"""Windowed stream aggregations (SURVEY.md §2.7).

The reference is a bounded-stream system (channels + threads, batch
semantics); watermarks/windows are the engine capabilities it lacks and we
declare. Every window shape is expressed so that BATCH execution over the
same data gives the identical result — that equivalence is what the
oracle checks, and it is exactly Structured Streaming's unified-API
contract: a streaming query is a batch query evaluated incrementally.

All three shapes work unchanged on a streaming DataFrame (readStream) with
`with_watermark=True`; tests/test_streaming.py runs them through a real
stream with trigger=availableNow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WATERMARK = "10 minutes"


def _maybe_watermark(df: DataFrame, ts_col: str, with_watermark: bool) -> DataFrame:
    """Late-data bound: state for windows older than the watermark is
    dropped (and late events discarded) — bounded state at 100 TB/day.

    Event-time watermarks require TimestampType (LTZ); an NTZ event-time
    column is cast at this boundary (session tz is UTC in the engine's
    session factory, so the instant is unchanged)."""
    if with_watermark and df.isStreaming:
        if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
            df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        return df.withWatermark(ts_col, DEFAULT_WATERMARK)
    return df


def _restore_ntz(df: DataFrame, was_ntz: bool, *cols: str) -> DataFrame:
    """Streaming casts NTZ event time to LTZ for the watermark; cast window
    bounds back so batch and streaming runs of the same operator return the
    same type (and the same collected values in any client timezone)."""
    if not was_ntz:
        return df
    for c in cols:
        df = df.withColumn(c, F.col(c).cast("timestamp_ntz"))
    return df


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    width: str = "1 hour",
    with_watermark: bool = True,
) -> DataFrame:
    """Non-overlapping fixed windows: one row per (window_start, key)."""
    was_ntz = dict(df.dtypes).get(ts_col) == "timestamp_ntz"
    d = _maybe_watermark(df, ts_col, with_watermark)
    out = (
        d.groupBy(F.window(ts_col, width).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), key_col, "n_events", "sum_value")
    )
    return _restore_ntz(out, was_ntz, "window_start")


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    slide: str = "30 minutes",
    with_watermark: bool = True,
) -> DataFrame:
    """Overlapping windows: each event lands in width/slide windows."""
    was_ntz = dict(df.dtypes).get(ts_col) == "timestamp_ntz"
    d = _maybe_watermark(df, ts_col, with_watermark)
    out = (
        d.groupBy(F.window(ts_col, width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )
    return _restore_ntz(out, was_ntz, "window_start")


def session_counts(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "5 minutes",
    with_watermark: bool = True,
) -> DataFrame:
    """Session windows: events of one user closer than `gap` merge into one
    session; session_end = last event + gap (Spark session_window
    semantics, reproduced by the gaps-and-islands oracle)."""
    was_ntz = dict(df.dtypes).get(ts_col) == "timestamp_ntz"
    d = _maybe_watermark(df, ts_col, with_watermark)
    out = (
        d.groupBy(F.session_window(ts_col, gap).alias("w"), F.col(user_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(user_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    return _restore_ntz(out, was_ntz, "session_start", "session_end")


def dim_enriched_tumbling_counts(
    df: DataFrame,
    dim: DataFrame,
    left_key: str = "user_id",
    right_key: str = "c_custkey",
    dim_col: str = "c_mktsegment",
    out_dim: str = "segment",
    ts_col: str = "ts",
    width: str = "1 hour",
    with_watermark: bool = True,
) -> DataFrame:
    """Stream-STATIC enrichment + tumbling aggregation: the static dim
    broadcasts to every executor (stream-static joins carry NO join
    state — the streaming-side watermark only bounds the window agg),
    then counts group by (window, enriched dim). Unmatched keys keep
    the row with an UNKNOWN dim value — an enrichment miss must not
    drop fact rows."""
    was_ntz = dict(df.dtypes).get(ts_col) == "timestamp_ntz"
    d = _maybe_watermark(df, ts_col, with_watermark)
    dimd = F.broadcast(
        dim.select(F.col(right_key).alias("__dk"), F.col(dim_col).alias(out_dim))
    )
    joined = (
        d.join(dimd, d[left_key] == dimd["__dk"], "left")
        .withColumn(out_dim, F.coalesce(F.col(out_dim), F.lit("UNKNOWN")))
    )
    out = (
        joined.groupBy(F.window(ts_col, width).alias("w"), F.col(out_dim))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), out_dim, "n_events", "sum_value")
    )
    return _restore_ntz(out, was_ntz, "window_start")
