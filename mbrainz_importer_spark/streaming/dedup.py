"""Streaming deduplication and stream-stream joins (§2.7 extension:
the LLM-pipeline dedup story applied to unbounded data).

Unified-API operators: each function takes a batch OR streaming
DataFrame and declares the same semantics; on a stream it wires the
watermark-backed primitive (`dropDuplicatesWithinWatermark`, interval
stream-stream join), in batch it is the equivalent bounded plan. The
gate queries certify the batch face against DuckDB; the streaming
tests prove stream == batch on the same data.

Scale notes:
  - dropDuplicatesWithinWatermark keeps per-key state ONLY inside the
    watermark horizon — bounded state, unlike dropDuplicates on a
    stream which grows forever. At 100 TB/day the horizon is the knob
    that caps state size.
  - The stream-stream join buffers both sides within their watermarks
    and evicts by the join's time-range condition; the equi-key
    (user_id) keeps the state partitioned — no broadcast of an
    unbounded side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _watermarked(df: DataFrame, ts_col: str, horizon: str) -> tuple[DataFrame, bool]:
    """Event-time watermarks require TimestampType (LTZ); an NTZ
    event-time column is cast at this boundary (the engine's session tz
    is UTC, so the instant is unchanged). Returns (df', was_ntz)."""
    was_ntz = dict(df.dtypes).get(ts_col) == "timestamp_ntz"
    if was_ntz:
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df.withWatermark(ts_col, horizon), was_ntz


def _restore_ntz(df: DataFrame, was_ntz: bool, *cols: str) -> DataFrame:
    if not was_ntz:
        return df
    for c in cols:
        df = df.withColumn(c, F.col(c).cast("timestamp_ntz"))
    return df


def dedup_within_horizon(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    horizon: str = "10 minutes",
) -> DataFrame:
    """Drop re-deliveries of the same key seen within `horizon`:
    first-seen row wins. Streaming: watermark + the bounded-state
    dropDuplicatesWithinWatermark. Batch: plain dropDuplicates — a
    bounded input IS one horizon.

    The surviving row for a key is arrival-order-dependent (as in any
    at-least-once transport); downstream comparisons should project the
    key columns, or pipe through a deterministic compaction
    (operators/upsert.compact_by_key) when value determinism matters."""
    if df.isStreaming:
        wm, was_ntz = _watermarked(df, ts_col, horizon)
        return _restore_ntz(
            wm.dropDuplicatesWithinWatermark(keys), was_ntz, ts_col
        )
    return df.dropDuplicates(keys)


def join_within_interval(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    within: str = "30 minutes",
    horizon: str = "1 hour",
) -> DataFrame:
    """Equi-key join where the right event happens in (left_ts,
    left_ts + within]: the click->purchase attribution shape. Key and
    timestamp columns must be name-distinct across the two sides (the
    usual discipline for self-joins of one event stream). On streams
    both sides carry watermarks so buffered state evicts once the
    range condition can no longer match."""
    l_ntz = r_ntz = False
    if left.isStreaming:
        left, l_ntz = _watermarked(left, left_ts, horizon)
    if right.isStreaming:
        right, r_ntz = _watermarked(right, right_ts, horizon)
    cond = (
        (F.col(left_key) == F.col(right_key))
        & (F.col(right_ts) > F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    out = left.join(right, cond)
    out = _restore_ntz(out, l_ntz, left_ts)
    return _restore_ntz(out, r_ntz, right_ts)
