"""Time-series regularization: per-key gap fill onto a dense daily
spine + forward fill.

The missing operator between event logs and anything windowed: models,
rollups, and retention math all assume one row per (key, period), but
raw events skip quiet days. Gap filling materializes the missing
periods; forward fill carries the last observation across them (sensor
readings, account balances, feature snapshots).

Scale design:
  - The spine is generated PER KEY from its own (min, max) day span —
    `F.sequence` + `explode` is a narrow projection over the per-key
    span row, so spine size is sum of spans, never |keys| x |calendar|.
  - Day indexes are integers (days since epoch) — engine-portable, no
    date_trunc locale/timezone edges (the cohort_retention discipline).
  - Actuals join the spine on (key, day): one hash shuffle.
  - Forward fill is `last(value, ignorenulls)` over a window
    PARTITIONED by key, ordered by day — bounded by a key's span,
    never a global sort.
  - Daily sums go through decimal so both engines add exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EPOCH = "1970-01-01"


def day_index(ts_col: str) -> "F.Column":
    """Integer days-since-epoch of a timestamp column."""
    return F.datediff(F.to_date(F.col(ts_col)), F.to_date(F.lit(EPOCH)))


def gapfill_daily(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Dense per-(key, day) frame over each key's observed span:
    (key, day_idx, n_events, day_value, ffill_value, is_gap).
    `day_value` is the day's decimal-exact sum (0 on gap days);
    `ffill_value` carries the last observed day's sum forward across
    gaps; `is_gap` marks synthesized rows."""
    daily = events.groupBy(
        F.col(key_col), day_index(ts_col).alias("day_idx")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(18,6)"))
        .cast("double")
        .alias("day_value"),
    )
    spans = daily.groupBy(key_col).agg(
        F.min("day_idx").alias("__lo"), F.max("day_idx").alias("__hi")
    )
    spine = spans.select(
        key_col, F.explode(F.sequence("__lo", "__hi")).alias("day_idx")
    )
    filled = spine.join(daily, [key_col, "day_idx"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("day_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        key_col,
        F.col("day_idx").cast("int").alias("day_idx"),
        F.coalesce(F.col("n_events"), F.lit(0)).cast("bigint").alias("n_events"),
        F.coalesce(F.col("day_value"), F.lit(0.0)).alias("day_value"),
        F.last("day_value", ignorenulls=True).over(w).alias("ffill_value"),
        F.col("day_value").isNull().alias("is_gap"),
    )
