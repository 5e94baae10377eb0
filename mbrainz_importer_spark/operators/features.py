"""Numeric feature conditioning for training pipelines: z-score and
min-max normalization, exact-percentile winsorization (outlier
clipping). Each is a TWO-step plan — one aggregation pass computes the
statistics, which then ride into a pure projection as a broadcast
scalar row — so the data itself never shuffles and the conditioning
pipelines into whatever scan feeds it.

Determinism note: means/stddevs are float reductions whose exact value
depends on partial-aggregation order, so normalized outputs are rounded
(6 decimals) before certification — the same discipline as the text
quality scores. Winsorization bounds use Spark's EXACT `percentile`
(sort-based, order-independent), so the clip bounds themselves are
deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _stats_row(df: DataFrame, aggs: list) -> DataFrame:
    return F.broadcast(df.agg(*aggs))


def zscore_normalize(
    df: DataFrame, cols: list[str], suffix: str = "_z"
) -> DataFrame:
    """Append (x - mean) / stddev_samp per column, rounded to 6; a
    constant column (stddev 0/null) normalizes to null rather than
    inf."""
    if not cols:
        raise ValueError("zscore_normalize needs columns")
    stats = _stats_row(
        df,
        [F.avg(F.col(c).cast("double")).alias(f"__m_{c}") for c in cols]
        + [F.stddev_samp(F.col(c).cast("double")).alias(f"__s_{c}") for c in cols],
    )
    out = df.crossJoin(stats)
    for c in cols:
        s = F.col(f"__s_{c}")
        out = out.withColumn(
            f"{c}{suffix}",
            F.round(
                F.when(
                    s.isNotNull() & (s != 0),
                    (F.col(c).cast("double") - F.col(f"__m_{c}")) / s,
                ),
                6,
            ),
        )
    return out.drop(*[f"__m_{c}" for c in cols], *[f"__s_{c}" for c in cols])


def minmax_normalize(
    df: DataFrame, cols: list[str], suffix: str = "_mm"
) -> DataFrame:
    """Append (x - min) / (max - min) per column in [0, 1], rounded to
    6; a constant column maps to null."""
    if not cols:
        raise ValueError("minmax_normalize needs columns")
    stats = _stats_row(
        df,
        [F.min(F.col(c).cast("double")).alias(f"__lo_{c}") for c in cols]
        + [F.max(F.col(c).cast("double")).alias(f"__hi_{c}") for c in cols],
    )
    out = df.crossJoin(stats)
    for c in cols:
        lo, hi = F.col(f"__lo_{c}"), F.col(f"__hi_{c}")
        out = out.withColumn(
            f"{c}{suffix}",
            F.round(
                F.when(hi != lo, (F.col(c).cast("double") - lo) / (hi - lo)),
                6,
            ),
        )
    return out.drop(*[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols])


def winsorize(
    df: DataFrame,
    col: str,
    p_low: float = 0.01,
    p_high: float = 0.99,
    suffix: str = "_w",
) -> DataFrame:
    """Clip a column to its exact [p_low, p_high] percentiles
    (sort-based exact percentile — deterministic bounds, unlike
    approx_percentile's merge-order dependence)."""
    if not (0.0 <= p_low < p_high <= 1.0):
        raise ValueError(f"need 0 <= p_low < p_high <= 1: {p_low}, {p_high}")
    bounds = _stats_row(
        df,
        [
            F.expr(f"percentile({col}, {p_low})").alias("__wlo"),
            F.expr(f"percentile({col}, {p_high})").alias("__whi"),
        ],
    )
    return (
        df.crossJoin(bounds)
        .withColumn(
            f"{col}{suffix}",
            F.least(
                F.greatest(F.col(col).cast("double"), F.col("__wlo")),
                F.col("__whi"),
            ),
        )
        .drop("__wlo", "__whi")
    )
