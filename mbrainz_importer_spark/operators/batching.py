"""Deterministic order-dependent batching (SURVEY.md §2.3 G3, §4.1).

The reference numbers fixed-size batches with a stateful counter over a
single ordered stream (tx-data->batches, cognitect/xform/batch.clj:31-40).
Spark has no implicit stream order, so the order is an explicit sort key —
and a naive `row_number().over(Window.orderBy(...))` collapses everything
onto ONE partition, which is wrong at scale.

`stable_row_number` is the 100 TB-safe version, value-bucketed two-phase:

  1. pick ordered boundary literals for the leading sort key (driver-side,
     from approx-quantiles or a bounded sample — affects balance only);
  2. bucket each row by pure comparison against those literals (NOT by
     spark_partition_id — partition identity is not stable across the jobs
     AQE compiles, value comparison is);
  3. count rows per bucket (one tiny aggregate) -> exclusive prefix-sum
     offsets on the driver;
  4. row_number inside each bucket (parallel windows) + the bucket offset.

Every step is deterministic given the data, so the numbering is
reproducible run-to-run — the property the reference gets from its
single-threaded counter and that idempotent re-imports depend on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MAX_BUCKETS = 256
_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType, T.DoubleType, T.DecimalType)


def _boundaries(df: DataFrame, col: str, k: int) -> list:
    """Driver-side ordered boundary values for the leading sort key.
    Approximate is fine: boundaries only balance buckets, never affect
    correctness."""
    k = min(k, _MAX_BUCKETS)
    if k <= 1:
        return []
    dt = df.schema[col].dataType
    if isinstance(dt, _NUMERIC):
        # one cheap min/max aggregate + fixed-width interpolation instead
        # of an approxQuantile pass (measured ~2s faster on the sf0.1
        # bench). Boundaries only balance buckets — a skewed key skews
        # bucket sizes but never correctness; the window inside each
        # bucket stays parallel either way.
        row = df.agg(
            F.min(F.col(col).cast("double")).alias("lo"),
            F.max(F.col(col).cast("double")).alias("hi"),
        ).collect()[0]
        lo, hi = row["lo"], row["hi"]
        if lo is None or hi is None or lo == hi:
            return []
        step = (hi - lo) / k
        return sorted({lo + i * step for i in range(1, k)})
    sample = (
        df.select(col).na.drop().sample(fraction=0.01, seed=42).limit(k * 64).collect()
    )
    vals = sorted({r[0] for r in sample})
    if len(vals) <= k:
        return vals
    step = len(vals) / k
    return [vals[int(i * step)] for i in range(1, k)]


def _bucket_expr(col: Column, bounds: list, numeric: bool) -> Column:
    """Pure-function bucket id: number of boundaries < value (null -> -1)."""
    c = col.cast("double") if numeric else col
    expr = F.lit(len(bounds))
    for i in range(len(bounds) - 1, -1, -1):
        expr = F.when(c <= F.lit(bounds[i]), i).otherwise(expr)
    return F.when(col.isNull(), F.lit(-1)).otherwise(expr)


def stable_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rn",
    num_buckets: int | None = None,
) -> DataFrame:
    """Global 1-based row numbers by `order_cols`, no single-partition
    window. Ties order by the remaining `order_cols`; rows identical on all
    of them get an arbitrary-but-deterministic relative order within a
    bucket."""
    spark = df.sparkSession
    k = num_buckets or spark.sparkContext.defaultParallelism
    lead = order_cols[0]
    numeric = isinstance(df.schema[lead].dataType, _NUMERIC)
    bounds = _boundaries(df, lead, k)

    bucketed = df.withColumn("__bkt", _bucket_expr(F.col(lead), bounds, numeric))

    counts = {
        r["__bkt"]: r["cnt"]
        for r in bucketed.groupBy("__bkt").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]

    if offsets:
        offset_expr = F.element_at(
            F.create_map(*[F.lit(x) for b in offsets for x in (b, offsets[b])]),
            F.col("__bkt"),
        )
    else:
        offset_expr = F.lit(0)
    w = Window.partitionBy("__bkt").orderBy(*[F.col(c) for c in order_cols])
    return (
        bucketed.withColumn(out_col, (F.row_number().over(w) + offset_expr).cast("long"))
        .drop("__bkt")
    )


def stable_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "cumsum",
    num_buckets: int | None = None,
) -> DataFrame:
    """Inclusive running sum of `value_col` in `order_cols` order, with the
    same value-bucketed two-phase plan as stable_row_number: parallel
    in-bucket window sums plus a driver-side exclusive prefix of <=256
    bucket subtotals. No single-partition window at any scale."""
    spark = df.sparkSession
    k = num_buckets or spark.sparkContext.defaultParallelism
    lead = order_cols[0]
    numeric = isinstance(df.schema[lead].dataType, _NUMERIC)
    bounds = _boundaries(df, lead, k)

    bucketed = df.withColumn("__bkt", _bucket_expr(F.col(lead), bounds, numeric))
    sums = {
        r["__bkt"]: r["s"]
        for r in bucketed.groupBy("__bkt")
        .agg(F.sum(F.col(value_col).cast("long")).alias("s"))
        .collect()
    }
    offsets, acc = {}, 0
    for b in sorted(sums):
        offsets[b] = acc
        acc += sums[b] or 0

    if offsets:
        offset_expr = F.element_at(
            F.create_map(*[F.lit(x) for b in offsets for x in (b, offsets[b])]),
            F.col("__bkt"),
        )
    else:
        offset_expr = F.lit(0)
    w = (
        Window.partitionBy("__bkt")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        bucketed.withColumn(
            out_col,
            (F.sum(F.col(value_col).cast("long")).over(w) + offset_expr).cast("long"),
        ).drop("__bkt")
    )


def assign_batch_ids(
    df: DataFrame,
    batch_size: int,
    prefix: str,
    order_cols: list[str],
    id_col: str = "batch_id",
    rn_col: str = "rn",
) -> DataFrame:
    """batch_id = '{prefix}-{N}', N from 1, consecutive in key order —
    the golden envelope contract (subsets/batches/artists.edn: 47 batches
    of 100 over 4,601 artists)."""
    numbered = stable_row_number(df, order_cols, out_col=rn_col)
    return numbered.withColumn(
        id_col,
        F.concat_ws("-", F.lit(prefix), (F.floor((F.col(rn_col) - 1) / batch_size) + 1)),
    )


def to_envelopes(
    df: DataFrame,
    data_cols: list[str],
    id_col: str = "batch_id",
    rn_col: str = "rn",
) -> DataFrame:
    """Collapse batch members into the envelope shape
    {batch_id, data: array<struct<...>>} with members ordered by `rn_col`
    (batch.clj:31-40 envelope; observed subsets/batches/*.edn)."""
    member = F.struct(F.col(rn_col).alias("__rn"), *[F.col(c) for c in data_cols])
    return (
        df.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(member)).alias("__members"),
             F.min(rn_col).alias("__first_rn"))
        .select(
            id_col,
            F.transform(F.col("__members"), lambda m: m.dropFields("__rn")).alias("data"),
            F.col("__first_rn"),
        )
    )
