"""Slowly-changing dimension type 2 (SCD2) — the warehouse-side twin of
the engine's datom history: instead of (e, a, v, tx, added) ops, a
dimension row carries [effective_from, effective_to) validity and the
current version has effective_to = NULL. `d/as-of` over the log and
"SELECT ... WHERE ts >= effective_from AND (effective_to IS NULL OR
ts < effective_to)" answer the same question.

`scd2_apply` merges a batch of timestamped changes into the dimension:

  - closed (historical) versions pass through untouched;
  - the current version of each key unions with its changes, RUNS of
    consecutive versions with identical tracked attributes collapse to
    the first (a "change" that changes nothing creates no version);
  - each surviving version closes at the next version's start
    (lead over the key window), the last stays open.

One shuffle on the dimension key; both window passes reuse the same
partitioning (Catalyst reuses the exchange). Every step is built-in
expressions — the plan is MERGE-shaped and maps onto any ACID table
format the same way operators/upsert.py does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key_col: str,
    tracked_cols: list[str],
    from_col: str = "effective_from",
    to_col: str = "effective_to",
) -> DataFrame:
    """Apply `changes` (key, tracked..., from_col) to an SCD2 `dim`
    (key, tracked..., from_col, to_col; to_col NULL = current).
    Returns the full new SCD2 table. Multiple changes per key in one
    batch chain in from_col order; ties collapse to one version."""
    if not tracked_cols:
        raise ValueError("scd2_apply needs tracked columns")
    cols = [key_col, *tracked_cols, from_col]

    hist = dim.where(F.col(to_col).isNotNull())
    cur = dim.where(F.col(to_col).isNull()).select(*cols)
    cand = cur.unionByName(changes.select(*cols)).dropDuplicates(
        [key_col, from_col]
    )

    w = Window.partitionBy(key_col).orderBy(from_col)
    same = F.lit(True)
    for c in tracked_cols:
        same = same & F.col(c).eqNullSafe(F.lag(F.col(c)).over(w))
    first = F.lag(F.col(from_col)).over(w).isNull()
    versions = (
        cand.withColumn("__keep", first | ~same)
        .where(F.col("__keep"))
        .drop("__keep")
    )
    closed = versions.withColumn(
        to_col, F.lead(F.col(from_col)).over(w)
    )
    return hist.select(*cols, to_col).unionByName(closed)


def as_of_dim(
    scd2: DataFrame,
    ts,
    from_col: str = "effective_from",
    to_col: str = "effective_to",
) -> DataFrame:
    """The dimension as of `ts` — one row per key whose validity
    interval covers ts (the warehouse d/as-of)."""
    t = F.lit(ts) if not hasattr(ts, "_jc") else ts
    return scd2.where(
        (F.col(from_col) <= t)
        & (F.col(to_col).isNull() | (F.col(to_col) > t))
    )
