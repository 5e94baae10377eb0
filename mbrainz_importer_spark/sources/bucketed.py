"""Bucketed entity-table storage — the 100 TB merge path (SURVEY.md §7.2 M6).

Every import pass merges on the same upsert key (gid). Hash-bucketing the
warehouse tables on that key makes each subsequent merge/join co-located:
Catalyst sees compatible output partitioning on both sides and plans a
SortMergeJoin with NO Exchange — the shuffle that would otherwise move the
entire big side on every pass simply disappears.

Bucketed tables require the session catalog (saveAsTable); paths alone
cannot carry bucket metadata. `assert_no_exchange` is the test hook that
proves the property from the physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int = 16,
) -> None:
    """Persist as a bucketed+sorted managed table keyed for co-located
    merges. The write pre-shuffles on the bucket id (the same Murmur3
    pmod Spark's bucketing uses) so each bucket is ONE sorted file —
    Spark only trusts sortBy metadata for single-file buckets, so this
    is what actually lets downstream SMJs skip their Sort (a
    multi-task write fans out files per (task x bucket) and silently
    re-inserts the Sort)."""
    from pyspark.sql import functions as F

    from ..plans.eav import _drop_stale_table

    _drop_stale_table(df.sparkSession, table)
    (
        df.repartition(F.pmod(F.hash(bucket_key), F.lit(n_buckets)))
        .write.mode("overwrite")
        .bucketBy(n_buckets, bucket_key)
        .sortBy(bucket_key)
        .format("parquet")
        .saveAsTable(table)
    )


def adaptive_buckets(
    *paths: str,
    target_mb: int = 128,
    floor: int = 32,
    expand: float = 1.0,
) -> int:
    """Bucket count sized to the DATA, the way production lays out
    bucketed tables: one bucket ~ one `target_mb` parquet file. With
    single-file-per-bucket writes (write_bucketed's invariant) the
    per-task sort/write memory is bounded by the bucket size, so an
    undersized bucket count doesn't just make big files — it OOMs the
    writer (measured at the sf100 tier: 10 GB of lineitem into 32
    buckets = 318 MB files, 32 concurrent sorting writers, 8g heap
    gone). Power-of-two counts keep co-location stable as data grows
    (Spark joins bucketed tables whose counts divide each other
    one-sided). `expand` scales the source-bytes estimate when the
    written projection is wider than the source (e.g. an unpivot)."""
    import math
    import os

    total = 0
    for p in paths:
        if os.path.isdir(p):
            total += sum(
                os.path.getsize(os.path.join(p, f))
                for f in os.listdir(p)
                if not f.startswith(("_", "."))
            )
        elif os.path.exists(p):
            total += os.path.getsize(p)
    need = int(total * expand) // (target_mb * 1024 * 1024)
    if need <= floor:
        return floor
    return 2 ** math.ceil(math.log2(need))


def joined_bucketed(spark: SparkSession, left: str, right: str, key: str) -> DataFrame:
    """Join two tables bucketed on `key`: the merge hint pins the
    Exchange-free SortMergeJoin the layout pays for — without it a
    column-pruned side under autoBroadcastJoinThreshold gets broadcast,
    rebuilding a fact-scale hash relation on the driver (measured 9x
    slower on the sf10 datom store; plans/eav.py:read_datoms_bucketed)."""
    return spark.table(left).hint("merge").join(spark.table(right), key)


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan."""
    plan = physical_plan(df)
    return sum(1 for line in plan.splitlines() if "Exchange hashpartitioning" in line)
