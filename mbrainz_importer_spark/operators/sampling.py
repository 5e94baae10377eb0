"""Deterministic dataset splitting & sampling for training-data
pipelines (train/val/test assignment, per-stratum downsampling).

Everything is hash-based and seed-stable: the SAME row lands in the
SAME split on every run, on any cluster size, in any engine that can
compute md5 — no RNG state, no partition-order dependence (Spark's
randomSplit changes membership under repartitioning; this does not).
That portability is also what lets the DuckDB oracle certify the split
bit-for-bit.

Scale: the hash is a narrow projection (no shuffle at all for the
split-column assignment; one map-side filter for sampling) — the
operators add zero exchanges to whatever plan they feed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 6 hex digits = 24 bits -> bucket in [0, 2^24); plenty of resolution
# for per-mille split fractions while staying exact in a BIGINT in
# every engine.
_BUCKETS = 1 << 24


def _hash_bucket(key: Column, salt: str) -> Column:
    """Deterministic bucket in [0, 2^24): md5 of salt|key, first 6 hex
    digits (DuckDB twin: try_cast('0x' || substr(md5(...), 1, 6) AS
    BIGINT))."""
    return F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit(salt), key.cast("string"))), 1, 6),
        16, 10,
    ).cast("bigint")


def with_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    salt: str = "split-v1",
) -> DataFrame:
    """Assign a stable split label per key: {"train": .8, "val": .1,
    "test": .1} — boundaries are cumulative fractions of the 2^24
    bucket space. Fractions must sum to 1 (within 1e-9); every key
    gets exactly one label. Changing `salt` re-deals the assignment;
    keeping it pins membership forever (the property training pipelines
    need: no test-set leakage across re-runs)."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    bucket = _hash_bucket(F.col(key_col), salt)
    expr = None
    acc = 0.0
    items = list(fractions.items())
    for name, frac in items[:-1]:
        acc += frac
        bound = int(acc * _BUCKETS)
        cond = bucket < F.lit(bound)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fraction: float,
    salt: str = "sample-v1",
) -> DataFrame:
    """Keep a deterministic ~`fraction` of keys WITHIN each stratum:
    the hash is salted with the stratum value, so the kept set in one
    stratum is independent of every other (equal per-stratum rates,
    the property plain hash-sampling lacks when strata correlate with
    keys)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1]: {fraction}")
    bucket = _hash_bucket(
        F.concat_ws("#", F.col(strata_col).cast("string"), F.col(key_col).cast("string")),
        salt,
    )
    return df.where(bucket < F.lit(int(fraction * _BUCKETS)))


def sample_k_per_group(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int,
    salt: str = "sample-k-v1",
) -> DataFrame:
    """EXACTLY min(k, |group|) rows per group, deterministically: rank
    each group's keys by their salted md5 (a reproducible random order)
    and keep the first k — the per-source quota sampler (cap every
    crawl domain at k documents) where rate-based sampling can't hit an
    exact count. One shuffle on the group key; the window ranks within
    groups only (never a global window). Ties are impossible: the
    md5 rank key includes the key itself."""
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    rank_key = F.md5(
        F.concat_ws("#", F.lit(salt), F.col(key_col).cast("string"))
    )
    w = Window.partitionBy(group_col).orderBy(rank_key, F.col(key_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def leakage_safe_split(
    docs: DataFrame,
    id_col: str,
    pairs: DataFrame,
    fractions: dict[str, float],
    salt: str = "split-v1",
) -> DataFrame:
    """Dedup-aware train/val/test split: the split UNIT is the
    near-duplicate cluster, not the document. Plain hash splits leave
    the leakage channel every eval report warns about — a document in
    train and its near-copy in test — because the two ids hash
    independently. Here the pair graph (any near-dup pair list: LSH-
    verified, n-gram Jaccard, SemDeDup) resolves into clusters first
    (pointer-jumping CC from operators/dedup.py) and `with_split`
    hashes the CLUSTER id, so every member of a cluster lands in the
    same split by construction.

    Scale: CC runs over pair edges only; the corpus pays one hash join
    to pick up (cluster, split). Returns `docs` + (cluster, split)."""
    from .dedup import dedup_clusters

    clusters = dedup_clusters(docs, pairs, id_col)
    labeled = with_split(clusters.select("doc", "cluster"), "cluster", fractions, salt)
    return docs.join(
        labeled.withColumnRenamed("doc", id_col),
        id_col,
    )
