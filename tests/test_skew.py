"""Salted-join skew mitigation: result parity with the plain join and
proof that a 100:1 hot key's rows spread across salt partitions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mbrainz_importer_spark.operators.skew import (
    SALT_COL,
    replicate_for_salt,
    salted_join,
    with_salt,
)

N_SALTS = 8
HOT_ROWS = 10_000
COLD_KEYS = 100
COLD_ROWS_PER_KEY = 100


@pytest.fixture(scope="module")
def skewed(spark):
    """key 'hot' owns 100x the rows of each cold key."""
    hot = spark.range(HOT_ROWS).select(
        F.lit("hot").alias("k"), F.col("id").alias("payload")
    )
    cold = spark.range(COLD_KEYS * COLD_ROWS_PER_KEY).select(
        F.concat(F.lit("cold"), (F.col("id") % COLD_KEYS)).alias("k"),
        F.col("id").alias("payload"),
    )
    return hot.unionByName(cold).cache()


@pytest.fixture(scope="module")
def dim(spark):
    keys = [("hot", 0)] + [(f"cold{i}", i + 1) for i in range(COLD_KEYS)]
    return spark.createDataFrame(keys, "k string, dim_val int")


def test_salted_join_matches_plain_join(skewed, dim):
    plain = skewed.join(dim, "k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s"),
        F.sum("dim_val").alias("d"),
    ).first()
    salted = salted_join(skewed, dim, "k", n_salts=N_SALTS).agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s"),
        F.sum("dim_val").alias("d"),
    ).first()
    assert (plain["n"], plain["s"], plain["d"]) == (salted["n"], salted["s"], salted["d"])


def test_left_join_preserves_unmatched(spark, dim):
    left = spark.createDataFrame(
        [("hot", 1), ("nokey", 2)], "k string, payload int"
    )
    out = salted_join(left, dim, "k", n_salts=4, how="left")
    got = {r["k"]: r["dim_val"] for r in out.collect()}
    assert got == {"hot": 0, "nokey": None}


def test_hot_key_spreads_over_salts(skewed):
    """The point of salting: the hot key's rows divide across N_SALTS
    buckets instead of one task owning all of them."""
    sizes = (
        with_salt(skewed.where(F.col("k") == "hot"), N_SALTS)
        .groupBy(SALT_COL).count().collect()
    )
    counts = {r[SALT_COL]: r["count"] for r in sizes}
    assert len(counts) == N_SALTS, f"hot key uses only salts {sorted(counts)}"
    # balanced: no salt bucket owns more than 2x the fair share
    fair = HOT_ROWS / N_SALTS
    assert max(counts.values()) < 2 * fair, f"unbalanced: {counts}"
    assert sum(counts.values()) == HOT_ROWS


def test_salt_is_deterministic(skewed):
    a = with_salt(skewed, N_SALTS).groupBy(SALT_COL).count().collect()
    b = with_salt(skewed, N_SALTS).groupBy(SALT_COL).count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_replication_covers_every_salt(dim):
    out = replicate_for_salt(dim, 4).groupBy("k").agg(
        F.countDistinct(SALT_COL).alias("n")
    )
    assert all(r["n"] == 4 for r in out.collect())


def test_unsupported_join_type_raises(skewed, dim):
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(skewed, dim, "k", how="full")
