"""operators/ranks.nth_smallest_distinct: exactness of the bounded
per-partition prefilter against a plain distinct-sort."""

from __future__ import annotations

import random

from mbrainz_importer_spark.operators.ranks import nth_smallest_distinct


def test_matches_full_distinct_sort(spark):
    rng = random.Random(7)
    vals = [rng.randrange(0, 500) for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "k bigint").repartition(8)
    want = sorted(set(vals))
    for n in (1, 7, 100):
        assert nth_smallest_distinct(df, "k", n) == want[n - 1]


def test_fewer_distinct_than_n_returns_max(spark):
    df = spark.createDataFrame([(3,), (1,), (3,), (2,)], "k bigint")
    assert nth_smallest_distinct(df, "k", 100) == 3


def test_empty_input_returns_none(spark):
    df = spark.createDataFrame([], "k bigint")
    assert nth_smallest_distinct(df, "k", 5) is None


def test_duplicates_straddling_partitions(spark):
    """The same value present in every partition must count once."""
    df = spark.createDataFrame([(1,)] * 64 + [(2,)] * 64 + [(5,)] * 64,
                               "k bigint").repartition(16)
    assert nth_smallest_distinct(df, "k", 3) == 5
