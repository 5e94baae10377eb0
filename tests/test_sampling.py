"""Deterministic split/sample semantics: exhaustive+disjoint labels,
stability under repartitioning (the property randomSplit lacks),
per-stratum independence, and repetition-score correctness on a known
degenerate document."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mbrainz_importer_spark.operators.sampling import (
    stratified_sample,
    with_split,
)
from mbrainz_importer_spark.operators.text import repetition_scores


@pytest.fixture(scope="module")
def keys(spark):
    return spark.range(0, 2000).select(F.col("id").alias("k"))


def test_split_exhaustive_and_disjoint(keys):
    out = with_split(keys, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 2000
    # rough proportions (hash-uniform over 2000 keys)
    assert 1500 < counts["train"] < 1700
    assert 120 < counts["val"] < 280
    assert 120 < counts["test"] < 280


def test_split_stable_under_repartition(keys):
    a = with_split(keys, "k", {"train": 0.5, "test": 0.5})
    b = with_split(keys.repartition(17), "k", {"train": 0.5, "test": 0.5})
    left = {(r["k"], r["split"]) for r in a.collect()}
    right = {(r["k"], r["split"]) for r in b.collect()}
    assert left == right


def test_split_salt_redeals(keys):
    a = {(r["k"], r["split"]) for r in
         with_split(keys, "k", {"train": 0.5, "test": 0.5}, salt="s1").collect()}
    b = {(r["k"], r["split"]) for r in
         with_split(keys, "k", {"train": 0.5, "test": 0.5}, salt="s2").collect()}
    assert a != b


def test_split_fractions_must_sum_to_one(keys):
    with pytest.raises(ValueError, match="sum to 1"):
        with_split(keys, "k", {"train": 0.8, "val": 0.1})


def test_stratified_sample_per_stratum_rate(spark):
    df = spark.range(0, 4000).select(
        F.col("id").alias("k"), (F.col("id") % 2).cast("string").alias("s")
    )
    out = stratified_sample(df, "k", "s", 0.25)
    counts = {r["s"]: r["n"] for r in
              out.groupBy("s").agg(F.count(F.lit(1)).alias("n")).collect()}
    for s in ("0", "1"):
        assert 400 < counts[s] < 600  # ~25% of 2000 per stratum


def test_stratified_sample_fraction_bounds(spark):
    df = spark.range(1).select(F.col("id").alias("k"), F.lit("a").alias("s"))
    with pytest.raises(ValueError, match="fraction"):
        stratified_sample(df, "k", "s", 1.5)


def test_repetition_scores_degenerate_doc(spark):
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),      # one trigram repeated 4x
            (2, "the quick brown fox jumps high"),     # all trigrams unique
            (3, "ab"),                                 # < n tokens -> absent
        ],
        "doc_id long, text string",
    )
    rows = {r["doc"]: r for r in repetition_scores(docs, "doc_id").collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["n_grams"] == 4
    assert rows[1]["dup_fraction"] == 0.75   # 1 distinct of 4 occurrences
    assert rows[1]["top_fraction"] == 1.0
    assert rows[2]["dup_fraction"] == 0.0
    assert rows[2]["top_fraction"] == 0.25   # 4 unique trigrams


def test_sample_k_per_group_exact_and_deterministic(spark):
    from mbrainz_importer_spark.operators.sampling import sample_k_per_group

    rows = [(i, "big" if i < 100 else "small") for i in range(103)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sample_k_per_group(df, "doc_id", "source", k=10).collect()
    by = {}
    for r in out:
        by.setdefault(r["source"], []).append(r["doc_id"])
    assert len(by["big"]) == 10           # exact quota
    assert sorted(by["small"]) == [100, 101, 102]  # undersized group kept whole

    again = sample_k_per_group(df, "doc_id", "source", k=10).collect()
    assert sorted(r["doc_id"] for r in again) == sorted(r["doc_id"] for r in out)
    # a different salt picks a different subset
    other = sample_k_per_group(df, "doc_id", "source", k=10, salt="v2").collect()
    assert sorted(r["doc_id"] for r in other) != sorted(r["doc_id"] for r in out)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="k must"):
        sample_k_per_group(df, "doc_id", "source", k=0)


def test_leakage_safe_split_clusters_never_straddle(spark):
    from mbrainz_importer_spark.operators.sampling import leakage_safe_split

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id int, text string"
    )
    # chain 0-1-2 plus pair (10, 11); everything else singleton
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "doc_a int, doc_b int"
    )
    out = leakage_safe_split(
        docs, "doc_id", pairs, {"train": 0.5, "val": 0.25, "test": 0.25}
    ).collect()
    assert len(out) == 200
    by_id = {r.doc_id: r for r in out}
    # every cluster maps to exactly one split
    assert len({by_id[i].split for i in (0, 1, 2)}) == 1
    assert by_id[10].split == by_id[11].split
    assert {by_id[i].cluster for i in (0, 1, 2)} == {0}
    # the split hashes the cluster id: singleton assignment matches
    # with_split on the doc id itself
    from mbrainz_importer_spark.operators.sampling import with_split

    solo = {
        r.doc_id: r.split
        for r in with_split(docs, "doc_id", {"train": 0.5, "val": 0.25, "test": 0.25})
        .collect()
    }
    for i in (50, 99, 150):
        assert by_id[i].split == solo[i]
