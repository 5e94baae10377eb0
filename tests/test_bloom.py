"""Bloom pre-filtered novelty (operators/dedup.py bloom section)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mbrainz_importer_spark.operators.dedup import (
    bloom_novelty_filter, bloom_positions, build_bloom,
)
from mbrainz_importer_spark.operators.text import normalize_for_fingerprint


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _expected_new(spark, arrivals, corpus):
    h = lambda df: df.select(
        F.col("doc_id").alias("id"),
        F.md5(normalize_for_fingerprint(F.col("text"))).alias("content_hash"),
    )
    return {
        (r["id"], r["content_hash"])
        for r in h(arrivals)
        .join(h(corpus).select("content_hash").distinct(), "content_hash", "left_anti")
        .collect()
    }


class TestBloomNovelty:
    def test_exact_result_large_filter(self, spark):
        corpus = _docs(spark, [(i, f"doc number {i}") for i in range(50)])
        arrivals = _docs(
            spark,
            [(100 + i, f"doc number {i}") for i in range(10)]  # dups of corpus
            + [(200 + i, f"fresh content {i}") for i in range(10)],  # novel
        )
        got = {
            (r["id"], r["content_hash"])
            for r in bloom_novelty_filter(arrivals, corpus, m_bits=1 << 16, k=4).collect()
        }
        assert got == _expected_new(spark, arrivals, corpus)
        assert {i for i, _ in got} == {200 + i for i in range(10)}

    def test_exact_even_with_tiny_filter(self, spark):
        # 64 bits for 50 keys => false positives everywhere; the verify
        # join must still make the result exact
        corpus = _docs(spark, [(i, f"doc number {i}") for i in range(50)])
        arrivals = _docs(spark, [(300 + i, f"novel {i}") for i in range(20)])
        got = {
            r["id"]
            for r in bloom_novelty_filter(arrivals, corpus, m_bits=64, k=2).collect()
        }
        assert got == {300 + i for i in range(20)}

    def test_no_false_negatives(self, spark):
        # every corpus member must probe as 'maybe' (bloom guarantee)
        corpus = _docs(spark, [(i, f"text {i}") for i in range(30)])
        bloom = build_bloom(
            corpus,
            F.md5(normalize_for_fingerprint(F.col("text"))),
            m_bits=1 << 12,
            k=3,
        )
        pos = corpus.select(
            F.explode(
                bloom_positions(
                    F.md5(normalize_for_fingerprint(F.col("text"))), 1 << 12, 3
                )
            ).alias("p")
        ).collect()
        for r in pos:
            assert bloom[r["p"] >> 3] & (1 << (r["p"] & 7)), r["p"]

    def test_bitmap_bounded_by_m(self, spark):
        corpus = _docs(spark, [(i, f"text {i}") for i in range(100)])
        bloom = build_bloom(
            corpus, F.md5(F.col("text")), m_bits=256, k=4
        )
        assert len(bloom) == 256 // 8 + 1
