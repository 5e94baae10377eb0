"""Misra–Gries heavy hitters (operators/sketch.py) and sliding-window
document chunking (operators/chunking.py)."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from mbrainz_importer_spark.operators.chunking import chunk_documents
from mbrainz_importer_spark.operators.sketch import _compress, heavy_hitters


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def _true_counts(texts):
    c: Counter = Counter()
    for t in texts:
        c.update(w for w in t.lower().strip().split() if w)
    return c


class TestHeavyHitters:
    def test_exact_when_capacity_sufficient(self, spark):
        texts = ["a b b c c c d", "c c a a a a", "b d d e"]
        truth = _true_counts(texts)
        rows = heavy_hitters(_docs(spark, texts), "text", capacity=100, k=10).collect()
        got = {r["token"]: (r["count_lower"], r["count_upper"]) for r in rows}
        assert set(got) == set(truth)
        for t, n in truth.items():
            assert got[t] == (n, n), t
        # ranking: count DESC, token ASC
        ranked = [(r["token"]) for r in rows]
        want = sorted(truth, key=lambda t: (-truth[t], t))
        assert ranked == want

    def test_bounds_contain_truth_small_capacity(self, spark):
        # skewed corpus: 3 heavy tokens + a singleton tail, capacity 4
        texts = [("hot " * 30 + "warm " * 20 + "mild " * 10 + f"tail{i}") for i in range(40)]
        truth = _true_counts(texts)
        df = _docs(spark, texts).repartition(4)
        rows = heavy_hitters(df, "text", capacity=4, k=5).collect()
        got = {r["token"]: (r["count_lower"], r["count_upper"]) for r in rows}
        n_total = sum(truth.values())
        # every token with freq > N/capacity must survive
        for t, n in truth.items():
            if n > n_total / 4:
                assert t in got, (t, n, n_total)
        for t, (lo, hi) in got.items():
            assert lo <= truth[t] <= hi, (t, lo, truth[t], hi)

    def test_compress_bound(self):
        c = Counter({"a": 10, "b": 6, "c": 3, "d": 2, "e": 1})
        kept, d = _compress(c, 2)
        assert d == 3 and len(kept) <= 2
        assert kept == Counter({"a": 7, "b": 3})

    def test_capacity_validation(self, spark):
        with pytest.raises(ValueError, match="capacity"):
            heavy_hitters(_docs(spark, ["x"]), "text", capacity=0, k=1)


class TestChunking:
    def test_windows_with_overlap(self, spark):
        df = _docs(spark, ["t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"])
        rows = chunk_documents(df, "doc_id", "text", chunk_tokens=4, stride=3).orderBy(
            "chunk_idx"
        ).collect()
        assert [(r["chunk_idx"], r["start_token"], r["n_tokens"], r["chunk_text"])
                for r in rows] == [
            (0, 0, 4, "t0 t1 t2 t3"),
            (1, 3, 4, "t3 t4 t5 t6"),
            (2, 6, 4, "t6 t7 t8 t9"),
            (3, 9, 1, "t9"),
        ]

    def test_disjoint_and_empty(self, spark):
        df = _docs(spark, ["a b c d", "", "   "])
        rows = chunk_documents(df, "doc_id", "text", chunk_tokens=2, stride=2).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r["chunk_text"])
        assert by_doc == {0: ["a b", "c d"]}  # empty docs: no chunks

    def test_no_exchange_plan(self, spark):
        df = _docs(spark, ["a b c"])
        plan = chunk_documents(df, "doc_id", "text", 4, 3)._jdf.queryExecution(
        ).executedPlan().toString()
        assert "Exchange" not in plan

    def test_validation(self, spark):
        with pytest.raises(ValueError, match="stride"):
            chunk_documents(_docs(spark, ["x"]), "doc_id", "text", 4, 0)
