"""SQ8 / PQ quantization (operators/quantize.py): grid exactness,
lossless-PQ equivalence, lossy-PQ recall bound."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mbrainz_importer_spark.operators.quantize import (
    int_dot, pq_encode, pq_ip_topk, sq8_code, sq8_ip_topk, sq8_train_bounds,
    train_pq_codebooks,
)

DIM = 8


def _vecs(spark, n=40, seed=7):
    # deterministic pseudo-random float vectors (no RNG state: md5-based)
    rows = []
    for i in range(n):
        v = [((i * 31 + d * 17 + seed) % 101) / 101.0 - 0.5 for d in range(DIM)]
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


class TestSQ8:
    def test_codes_on_grid_and_clamped(self, spark):
        df = _vecs(spark)
        lo, hi = sq8_train_bounds(df, "embedding", DIM)
        codes = df.select(sq8_code(F.col("embedding"), lo, hi).alias("c")).collect()
        for r in codes:
            assert all(0 <= x <= 255 for x in r["c"])
        # boundary vectors hit the grid ends
        flat = [x for r in codes for x in r["c"]]
        assert 0 in flat and 255 in flat

    def test_int_dot_exact(self, spark):
        df = spark.createDataFrame(
            [(1, [1, 2, 3]), (2, [4, 5, 6])], "id bigint, c array<int>"
        )
        a = df.where("id=1").select(F.col("c").alias("a"))
        b = df.where("id=2").select(F.col("c").alias("b"))
        got = a.crossJoin(b).select(int_dot(F.col("a"), F.col("b")).alias("d")).collect()
        assert got[0]["d"] == 1 * 4 + 2 * 5 + 3 * 6

    def test_topk_ranks_by_quantized_ip(self, spark):
        df = _vecs(spark, n=20)
        lo, hi = sq8_train_bounds(df, "embedding", DIM)
        queries = df.where(F.col("vec_id") < 2)
        out = sq8_ip_topk(queries, df, lo, hi, k=3).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r["qid"], []).append(r)
        for qid, rows in by_q.items():
            assert len(rows) == 3
            assert all(r["nid"] != qid for r in rows)
            ds = [r["dot_q"] for r in sorted(rows, key=lambda r: r["rank"])]
            assert ds == sorted(ds, reverse=True)


class TestPQ:
    def test_lossless_when_k_covers_subvectors(self, spark):
        # integer-grid corpus => exact arithmetic; k = corpus size =>
        # every subvector its own centroid => ADC == exact integer IP
        df = _vecs(spark, n=24)
        lo, hi = sq8_train_bounds(df, "embedding", DIM)
        codes_as_vecs = df.select(
            "vec_id",
            sq8_code(F.col("embedding"), lo, hi).cast("array<float>").alias("embedding"),
        )
        books = train_pq_codebooks(
            codes_as_vecs, "vec_id", "embedding", DIM, m=4, k=24, sample_limit=1000
        )
        enc = pq_encode(codes_as_vecs, "vec_id", "embedding", DIM, books)
        queries = codes_as_vecs.where(F.col("vec_id") < 3)
        adc = pq_ip_topk(queries, enc, books, DIM, k=4).select(
            "qid", "nid", F.round("score").cast("bigint").alias("dot_q"), "rank"
        )
        exact = sq8_ip_topk(df.where(F.col("vec_id") < 3), df, lo, hi, k=4)
        assert sorted(map(tuple, adc.collect())) == sorted(map(tuple, exact.collect()))

    def test_lossy_recall_bound(self, spark):
        df = _vecs(spark, n=40)
        books = train_pq_codebooks(
            df, "vec_id", "embedding", DIM, m=4, k=8, sample_limit=1000
        )
        enc = pq_encode(df, "vec_id", "embedding", DIM, books)
        queries = df.where(F.col("vec_id") < 5)
        adc = pq_ip_topk(queries, enc, books, DIM, k=10)
        # exact IP on the raw floats
        q = queries.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
        c = df.select(F.col("vec_id").alias("nid"), F.col("embedding").alias("nv"))
        exact = (
            q.crossJoin(c)
            .where(F.col("qid") != F.col("nid"))
            .select(
                "qid", "nid",
                F.aggregate(
                    F.zip_with("qv", "nv", lambda a, b: a.cast("double") * b.cast("double")),
                    F.lit(0.0), lambda acc, x: acc + x,
                ).alias("ip"),
            )
        )
        from pyspark.sql import Window

        w = Window.partitionBy("qid").orderBy(F.col("ip").desc(), F.col("nid"))
        top = exact.withColumn("r", F.row_number().over(w)).where(F.col("r") <= 5)
        truth = {(r["qid"], r["nid"]) for r in top.collect()}
        got = {(r["qid"], r["nid"]) for r in adc.collect()}
        recall = len(truth & got) / len(truth)
        assert recall >= 0.6, recall

    def test_dim_divisibility(self, spark):
        df = _vecs(spark)
        with pytest.raises(ValueError, match="divisible"):
            train_pq_codebooks(df, "vec_id", "embedding", DIM, m=3, k=4)
