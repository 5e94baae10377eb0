"""RRF hybrid retrieval (operators/retrieval.py): fusion math,
overlap boosting, determinism."""

from __future__ import annotations

import pytest

from mbrainz_importer_spark.operators.retrieval import (
    RRF_SCALE,
    ranked,
    rrf_fuse,
)

from pyspark.sql import functions as F


def test_rrf_fuse_math_and_overlap(spark):
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc long, rank long")
    b = spark.createDataFrame([(2, 1), (4, 2)], "doc long, rank long")
    out = {r["doc"]: r for r in rrf_fuse([a, b], top_k=10).collect()}
    # doc 2 appears in both lists: 1/(60+2) + 1/(60+1) quantized
    assert out[2]["rrf_score"] == RRF_SCALE // 62 + RRF_SCALE // 61
    assert out[2]["n_lists"] == 2
    # singles contribute once
    assert out[1]["rrf_score"] == RRF_SCALE // 61 and out[1]["n_lists"] == 1
    assert out[4]["rrf_score"] == RRF_SCALE // 62
    # overlap outranks a better single-list rank
    docs_in_order = [r["doc"] for r in rrf_fuse([a, b], top_k=10).collect()]
    assert docs_in_order[0] == 2

    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])


def test_ranked_tiebreak(spark):
    df = spark.createDataFrame(
        [(5, 10), (3, 10), (9, 7)], "doc long, score long"
    )
    out = ranked(df, "doc", [F.desc("score"), F.asc("doc")]).collect()
    got = {r["doc"]: r["rank"] for r in out}
    assert got == {3: 1, 5: 2, 9: 3}  # tie at score 10 broken by doc asc


def test_hybrid_pq_dense_route_matches_ivf_route_at_exhaustive(spark, tmp_path):
    """hybrid_rrf_search_indexed(codebooks=...) swaps the dense side to
    the IVF×PQ index; with lossless codebooks, an exhaustive probe, and
    a rerank window covering the corpus, the fused output must equal
    the full-precision IVF route exactly — the quantized stack differs
    only inside its approximation knobs."""
    from mbrainz_importer_spark.operators.ann import (
        materialize_ivf_index,
        materialize_ivf_pq_index,
        train_centroids_sample,
    )
    from mbrainz_importer_spark.operators.fulltext import materialize_fulltext_index
    from mbrainz_importer_spark.operators.quantize import train_pq_codebooks
    from mbrainz_importer_spark.operators.retrieval import hybrid_rrf_search_indexed
    from mbrainz_importer_spark.tables import load

    sf = "/root/testdata/sf0.001"
    docs = load(spark, sf, "documents")
    emb = load(spark, sf, "embeddings")
    ft = str(tmp_path / "ft")
    materialize_fulltext_index(docs, ft)
    cents = train_centroids_sample(emb, n_cells=4)
    ivf = str(tmp_path / "ivf")
    materialize_ivf_index(emb, cents, ivf)
    # k >= distinct subvectors of the 500-vector corpus => lossless ADC
    books = train_pq_codebooks(emb, "vec_id", "embedding", 64, m=8, k=512)
    pq = str(tmp_path / "pq")
    materialize_ivf_pq_index(emb, cents, books, 64, pq)
    q = emb.where(F.col("vec_id") == 7)
    via_ivf = hybrid_rrf_search_indexed(
        spark, ft, ivf, cents, "vector table scan", q,
        n_candidates=10, top_k=5,
    )
    via_pq = hybrid_rrf_search_indexed(
        spark, ft, pq, cents, "vector table scan", q,
        n_candidates=10, top_k=5, codebooks=books, dim=64, rerank=50,
    )
    assert sorted(map(tuple, via_pq.collect())) == sorted(
        map(tuple, via_ivf.collect())
    )


def test_hybrid_indexed_pq_route_requires_dim():
    """ADVICE r9 (retrieval.py): codebooks without dim used to fail deep
    inside the ADC LUT math with an opaque TypeError on dim // m — the
    precondition is now checked at entry."""
    import pytest

    from mbrainz_importer_spark.operators.retrieval import (
        hybrid_rrf_search_indexed,
    )

    with pytest.raises(ValueError, match="needs `dim`"):
        hybrid_rrf_search_indexed(
            None, "ft", "ivf", [[1.0]], "q", None, codebooks=[[[0.0]]]
        )
