"""Hybrid retrieval — fusing lexical (BM25 postings) and dense
(embedding cosine) rankings with Reciprocal Rank Fusion (Cormack,
Clarke & Buettcher, SIGIR 2009: "Reciprocal rank fusion outperforms
Condorcet and individual rank learning methods"):

    RRF(d) = sum over lists L of  1 / (k + rank_L(d))      (k = 60)

This is the standard first-stage retriever of RAG pipelines (sparse +
dense hybrid). Engine-portable twist: the reciprocal is quantized to
integer arithmetic —

    score_int(d) = sum over lists of  1e12 DIV (k + rank_L(d))

Integer sums are associative and order-independent, so any engine
reproduces the fused ranking bit-for-bit (float RRF sums of 3+ lists
can disagree in the last ulp depending on add order). At 1e-12
granularity the quantization can only reorder pairs whose true RRF
scores differ by < 1e-12 — i.e. never, for ranks below a million.

Scale shape: each input list is already top-N (small); fusion is a
union of k·|lists| rows + one tiny groupBy — negligible next to the
retrievers themselves. The retrievers keep their own scale paths
(term-bucketed postings; IVF/LSH for the dense side).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RRF_K = 60
RRF_SCALE = 1_000_000_000_000


def ranked(df: DataFrame, id_col: str, order_cols: list, alias: str = "rank") -> DataFrame:
    """Attach a dense 1-based rank by the given (already deterministic)
    ordering — for score frames that don't carry ranks yet. The rank is
    global but runs over an already top-N-limited frame (bounded rows),
    never the corpus — computed by operators/ranks.bounded_global_rank,
    so the single partition is a declared Coalesce(1), not a silent
    no-partition WindowExec."""
    from .ranks import bounded_global_rank

    return bounded_global_rank(df, list(order_cols), alias=alias)


def rrf_fuse(
    lists: list[DataFrame],
    id_col: str = "doc",
    rank_col: str = "rank",
    k_const: int = RRF_K,
    top_k: int = 10,
) -> DataFrame:
    """Fuse ranked lists by quantized RRF. Each input needs (id_col,
    rank_col); docs absent from a list contribute nothing for it.
    Output: (doc, rrf_score BIGINT, n_lists) by (score desc, doc asc),
    top_k rows — a TakeOrdered plan, no global sort."""
    if not lists:
        raise ValueError("rrf_fuse needs at least one ranked list")
    tagged = [
        df.select(
            F.col(id_col).alias("doc"),
            F.col(rank_col).cast("bigint").alias("rank"),
        )
        for df in lists
    ]
    u = reduce(DataFrame.unionByName, tagged)
    contrib = F.expr(f"CAST({RRF_SCALE} DIV ({k_const} + rank) AS BIGINT)")
    return (
        u.select("doc", contrib.alias("c"))
        .groupBy("doc")
        .agg(
            F.sum("c").cast("bigint").alias("rrf_score"),
            F.count(F.lit(1)).cast("bigint").alias("n_lists"),
        )
        .orderBy(F.desc("rrf_score"), F.asc("doc"))
        .limit(top_k)
    )


def hybrid_rrf_search(
    docs: DataFrame,
    embeddings: DataFrame,
    query_text: str,
    query_vec_id: int,
    n_candidates: int = 20,
    top_k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """End-to-end hybrid search over the corpus: BM25 top-N on the
    postings index + exact-cosine top-N around a query embedding,
    RRF-fused. The dense side is the brute-force face for oracle
    exactness; production swaps in the IVF/LSH retriever (same (id,
    rank) contract)."""
    from .fulltext import build_fulltext_index, fulltext_bm25_topk
    from .similarity import brute_force_topk

    idx = build_fulltext_index(docs, id_col, text_col)
    text_top = fulltext_bm25_topk(idx, query_text, k=n_candidates, mode="any")
    text_ranked = ranked(
        text_top, "doc", [F.desc("score"), F.asc("doc")]
    )

    q = embeddings.where(F.col(vec_id_col) == query_vec_id)
    vec_top = brute_force_topk(
        q, embeddings, id_col=vec_id_col, k=n_candidates
    ).select(F.col("nid").alias("doc"), "rank")

    return rrf_fuse(
        [text_ranked.select("doc", "rank"), vec_top], top_k=top_k
    )


def hybrid_rrf_search_indexed(
    spark,
    ft_path: str,
    ivf_path: str,
    centroids: list[list[float]],
    query_text: str,
    query_vecs: DataFrame,
    n_candidates: int = 20,
    top_k: int = 10,
    n_probe: int | None = None,
    codebooks: list[list[list[float]]] | None = None,
    dim: int | None = None,
    rerank: int = 4,
) -> DataFrame:
    """The hybrid retriever SERVED FROM STORAGE — the production
    counterpart of `hybrid_rrf_search`, which tokenizes the corpus and
    scores every embedding per query. Both sides read materialized,
    incrementally-maintained indexes instead:

    - lexical: `fulltext_bm25_from_index` over the term-hash-partitioned
      postings (pruned to the query terms' partitions, doc length
      denormalized — no corpus pass);
    - dense: `ivf_topk_from_index_arrow` over the cell-partitioned IVF
      lists (pruned to the probed cells, BLAS-scored).

    With n_probe = len(centroids) (the default here) the dense ranks
    equal brute force, so the fused output hash-matches
    `hybrid_rrf_search`'s oracle — storage serving certified against
    the from-scratch evaluation. Production drops n_probe for the
    approximate latency contract; the fusion is rank-only, so swapping
    retriever internals never changes its arithmetic.

    Passing `codebooks` (+ `dim`) swaps the dense side to the IVF×PQ
    index at `ivf_path` (`ivf_pq_topk_from_index_arrow`: ADC candidates
    over codes only, exact re-rank of the survivors) — the fully
    quantized serving stack. The fusion contract is unchanged: the
    dense retriever still hands back (doc, rank)."""
    if codebooks is not None and dim is None:
        raise ValueError(
            "hybrid_rrf_search_indexed: the PQ route needs `dim` alongside "
            "`codebooks` (the ADC LUTs split the vector into dim // m "
            "subspaces)"
        )
    from .ann import ivf_pq_topk_from_index_arrow, ivf_topk_from_index_arrow
    from .fulltext import fulltext_bm25_from_index

    text_top = fulltext_bm25_from_index(
        spark, ft_path, query_text, k=n_candidates, mode="any"
    )
    text_ranked = ranked(text_top, "doc", [F.desc("score"), F.asc("doc")])
    if codebooks is not None:
        vec_top = ivf_pq_topk_from_index_arrow(
            spark,
            ivf_path,
            query_vecs,
            centroids,
            codebooks,
            dim,
            k=n_candidates,
            n_probe=len(centroids) if n_probe is None else n_probe,
            rerank=rerank,
        ).select(F.col("nid").alias("doc"), "rank")
    else:
        vec_top = ivf_topk_from_index_arrow(
            spark,
            ivf_path,
            query_vecs,
            centroids,
            k=n_candidates,
            n_probe=len(centroids) if n_probe is None else n_probe,
        ).select(F.col("nid").alias("doc"), "rank")
    return rrf_fuse(
        [text_ranked.select("doc", "rank"), vec_top], top_k=top_k
    )
