"""Gates for embedding quantization (operators/quantize.py): SQ8
quantized inner-product search, and product quantization certified in
its LOSSLESS regime (k >= distinct subvectors ⇒ ADC == exact integer
dot — the same exact-regime trick as `sim_ivf_exact`, so the encode/
ADC/ranking machinery hash-matches DuckDB; the lossy regime's recall
bound lives in tests/test_quantize.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.quantize import (
    pq_encode, pq_ip_topk, sq8_code, sq8_ip_topk, sq8_train_bounds,
    train_pq_codebooks,
)
from ..tables import load

DIM = 64

# per-dim grid codes, all arithmetic in DOUBLE on both engines (FLOAT
# subtraction would round differently); greatest/least clamp like the
# Spark side
_CODES_CTE = f"""
    e AS (SELECT vec_id, embedding FROM embeddings),
    dims AS (
        SELECT i AS d,
               CAST(min(embedding[i]) AS DOUBLE) AS lo,
               CAST(max(embedding[i]) AS DOUBLE) AS hi
        FROM e, UNNEST(range(1, {DIM + 1})) AS t(i)
        GROUP BY i
    ),
    codes AS (
        SELECT vec_id,
               list(CAST(greatest(0, least(255,
                   round(CASE WHEN hi = lo THEN 0
                         ELSE (CAST(embedding[i] AS DOUBLE) - lo)
                              * (255.0 / (hi - lo)) END)))
                   AS BIGINT) ORDER BY i) AS c
        FROM e, UNNEST(range(1, {DIM + 1})) AS t(i)
        JOIN dims ON d = i
        GROUP BY vec_id
    )
"""


def _topk_sql(q_pred: str, n_pred: str, k: int) -> str:
    return f"""
        WITH {_CODES_CTE},
        pairs AS (
            SELECT q.vec_id AS qid, n.vec_id AS nid,
                   CAST(list_dot_product(q.c, n.c) AS BIGINT) AS dot_q
            FROM codes q JOIN codes n ON q.vec_id <> n.vec_id
            WHERE ({q_pred.replace('vec_id', 'q.vec_id')})
              AND ({n_pred.replace('vec_id', 'n.vec_id')})
        )
        SELECT qid, nid, dot_q, rank FROM (
            SELECT qid, nid, dot_q,
                   CAST(row_number() OVER (PARTITION BY qid
                        ORDER BY dot_q DESC, nid) AS BIGINT) AS rank
            FROM pairs
        ) WHERE rank <= {k}
        ORDER BY qid, rank
    """


def sq8_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat,SQ8 inner-product top-5: grid trained on the corpus, exact
    integer dot of codes, per-query ranking."""
    emb = load(spark, sf_dir, "embeddings")
    lo, hi = sq8_train_bounds(emb, "embedding", DIM)
    queries = emb.where(F.col("vec_id") < 5)
    return sq8_ip_topk(queries, emb, lo, hi, k=5).orderBy("qid", "rank")


def pq_exact_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ (m=8) in the lossless regime over an integer-grid corpus
    subset: every distinct subvector becomes its own centroid, so the
    ADC score IS the exact integer dot and must hash-equal the plain
    quantized ranking (which the oracle recomputes without knowing PQ
    exists)."""
    emb = load(spark, sf_dir, "embeddings")
    lo, hi = sq8_train_bounds(emb, "embedding", DIM)
    grid = emb.where(F.col("vec_id") < 64).select(
        "vec_id", sq8_code(F.col("embedding"), lo, hi).cast("array<float>").alias("embedding")
    )
    # k bounds at the 64 distinct subvectors — small enough that the
    # literal codebook stays a compact plan, large enough for lossless
    books = train_pq_codebooks(
        grid, "vec_id", "embedding", DIM, m=8, k=256, sample_limit=4096
    )
    enc = pq_encode(grid, "vec_id", "embedding", DIM, books)
    queries = grid.where(F.col("vec_id") < 3)
    return (
        pq_ip_topk(queries, enc, books, DIM, k=5)
        .select("qid", "nid", F.round("score").cast("bigint").alias("dot_q"), "rank")
        .orderBy("qid", "rank")
    )


def ivf_pq_exact_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full IVF×PQ serving path (operators/ann.py:
    materialize_ivf_pq_index / ivf_pq_topk_from_index) in its EXACT
    regime: the integer-grid corpus subset from pq_exact_topk, lossless
    codebooks (k >= the 64 distinct subvectors ⇒ ADC == exact integer
    dot), and an exhaustive probe (n_probe = n_cells) — so the coarse
    cells, the cell-partitioned code storage, the column-pruned ADC
    candidate pass, the rerank cutoff, and the full-vector re-rank must
    together HASH-EQUAL an oracle that has never heard of IVF or PQ.
    The lossy regime's recall is pinned in tests/test_ivf_index.py; the
    production-tuned face is sim_ivf_pq_serving."""
    import os

    from ..operators.ann import (
        ivf_pq_topk_from_index,
        materialize_ivf_pq_index,
        train_centroids_sample,
    )

    emb = load(spark, sf_dir, "embeddings")
    lo, hi = sq8_train_bounds(emb, "embedding", DIM)
    grid = emb.where(F.col("vec_id") < 64).select(
        "vec_id", sq8_code(F.col("embedding"), lo, hi).cast("array<float>").alias("embedding")
    )
    books = train_pq_codebooks(
        grid, "vec_id", "embedding", DIM, m=8, k=256, sample_limit=4096
    )
    cents = train_centroids_sample(grid, n_cells=4)
    path = os.path.join(
        "spark-warehouse", "ivf_pq_index",
        os.path.basename(os.path.normpath(sf_dir)) + "_exact_v1",
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        materialize_ivf_pq_index(grid, cents, books, DIM, path)
    queries = grid.where(F.col("vec_id") < 3)
    return (
        ivf_pq_topk_from_index(
            spark, path, queries, cents, books, DIM,
            k=5, n_probe=len(cents), rerank=2, metric="ip",
        )
        .select("qid", "nid", "dot_q", "rank")
        .orderBy("qid", "rank")
    )


def ivf_pq_incremental_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incrementally MAINTAINED IVF×PQ index in its exact regime:
    builds once per sf_dir from 90% of the integer-grid corpus, every
    10th vector arrives through `merge_ivf_pq_increment` (arrow-encoded
    in the arrival pass, folded into touched cells only, redelivery-
    safe), and an exhaustive lossless probe must hash-equal the same
    PQ-unaware oracle — certifying that incremental maintenance left
    codes AND vectors exactly equal to a full build (the PQ twin of
    sim_ivf_incremental_exact)."""
    import os

    from ..operators.ann import (
        ivf_pq_topk_from_index,
        materialize_ivf_pq_index,
        merge_ivf_pq_increment,
        train_centroids_sample,
    )

    emb = load(spark, sf_dir, "embeddings")
    lo, hi = sq8_train_bounds(emb, "embedding", DIM)
    grid = emb.where(F.col("vec_id") < 64).select(
        "vec_id", sq8_code(F.col("embedding"), lo, hi).cast("array<float>").alias("embedding")
    )
    books = train_pq_codebooks(
        grid, "vec_id", "embedding", DIM, m=8, k=256, sample_limit=4096
    )
    cents = train_centroids_sample(grid, n_cells=4)
    path = os.path.join(
        "spark-warehouse", "ivf_pq_index",
        os.path.basename(os.path.normpath(sf_dir)) + "_inc_v1",
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        materialize_ivf_pq_index(
            grid.where(F.col("vec_id") % 10 != 0), cents, books, DIM, path
        )
    merge_ivf_pq_increment(
        spark, path, grid.where(F.col("vec_id") % 10 == 0), cents, books, DIM
    )
    queries = grid.where(F.col("vec_id") < 3)
    return (
        ivf_pq_topk_from_index(
            spark, path, queries, cents, books, DIM,
            k=5, n_probe=len(cents), rerank=2, metric="ip",
        )
        .select("qid", "nid", "dot_q", "rank")
        .orderBy("qid", "rank")
    )


def sim_ivf_sq8_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF×SQ8 index (operators/ann.py:materialize_ivf_sq8_index /
    ivf_sq8_topk_from_index) certified CORPUS-WIDE: SQ8's grid is a
    closed form the oracle recomputes exactly (no lossless-regime
    subset — the whole embeddings table is the corpus), and with
    n_probe = n_cells the partition-pruned probe must hash-equal the
    Flat,SQ8 ranking of an oracle that has never heard of IVF. The
    cell layout, the codes-only candidate read, and the integer-dot
    ranking all sit under the hash."""
    import os

    from ..operators.ann import (
        ivf_sq8_topk_from_index_arrow,
        materialize_ivf_sq8_index,
        train_centroids_sample,
    )

    emb = load(spark, sf_dir, "embeddings")
    lo, hi = sq8_train_bounds(emb, "embedding", DIM)
    cents = train_centroids_sample(emb, n_cells=4)
    path = os.path.join(
        "spark-warehouse", "ivf_sq8_index",
        os.path.basename(os.path.normpath(sf_dir)) + "_exact_v1",
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        materialize_ivf_sq8_index(emb, cents, lo, hi, path)
    queries = emb.where(F.col("vec_id") < 5)
    return (
        ivf_sq8_topk_from_index_arrow(
            spark, path, queries, cents, lo, hi, k=5, n_probe=len(cents)
        )
        .select("qid", "nid", "dot_q", "rank")
        .orderBy("qid", "rank")
    )


def sim_ivf_sq8_incremental_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incrementally MAINTAINED IVF×SQ8 index, corpus-wide exact:
    builds once from 90% of the embeddings, every 10th vector arrives
    through `merge_ivf_sq8_increment` (encoded on the STORED grid,
    folded into touched cells only through the shared
    _merge_fresh_into_cells core, redelivery-safe), and the exhaustive
    probe must hash-equal the same IVF-unaware Flat,SQ8 oracle —
    incremental maintenance left codes AND vectors exactly equal to a
    full build."""
    import os

    from ..operators.ann import (
        ivf_sq8_topk_from_index_arrow,
        materialize_ivf_sq8_index,
        merge_ivf_sq8_increment,
        train_centroids_sample,
    )

    emb = load(spark, sf_dir, "embeddings")
    lo, hi = sq8_train_bounds(emb, "embedding", DIM)
    cents = train_centroids_sample(emb, n_cells=4)
    path = os.path.join(
        "spark-warehouse", "ivf_sq8_index",
        os.path.basename(os.path.normpath(sf_dir)) + "_inc_v1",
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        materialize_ivf_sq8_index(
            emb.where(F.col("vec_id") % 10 != 0), cents, lo, hi, path
        )
    merge_ivf_sq8_increment(
        spark, path, emb.where(F.col("vec_id") % 10 == 0), cents, lo, hi
    )
    queries = emb.where(F.col("vec_id") < 5)
    return (
        ivf_sq8_topk_from_index_arrow(
            spark, path, queries, cents, lo, hi, k=5, n_probe=len(cents)
        )
        .select("qid", "nid", "dot_q", "rank")
        .orderBy("qid", "rank")
    )


def sim_ivf_pq_sq8_refine_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-stage quantized serving stack (operators/ann.py:
    materialize_ivf_pq_refine_index / ivf_pq_sq8_refine_topk) certified
    CORPUS-WIDE: PQ ADC candidates with an exhaustive band (n_probe =
    n_cells, rerank*k >= corpus) feed the SQ8 refine stage, whose exact
    integer dots the oracle recomputes on the closed-form grid — so the
    final ranking must hash-equal Flat,SQ8 from an oracle that has never
    heard of IVF, PQ, or the two-stage split. The probe reads codes +
    sq8 and NEVER `nv` (plan-asserted in tests/test_ivf_index.py); the
    production band is sim_ivf_pq_sq8_refine_serving."""
    import os

    from ..operators.ann import (
        ivf_pq_sq8_refine_topk,
        materialize_ivf_pq_refine_index,
        train_centroids_sample,
    )

    emb = load(spark, sf_dir, "embeddings")
    lo, hi = sq8_train_bounds(emb, "embedding", DIM)
    books = train_pq_codebooks(
        emb, "vec_id", "embedding", DIM, m=16, k=64, sample_limit=4096
    )
    cents = train_centroids_sample(emb, n_cells=4)
    path = os.path.join(
        "spark-warehouse", "ivf_pq_refine_index",
        os.path.basename(os.path.normpath(sf_dir)) + "_exact_v1",
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        materialize_ivf_pq_refine_index(emb, cents, books, lo, hi, DIM, path)
    k = 5
    n = emb.count()
    queries = emb.where(F.col("vec_id") < 5)
    return (
        ivf_pq_sq8_refine_topk(
            spark, path, queries, cents, books, lo, hi, DIM,
            k=k, n_probe=len(cents), rerank=(n + k - 1) // k,
        )
        .select("qid", "nid", "dot_q", "rank")
        .orderBy("qid", "rank")
    )


def semdedup_pq_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup served from the IVF×PQ index in its EXACT regime (r9
    verdict #2): the integer-grid corpus subset, lossless codebooks
    (k >= the 64 distinct subvectors ⇒ the codes-only ADC Gram IS the
    exact pairwise cosine up to float order, covered by the 1e-6
    margin), threshold 0.9 (the grid corpus's pairwise cosines span
    0.856-0.942 — the bar discriminates). Candidate generation reads
    (nid, codes, cell) and never `nv` (plan-asserted in
    tests/test_semdedup_index.py); only candidates read vectors, for
    the rounded cosine the PQ-unaware oracle computes. Must hash-equal
    the same semdedup math DuckDB runs on raw grid vectors."""
    import os

    from ..operators.similarity import (
        hyperplanes,
        materialize_semdedup_index,
        semdedup_from_index,
    )

    emb = load(spark, sf_dir, "embeddings")
    lo, hi = sq8_train_bounds(emb, "embedding", DIM)
    grid = emb.where(F.col("vec_id") < 64).select(
        "vec_id", sq8_code(F.col("embedding"), lo, hi).cast("array<float>").alias("embedding")
    )
    books = train_pq_codebooks(
        grid, "vec_id", "embedding", DIM, m=8, k=256, sample_limit=4096
    )
    cents = hyperplanes(DIM, 4, seed=7)
    path = os.path.join(
        "spark-warehouse", "semdedup_index",
        os.path.basename(os.path.normpath(sf_dir)) + "_exact_v1",
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        materialize_semdedup_index(grid, cents, books, DIM, path)
    return semdedup_from_index(
        spark, path, cents, books, DIM, threshold=0.9
    ).orderBy("doc")


def _semdedup_pq_oracle() -> str:
    from ..operators.similarity import hyperplanes

    cents = hyperplanes(DIM, 4, seed=7)
    rows = ", ".join(
        "{'cell': %d, 'c': [%s]::DOUBLE[]}"
        % (i, ", ".join(repr(x) for x in c))
        for i, c in enumerate(cents)
    )
    return f"""
        WITH {_CODES_CTE},
        grid AS (
            SELECT vec_id, c::DOUBLE[] AS v FROM codes WHERE vec_id < 64
        ),
        sims AS (
            SELECT vec_id, u.cell AS cell,
                   ROUND(list_cosine_similarity(v, u.c), 6) AS sim
            FROM grid, UNNEST([{rows}]) AS t(u)
        ),
        assign AS (
            SELECT vec_id, CAST(cell AS INT) AS cell FROM sims
            QUALIFY row_number() OVER (
                PARTITION BY vec_id ORDER BY sim DESC, cell ASC) = 1
        ),
        dups AS (
            SELECT DISTINCT b.vec_id AS doc
            FROM assign a JOIN assign b
                ON a.cell = b.cell AND a.vec_id < b.vec_id
              JOIN grid ga ON ga.vec_id = a.vec_id
              JOIN grid gb ON gb.vec_id = b.vec_id
            WHERE ROUND(list_cosine_similarity(ga.v, gb.v), 6) >= 0.9
        )
        SELECT a.vec_id AS doc, a.cell, (d.doc IS NULL) AS keep
        FROM assign a LEFT JOIN dups d ON a.vec_id = d.doc
        ORDER BY doc
    """


QUERIES = {
    "sq8_quantized_topk": sq8_quantized_topk,
    "pq_exact_topk": pq_exact_topk,
    "ivf_pq_exact_topk": ivf_pq_exact_topk,
    "ivf_pq_incremental_exact": ivf_pq_incremental_exact,
    "sim_ivf_sq8_exact": sim_ivf_sq8_exact,
    "sim_ivf_sq8_incremental_exact": sim_ivf_sq8_incremental_exact,
    "sim_ivf_pq_sq8_refine_exact": sim_ivf_pq_sq8_refine_exact,
    "semdedup_pq_exact": semdedup_pq_exact,
}

ORACLES = {
    "sq8_quantized_topk": _topk_sql("vec_id < 5", "TRUE", 5),
    "pq_exact_topk": _topk_sql("vec_id < 3", "vec_id < 64", 5),
    "ivf_pq_exact_topk": _topk_sql("vec_id < 3", "vec_id < 64", 5),
    "ivf_pq_incremental_exact": _topk_sql("vec_id < 3", "vec_id < 64", 5),
    "sim_ivf_sq8_exact": _topk_sql("vec_id < 5", "TRUE", 5),
    "sim_ivf_sq8_incremental_exact": _topk_sql("vec_id < 5", "TRUE", 5),
    "sim_ivf_pq_sq8_refine_exact": _topk_sql("vec_id < 5", "TRUE", 5),
    "semdedup_pq_exact": _semdedup_pq_oracle(),
}
