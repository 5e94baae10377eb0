"""Fulltext gate queries (Datomic :db/fulltext analog,
subsets/entities/schema.edn:37,183) over the documents table.

Oracles rebuild the identical postings index in DuckDB SQL; scoring is
integer tf sums so the hash comparison is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.fulltext import (
    build_fulltext_index,
    fulltext_bm25_topk,
    fulltext_search,
    fulltext_tfidf_topk,
    fulltext_topk,
)
from ..tables import load

_SQL_POSTINGS = r"""
    toks AS (
        SELECT doc_id AS doc,
               unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
        FROM documents
    ),
    postings AS (
        SELECT term, doc, COUNT(*) AS tf
        FROM toks WHERE term <> '' GROUP BY 1, 2
    )
"""


def fulltext_and_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND-semantics fulltext: docs containing BOTH 'hash' and 'join',
    scored by summed term frequency."""
    docs = load(spark, sf_dir, "documents")
    idx = build_fulltext_index(docs, "doc_id", "text")
    return fulltext_search(idx, "hash join", mode="all").orderBy("doc")


def fulltext_any_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-semantics top-20 by (score desc, doc asc) — deterministic
    k-boundary, TakeOrdered plan."""
    docs = load(spark, sf_dir, "documents")
    idx = build_fulltext_index(docs, "doc_id", "text")
    return fulltext_topk(idx, "vector scan batch", k=20, mode="any")


def fulltext_tfidf_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-idf relevance top-20: integer-scaled idf weighting so the rare
    'vector' outweighs the common 'table' — identical bit-exact scores
    in the DuckDB oracle (integer div, no float log)."""
    docs = load(spark, sf_dir, "documents")
    idx = build_fulltext_index(docs, "doc_id", "text")
    return fulltext_tfidf_topk(idx, "vector table scan", k=20, mode="any")


def fulltext_bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized-BM25 top-20: idf weighting plus document-length
    normalization, all integer arithmetic (derivation in
    operators/fulltext.py) so the DuckDB oracle reproduces every score."""
    docs = load(spark, sf_dir, "documents")
    idx = build_fulltext_index(docs, "doc_id", "text")
    return fulltext_bm25_topk(idx, "vector table scan", k=20, mode="any")


def hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid sparse+dense retrieval: BM25 top-20 and exact-cosine
    top-20 (around embedding #7) fused by integer-quantized Reciprocal
    Rank Fusion — the RAG first-stage retriever, certified bit-exactly
    because both ranks and the fused score are integers.

    Cost contract (the sim_topk_bruteforce pattern): this face builds
    BOTH retrieval structures IN-QUERY — a full postings pass and an
    exact cosine scan — every call; it is the CERTIFICATION twin, kept
    because its arithmetic is end-to-end oracle-reproducible from the
    raw tables. It scales as a corpus scan by design (71.95s at the
    sf100 tier, 10.3x/decade) and is tier-skipped at sf100 accordingly;
    the production faces are `hybrid_rrf_from_index` /
    `hybrid_rrf_serving` (5.16s at sf100), which serve from the
    materialized postings + vector index."""
    from ..operators.retrieval import hybrid_rrf_search

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    return hybrid_rrf_search(
        docs, emb, "vector table scan", query_vec_id=7,
        n_candidates=20, top_k=10,
    )


_FT_INDEX_ROOT = "spark-warehouse/ft_index"


def _ft_index_path(sf_dir: str, suffix: str) -> str:
    import os

    return os.path.join(
        _FT_INDEX_ROOT,
        os.path.basename(os.path.normpath(sf_dir)) + suffix,
    )


def fulltext_bm25_from_index_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 served from the MATERIALIZED postings index (built once per
    sf_dir; operators/fulltext.py: term-hash-partitioned postings with
    denormalized doc length + maintained corpus stats). Shares the
    in-memory face's oracle — storage serving must reproduce every
    integer score bit-for-bit while reading only the query terms'
    partitions instead of tokenizing the corpus per query."""
    import os

    from ..operators.fulltext import (
        fulltext_bm25_from_index,
        materialize_fulltext_index,
    )

    path = _ft_index_path(sf_dir, "_prod_v1")
    if not os.path.exists(os.path.join(path, "_meta.json")):
        docs = load(spark, sf_dir, "documents")
        materialize_fulltext_index(docs, path)
    return fulltext_bm25_from_index(
        spark, path, "vector table scan", k=20, mode="any"
    )


def fulltext_incremental_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The postings index incrementally MAINTAINED: built from 90% of
    the corpus, every 10th document arrives as an increment and folds
    into only the partitions it touches (merge_fulltext_increment —
    membership probe on the doc-hash side table, dynamic overwrite of
    touched term-hash partitions, arithmetic stats update,
    redelivery-safe). Serving the merged index must hash-equal the
    full-corpus oracle — certifying the merge left the index exactly
    equal to a from-scratch build."""
    import os

    from ..operators.fulltext import (
        fulltext_bm25_from_index,
        materialize_fulltext_index,
        merge_fulltext_increment,
    )

    docs = load(spark, sf_dir, "documents")
    path = _ft_index_path(sf_dir, "_v1")
    if not os.path.exists(os.path.join(path, "_meta.json")):
        materialize_fulltext_index(
            docs.where(F.col("doc_id") % 10 != 0), path
        )
    merge_fulltext_increment(
        spark, path, docs.where(F.col("doc_id") % 10 == 0)
    )
    return fulltext_bm25_from_index(
        spark, path, "vector table scan", k=20, mode="any"
    )


def hybrid_rrf_from_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid sparse+dense retrieval SERVED FROM STORAGE: BM25 from the
    materialized postings index + dense ranks from the cell-partitioned
    IVF index (exhaustive probe, so dense ranks equal brute force),
    RRF-fused. Shares hybrid_rrf_topk's oracle — the production serving
    path (both sides partition-pruned index reads) certified against
    the from-scratch evaluation."""
    import os

    from ..operators.ann import materialize_ivf_index
    from ..operators.fulltext import materialize_fulltext_index
    from ..operators.retrieval import hybrid_rrf_search_indexed
    from .llm import _ivf_centroids

    ft_path = _ft_index_path(sf_dir, "_prod_v1")
    if not os.path.exists(os.path.join(ft_path, "_meta.json")):
        docs = load(spark, sf_dir, "documents")
        materialize_fulltext_index(docs, ft_path)
    emb = load(spark, sf_dir, "embeddings")
    centroids = _ivf_centroids(spark, sf_dir)
    ivf_path = os.path.join(
        "spark-warehouse", "ivf_index",
        os.path.basename(os.path.normpath(sf_dir)) + "_prod_v1",
    )
    if not os.path.exists(os.path.join(ivf_path, "_SUCCESS")):
        materialize_ivf_index(emb, centroids, ivf_path)
    return hybrid_rrf_search_indexed(
        spark,
        ft_path,
        ivf_path,
        centroids,
        "vector table scan",
        emb.where(F.col("vec_id") == 7),
        n_candidates=20,
        top_k=10,
    )


def hybrid_rrf_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION hybrid serving shape: same materialized indexes
    as hybrid_rrf_from_index, but the dense side probes only the 4
    nearest cells (the approximate latency contract every deployed IVF
    runs) instead of the exhaustive certification probe. Rows-only by
    design: partial probing is approximate, so there is no exact SQL
    twin — the EXACT face (`hybrid_rrf_from_index`, n_probe=all) is
    the oracle-certified one; this entry exists so the scale tiers
    measure the latency customers actually pay at 100 TB (pruned
    postings read + 4 of 16 inverted lists)."""
    import os

    from ..operators.ann import materialize_ivf_index
    from ..operators.fulltext import materialize_fulltext_index
    from ..operators.retrieval import hybrid_rrf_search_indexed
    from .llm import _ivf_centroids

    ft_path = _ft_index_path(sf_dir, "_prod_v1")
    if not os.path.exists(os.path.join(ft_path, "_meta.json")):
        docs = load(spark, sf_dir, "documents")
        materialize_fulltext_index(docs, ft_path)
    emb = load(spark, sf_dir, "embeddings")
    centroids = _ivf_centroids(spark, sf_dir)
    ivf_path = os.path.join(
        "spark-warehouse", "ivf_index",
        os.path.basename(os.path.normpath(sf_dir)) + "_prod_v1",
    )
    if not os.path.exists(os.path.join(ivf_path, "_SUCCESS")):
        materialize_ivf_index(emb, centroids, ivf_path)
    return hybrid_rrf_search_indexed(
        spark,
        ft_path,
        ivf_path,
        centroids,
        "vector table scan",
        emb.where(F.col("vec_id") == 7),
        n_candidates=20,
        top_k=10,
        n_probe=4,
    )


def hybrid_rrf_pq_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULLY QUANTIZED hybrid serving stack — what a 100 TB
    deployment actually runs: pruned postings (BM25 from the term-hash-
    partitioned index) + IVF×PQ dense side (n_probe=4 pruned cells, ADC
    candidates over 16-int codes, exact re-rank of survivors), RRF-
    fused. Shares sim_ivf_pq_serving's materialized index. Rows-only by
    the partial-probe contract; every piece is certified elsewhere
    (postings: fulltext_bm25_from_index oracle; PQ machinery:
    ivf_pq_exact_topk; fusion arithmetic: hybrid_rrf_topk oracle)."""
    import os

    from ..operators.ann import materialize_ivf_pq_index
    from ..operators.fulltext import materialize_fulltext_index
    from ..operators.retrieval import hybrid_rrf_search_indexed
    from .llm import _ivf_centroids, _pq_codebooks

    ft_path = _ft_index_path(sf_dir, "_prod_v1")
    if not os.path.exists(os.path.join(ft_path, "_meta.json")):
        docs = load(spark, sf_dir, "documents")
        materialize_fulltext_index(docs, ft_path)
    emb = load(spark, sf_dir, "embeddings")
    centroids = _ivf_centroids(spark, sf_dir)
    books = _pq_codebooks(spark, sf_dir)
    pq_path = os.path.join(
        "spark-warehouse", "ivf_pq_index",
        os.path.basename(os.path.normpath(sf_dir)) + "_serving_v1",
    )
    if not os.path.exists(os.path.join(pq_path, "_SUCCESS")):
        materialize_ivf_pq_index(emb, centroids, books, 64, pq_path)
    return hybrid_rrf_search_indexed(
        spark,
        ft_path,
        pq_path,
        centroids,
        "vector table scan",
        emb.where(F.col("vec_id") == 7),
        n_candidates=20,
        top_k=10,
        n_probe=4,
        codebooks=books,
        dim=64,
        rerank=4,
    )


def fulltext_excision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten on the postings index: every 97th doc is
    excised (operators/fulltext.py:excise_fulltext_docs — O(1)
    tombstone + doc-partition-pruned doclen/stats rewrite; postings
    rows persist until compaction but every serving read masks them).
    Serving must hash-equal the oracle evaluated over the corpus WITH
    THE DOOMED DOCS GONE — df, n_docs, total and the ranking all
    reflect the excision immediately."""
    import os

    from ..operators.fulltext import (
        excise_fulltext_docs,
        fulltext_bm25_from_index,
        materialize_fulltext_index,
    )

    docs = load(spark, sf_dir, "documents")
    path = _ft_index_path(sf_dir, "_exc_v1")
    if not os.path.exists(os.path.join(path, "_meta.json")):
        materialize_fulltext_index(docs, path)
    excise_fulltext_docs(
        spark, path,
        docs.where(F.col("doc_id") % 97 == 0)
        .select(F.col("doc_id").alias("doc")),
    )
    return fulltext_bm25_from_index(
        spark, path, "vector table scan", k=20, mode="any"
    )


def fulltext_excision_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full excision lifecycle: tombstone, then
    compact_fulltext_index physically erases the doomed rows and clears
    the tombstones (the segment-merge moment). Serving the compacted
    index must hash-equal the same filtered-corpus oracle — certifying
    that masked serving and physical erasure agree bit-for-bit."""
    import os

    from ..operators.fulltext import (
        compact_fulltext_index,
        excise_fulltext_docs,
        fulltext_bm25_from_index,
        materialize_fulltext_index,
    )

    docs = load(spark, sf_dir, "documents")
    path = _ft_index_path(sf_dir, "_excc_v1")
    if not os.path.exists(os.path.join(path, "_meta.json")):
        materialize_fulltext_index(docs, path)
    excise_fulltext_docs(
        spark, path,
        docs.where(F.col("doc_id") % 97 == 0)
        .select(F.col("doc_id").alias("doc")),
    )
    compact_fulltext_index(spark, path)
    return fulltext_bm25_from_index(
        spark, path, "vector table scan", k=20, mode="any"
    )


def fulltext_bm25_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched serving: three queries answered from ONE partition-
    pruned postings scan (fulltext_bm25_from_index_many) — per-term df
    computes once and serves every query containing the term, the
    production QPS amortization. Scores bit-identical to the single-
    query face; the oracle evaluates the same relational form with the
    (qid, term) batch as a VALUES relation."""
    import os

    from ..operators.fulltext import (
        fulltext_bm25_from_index_many,
        materialize_fulltext_index,
    )

    path = _ft_index_path(sf_dir, "_prod_v1")
    if not os.path.exists(os.path.join(path, "_meta.json")):
        docs = load(spark, sf_dir, "documents")
        materialize_fulltext_index(docs, path)
    return fulltext_bm25_from_index_many(
        spark, path,
        ["vector table scan", "hash join", "merge sort"],
        k=5, mode="any",
    )


QUERIES = {
    "fulltext_and_search": fulltext_and_search,
    "fulltext_any_topk": fulltext_any_topk,
    "fulltext_tfidf_topk": fulltext_tfidf_topk_docs,
    "fulltext_bm25_topk": fulltext_bm25_topk_docs,
    "hybrid_rrf_topk": hybrid_rrf_topk,
    "fulltext_bm25_from_index": fulltext_bm25_from_index_docs,
    "fulltext_incremental_index": fulltext_incremental_index,
    "hybrid_rrf_from_index": hybrid_rrf_from_index,
    "hybrid_rrf_serving": hybrid_rrf_serving,
    "hybrid_rrf_pq_serving": hybrid_rrf_pq_serving,
    "fulltext_excision": fulltext_excision,
    "fulltext_excision_compacted": fulltext_excision_compacted,
    "fulltext_bm25_batch": fulltext_bm25_batch,
}

ORACLES = {
    "fulltext_and_search": f"""
        WITH {_SQL_POSTINGS}
        SELECT doc,
               CAST(COUNT(*) AS BIGINT) AS n_matched,
               CAST(SUM(tf) AS BIGINT) AS score
        FROM postings WHERE term IN ('hash', 'join')
        GROUP BY doc HAVING COUNT(*) = 2
        ORDER BY doc
    """,
    "fulltext_any_topk": f"""
        WITH {_SQL_POSTINGS}
        SELECT doc,
               CAST(COUNT(*) AS BIGINT) AS n_matched,
               CAST(SUM(tf) AS BIGINT) AS score
        FROM postings WHERE term IN ('batch', 'scan', 'vector')
        GROUP BY doc
        ORDER BY score DESC, doc ASC
        LIMIT 20
    """,
    "fulltext_bm25_topk": f"""
        WITH {_SQL_POSTINGS},
        dl AS (SELECT doc, CAST(SUM(tf) AS BIGINT) AS dl FROM postings GROUP BY doc),
        tot AS (SELECT CAST(SUM(dl) AS BIGINT) AS total,
                       CAST(COUNT(*) AS BIGINT) AS n_docs FROM dl),
        dfreq AS (
            SELECT term,
                   (1000 * (SELECT n_docs FROM tot)) // COUNT(DISTINCT doc)
                       AS idf_scaled
            FROM postings
            WHERE term IN ('scan', 'table', 'vector')
            GROUP BY term
        ),
        ts AS (
            SELECT p.doc,
                   (d.idf_scaled * 44 * p.tf) //
                   (20 * p.tf + 6 + (18 * dl.dl * (SELECT n_docs FROM tot))
                        // (SELECT total FROM tot)) AS term_score
            FROM postings p
              JOIN dfreq d USING (term)
              JOIN dl USING (doc)
        )
        SELECT doc,
               CAST(COUNT(*) AS BIGINT) AS n_matched,
               CAST(SUM(term_score) AS BIGINT) AS score
        FROM ts
        GROUP BY doc
        ORDER BY score DESC, doc ASC
        LIMIT 20
    """,
    "hybrid_rrf_topk": f"""
        WITH {_SQL_POSTINGS},
        dl AS (SELECT doc, CAST(SUM(tf) AS BIGINT) AS dl FROM postings GROUP BY doc),
        tot AS (SELECT CAST(SUM(dl) AS BIGINT) AS total,
                       CAST(COUNT(*) AS BIGINT) AS n_docs FROM dl),
        dfreq AS (
            SELECT term,
                   (1000 * (SELECT n_docs FROM tot)) // COUNT(DISTINCT doc)
                       AS idf_scaled
            FROM postings
            WHERE term IN ('scan', 'table', 'vector')
            GROUP BY term
        ),
        ts AS (
            SELECT p.doc,
                   (d.idf_scaled * 44 * p.tf) //
                   (20 * p.tf + 6 + (18 * dl.dl * (SELECT n_docs FROM tot))
                        // (SELECT total FROM tot)) AS term_score
            FROM postings p
              JOIN dfreq d USING (term)
              JOIN dl USING (doc)
        ),
        bm AS (
            SELECT doc, SUM(term_score) AS score
            FROM ts GROUP BY doc
            ORDER BY score DESC, doc ASC LIMIT 20
        ),
        bmr AS (
            SELECT doc, row_number() OVER (ORDER BY score DESC, doc ASC) AS rank
            FROM bm
        ),
        cos AS (
            SELECT vec_id AS doc,
                   ROUND(list_cosine_similarity(
                       embedding::DOUBLE[],
                       (SELECT embedding FROM embeddings WHERE vec_id = 7)::DOUBLE[]
                   ), 6) AS cs
            FROM embeddings WHERE vec_id <> 7
        ),
        vr AS (
            SELECT doc, row_number() OVER (ORDER BY cs DESC, doc ASC) AS rank
            FROM cos
            QUALIFY rank <= 20
        ),
        u AS (
            SELECT doc, rank FROM bmr
            UNION ALL
            SELECT doc, rank FROM vr
        )
        SELECT doc,
               CAST(SUM(1000000000000 // (60 + rank)) AS BIGINT) AS rrf_score,
               CAST(COUNT(*) AS BIGINT) AS n_lists
        FROM u
        GROUP BY doc
        ORDER BY rrf_score DESC, doc ASC
        LIMIT 10
    """,
    "fulltext_tfidf_topk": f"""
        WITH {_SQL_POSTINGS},
        nd AS (SELECT COUNT(DISTINCT doc) AS n_docs FROM postings),
        dfreq AS (
            SELECT term,
                   (1000 * (SELECT n_docs FROM nd)) // COUNT(DISTINCT doc)
                       AS idf_scaled
            FROM postings
            WHERE term IN ('scan', 'table', 'vector')
            GROUP BY term
        )
        SELECT p.doc,
               CAST(COUNT(*) AS BIGINT) AS n_matched,
               CAST(SUM(p.tf * d.idf_scaled) AS BIGINT) AS score
        FROM postings p JOIN dfreq d USING (term)
        GROUP BY p.doc
        ORDER BY score DESC, doc ASC
        LIMIT 20
    """,
}

ORACLES["fulltext_bm25_from_index"] = ORACLES["fulltext_bm25_topk"]
ORACLES["fulltext_incremental_index"] = ORACLES["fulltext_bm25_topk"]
ORACLES["hybrid_rrf_from_index"] = ORACLES["hybrid_rrf_topk"]

_EXCISED = ORACLES["fulltext_bm25_topk"].replace(
    "FROM documents", "FROM documents WHERE doc_id % 97 <> 0"
)
ORACLES["fulltext_excision"] = _EXCISED
ORACLES["fulltext_excision_compacted"] = _EXCISED

ORACLES["fulltext_bm25_batch"] = f"""
    WITH {_SQL_POSTINGS},
    dl AS (SELECT doc, CAST(SUM(tf) AS BIGINT) AS dl FROM postings GROUP BY doc),
    tot AS (SELECT CAST(SUM(dl) AS BIGINT) AS total,
                   CAST(COUNT(*) AS BIGINT) AS n_docs FROM dl),
    qrel(qid, term) AS (
        VALUES (0, 'scan'), (0, 'table'), (0, 'vector'),
               (1, 'hash'), (1, 'join'),
               (2, 'merge'), (2, 'sort')
    ),
    terms AS (SELECT DISTINCT term FROM qrel),
    m AS (SELECT p.* FROM postings p JOIN terms USING (term)),
    dfreq AS (
        SELECT term,
               (1000 * (SELECT n_docs FROM tot)) // COUNT(DISTINCT doc)
                   AS idf_scaled
        FROM m GROUP BY term
    ),
    ts AS (
        SELECT q.qid, m.doc,
               (d.idf_scaled * 44 * m.tf) //
               (20 * m.tf + 6 + (18 * dl.dl * (SELECT n_docs FROM tot))
                    // (SELECT total FROM tot)) AS term_score
        FROM m
          JOIN qrel q USING (term)
          JOIN dfreq d USING (term)
          JOIN dl USING (doc)
    ),
    agg AS (
        SELECT qid, doc,
               CAST(COUNT(*) AS BIGINT) AS n_matched,
               CAST(SUM(term_score) AS BIGINT) AS score
        FROM ts GROUP BY qid, doc
    )
    SELECT qid, doc, n_matched, score
    FROM (SELECT *, row_number() OVER (PARTITION BY qid
                                       ORDER BY score DESC, doc ASC) AS rn
          FROM agg)
    WHERE rn <= 5
"""
