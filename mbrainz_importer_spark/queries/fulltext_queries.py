"""Fulltext gate queries (Datomic :db/fulltext analog,
subsets/entities/schema.edn:37,183) over the documents table.

Oracles rebuild the identical postings index in DuckDB SQL; scoring is
integer tf sums so the hash comparison is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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


QUERIES = {
    "fulltext_and_search": fulltext_and_search,
    "fulltext_any_topk": fulltext_any_topk,
    "fulltext_tfidf_topk": fulltext_tfidf_topk_docs,
    "fulltext_bm25_topk": fulltext_bm25_topk_docs,
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
