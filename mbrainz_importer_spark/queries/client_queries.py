"""Gates for the round-7 tail: frequency sketches (operators/sketch.py),
document chunking (operators/chunking.py), and the Datomic client-API
surface (plans/client.py). Every oracle reproduces the operator
bit-for-bit in DuckDB."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.chunking import chunk_documents
from ..operators.sketch import heavy_hitters
from ..plans.client import db_stats, squuid
from ..plans.datalog import q
from ..plans.eav import alter_ident, build_datoms, datoms_index
from ..tables import load

_SQL_TOKS = r"regexp_split_to_array(lower(trim(text)), '\s+')"


def heavy_hitters_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra–Gries heavy hitters over the corpus, run in its EXACT
    regime (capacity above the corpus vocabulary ⇒ every per-partition
    error is 0 and the sketch is the exact frequency table, which is
    what lets DuckDB certify it). The approximate regime's bounds are
    pinned by tests/test_sketch_chunking.py."""
    docs = load(spark, sf_dir, "documents")
    return heavy_hitters(docs, "text", capacity=200_000, k=25).orderBy(
        F.col("count_lower").desc(), "token"
    )


def doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (32-token windows, stride 24) of a doc
    subset — the RAG/embedding preprocessing shape; zero-exchange plan
    (plan-asserted in tests)."""
    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 120)
    return chunk_documents(docs, "doc_id", "text", chunk_tokens=32, stride=24).orderBy(
        "doc_id", "chunk_idx"
    )


def db_stats_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d/db-stats over the nation+region datom view: per-attribute datom
    counts plus the '*' total row."""
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    datoms = build_datoms(
        {"nation": (nation, "n_nationkey"), "region": (region, "r_regionkey")}
    )
    return db_stats(datoms)


def squuid_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d/squuid for the first 200 events: time-sortable deterministic
    UUIDs (epoch-seconds top 32 bits, md5-entropy low bits)."""
    ev = load(spark, sf_dir, "events").where(F.col("event_id") < 200)
    return ev.select(
        "event_id", squuid(F.col("ts"), F.col("event_id")).alias("squuid")
    ).orderBy("event_id")


def _nr_datoms(spark: SparkSession, sf_dir: str):
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return build_datoms(
        {"nation": (nation, "n_nationkey"), "region": (region, "r_regionkey")}
    )


def datoms_vaet_reverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d/datoms :vaet with a value prefix — the reverse-ref lookup:
    every ref datom pointing at key '1' (region 1's nations, plus any
    other ref attr carrying that value), value-major order."""
    return datoms_index(
        _nr_datoms(spark, sf_dir), "vaet", v="1",
        ref_attrs={":nation/n_regionkey"},
    )


def schema_rename_ident(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema alteration: rename :nation/n_name -> :nation/name, then
    query through the NEW ident with plain datalog — the datoms and the
    schema entity both follow the rename."""
    renamed = alter_ident(_nr_datoms(spark, sf_dir), ":nation/n_name", ":nation/name")
    return q(
        {"find": ["?e", "?name"], "where": [["?e", ":nation/name", "?name"]]},
        renamed,
    ).orderBy("e")



def chunk_retrieval_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RAG first stage end-to-end: chunk documents into overlapping
    token windows, build the postings index OVER THE CHUNKS, rank with
    quantized BM25, return the top chunks with their (doc, chunk)
    provenance — a pure composition of chunk_documents +
    build_fulltext_index + fulltext_bm25_topk, certified as one plan."""
    from ..operators.chunking import chunk_documents
    from ..operators.fulltext import build_fulltext_index, fulltext_bm25_topk

    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    ch = chunk_documents(docs, "doc_id", "text", chunk_tokens=32, stride=24)
    ch = ch.select(
        (F.col("doc_id") * 1000 + F.col("chunk_idx")).alias("cid"),
        "chunk_text",
    )
    idx = build_fulltext_index(ch, "cid", "chunk_text")
    top = fulltext_bm25_topk(idx, "vector table scan", k=15, mode="any")
    return top.select(
        F.expr("doc DIV 1000").cast("bigint").alias("doc_id"),
        F.expr("doc % 1000").cast("bigint").alias("chunk_idx"),
        "n_matched", "score",
    )


def connection_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Connection facade end-to-end as a deterministic gate:
    connect at a FRESH root (re-runs start clean, so the result is
    hash-stable), transact two transactions (asserts, a cas update, a
    retraction, a custom transfer fn), request_index to fold tx 1-2
    into the store, transact once more so the final db() reads store ∪
    unindexed suffix — then return the current datoms. The oracle is
    the literal expected state: the facade's whole lifecycle
    (expansion, append, memory-index view, background fold) must land
    on exactly these rows."""
    import shutil

    from ..plans.client import connect

    root = os.path.join(
        "spark-warehouse", "conn_gate",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    shutil.rmtree(root, ignore_errors=True)
    conn = connect(spark, root)
    conn.transact([
        [":db/add", "acct:1", ":acct/bal", 100],
        [":db/add", "acct:2", ":acct/bal", 50],
        [":db/add", "acct:1", ":acct/owner", "ada"],
    ])

    def transfer(state, src, dst, amount):
        rows = {r["e"]: float(r["v"]) for r in state.where(
            (F.col("a") == ":acct/bal") & F.col("e").isin([src, dst])
        ).collect()}
        return [
            [":db/cas", src, ":acct/bal", rows[src], rows[src] - amount],
            [":db/cas", dst, ":acct/bal", rows[dst], rows[dst] + amount],
        ]

    conn.transact(
        [["transfer", "acct:1", "acct:2", 30],
         [":db/retract", "acct:1", ":acct/owner", "ada"]],
        fns={"transfer": transfer},
    )
    conn.request_index()
    conn.transact([[":db/add", "acct:3", ":acct/bal", 7]])
    return conn.db().select("e", "a", "v").orderBy("e", "a")


QUERIES = {
    "connection_lifecycle": connection_lifecycle,
    "heavy_hitters_topk": heavy_hitters_topk,
    "doc_chunk_windows": doc_chunk_windows,
    "chunk_retrieval_topk": chunk_retrieval_topk,
    "db_stats_attrs": db_stats_attrs,
    "squuid_events": squuid_events,
    "datoms_vaet_reverse": datoms_vaet_reverse,
    "schema_rename_ident": schema_rename_ident,
}

ORACLES = {
    "connection_lifecycle": """
        SELECT e, a, v FROM (VALUES
            ('acct:1', ':acct/bal', '70'),
            ('acct:2', ':acct/bal', '80'),
            ('acct:3', ':acct/bal', '7')
        ) AS t(e, a, v)
        ORDER BY e, a
    """,
    "heavy_hitters_topk": f"""
        WITH counts AS (
            SELECT u.token, CAST(count(*) AS BIGINT) AS n
            FROM (SELECT {_SQL_TOKS} AS t FROM documents), UNNEST(t) AS u(token)
            WHERE u.token <> ''
            GROUP BY u.token
        )
        SELECT token, n AS count_lower, n AS count_upper
        FROM counts
        ORDER BY n DESC, token
        LIMIT 25
    """,
    "doc_chunk_windows": f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter({_SQL_TOKS}, x -> x <> '') AS t
            FROM documents WHERE doc_id < 120
        ),
        starts AS (
            SELECT doc_id, t,
                   CAST(u.s AS BIGINT) AS start_token,
                   CAST(row_number() OVER (PARTITION BY doc_id ORDER BY u.s)
                        - 1 AS BIGINT) AS chunk_idx
            FROM toks, UNNEST(range(0, len(t), 24)) AS u(s)
        )
        SELECT doc_id, chunk_idx, start_token,
               CAST(len(list_slice(t, start_token + 1, start_token + 32))
                    AS BIGINT) AS n_tokens,
               array_to_string(list_slice(t, start_token + 1, start_token + 32),
                               ' ') AS chunk_text
        FROM starts
        ORDER BY doc_id, chunk_idx
    """,
    "db_stats_attrs": """
        WITH n AS (SELECT * FROM nation), r AS (SELECT * FROM region),
        datoms AS (
            SELECT ':nation/n_nationkey' AS attr, count(n_nationkey) AS c FROM n
            UNION ALL SELECT ':nation/n_name', count(n_name) FROM n
            UNION ALL SELECT ':nation/n_regionkey', count(n_regionkey) FROM n
            UNION ALL SELECT ':region/r_regionkey', count(r_regionkey) FROM r
            UNION ALL SELECT ':region/r_name', count(r_name) FROM r
        ),
        plus_total AS (
            SELECT attr, c FROM datoms
            UNION ALL SELECT '*', sum(c) FROM datoms
        )
        SELECT attr, CAST(c AS BIGINT) AS datom_count
        FROM plus_total ORDER BY attr
    """,
    "datoms_vaet_reverse": """
        SELECT 'nation:' || CAST(n_nationkey AS VARCHAR) AS e,
               ':nation/n_regionkey' AS a,
               '1' AS v,
               CAST(1 AS DOUBLE) AS v_num
        FROM nation WHERE n_regionkey = 1
        ORDER BY e
    """,
    "schema_rename_ident": """
        SELECT 'nation:' || CAST(n_nationkey AS VARCHAR) AS e,
               n_name AS name
        FROM nation
        ORDER BY e
    """,
    "squuid_events": """
        WITH h AS (
            SELECT event_id,
                   lpad(lower(to_hex(CAST(floor(epoch(ts)) AS BIGINT))), 8, '0') AS secs,
                   md5(CAST(event_id AS VARCHAR)) AS m
            FROM events WHERE event_id < 200
        )
        SELECT event_id,
               secs || '-' || substr(m, 1, 4) || '-4' || substr(m, 5, 3)
                    || '-8' || substr(m, 8, 3) || '-' || substr(m, 11, 12)
                   AS squuid
        FROM h ORDER BY event_id
    """,
}

ORACLES["chunk_retrieval_topk"] = rf"""
    WITH toks AS (
        SELECT doc_id,
               list_filter({_SQL_TOKS}, x -> x <> '') AS t
        FROM documents WHERE doc_id < 200
    ),
    starts AS (
        SELECT doc_id, t,
               CAST(u.s AS BIGINT) AS start_token,
               CAST(row_number() OVER (PARTITION BY doc_id ORDER BY u.s)
                    - 1 AS BIGINT) AS chunk_idx
        FROM toks, UNNEST(range(0, len(t), 24)) AS u(s)
    ),
    chunks AS (
        SELECT doc_id * 1000 + chunk_idx AS doc,
               list_slice(t, start_token + 1, start_token + 32) AS ct
        FROM starts
    ),
    postings AS (
        SELECT doc, u.term, COUNT(*) AS tf
        FROM chunks, UNNEST(ct) AS u(term)
        GROUP BY 1, 2
    ),
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
    top AS (
        SELECT doc,
               CAST(COUNT(*) AS BIGINT) AS n_matched,
               CAST(SUM(term_score) AS BIGINT) AS score
        FROM ts
        GROUP BY doc
        ORDER BY score DESC, doc ASC
        LIMIT 15
    )
    SELECT CAST(doc // 1000 AS BIGINT) AS doc_id,
           CAST(doc % 1000 AS BIGINT) AS chunk_idx,
           n_matched, score
    FROM top
    ORDER BY score DESC, doc_id ASC, chunk_idx ASC
"""
