"""Fulltext search — the Datomic `:db/fulltext true` analog
(SURVEY.md §2 gap closed in round 2; VERDICT r1 "What's missing" #2).

The reference schema flags string attributes for fulltext indexing
(subsets/entities/schema.edn:37,104,115,183,211 — artist/name,
label/name, release/name, track/name, abstractRelease/name) and Datomic
exposes them through a Lucene-backed `(fulltext $ :attr ?search)` that
returns entity/value/score tuples.

Spark-first re-expression: the index IS a DataFrame — `(term, doc, tf)`
term-frequency postings built by one explode + groupBy. At 100 TB the
postings table is written bucketed/partitioned by `term`, so a search
touches only its terms' files (partition pruning); the query-term set is
a driver-side literal list compiled into an `IN` filter that pushes down
to the scan. Scoring is integer term-frequency sums (bit-exact across
engines, no float ranking drift); AND semantics come from counting
matched terms per doc — no UDFs anywhere, one shuffle per search.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def build_fulltext_index(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Tokenized inverted index: one row per (term, doc) with its term
    frequency. Tokenization matches operators.text.tokens (lowercase,
    whitespace split) so fulltext and text-analysis agree on terms.

    Scale path: persist with .write.bucketBy(n, "term") — searches then
    prune to the query terms' buckets and the groupBy below needs no
    extra exchange."""
    return (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy("term", "doc")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def write_fulltext_index_bucketed(
    index: DataFrame, table: str, n_buckets: int = 64
) -> None:
    """Persist the postings index bucketed+sorted by `term` — the scale
    shape build_fulltext_index's docstring promises, made concrete:

    - whenever the bucketed scan is active (any per-term aggregate or
      term-keyed join — e.g. the df counts feeding tf-idf's idf), the
      `term IN (...)` filter BUCKET-PRUNES the scan to the query terms'
      buckets (`SelectedBucketsCount: k out of n` in the physical plan)
      and groupBy('term') inherits hashpartitioning(term) so it plans
      with NO Exchange (both proven in test_fulltext.py);
    - for pure filter+scan reads Spark auto-disables bucketed scans
      (no partitioning to exploit); set
      spark.sql.sources.bucketing.autoBucketedScan.enabled=false to
      force pruning there too.

    Managed table because only the catalog carries bucket metadata
    (same constraint as sources/bucketed.py). The write pre-shuffles on
    the bucket id so each bucket is ONE sorted file (the
    single-file-per-bucket discipline of sources/bucketed.py:
    write_bucketed) — without it the upstream groupBy's 32 tasks each
    fan out files into every bucket (tasks x buckets fragments) and the
    sortBy metadata is never trusted on read."""
    from ..plans.eav import _drop_stale_table
    from ..sources.bucketed import (
        table_location,
        write_bucket_spec,
        writer_partitions,
    )

    _drop_stale_table(index.sparkSession, table)
    (
        index.repartition(
            writer_partitions(index.sparkSession, n_buckets),
            F.pmod(F.hash("term"), F.lit(n_buckets)),
        )
        .write.mode("overwrite")
        .bucketBy(n_buckets, "term")
        .sortBy("term")
        .format("parquet")
        .saveAsTable(table)
    )
    write_bucket_spec(
        index.schema,
        table_location(index.sparkSession, table),
        "term",
        n_buckets,
    )


def query_terms(query: str) -> list[str]:
    """Distinct lowercased whitespace terms of a query string, sorted —
    the driver-side constant the search compiles into the plan."""
    terms = sorted({t for t in re.split(r"\s+", query.lower().strip()) if t})
    if not terms:
        raise ValueError(f"fulltext query has no terms: {query!r}")
    return terms


def fulltext_search(
    index: DataFrame, query: str, mode: str = "all"
) -> DataFrame:
    """Search the postings index. Returns (doc, n_matched, score) where
    `score` is the summed term frequency of matched query terms —
    integer, hence reproducible bit-for-bit in any engine.

    mode="all": doc must contain every query term (Datomic/Lucene
    default-AND); mode="any": at least one term.
    """
    if mode not in ("all", "any"):
        raise ValueError(f"mode must be 'all' or 'any': {mode!r}")
    terms = query_terms(query)
    matched = index.where(F.col("term").isin(terms))
    # index is unique per (term, doc), so count(*) counts matched terms
    agg = matched.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.sum("tf").cast("long").alias("score"),
    )
    if mode == "all":
        agg = agg.where(F.col("n_matched") == len(terms))
    return agg


def fulltext_topk(
    index: DataFrame, query: str, k: int, mode: str = "all"
) -> DataFrame:
    """Top-k docs by (score desc, doc asc) — a deterministic total order,
    so the k-boundary is stable. orderBy+limit compiles to TakeOrdered
    (per-partition top-k then driver merge), not a global sort."""
    return fulltext_search(index, query, mode).orderBy(
        F.col("score").desc(), F.col("doc").asc()
    ).limit(k)


def fulltext_bm25_topk(
    index: DataFrame,
    query: str,
    k: int,
    mode: str = "any",
    idf_scale: int = 1000,
) -> DataFrame:
    """Top-k by QUANTIZED BM25 (k1=1.2, b=0.75) — relevance with
    document-length normalization, in pure integer arithmetic so the
    ranking reproduces bit-for-bit in any engine.

    Derivation: BM25_term = idf · tf(k1+1) / (tf + k1(1-b + b·dl/avgdl))
    with k1=6/5, b=3/4 and avgdl = total/N becomes, after clearing
    denominators,   idf · 44·tf·total / (20·tf·total + 6·total + 18·dl·N).
    To stay inside int64 at any corpus size we quantize the length term
    FIRST:  den = 20·tf + 6 + (18·dl·N) div total,  then
    term_score = (idf_scaled · 44·tf) div den — every factor is bounded
    by tokens-per-doc, not corpus size (18·dl·N needs dl·N < 5e17, fine
    for 1e9 docs of 1e3 tokens). The early division quantizes the
    length penalty to integer steps; ranking behavior (rare terms up,
    long docs down) is preserved and, unlike float BM25, two engines
    can never disagree on a tie.

    Shapes: dl is one groupBy(doc) over the postings (co-located if the
    index is ALSO stored doc-bucketed; with the term-bucketed layout of
    write_fulltext_index_bucketed it is one shuffle), df/N/total are
    query-term-sized or single-row broadcasts; the scoring join then
    aggregates per doc exactly like fulltext_search."""
    if mode not in ("all", "any"):
        raise ValueError(f"mode must be 'all' or 'any': {mode!r}")
    terms = query_terms(query)
    dl = index.groupBy("doc").agg(F.sum("tf").cast("long").alias("dl"))
    totals = dl.agg(
        F.sum("dl").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    matched = index.where(F.col("term").isin(terms))
    dfreq = (
        matched.groupBy("term")
        .agg(F.countDistinct("doc").alias("df"))
        .crossJoin(F.broadcast(totals))
        .select(
            "term",
            F.expr(f"CAST(({idf_scale} * n_docs) DIV df AS BIGINT)").alias(
                "idf_scaled"
            ),
        )
    )
    scored = (
        matched.join(F.broadcast(dfreq), "term")
        .join(dl, "doc")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "den",
            F.expr("20 * tf + 6 + (18 * dl * n_docs) DIV total"),
        )
        .withColumn(
            "term_score",
            F.expr("CAST((idf_scaled * 44 * tf) DIV den AS BIGINT)"),
        )
    )
    agg = scored.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.sum("term_score").cast("long").alias("score"),
    )
    if mode == "all":
        agg = agg.where(F.col("n_matched") == len(terms))
    return agg.orderBy(F.col("score").desc(), F.col("doc").asc()).limit(k)


def fulltext_tfidf_topk(
    index: DataFrame,
    query: str,
    k: int,
    mode: str = "any",
    idf_scale: int = 1000,
) -> DataFrame:
    """Top-k by integer-scaled tf-idf: rare query terms outweigh common
    ones, the relevance ranking a search user expects beyond raw tf
    (VERDICT r5 next-round #4).

    idf_scaled(t) = (idf_scale * N) div df(t) — an integer rational
    approximation of inverse document frequency (monotone decreasing in
    df, like log(N/df), but exact integer arithmetic end-to-end so the
    DuckDB oracle reproduces scores bit-for-bit; float log would invite
    cross-engine ulp drift in the ranking). N is the corpus doc count
    (distinct docs in the index), df the number of docs containing the
    term. score(doc) = sum over matched terms of tf * idf_scaled.

    Scale shape: df/N are one groupBy over the few query terms' postings
    (partition-pruned on bucketed storage) plus one single-row aggregate;
    both broadcast into the scoring join, so the corpus-side postings
    shuffle once on doc, same as fulltext_search. orderBy+limit is
    TakeOrdered, not a global sort."""
    if mode not in ("all", "any"):
        raise ValueError(f"mode must be 'all' or 'any': {mode!r}")
    terms = query_terms(query)
    matched = index.where(F.col("term").isin(terms))
    n_docs = index.agg(F.countDistinct("doc").alias("n_docs"))
    dfreq = (
        matched.groupBy("term")
        .agg(F.countDistinct("doc").alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            F.expr(f"CAST(({idf_scale} * n_docs) DIV df AS BIGINT)").alias(
                "idf_scaled"
            ),
        )
    )
    agg = (
        matched.join(F.broadcast(dfreq), "term")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.sum(F.col("tf") * F.col("idf_scaled")).cast("long").alias("score"),
        )
    )
    if mode == "all":
        agg = agg.where(F.col("n_matched") == len(terms))
    return agg.orderBy(F.col("score").desc(), F.col("doc").asc()).limit(k)


# ---------------------------------------------------------------------------
# The MATERIALIZED postings index: fulltext as storage, incrementally
# maintained — the retrieval analog of the attribute-partitioned datom
# store (plans/eav.py) and the cell-partitioned IVF index (operators/
# ann.py). Datomic's Lucene index is exactly this shape: built once,
# folded forward by the background index job, never rebuilt per query.
#
# Layout under one root path:
#   postings/pfx=<h>/   (term, doc, tf, dl)  — term-hash partitions; a
#       query's terms map to literal pfx values driver-side, so serving
#       is a PARTITION-PRUNED scan of <= |query terms| directories.
#       Document length `dl` is DENORMALIZED into every posting row
#       (one int per posting): BM25's length penalty then needs NO join
#       to a doc-length table and NO per-query full-index groupBy —
#       the classic impact-ordered-postings trade.
#   doclen/dpfx=<h>/    (doc, dl)            — doc-hash partitions; the
#       membership side table that makes the merge O(increment): an
#       arrival batch probes only the dpfx partitions its docs hash to.
#   stats/              one row (n_docs, total) — the corpus-level BM25
#       constants, updated arithmetically per merge.
#   _meta.json          partition-count parameters.
#
# Docs are immutable by contract (the corpus-ingest workload): a merge
# APPENDS new docs' postings into the pfx partitions they touch and
# never rewrites an existing doc's rows, so df/dl of existing docs stay
# correct without any read-modify-write of untouched partitions.
# ---------------------------------------------------------------------------


def _term_pfx(col: F.Column, n_pfx: int) -> F.Column:
    return F.pmod(F.xxhash64(col), F.lit(n_pfx))


def _doc_pfx(col: F.Column, n_dpfx: int) -> F.Column:
    return F.pmod(F.xxhash64(col), F.lit(n_dpfx))


def _write_meta(path: str, meta: dict) -> None:
    import json
    import os

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "_meta.json"), "w") as f:
        json.dump(meta, f)


def _read_meta(path: str) -> dict:
    import json
    import os

    with open(os.path.join(path, "_meta.json")) as f:
        return json.load(f)


def materialize_fulltext_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_pfx: int = 64,
    n_dpfx: int = 16,
) -> None:
    """Build the persistent postings index from scratch (the initial
    bulk load; incremental arrivals go through
    `merge_fulltext_increment`). n_pfx sizes the term-hash fan-out —
    64 suits the test tiers; a 100 TB corpus wants O(thousands) so a
    single partition stays executor-sized. Docs whose text tokenizes to
    nothing carry no postings and are excluded from n_docs/total,
    matching `build_fulltext_index` + the per-query aggregation of the
    in-memory faces bit-for-bit."""
    spark = docs.sparkSession
    idx = build_fulltext_index(docs, id_col, text_col)
    dl = idx.groupBy("doc").agg(F.sum("tf").cast("long").alias("dl"))
    postings = idx.join(dl, "doc").select(
        "term",
        "doc",
        F.col("tf").cast("long").alias("tf"),
        "dl",
        _term_pfx(F.col("term"), n_pfx).alias("pfx"),
    )
    postings.write.mode("overwrite").partitionBy("pfx").parquet(
        path + "/postings"
    )
    doclen = dl.select(
        "doc", "dl", _doc_pfx(F.col("doc"), n_dpfx).alias("dpfx")
    )
    doclen.write.mode("overwrite").partitionBy("dpfx").parquet(
        path + "/doclen"
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("total"),
    )
    stats.coalesce(1).write.mode("overwrite").parquet(path + "/stats")
    _write_meta(path, {"n_pfx": n_pfx, "n_dpfx": n_dpfx})


def merge_fulltext_increment(
    spark,
    path: str,
    arrivals: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Fold an arrival batch into the persistent index — O(increment +
    touched partitions), the index never rebuilds:

    1. membership probe: arrivals' doc ids prune the doclen side table
       to their dpfx partitions; a left_anti keeps only truly-new docs
       (redelivered batches dissolve here — content-idempotent like the
       datom-store and IVF merges);
    2. the new docs' postings fold into only the pfx partitions their
       terms hash to (dynamic partition overwrite, union deduped by
       (term, doc) so a crash-interrupted merge heals on re-run, staged
       through disk per the _stage_merge contract — never an in-memory
       checkpoint of unbounded partition rows);
    3. doclen's touched dpfx partitions fold the same way; stats update
       arithmetically (old + new docs' count/length). Write order is
       postings -> doclen -> stats, so a mid-merge crash leaves docs
       absent from the membership table and the re-run repairs every
       layer; `repair_fulltext_stats` recomputes stats from doclen if a
       crash landed between the last two writes."""
    from ..plans.eav import _drop_stage, _stage_merge

    meta = _read_meta(path)
    n_pfx, n_dpfx = meta["n_pfx"], meta["n_dpfx"]

    new_idx = build_fulltext_index(arrivals, id_col, text_col)
    tomb = _tombstones(spark, path)
    if tomb is not None:
        # delete-then-readd contract: an excised id stays excised until
        # compaction clears its tombstone; arrivals bearing one drop here
        new_idx = new_idx.join(
            F.broadcast(tomb.select("doc")), "doc", "left_anti"
        )
    # materialize the arrival postings ONCE: new_idx is consumed by the
    # dpfx probe, the doclen anti-join AND the postings fold — without
    # the cut each consumer re-tokenizes the whole arrival batch (the
    # increment's dominant compute, paid 2-3x per merge). O(increment)
    # rows by contract; a local checkpoint, not a durable write — the
    # frame only lives within this call (the crash contract rests on
    # the staged partition writes below, not on this materialization).
    new_idx = new_idx.localCheckpoint()
    new_dl = (
        new_idx.groupBy("doc")
        .agg(F.sum("tf").cast("long").alias("dl"))
        .select("doc", "dl", _doc_pfx(F.col("doc"), n_dpfx).alias("dpfx"))
    )
    dpfxs = sorted(r[0] for r in new_dl.select("dpfx").distinct().collect())
    if not dpfxs:
        return
    existing_docs = (
        spark.read.parquet(path + "/doclen")
        .where(F.col("dpfx").isin(dpfxs))
        .select("doc")
    )
    # truly-new docs: materialized the same way (consumed by the delta
    # aggregation, the postings fold and the doclen fold) — replaces
    # the old incoming_staging parquet round-trip (write + listing +
    # re-read bought nothing: the frame never outlives the call)
    truly_new = new_dl.join(existing_docs, "doc", "left_anti").localCheckpoint()
    delta = truly_new.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("total"),
    ).collect()[0]
    if delta["n_docs"] == 0:
        return

    add = new_idx.join(truly_new.select("doc", "dl"), "doc").select(
        "term",
        "doc",
        F.col("tf").cast("long").alias("tf"),
        "dl",
        _term_pfx(F.col("term"), n_pfx).alias("pfx"),
    )
    touched = sorted(
        r[0] for r in add.select("pfx").distinct().collect()
    )
    existing_p = (
        spark.read.parquet(path + "/postings")
        .where(F.col("pfx").isin(touched))
        .select("term", "doc", "tf", "dl", "pfx")
    )
    merged = (
        existing_p.unionByName(add)
        .groupBy("term", "doc")
        .agg(F.max("tf").alias("tf"), F.max("dl").alias("dl"))
        .select(
            "term", "doc", "tf", "dl",
            _term_pfx(F.col("term"), n_pfx).alias("pfx"),
        )
    )
    merged = _stage_merge(
        spark, merged, path + "/postings",
        columns=("term", "doc", "tf", "dl", "pfx"),
    )
    mode_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(mode_key, "static")
    spark.conf.set(mode_key, "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy("pfx").parquet(
            path + "/postings"
        )
        existing_d = (
            spark.read.parquet(path + "/doclen")
            .where(F.col("dpfx").isin(dpfxs))
            .select("doc", "dl")
        )
        merged_d = (
            existing_d.unionByName(truly_new.select("doc", "dl"))
            .groupBy("doc")
            .agg(F.max("dl").alias("dl"))
            .select(
                "doc", "dl",
                _doc_pfx(F.col("doc"), n_dpfx).alias("dpfx"),
            )
        )
        merged_d = _stage_merge(
            spark, merged_d, path + "/doclen",
            columns=("doc", "dl", "dpfx"),
        )
        merged_d.write.mode("overwrite").partitionBy("dpfx").parquet(
            path + "/doclen"
        )
    finally:
        spark.conf.set(mode_key, prev)
    _drop_stage(path + "/postings")
    _drop_stage(path + "/doclen")

    old = spark.read.parquet(path + "/stats").collect()[0]
    from .localrel import local_df

    local_df(
        spark,
        [(old["n_docs"] + delta["n_docs"], old["total"] + delta["total"])],
        "n_docs long, total long",
    ).coalesce(1).write.mode("overwrite").parquet(path + "/stats")


def repair_fulltext_stats(spark, path: str) -> None:
    """Recompute the stats row from the doclen side table — the
    recovery path for a crash that landed after the doclen overwrite
    but before the stats write (the one window where the arithmetic
    update could go stale)."""
    (
        spark.read.parquet(path + "/doclen")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("total"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(path + "/stats")
    )


def _pfx_of_terms(spark, terms: list[str], n_pfx: int) -> list[int]:
    """The query terms' partition values, still computed by Spark's own
    xxhash64 — but over a JVM LocalRelation (operators/localrel), so
    the foldable projection collects driver-side with ZERO scan tasks.
    The previous createDataFrame(list) planned a Python-RDD scan:
    32 tasks each spinning a Python worker to unpickle a slice of a
    three-term list — 50.3 s of task time per serving query (r14
    measured, fulltext_bm25_from_index stage 4). Dedup happens here,
    not in a distinct(), so no shuffle job either."""
    from .localrel import local_df

    rows = (
        local_df(spark, [(t,) for t in terms], "term string")
        .select(_term_pfx(F.col("term"), n_pfx).alias("pfx"))
        .collect()
    )
    return sorted({r["pfx"] for r in rows})


def fulltext_bm25_from_index(
    spark,
    path: str,
    query: str,
    k: int,
    mode: str = "any",
    idf_scale: int = 1000,
) -> DataFrame:
    """Serve quantized BM25 top-k from the MATERIALIZED index —
    bit-identical scores to `fulltext_bm25_topk` over the same corpus
    (same integer derivation; df computed from the pruned matched
    postings exactly as the in-memory face computes it; n_docs/total
    from the maintained stats row; dl row-local). Per-query cost is a
    partition-pruned scan of the query terms' pfx directories plus one
    groupBy(doc) over the matched rows — the full-corpus tokenize +
    doc-length aggregation the in-memory face pays per query is gone."""
    if mode not in ("all", "any"):
        raise ValueError(f"mode must be 'all' or 'any': {mode!r}")
    terms = query_terms(query)
    meta = _read_meta(path)
    pfxs = _pfx_of_terms(spark, terms, meta["n_pfx"])
    matched = (
        spark.read.parquet(path + "/postings")
        .where(F.col("pfx").isin(pfxs))
        .where(F.col("term").isin(terms))
    )
    tomb = _tombstones(spark, path)
    if tomb is not None:
        # excised docs vanish from results AND from df/n_matched before
        # compaction physically erases their rows (broadcast-sized set)
        matched = matched.join(
            F.broadcast(tomb.select("doc")), "doc", "left_anti"
        )
    stats = spark.read.parquet(path + "/stats")
    dfreq = (
        matched.groupBy("term")
        .agg(F.countDistinct("doc").alias("df"))
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            F.expr(f"CAST(({idf_scale} * n_docs) DIV df AS BIGINT)").alias(
                "idf_scaled"
            ),
        )
    )
    scored = (
        matched.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "den", F.expr("20 * tf + 6 + (18 * dl * n_docs) DIV total")
        )
        .withColumn(
            "term_score",
            F.expr("CAST((idf_scaled * 44 * tf) DIV den AS BIGINT)"),
        )
    )
    agg = scored.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.sum("term_score").cast("long").alias("score"),
    )
    if mode == "all":
        agg = agg.where(F.col("n_matched") == len(terms))
    return agg.orderBy(F.col("score").desc(), F.col("doc").asc()).limit(k)


# ---------------------------------------------------------------------------
# Excision (right-to-be-forgotten) for the postings index. The datom
# store excises by rewriting the touched attribute partitions
# (plans/eav.py:excise_store); postings are partitioned by TERM, so a
# doomed doc's rows scatter across partitions no doc-id filter can
# prune. The Lucene-shaped answer (segment deletes + merges): excision
# writes a doc-id TOMBSTONE (O(1), no postings touched), every serving
# read anti-joins the pruned matched rows against the tombstone set
# (broadcast-sized by contract), and a compaction pass physically
# erases the doomed rows from every partition on the maintenance
# cadence — the same amortization compact_store applies to merge
# fan-out. doclen/stats update eagerly (doclen IS doc-partitioned, so
# that rewrite touches only the doomed docs' dpfx directories), which
# keeps BM25's corpus constants exact the moment the excision lands.
# ---------------------------------------------------------------------------


def _tombstones(spark, path: str) -> DataFrame | None:
    import os

    t = path + "/tombstones"
    if not os.path.exists(t):
        return None
    return spark.read.parquet(t)


def excise_fulltext_docs(spark, path: str, doomed: DataFrame) -> None:
    """Excise `doomed` (one column `doc`) from the index: tombstone the
    ids, drop them from doclen (touched dpfx partitions only), subtract
    their mass from stats. Content-idempotent — re-excising already-
    absent or already-tombstoned ids changes nothing. A tombstoned id
    must not be re-asserted before `compact_fulltext_index` runs;
    `merge_fulltext_increment` drops such arrivals and documents the
    delete-then-readd contract."""
    import os
    import shutil

    meta = _read_meta(path)
    # materialize the (possibly expensive) doomed plan ONCE — a local
    # checkpoint, not a parquet staging write: the frame is only read
    # within this call, so the durable write + listing + re-read bought
    # nothing (job-count hygiene, guide §1/§5: the excision's steady
    # path is all driver barriers at small doom sets)
    ids = (
        doomed.select(F.col("doc").cast("long").alias("doc"))
        .distinct()
        .localCheckpoint()
    )
    old_t = _tombstones(spark, path)
    # ONE probe collect answers everything the driver needs up front:
    # the touched dpfx partitions AND whether any id is newly
    # tombstoned (doom sets are broadcast-sized by contract, so
    # collecting (dpfx, is_new) pairs is bounded)
    marked = (
        old_t.select("doc").withColumn("__t", F.lit(1))
        if old_t is not None
        else spark.createDataFrame([], "doc long, __t int")
    )
    probe = (
        ids.join(F.broadcast(marked), "doc", "left")
        .select(
            _doc_pfx(F.col("doc"), meta["n_dpfx"]).alias("dpfx"),
            F.col("__t").isNull().alias("new_t"),
        )
        .groupBy("dpfx")
        .agg(F.sum(F.col("new_t").cast("long")).alias("n_new"))
        .collect()
    )
    dpfxs = sorted(r["dpfx"] for r in probe)
    n_new_tomb = sum(r["n_new"] for r in probe)
    if not dpfxs:
        return
    touched = (
        spark.read.parquet(path + "/doclen")
        .where(F.col("dpfx").isin(dpfxs))
    )
    # per-dpfx presence/remainder in ONE aggregation: the stats delta
    # (present docs' count + mass), and which touched partitions keep
    # rows (the old separate `kept` collect) — fused, guide §1 job
    # hygiene
    per_pfx = (
        touched.join(
            F.broadcast(ids.withColumn("__d", F.lit(1))), "doc", "left"
        )
        .groupBy("dpfx")
        .agg(
            F.coalesce(
                F.sum(F.col("__d").cast("long")), F.lit(0)
            ).alias("n_docs"),
            F.coalesce(
                F.sum(F.when(F.col("__d").isNotNull(), F.col("dl"))),
                F.lit(0),
            ).cast("long").alias("total"),
            F.coalesce(
                F.sum(F.when(F.col("__d").isNull(), 1).cast("long")),
                F.lit(0),
            ).alias("n_keep"),
        )
        .collect()
    )
    delta_docs = sum(r["n_docs"] for r in per_pfx)
    delta_total = sum(r["total"] for r in per_pfx)
    kept = {r["dpfx"] for r in per_pfx if r["n_keep"] > 0}

    # tombstones: union-distinct rewrite (tiny by contract) — skipped
    # when every id is already tombstoned (the rewrite would be a
    # content no-op; redelivered excisions stay idempotent AND cheap)
    if n_new_tomb > 0:
        if old_t is None:
            # ids is checkpointed, reads nothing under the target dir
            ids.coalesce(1).write.mode("overwrite").parquet(
                path + "/tombstones"
            )
        else:
            new_t = _stage_local(
                spark, old_t.unionByName(ids).distinct(),
                path + "/tombstones",
            )
            new_t.coalesce(1).write.mode("overwrite").parquet(
                path + "/tombstones"
            )
            _drop_local_stage(path + "/tombstones")

    if delta_docs == 0:
        return
    remaining = touched.join(ids, "doc", "left_anti").select(
        "doc", "dl", "dpfx"
    )
    from ..plans.eav import _drop_stage, _stage_merge

    remaining = _stage_merge(
        spark, remaining, path + "/doclen",
        columns=("doc", "dl", "dpfx"),
    )
    mode_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(mode_key, "static")
    spark.conf.set(mode_key, "dynamic")
    try:
        remaining.write.mode("overwrite").partitionBy("dpfx").parquet(
            path + "/doclen"
        )
    finally:
        spark.conf.set(mode_key, prev)
    _drop_stage(path + "/doclen")
    # a dpfx partition whose every doc was excised has no staged
    # rows; dynamic overwrite cannot express an empty partition,
    # so the emptied directory is removed explicitly
    for k in set(dpfxs) - kept:
        d = os.path.join(path, "doclen", f"dpfx={k}")
        if os.path.exists(d):
            shutil.rmtree(d)

    old = spark.read.parquet(path + "/stats").collect()[0]
    from .localrel import local_df

    local_df(
        spark,
        [(old["n_docs"] - delta_docs, old["total"] - delta_total)],
        "n_docs long, total long",
    ).coalesce(1).write.mode("overwrite").parquet(path + "/stats")


def _stage_local(spark, df: DataFrame, anchor: str) -> DataFrame:
    """Stage a small frame through disk before overwriting a path its
    plan reads from (the tombstone union reads the directory it
    replaces)."""
    stage = anchor.rstrip("/") + ".__rewrite_staging"
    df.write.mode("overwrite").parquet(stage)
    return spark.read.parquet(stage)


def _drop_local_stage(anchor: str) -> None:
    import os
    import shutil

    stage = anchor.rstrip("/") + ".__rewrite_staging"
    if os.path.exists(stage):
        shutil.rmtree(stage)


def compact_fulltext_index(spark, path: str) -> None:
    """Physically erase tombstoned docs from every postings partition
    and clear the tombstone set — the segment-merge moment where
    right-to-be-forgotten becomes bytes-on-disk. Full postings rewrite
    by design (the doomed rows scatter across term partitions);
    amortized on the compaction cadence like compact_store. Also
    collapses per-merge small-file fan-out, so it doubles as the
    index's regular compaction."""
    import shutil

    from ..plans.eav import _drop_stage, _stage_merge

    t = _tombstones(spark, path)
    postings = spark.read.parquet(path + "/postings")
    if t is not None:
        postings = postings.join(
            F.broadcast(t.select(F.col("doc"))), "doc", "left_anti"
        )
    postings = postings.select("term", "doc", "tf", "dl", "pfx")
    staged = _stage_merge(
        spark, postings, path + "/postings",
        columns=("term", "doc", "tf", "dl", "pfx"),
    )
    staged.write.mode("overwrite").partitionBy("pfx").parquet(
        path + "/postings"
    )
    _drop_stage(path + "/postings")
    import os

    _drop_local_stage(path + "/tombstones")
    tomb = path + "/tombstones"
    if os.path.exists(tomb):
        shutil.rmtree(tomb)


def fulltext_bm25_from_index_many(
    spark,
    path: str,
    queries: list[str],
    k: int,
    mode: str = "any",
    idf_scale: int = 1000,
) -> DataFrame:
    """Batched serving: N queries answered from ONE partition-pruned
    scan of the union of their terms' directories — the production QPS
    shape (per-query scan setup amortizes across the batch; df per
    term computes once and serves every query that contains the term).
    Returns (qid, doc, n_matched, score): query qid's top-k by
    (score desc, doc asc), scores bit-identical to the single-query
    face. qid = position in `queries`."""
    if mode not in ("all", "any"):
        raise ValueError(f"mode must be 'all' or 'any': {mode!r}")
    if not queries:
        raise ValueError("fulltext_bm25_from_index_many needs queries")
    per_q = {qid: query_terms(q) for qid, q in enumerate(queries)}
    from .localrel import local_df

    qrel = local_df(
        spark,
        [(qid, t) for qid, ts in per_q.items() for t in ts],
        "qid int, term string",
    )
    all_terms = sorted({t for ts in per_q.values() for t in ts})
    meta = _read_meta(path)
    pfxs = _pfx_of_terms(spark, all_terms, meta["n_pfx"])
    matched = (
        spark.read.parquet(path + "/postings")
        .where(F.col("pfx").isin(pfxs))
        .where(F.col("term").isin(all_terms))
    )
    tomb = _tombstones(spark, path)
    if tomb is not None:
        matched = matched.join(
            F.broadcast(tomb.select("doc")), "doc", "left_anti"
        )
    stats = spark.read.parquet(path + "/stats")
    dfreq = (
        matched.groupBy("term")
        .agg(F.countDistinct("doc").alias("df"))
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            F.expr(f"CAST(({idf_scale} * n_docs) DIV df AS BIGINT)").alias(
                "idf_scaled"
            ),
        )
    )
    scored = (
        matched.join(F.broadcast(qrel), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "den", F.expr("20 * tf + 6 + (18 * dl * n_docs) DIV total")
        )
        .withColumn(
            "term_score",
            F.expr("CAST((idf_scaled * 44 * tf) DIV den AS BIGINT)"),
        )
    )
    agg = scored.groupBy("qid", "doc").agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.sum("term_score").cast("long").alias("score"),
    )
    if mode == "all":
        n_terms = local_df(
            spark,
            [(qid, len(ts)) for qid, ts in per_q.items()],
            "qid int, n_terms int",
        )
        agg = agg.join(F.broadcast(n_terms), "qid").where(
            F.col("n_matched") == F.col("n_terms")
        ).drop("n_terms")
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(
        F.desc("score"), F.asc("doc")
    )
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )
