"""The materialized fulltext postings index (operators/fulltext.py:
materialize_fulltext_index / merge_fulltext_increment /
fulltext_bm25_from_index) — the retrieval analog of the datom-store
and IVF index-maintenance tiers, and the same proof obligations:
serving equals the from-scratch evaluation, merges are O(increment)
and content-idempotent, untouched partitions keep their files, and
the serving scan is partition-pruned.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mbrainz_importer_spark.operators.fulltext import (
    build_fulltext_index,
    fulltext_bm25_from_index,
    fulltext_bm25_topk,
    materialize_fulltext_index,
    merge_fulltext_increment,
    repair_fulltext_stats,
)

DOCS = [
    (1, "vector table scan joins the hash table"),
    (2, "hash join beats nested loop on big tables"),
    (3, "a vector index prunes the scan"),
    (4, "scan scan scan"),
    (5, ""),  # tokenizes to nothing: no postings, excluded from stats
    (6, "the optimizer picks a broadcast hash join plan"),
    (7, "table statistics drive the scan estimates"),
    (8, "vector vector vector similarity"),
    (9, "merge sort join for sorted tables"),
    (10, "index only scan avoids the heap"),
]


def _docs(spark, rows=None):
    return spark.createDataFrame(rows or DOCS, "doc_id long, text string")


def _snapshot(spark, path):
    postings = sorted(
        tuple(r)
        for r in spark.read.parquet(path + "/postings")
        .select("term", "doc", "tf", "dl")
        .collect()
    )
    doclen = sorted(
        tuple(r)
        for r in spark.read.parquet(path + "/doclen")
        .select("doc", "dl")
        .collect()
    )
    stats = spark.read.parquet(path + "/stats").collect()[0]
    return postings, doclen, (stats["n_docs"], stats["total"])


def _files(path):
    out = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out[p] = (os.path.getsize(p), os.path.getmtime(p))
    return out


def test_from_index_equals_in_memory_face(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "ft")
    materialize_fulltext_index(docs, path, n_pfx=8, n_dpfx=4)
    idx = build_fulltext_index(docs, "doc_id", "text")
    for query, mode in [("vector table scan", "any"), ("hash join", "all")]:
        mem = fulltext_bm25_topk(idx, query, k=10, mode=mode).collect()
        srv = fulltext_bm25_from_index(
            spark, path, query, k=10, mode=mode
        ).collect()
        assert [tuple(r) for r in srv] == [tuple(r) for r in mem]


def test_incremental_merge_equals_full_build(spark, tmp_path):
    docs = _docs(spark)
    inc_path = str(tmp_path / "ft_inc")
    full_path = str(tmp_path / "ft_full")
    materialize_fulltext_index(
        docs.where(F.col("doc_id") % 3 != 0), inc_path, n_pfx=8, n_dpfx=4
    )
    merge_fulltext_increment(
        spark, inc_path, docs.where(F.col("doc_id") % 3 == 0)
    )
    materialize_fulltext_index(docs, full_path, n_pfx=8, n_dpfx=4)
    assert _snapshot(spark, inc_path) == _snapshot(spark, full_path)


def test_merge_redelivery_is_noop_and_keeps_files(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "ft")
    arrivals = docs.where(F.col("doc_id") >= 8)
    materialize_fulltext_index(
        docs.where(F.col("doc_id") < 8), path, n_pfx=8, n_dpfx=4
    )
    merge_fulltext_increment(spark, path, arrivals)
    before = _snapshot(spark, path)
    files_before = _files(path)
    # redelivered batch: every doc already a member -> merge dissolves
    # at the membership probe, no partition rewrites at all
    merge_fulltext_increment(spark, path, arrivals)
    assert _snapshot(spark, path) == before
    assert _files(path) == files_before


def test_merge_rewrites_only_touched_partitions(spark, tmp_path):
    path = str(tmp_path / "ft")
    base = _docs(spark)
    materialize_fulltext_index(base, path, n_pfx=64, n_dpfx=16)
    files_before = _files(path + "/postings")
    arrival = _docs(spark, [(11, "zzzunique")])
    merge_fulltext_increment(spark, path, arrival)
    files_after = _files(path + "/postings")
    touched_dirs = {
        os.path.dirname(p)
        for p in set(files_after) - set(files_before)
    }
    # one new term -> exactly one pfx partition gained files
    assert len(touched_dirs) == 1
    # every pre-existing file survives byte-identical (untouched
    # partitions were never read or rewritten)
    unchanged = {
        p: s for p, s in files_before.items()
        if os.path.dirname(p) not in touched_dirs
    }
    assert all(files_after[p] == s for p, s in unchanged.items())


def test_empty_text_docs_excluded_from_stats(spark, tmp_path):
    path = str(tmp_path / "ft")
    materialize_fulltext_index(_docs(spark), path, n_pfx=8, n_dpfx=4)
    stats = spark.read.parquet(path + "/stats").collect()[0]
    # doc 5 tokenizes to nothing -> 9 docs carry postings
    assert stats["n_docs"] == 9
    doclen = spark.read.parquet(path + "/doclen")
    assert doclen.where(F.col("doc") == 5).count() == 0


def test_repair_stats_matches_maintained_stats(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "ft")
    materialize_fulltext_index(
        docs.where(F.col("doc_id") <= 6), path, n_pfx=8, n_dpfx=4
    )
    merge_fulltext_increment(spark, path, docs.where(F.col("doc_id") > 6))
    maintained = spark.read.parquet(path + "/stats").collect()[0]
    repair_fulltext_stats(spark, path)
    repaired = spark.read.parquet(path + "/stats").collect()[0]
    assert tuple(maintained) == tuple(repaired)


def test_serving_scan_partition_pruned(spark, tmp_path):
    path = str(tmp_path / "ft")
    materialize_fulltext_index(_docs(spark), path, n_pfx=8, n_dpfx=4)
    plan = (
        fulltext_bm25_from_index(spark, path, "vector table scan", k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [" in plan
    seg = plan.split("PartitionFilters")[1][:200]
    assert "pfx" in seg


def test_merge_empty_arrivals_is_noop(spark, tmp_path):
    path = str(tmp_path / "ft")
    materialize_fulltext_index(_docs(spark), path, n_pfx=8, n_dpfx=4)
    before = _snapshot(spark, path)
    merge_fulltext_increment(
        spark, path, _docs(spark).where(F.lit(False))
    )
    assert _snapshot(spark, path) == before


def test_bad_mode_rejected(spark, tmp_path):
    path = str(tmp_path / "ft")
    materialize_fulltext_index(_docs(spark), path, n_pfx=8, n_dpfx=4)
    with pytest.raises(ValueError):
        fulltext_bm25_from_index(spark, path, "vector", k=5, mode="or")


def test_excision_masks_and_compaction_erases(spark, tmp_path):
    from mbrainz_importer_spark.operators.fulltext import (
        compact_fulltext_index,
        excise_fulltext_docs,
    )

    docs = _docs(spark)
    path = str(tmp_path / "ft")
    materialize_fulltext_index(docs, path, n_pfx=8, n_dpfx=4)
    doomed = spark.createDataFrame([(2,), (8,)], "doc long")
    excise_fulltext_docs(spark, path, doomed)

    survivors = docs.where(~F.col("doc_id").isin(2, 8))
    ref_path = str(tmp_path / "ft_ref")
    materialize_fulltext_index(survivors, ref_path, n_pfx=8, n_dpfx=4)
    for query in ["vector table scan", "hash join"]:
        masked = fulltext_bm25_from_index(spark, path, query, k=10).collect()
        ref = fulltext_bm25_from_index(spark, ref_path, query, k=10).collect()
        assert [tuple(r) for r in masked] == [tuple(r) for r in ref]
    # doclen/stats updated eagerly
    assert _snapshot(spark, path)[1:] == _snapshot(spark, ref_path)[1:]
    # postings still carry the doomed rows until compaction
    assert (
        spark.read.parquet(path + "/postings").where(F.col("doc") == 2).count()
        > 0
    )
    compact_fulltext_index(spark, path)
    assert _snapshot(spark, path) == _snapshot(spark, ref_path)
    assert not os.path.exists(path + "/tombstones")
    masked = fulltext_bm25_from_index(
        spark, path, "vector table scan", k=10
    ).collect()
    ref = fulltext_bm25_from_index(
        spark, ref_path, "vector table scan", k=10
    ).collect()
    assert [tuple(r) for r in masked] == [tuple(r) for r in ref]


def test_excision_idempotent(spark, tmp_path):
    from mbrainz_importer_spark.operators.fulltext import excise_fulltext_docs

    path = str(tmp_path / "ft")
    materialize_fulltext_index(_docs(spark), path, n_pfx=8, n_dpfx=4)
    doomed = spark.createDataFrame([(3,), (999,)], "doc long")  # 999 absent
    excise_fulltext_docs(spark, path, doomed)
    before = _snapshot(spark, path)
    tomb_before = sorted(
        r[0] for r in spark.read.parquet(path + "/tombstones").collect()
    )
    excise_fulltext_docs(spark, path, doomed)
    assert _snapshot(spark, path) == before
    assert (
        sorted(r[0] for r in spark.read.parquet(path + "/tombstones").collect())
        == tomb_before
        == [3, 999]
    )


def test_merge_drops_tombstoned_arrivals(spark, tmp_path):
    from mbrainz_importer_spark.operators.fulltext import excise_fulltext_docs

    docs = _docs(spark)
    path = str(tmp_path / "ft")
    materialize_fulltext_index(docs, path, n_pfx=8, n_dpfx=4)
    excise_fulltext_docs(spark, path, spark.createDataFrame([(4,)], "doc long"))
    before = _snapshot(spark, path)
    # the excised id arrives again: delete-then-readd contract drops it
    merge_fulltext_increment(
        spark, path, _docs(spark, [(4, "scan scan scan")])
    )
    assert _snapshot(spark, path) == before


def test_streaming_doc_ingest(spark, tmp_path):
    """Document micro-batches stream into the postings index; the
    drained index equals a full rebuild over base + arrivals (content,
    doclen, and stats all equal)."""
    from mbrainz_importer_spark.streaming.doc_ingest import (
        start_fulltext_ingest,
    )

    docs = _docs(spark)
    path = str(tmp_path / "ft")
    materialize_fulltext_index(
        docs.where(F.col("doc_id") <= 6), path, n_pfx=8, n_dpfx=4
    )
    drop = tmp_path / "docs"
    _docs(spark, DOCS[6:8]).write.parquet(str(drop / "d1"))
    _docs(spark, DOCS[8:]).write.parquet(str(drop / "d2"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{drop}/*/")
    )
    q = start_fulltext_ingest(stream, path, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    full = str(tmp_path / "full")
    materialize_fulltext_index(docs, full, n_pfx=8, n_dpfx=4)
    assert _snapshot(spark, path) == _snapshot(spark, full)


def test_batch_face_equals_single_query_face(spark, tmp_path):
    from mbrainz_importer_spark.operators.fulltext import (
        fulltext_bm25_from_index_many,
    )

    path = str(tmp_path / "ft")
    materialize_fulltext_index(_docs(spark), path, n_pfx=8, n_dpfx=4)
    queries = ["vector table scan", "hash join", "merge sort"]
    batch = fulltext_bm25_from_index_many(
        spark, path, queries, k=5, mode="any"
    ).collect()
    by_qid = {}
    for r in batch:
        by_qid.setdefault(r["qid"], []).append(
            (r["doc"], r["n_matched"], r["score"])
        )
    for qid, q in enumerate(queries):
        single = [
            (r["doc"], r["n_matched"], r["score"])
            for r in fulltext_bm25_from_index(
                spark, path, q, k=5, mode="any"
            ).collect()
        ]
        assert sorted(by_qid.get(qid, [])) == sorted(single), q


def test_excision_empties_doclen_partition(spark, tmp_path):
    """Excising every doc that hashes to one dpfx partition must remove
    the emptied directory (dynamic overwrite cannot express an empty
    partition) — membership probes and stats repair then see the truth."""
    from mbrainz_importer_spark.operators.fulltext import (
        _doc_pfx,
        excise_fulltext_docs,
        repair_fulltext_stats,
    )

    docs = _docs(spark)
    path = str(tmp_path / "ft")
    materialize_fulltext_index(docs, path, n_pfx=8, n_dpfx=2)
    doclen = spark.read.parquet(path + "/doclen")
    target = doclen.select("dpfx").first()["dpfx"]
    doomed = doclen.where(F.col("dpfx") == target).select("doc")
    excise_fulltext_docs(spark, path, doomed)
    assert not os.path.exists(path + f"/doclen/dpfx={target}")
    # stats repair from the (now partially emptied) doclen agrees with
    # the arithmetically maintained stats
    maintained = spark.read.parquet(path + "/stats").collect()[0]
    repair_fulltext_stats(spark, path)
    repaired = spark.read.parquet(path + "/stats").collect()[0]
    assert tuple(maintained) == tuple(repaired)
