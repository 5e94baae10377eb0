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
