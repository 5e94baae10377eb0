"""Tx-metadata table: batch commits registered as transaction rows
(the reference asserts batch-id on the tx entity, batch.clj:36-37),
done-set served from the tiny tx table, crash-window heal."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from mbrainz_importer_spark.operators.idempotency import (
    BATCH_ID_COL,
    TxMetadataParquetSink,
)


def _batches(spark, ids):
    rows = [(f"orders-{i}", j) for i in ids for j in range(10 * i, 10 * i + 5)]
    return spark.createDataFrame(rows, f"{BATCH_ID_COL} string, payload long")


def test_load_registers_tx_rows(spark, tmp_path):
    sink = TxMetadataParquetSink(str(tmp_path / "facts"))
    out = sink.load(_batches(spark, [1, 2, 3]), spark)
    assert out == {"txes": 3, "datoms": 15}
    tx = {r[BATCH_ID_COL]: r["n_datoms"] for r in sink.tx_table(spark).collect()}
    assert tx == {"orders-1": 5, "orders-2": 5, "orders-3": 5}
    # done-set comes from the tx table and matches the data-derived ids
    done = {r[BATCH_ID_COL] for r in sink.done_ids(spark).collect()}
    data = {r[BATCH_ID_COL] for r in sink.data_ids(spark).collect()}
    assert done == data == {"orders-1", "orders-2", "orders-3"}


def test_reload_is_noop_and_incremental(spark, tmp_path):
    sink = TxMetadataParquetSink(str(tmp_path / "facts"))
    sink.load(_batches(spark, [1, 2]), spark)
    again = sink.load(_batches(spark, [1, 2]), spark)
    assert again == {"txes": 0, "datoms": 0}
    more = sink.load(_batches(spark, [1, 2, 3]), spark)
    assert more == {"txes": 1, "datoms": 5}
    total = spark.read.parquet(sink.path).count()
    assert total == 15  # no duplicate rows from the reloads


def test_heal_after_crash_between_appends(spark, tmp_path):
    """Simulate a crash AFTER the data append, BEFORE the tx append:
    the tx table is missing a batch the data sink has. heal() must
    register it and the next load must NOT re-append it."""
    sink = TxMetadataParquetSink(str(tmp_path / "facts"))
    sink.load(_batches(spark, [1, 2]), spark)
    # "crash": wipe the tx table entirely (worst case: both records lost)
    shutil.rmtree(sink.tx_path)
    assert sink.done_ids(spark).count() == 0  # tx-based done-set is blind
    healed = sink.heal(spark)
    assert healed == 2
    tx = {r[BATCH_ID_COL]: r["n_datoms"] for r in sink.tx_table(spark).collect()}
    assert tx == {"orders-1": 5, "orders-2": 5}
    # and load() itself heals first, so a restart straight into load is safe
    shutil.rmtree(sink.tx_path)
    out = sink.load(_batches(spark, [1, 2, 3]), spark)
    assert out == {"txes": 1, "datoms": 5}  # only the genuinely new batch
    assert spark.read.parquet(sink.path).count() == 15
    assert (
        spark.read.parquet(sink.path)
        .groupBy(BATCH_ID_COL, "payload").count()
        .where(F.col("count") > 1).count()
    ) == 0  # zero duplicated facts


def test_heal_idempotent(spark, tmp_path):
    sink = TxMetadataParquetSink(str(tmp_path / "facts"))
    sink.load(_batches(spark, [1]), spark)
    assert sink.heal(spark) == 0
    assert sink.heal(spark) == 0
    assert sink.tx_table(spark).count() == 1
