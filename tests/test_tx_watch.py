"""tx-report-queue analog: new appends are delivered exactly once across
listener restarts (checkpoint = queue cursor); attr/entity filters work."""

from __future__ import annotations

from mbrainz_importer_spark.streaming.tx_watch import (
    TX_LOG_SCHEMA,
    tx_report_stream,
    tx_summaries,
    watch_attrs,
    watch_entities_of,
)


def _append(spark, log_dir: str, rows: list[tuple]) -> None:
    spark.createDataFrame(rows, TX_LOG_SCHEMA).coalesce(1).write.mode("append").parquet(log_dir)


def _drain(spark, stream_df, name: str, checkpoint: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").collect()


def _drain_to_files(spark, stream_df, out_dir: str, checkpoint: str):
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out_dir).collect()


def test_reports_delivered_once_across_restarts(spark, tmp_path):
    log = str(tmp_path / "txlog")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "delivered")
    _append(spark, log, [("u:1", ":a", 1.0, 1, True), ("u:2", ":a", 2.0, 2, True)])

    first = _drain_to_files(spark, tx_report_stream(spark, log), out, ckpt)
    assert {r["tx"] for r in first} == {1, 2}

    # new commit lands; a RESTARTED listener on the same checkpoint
    # delivers only the new datoms — the queue cursor survived, nothing
    # is replayed (total delivered = 2 old + 2 new, no duplicates)
    _append(spark, log, [("u:1", ":b", 3.0, 3, True), ("u:1", ":a", 1.0, 3, False)])
    total = _drain_to_files(spark, tx_report_stream(spark, log), out, ckpt)
    assert len(total) == 4
    assert sorted(r["tx"] for r in total) == [1, 2, 3, 3]


def test_watch_filters_batch_face(spark):
    datoms = spark.createDataFrame(
        [
            ("user:1", ":user/click", 1.0, 1, True),
            ("user:2", ":user/buy", 2.0, 2, True),
            ("order:9", ":order/total", 30.0, 2, True),
        ],
        TX_LOG_SCHEMA,
    )
    assert {r["a"] for r in watch_attrs(datoms, [":user/buy"]).collect()} == {":user/buy"}
    assert {r["e"] for r in watch_entities_of(datoms, "user:").collect()} == {
        "user:1",
        "user:2",
    }
    summary = {r["tx"]: (r["n_datoms"], r["n_asserts"], r["n_retracts"])
               for r in tx_summaries(datoms).collect()}
    assert summary == {1: (1, 1, 0), 2: (2, 2, 0)}


def test_watch_attrs_streaming_filter(spark, tmp_path):
    log = str(tmp_path / "txlog2")
    ckpt = str(tmp_path / "ckpt2")
    _append(
        spark,
        log,
        [
            ("user:1", ":user/click", 1.0, 1, True),
            ("user:1", ":user/buy", 9.0, 1, True),
            ("user:2", ":user/click", 2.0, 2, True),
        ],
    )
    rows = _drain(
        spark, watch_attrs(tx_report_stream(spark, log), [":user/buy"]), "w3", ckpt
    )
    assert [(r["e"], r["a"]) for r in rows] == [("user:1", ":user/buy")]
