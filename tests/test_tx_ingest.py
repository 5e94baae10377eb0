"""Streaming transactor (streaming/tx_ingest.py): ops stream into the
durable log; as-of over the accumulated store equals batch; replays
never double-write; compaction preserves the log and prunes."""

from __future__ import annotations

import pytest

from mbrainz_importer_spark.plans.history import as_of, read_log, tx_range
from mbrainz_importer_spark.streaming.tx_ingest import (
    compact_log,
    read_tx_log,
    start_tx_ingest,
)

OPS1 = [("u1", ":k/bal", 10.0, 1, True), ("u2", ":k/bal", 5.0, 1, True)]
OPS2 = [("u1", ":k/bal", 20.0, 2, True), ("u2", ":k/bal", 5.0, 3, False)]
SCHEMA = "e string, a string, v_num double, tx long, added boolean"


@pytest.fixture(scope="module")
def op_dirs(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("txops")
    spark.createDataFrame(OPS1, SCHEMA).write.parquet(str(d / "drop1"))
    spark.createDataFrame(OPS2, SCHEMA).write.parquet(str(d / "drop2"))
    return str(d)


def _stream(spark, op_dirs):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{op_dirs}/*/")
    )


def test_ingest_asof_equals_batch_and_replay(spark, op_dirs, tmp_path_factory):
    base = tmp_path_factory.mktemp("txlog")
    out, ckpt = str(base / "log"), str(base / "ckpt")

    q = start_tx_ingest(_stream(spark, op_dirs), out, ckpt)
    q.awaitTermination(120)

    log = read_tx_log(spark, out)
    batch_log = spark.createDataFrame(OPS1 + OPS2, SCHEMA)

    for t in (1, 2, 3):
        got = sorted(map(tuple, as_of(log, t).collect()))
        want = sorted(map(tuple, as_of(batch_log, t).collect()))
        assert got == want, t
    # state narrative: t=1 both present; t=2 u1 updated; t=3 u2 retracted
    final = {r["e"]: r["v_num"] for r in as_of(log, 3).collect()}
    assert final == {"u1": 20.0}

    assert sorted(map(tuple, tx_range(log, 2, 3).collect())) == sorted(
        map(tuple, tx_range(batch_log, 2, 3).collect())
    )

    # replay with a fresh checkpoint: batch-id anti-join, no growth
    n = log.count()
    q2 = start_tx_ingest(_stream(spark, op_dirs), out, str(base / "ckpt2"))
    q2.awaitTermination(120)
    assert read_tx_log(spark, out).count() == n == 4

    # compaction: same log content, attribute-partitioned layout
    store = str(base / "store")
    compact_log(spark, out, store)
    compacted = read_log(spark, store)
    assert sorted(map(tuple, compacted.collect())) == sorted(
        map(tuple, read_tx_log(spark, out).collect())
    )
    plan = (
        compacted.where("a = ':k/bal'")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [isnotnull(a" in plan, plan
