"""applyInPandasWithState: state persists across micro-batches and the
final emitted state equals the batch aggregation."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mbrainz_importer_spark.streaming.stateful import running_user_totals
from mbrainz_importer_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_stateful_totals_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "src")
    ev = load(spark, SF, "events").select("user_id", "value", "event_id")
    # two separate file lands => at least two micro-batches with maxFilesPerTrigger=1
    ev.where(F.col("event_id") % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    ev.where(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("stateful_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # update mode: several rows per user (one per micro-batch); the LAST
    # emitted state per user must equal the batch aggregate
    emitted = spark.sql("SELECT * FROM stateful_totals").collect()
    assert len(emitted) > 0
    last = {}
    for r in emitted:  # memory sink appends in emission order
        last[r["user_id"]] = (r["n_events"], round(r["total_value"], 4))

    batch = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 4))
        for r in running_user_totals(load(spark, SF, "events")).collect()
    }
    assert last == batch
    # state actually accumulated across micro-batches (not reset):
    multi = [u for u in last if last[u][0] > 1]
    assert multi, "expected users with events in both micro-batches"
