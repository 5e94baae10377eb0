"""Streaming dedup + stream-stream interval join: real readStream runs
(availableNow) must agree with the batch face, and the duplicate-drop
must actually drop a re-delivered row within the watermark horizon."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mbrainz_importer_spark.streaming.dedup import (
    dedup_within_horizon,
    join_within_interval,
)
from mbrainz_importer_spark.tables import load

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_dedup_stream"))
    load(spark, SF, "events").repartition(4).write.mode("overwrite").parquet(d)
    return d


def _run_append_to_memory(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_stream_dedup_key_set_equals_batch(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    out = _run_append_to_memory(
        spark,
        dedup_within_horizon(stream, ["user_id", "event_type"], horizon="365 days"),
        "t_dedup",
    )
    got = {(r["user_id"], r["event_type"]) for r in out.collect()}
    want = {
        (r["user_id"], r["event_type"])
        for r in load(spark, SF, "events")
        .select("user_id", "event_type").distinct().collect()
    }
    assert got == want
    # and it actually deduplicated: output rows == distinct keys
    assert out.count() == len(want)


def test_stream_redelivery_dropped(spark, tmp_path_factory):
    """Same key delivered twice (distinct event ids) inside the horizon:
    exactly one row survives."""
    d = tmp_path_factory.mktemp("redeliver")
    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 7, "click"),
         (2, "2024-01-01 10:00:30", 7, "click")],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.coalesce(1).write.mode("overwrite").parquet(str(d))
    stream = spark.readStream.schema(df.schema).parquet(str(d))
    out = _run_append_to_memory(
        spark,
        dedup_within_horizon(stream, ["user_id", "event_type"], horizon="10 minutes"),
        "t_redeliver",
    )
    assert out.count() == 1


def test_stream_interval_join_equals_batch(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema

    def split(df):
        clicks = df.where(F.col("event_type") == "click").select(
            F.col("user_id").alias("cu"), F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        purchases = df.where(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("pu"), F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        return clicks, purchases

    sc, sp = split(spark.readStream.schema(schema).parquet(events_dir))
    out = _run_append_to_memory(
        spark,
        join_within_interval(sc, sp, "cu", "pu", "click_ts", "purchase_ts"),
        "t_ssj",
    )
    bc, bp = split(load(spark, SF, "events"))
    batch = join_within_interval(bc, bp, "cu", "pu", "click_ts", "purchase_ts")
    cols = ["click_id", "purchase_id"]
    got = sorted(tuple(r) for r in out.select(*cols).collect())
    want = sorted(tuple(r) for r in batch.select(*cols).collect())
    assert got == want and len(want) > 0
