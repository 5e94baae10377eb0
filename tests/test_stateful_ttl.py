"""GroupStateTimeout eviction: prove idle-key state is DROPPED after the
TTL fires (bounded state at scale) and that a returning key restarts
from zero — VERDICT r1 next-round item #10."""

from __future__ import annotations

import os
import time

import pytest

from mbrainz_importer_spark.streaming.stateful import running_user_totals_ttl


def _write_batch_file(spark, d: str, rows, mtime: float) -> None:
    sub = os.path.join(d, f"f{mtime}")
    df = spark.createDataFrame(rows, "user_id long, value double")
    df.coalesce(1).write.mode("overwrite").parquet(sub)
    # the file source orders files by modification time; pin it so each
    # parquet dir becomes its own deterministic micro-batch
    for root, _, files in os.walk(sub):
        for f in files:
            os.utime(os.path.join(root, f), (mtime, mtime))


def test_stateful_ttl_eviction(spark, tmp_path):
    d = str(tmp_path / "in")
    os.makedirs(d)
    t0 = time.time() - 100
    # batch 1: users 1 and 2; batch 2: only user 2 (user 1 idles out);
    # batch 3: user 1 returns after eviction
    _write_batch_file(spark, d, [(1, 10.0), (2, 5.0)], t0)
    _write_batch_file(spark, d, [(2, 7.0)], t0 + 10)
    _write_batch_file(spark, d, [(1, 99.0)], t0 + 20)

    schema = "user_id long, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = running_user_totals_ttl(stream, ttl_ms=1)
    # state-store partition count is fixed at query start from
    # shuffle.partitions; 2 keys don't need 32 stores x 3 batches of
    # Python state workers — drop to 2 for this query only
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    q = None
    try:
        q = (
            out.writeStream.format("memory")
            .queryName("t_ttl")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        # ProcessingTimeTimeout keeps scheduling no-data micro-batches to
        # service future timeouts, so availableNow never self-terminates —
        # poll for the rows the assertions need, then stop explicitly.
        deadline = time.time() + 120
        rows: list = []
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM t_ttl").collect()
            have_tombstone = any(r["user_id"] == 1 and r["evicted"] for r in rows)
            have_reset = any(
                r["user_id"] == 1 and not r["evicted"] and r["total_value"] == 99.0
                for r in rows
            )
            if have_tombstone and have_reset:
                break
            time.sleep(0.5)
    finally:
        if q is not None:
            q.stop()
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    evicted = [r for r in rows if r["evicted"]]
    live_u1 = [r for r in rows if r["user_id"] == 1 and not r["evicted"]]

    # user 1 was evicted with its pre-eviction totals...
    assert any(r["user_id"] == 1 and r["n_events"] == 1 and r["total_value"] == 10.0
               for r in evicted), f"no eviction tombstone for user 1: {rows}"
    # ...and its post-eviction reappearance restarted from ZERO state
    assert any(r["n_events"] == 1 and r["total_value"] == 99.0 for r in live_u1), (
        f"user 1 state not dropped (totals carried across eviction): {rows}"
    )
    # user 2 was active in both early batches and accumulated normally
    u2_counts = sorted(r["n_events"] for r in rows
                       if r["user_id"] == 2 and not r["evicted"])
    assert u2_counts[-1] == 2
