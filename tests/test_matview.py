"""Incremental view maintenance (operators/matview.py): the additive-
aggregate state must equal a full rebuild after any merge sequence,
redelivered batches must be skipped by the ledger, deletes enter as
negative-weight deltas, and the crash protocol rolls forward or back
depending on whether the ledger committed.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from mbrainz_importer_spark.operators.matview import (
    _recover,
    _stage_path,
    materialize_agg_view,
    merge_agg_increment,
    read_agg_view,
)

ROWS = [(i, i % 5, (i + 1) * 10) for i in range(40)]  # (id, grp, amt)


def _rows(spark, rows=None):
    return spark.createDataFrame(
        rows or ROWS, "id long, grp long, amt long"
    )


def _state(spark, path):
    return sorted(tuple(r) for r in read_agg_view(spark, path).collect())


def _rebuild(spark, df, tmp_path, name):
    p = str(tmp_path / name)
    materialize_agg_view(df, p, keys=["grp"], measures=["amt"])
    return _state(spark, p)


def test_incremental_equals_full_rebuild(spark, tmp_path):
    df = _rows(spark)
    path = str(tmp_path / "mv")
    materialize_agg_view(
        df.where(F.col("id") < 30), path, keys=["grp"], measures=["amt"]
    )
    merge_agg_increment(spark, path, df.where(F.col("id") >= 30), "b1")
    assert _state(spark, path) == _rebuild(spark, df, tmp_path, "full")


def test_ledger_skips_redelivered_batch(spark, tmp_path):
    df = _rows(spark)
    path = str(tmp_path / "mv")
    materialize_agg_view(
        df.where(F.col("id") < 30), path, keys=["grp"], measures=["amt"]
    )
    inc = df.where(F.col("id") >= 30)
    merge_agg_increment(spark, path, inc, "b1")
    before = _state(spark, path)
    merge_agg_increment(spark, path, inc, "b1")  # redelivery
    assert _state(spark, path) == before


def test_negative_weight_delete(spark, tmp_path):
    df = _rows(spark)
    path = str(tmp_path / "mv")
    materialize_agg_view(df, path, keys=["grp"], measures=["amt"])
    doomed = df.where(F.col("id") % 4 == 0).withColumn("w", F.lit(-1))
    merge_agg_increment(spark, path, doomed, "del1", weight_col="w")
    kept = df.where(F.col("id") % 4 != 0)
    assert _state(spark, path) == _rebuild(spark, kept, tmp_path, "kept")


def test_group_retracted_to_zero_drops_out(spark, tmp_path):
    df = _rows(spark)
    path = str(tmp_path / "mv")
    materialize_agg_view(df, path, keys=["grp"], measures=["amt"])
    doomed = df.where(F.col("grp") == 2).withColumn("w", F.lit(-1))
    merge_agg_increment(spark, path, doomed, "del_grp2", weight_col="w")
    state = read_agg_view(spark, path)
    assert state.where(F.col("grp") == 2).count() == 0
    assert state.count() == 4


def test_crash_rolls_forward_when_ledger_committed(spark, tmp_path):
    """Simulated crash between ledger commit and state overwrite: the
    stamped stage + ledger row exist, the state is stale. Recovery
    (which every merge runs first) must replay the overwrite."""
    from mbrainz_importer_spark.operators.matview import _commit_batch

    df = _rows(spark)
    path = str(tmp_path / "mv")
    materialize_agg_view(
        df.where(F.col("id") < 30), path, keys=["grp"], measures=["amt"]
    )
    # hand-build the stage a completed merge would have written
    from mbrainz_importer_spark.operators.matview import _agg_state, _key_pfx

    full = (
        _agg_state(df, ["grp"], ["amt"])
        .withColumn("kpfx", _key_pfx(["grp"], 32))
    )
    stage = _stage_path(path)
    full.select("grp", "sum_amt", "cnt", "kpfx").write.mode(
        "overwrite"
    ).parquet(stage)
    touched = sorted(
        r[0] for r in full.select("kpfx").distinct().collect()
    )
    with open(os.path.join(stage, "_BATCH"), "w") as f:
        json.dump({"batch_id": "b1", "touched": touched}, f)
    _commit_batch(spark, path, "b1")
    # crash here: overwrite never ran; recovery must finish it
    _recover(spark, path)
    assert not os.path.exists(stage)
    assert _state(spark, path) == _rebuild(spark, df, tmp_path, "full")
    # and the batch stays applied: a redelivery is a no-op
    merge_agg_increment(spark, path, df.where(F.col("id") >= 30), "b1")
    assert _state(spark, path) == _rebuild(spark, df, tmp_path, "full2")


def test_crash_rolls_back_without_ledger(spark, tmp_path):
    """Simulated crash between stage write and ledger commit: the stage
    exists but the ledger never saw the batch. Recovery must drop the
    stage untouched, and the redelivered batch then applies cleanly."""
    df = _rows(spark)
    path = str(tmp_path / "mv")
    materialize_agg_view(
        df.where(F.col("id") < 30), path, keys=["grp"], measures=["amt"]
    )
    before = _state(spark, path)
    from mbrainz_importer_spark.operators.matview import _agg_state, _key_pfx

    junk = (
        _agg_state(df, ["grp"], ["amt"])
        .withColumn("kpfx", _key_pfx(["grp"], 32))
    )
    stage = _stage_path(path)
    junk.select("grp", "sum_amt", "cnt", "kpfx").write.mode(
        "overwrite"
    ).parquet(stage)
    touched = sorted(
        r[0] for r in junk.select("kpfx").distinct().collect()
    )
    with open(os.path.join(stage, "_BATCH"), "w") as f:
        json.dump({"batch_id": "b1", "touched": touched}, f)
    # no ledger commit — rollback
    _recover(spark, path)
    assert not os.path.exists(stage)
    assert _state(spark, path) == before
    merge_agg_increment(spark, path, df.where(F.col("id") >= 30), "b1")
    assert _state(spark, path) == _rebuild(spark, df, tmp_path, "full")


def test_merge_touches_only_hashed_partitions(spark, tmp_path):
    df = _rows(spark)
    path = str(tmp_path / "mv")
    materialize_agg_view(df, path, keys=["grp"], measures=["amt"])

    def files():
        out = {}
        for root, _d, fs in os.walk(path + "/state"):
            for f in fs:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[p] = (os.path.getsize(p), os.path.getmtime(p))
        return out

    before = files()
    # increment touches only group 1's partition
    merge_agg_increment(
        spark, path, _rows(spark, [(100, 1, 7)]), "b_one_group"
    )
    after = files()
    changed_dirs = {
        os.path.dirname(p)
        for p in (set(after) - set(before))
        | {p for p in before if p not in after or after[p] != before[p]}
    }
    assert len(changed_dirs) == 1
    untouched = {
        p: s for p, s in before.items()
        if os.path.dirname(p) not in changed_dirs
    }
    assert all(after[p] == s for p, s in untouched.items())


def test_streaming_agg_ingest(spark, tmp_path):
    """Row micro-batches stream into the view; the drained state equals
    a full rebuild over base + arrivals."""
    from mbrainz_importer_spark.streaming.agg_ingest import start_agg_ingest

    df = _rows(spark)
    path = str(tmp_path / "mv")
    materialize_agg_view(
        df.where(F.col("id") < 20), path, keys=["grp"], measures=["amt"]
    )
    drop = tmp_path / "rows"
    # one file per arrival batch: each file is one foreachBatch epoch
    # (a multi-file write would shatter into one epoch per part file
    # and the per-epoch merge overhead would dominate the test)
    _rows(spark, ROWS[20:30]).coalesce(1).write.parquet(str(drop / "d1"))
    _rows(spark, ROWS[30:]).coalesce(1).write.parquet(str(drop / "d2"))
    stream = (
        spark.readStream.schema("id long, grp long, amt long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{drop}/*/")
    )
    q = start_agg_ingest(stream, path, str(tmp_path / "ckpt"))
    assert q.awaitTermination(300), "ingest did not drain in time"
    assert _state(spark, path) == _rebuild(spark, df, tmp_path, "full")
