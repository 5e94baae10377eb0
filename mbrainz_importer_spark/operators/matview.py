"""Incremental view maintenance for additive aggregates — the fourth
member of the materialized-and-maintained family (attribute-partitioned
datoms, IVF inverted lists, term-partitioned postings, now grouped
aggregates). The classic IVM identity: SUM/COUNT group states merge by
addition, so folding an increment's partial aggregate into the stored
view costs O(increment + touched partitions) and never re-reads the
base corpus — at 100 TB the difference between "refresh the dashboard"
and "rescan the lake".

Layout under one root path:
  state/kpfx=<h>/   (group keys..., measure sums, cnt)  — key-hash
      partitions; an increment touches only the partitions its groups
      hash to (dynamic overwrite, staged through disk per the
      _stage_merge contract).
  batches/          applied batch ids — the exactly-once ledger.
      Addition is NOT idempotent (re-applying a delta double-counts),
      so redelivery safety comes from the ledger, the same contract
      streaming/exactly_once.py gives sinks: a replayed batch id is
      skipped whole.
  _meta.json        key columns, measure columns, partition fan-out.

COUNT rides along as SUM(1); AVG and friends derive at read time from
(sum, cnt). MIN/MAX are NOT mergeable under retraction and are
deliberately out of scope (they'd need the full group re-derived);
deletes enter as negative deltas, the standard IVM treatment.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _key_pfx(keys: list[str], n_kpfx: int) -> F.Column:
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_kpfx))


def _agg_state(
    df: DataFrame,
    keys: list[str],
    measures: list[str],
    weight_col: str | None = None,
) -> DataFrame:
    """Partial-aggregate to group states. With `weight_col` each row
    contributes `weight` times (weight -1 = the standard IVM delete
    delta); without it every row weighs 1."""
    if weight_col is None:
        return df.groupBy(*keys).agg(
            *[F.sum(m).alias(f"sum_{m}") for m in measures],
            F.count(F.lit(1)).cast("long").alias("cnt"),
        )
    w = F.col(weight_col).cast("long")
    return df.groupBy(*keys).agg(
        *[F.sum(F.col(m) * w).alias(f"sum_{m}") for m in measures],
        F.sum(w).cast("long").alias("cnt"),
    )


def materialize_agg_view(
    df: DataFrame,
    path: str,
    keys: list[str],
    measures: list[str],
    n_kpfx: int = 32,
) -> None:
    """Build the grouped-aggregate state from scratch (the initial
    refresh; increments go through `merge_agg_increment`)."""
    state = _agg_state(df, keys, measures).withColumn(
        "kpfx", _key_pfx(keys, n_kpfx)
    )
    state.write.mode("overwrite").partitionBy("kpfx").parquet(
        path + "/state"
    )
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "_meta.json"), "w") as f:
        json.dump({"keys": keys, "measures": measures, "n_kpfx": n_kpfx}, f)


def _read_meta(path: str) -> dict:
    with open(os.path.join(path, "_meta.json")) as f:
        return json.load(f)


def read_agg_view(spark, path: str) -> DataFrame:
    meta = _read_meta(path)
    cols = (
        meta["keys"]
        + [f"sum_{m}" for m in meta["measures"]]
        + ["cnt"]
    )
    return spark.read.parquet(path + "/state").select(*cols)


def _applied_batches(spark, path: str) -> set[str]:
    b = path + "/batches"
    if not os.path.exists(b):
        return set()
    return {r["batch_id"] for r in spark.read.parquet(b).collect()}


def merge_agg_increment(
    spark,
    path: str,
    delta: DataFrame,
    batch_id: str,
    weight_col: str | None = None,
) -> None:
    """Fold an increment into the view: partial-aggregate the delta
    (map-side combine — the increment shrinks to its group states
    before it ever shuffles), prune the stored state to the touched
    key-hash partitions, ADD group states, dynamic-overwrite only those
    partitions. Groups summing to zero rows (cnt 0 after a pure
    retraction delta) drop out of the state.

    `batch_id` is the exactly-once handle: an id already in the ledger
    is skipped whole (addition double-counts under redelivery, so the
    replay contract here is the ledger, not content idempotence). The
    crash protocol makes the two-write commit safe in either order of
    failure: (1) the merged touched partitions stage to disk and the
    stage is stamped with the batch id, (2) the ledger row commits,
    (3) the stage overwrites the state, (4) the stage drops. Every
    merge first runs recovery: a leftover stage whose stamp IS in the
    ledger rolls FORWARD (the overwrite replays from the stage —
    byte-identical, hence idempotent); a stage whose stamp is absent
    rolls BACK (dropped — the state was never touched, and the batch
    will re-apply cleanly when redelivered)."""
    _recover(spark, path)
    if batch_id in _applied_batches(spark, path):
        return
    meta = _read_meta(path)
    keys, measures, n_kpfx = meta["keys"], meta["measures"], meta["n_kpfx"]
    d = _agg_state(delta, keys, measures, weight_col).withColumn(
        "kpfx", _key_pfx(keys, n_kpfx)
    )
    staged_delta = path + "/delta_staging"
    d.write.mode("overwrite").parquet(staged_delta)
    try:
        d = spark.read.parquet(staged_delta)
        touched = sorted(
            r[0] for r in d.select("kpfx").distinct().collect()
        )
        if not touched:
            _commit_batch(spark, path, batch_id)
            return
        sum_cols = [f"sum_{m}" for m in measures]
        existing = (
            spark.read.parquet(path + "/state")
            .where(F.col("kpfx").isin(touched))
            .select(*keys, *sum_cols, "cnt", "kpfx")
        )
        merged = (
            existing.unionByName(d.select(*keys, *sum_cols, "cnt", "kpfx"))
            .groupBy(*keys)
            .agg(
                *[F.sum(c).alias(c) for c in sum_cols],
                F.sum("cnt").cast("long").alias("cnt"),
            )
            .where(F.col("cnt") != 0)
            .withColumn("kpfx", _key_pfx(keys, n_kpfx))
        )
        cols = keys + sum_cols + ["cnt", "kpfx"]
        stage = _stage_path(path)
        merged.select(*cols).write.mode("overwrite").parquet(stage)
        with open(os.path.join(stage, "_BATCH"), "w") as f:
            json.dump({"batch_id": batch_id, "touched": touched}, f)
        _commit_batch(spark, path, batch_id)
        _overwrite_from_stage(spark, path, touched)
        shutil.rmtree(stage)
    finally:
        if os.path.exists(staged_delta):
            shutil.rmtree(staged_delta)


def _stage_path(path: str) -> str:
    return path + "/state.__merge_staging"


def _overwrite_from_stage(spark, path: str, touched: list) -> None:
    """Dynamic-overwrite the touched state partitions from the staged
    merge — byte-deterministic, so replaying it after a crash is a
    no-op beyond the first completion. A touched partition whose every
    group retracted to zero has NO staged rows; dynamic overwrite
    cannot express an empty partition, so its directory is removed
    explicitly (the datom-store merge's emptied-partition rule)."""
    staged = spark.read.parquet(_stage_path(path))
    remaining = {r[0] for r in staged.select("kpfx").distinct().collect()}
    mode_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(mode_key, "static")
    spark.conf.set(mode_key, "dynamic")
    try:
        staged.write.mode("overwrite").partitionBy("kpfx").parquet(
            path + "/state"
        )
    finally:
        spark.conf.set(mode_key, prev)
    for k in set(touched) - remaining:
        d = os.path.join(path, "state", f"kpfx={k}")
        if os.path.exists(d):
            shutil.rmtree(d)


def _recover(spark, path: str) -> None:
    """Finish or undo a crashed merge (see merge_agg_increment)."""
    stage = _stage_path(path)
    if not os.path.exists(stage):
        return
    marker = os.path.join(stage, "_BATCH")
    if os.path.exists(marker):
        with open(marker) as f:
            stamp = json.load(f)
        if stamp["batch_id"] in _applied_batches(spark, path):
            _overwrite_from_stage(spark, path, stamp["touched"])
    shutil.rmtree(stage)


def _commit_batch(spark, path: str, batch_id: str) -> None:
    from .localrel import local_df

    local_df(spark, [(batch_id,)], "batch_id string").coalesce(
        1
    ).write.mode("append").parquet(path + "/batches")
