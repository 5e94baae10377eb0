"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.7 — the escape hatch for operators Spark's built-in
windows can't express; the reference's analog is its stateful
counters/atoms, cognitect/xform/batch.clj:35).

`running_user_totals`: per-user running event count + value sum,
updated per micro-batch, emitted as change rows. State is a single
(count, total) pair per key — O(keys) state, GroupStateTimeout can bound
it by inactivity for unbounded key spaces.

Works in batch mode too (groupBy fallback) so the operator has one
declared semantics — and the batch path is what the DuckDB oracle can
check.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType([
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, round(total, 6)))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "total_value": [round(total, 6)]})


def running_user_totals(df: DataFrame) -> DataFrame:
    """Streaming: stateful per-user totals (one emitted row per user per
    micro-batch). Batch: the same result via plain aggregation."""
    if df.isStreaming:
        return df.groupBy("user_id").applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    return df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


TTL_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
    StructField("evicted", BooleanType()),
])


def running_user_totals_ttl(df: DataFrame, ttl_ms: int = 60_000) -> DataFrame:
    """`running_user_totals` with BOUNDED state: keys idle for `ttl_ms`
    of processing time are evicted (state.remove()) and emit one final
    tombstone row with evicted=true. This is what keeps state O(active
    keys) instead of O(all keys ever seen) on an unbounded key space —
    the 100 TB requirement for any long-running stateful stream. A key
    seen again after eviction restarts from zero (proved by
    test_stateful_ttl_eviction)."""
    if not df.isStreaming:
        raise ValueError("running_user_totals_ttl is streaming-only")

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame({
                "user_id": [user_id], "n_events": [n],
                "total_value": [total], "evicted": [True],
            })
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, round(total, 6)))
        state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({
            "user_id": [user_id], "n_events": [n],
            "total_value": [round(total, 6)], "evicted": [False],
        })

    return df.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=TTL_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
