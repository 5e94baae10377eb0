"""Transaction watch — Datomic's `tx-report-queue` analog.

In Datomic, a connection's tx-report-queue delivers every committed
transaction (tx-data datoms) to listeners. Here the durable tx log is an
append-only parquet directory (the shape operators/idempotency.py sinks
write: data committed atomically with its tx stamp), and the report queue
is a Structured Streaming file source over it: each newly committed file
becomes a micro-batch of report datoms. The checkpoint IS the queue
cursor — a restarted listener resumes after the last delivered tx without
replay (exactly-once delivery of reports).

Scale: the file source lists only NEW files per trigger (no rescan of
history); attr filters push into the parquet scan so a listener watching
one attribute reads one column family's worth of bytes, not the log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TX_LOG_SCHEMA = "e string, a string, v_num double, tx long, added boolean"


def tx_report_stream(
    spark: SparkSession,
    log_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """The raw report queue: a stream of every datom appended to the log.
    `max_files_per_trigger` is the backpressure bound (SURVEY.md §2.7)."""
    reader = spark.readStream.schema(TX_LOG_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(log_dir)


def watch_attrs(reports: DataFrame, attrs: list[str]) -> DataFrame:
    """Restrict a report stream to the watched attributes — the common
    listener shape (`(filter #(watched? (:a %)) tx-data)`). Works on the
    batch face too (unified API): pass any datom DataFrame."""
    if not attrs:
        raise ValueError("watch_attrs needs at least one attribute")
    return reports.where(F.col("a").isin(attrs))


def watch_entities_of(reports: DataFrame, entity_prefix: str) -> DataFrame:
    """Listener filtered to one entity family (e.g. 'user:'). startswith
    is a pushdown-able predicate (StringStartsWith in parquet filters)."""
    return reports.where(F.col("e").startswith(entity_prefix))


def tx_summaries(reports: DataFrame) -> DataFrame:
    """Per-transaction report envelope: tx -> datom count, asserts,
    retracts — the {:tx-data ...} summary a reporting listener computes.

    On a BATCH DataFrame this is a plain aggregation. On the streaming
    face a bare groupBy is a global stateful aggregation that cannot run
    in append output mode — use `watch_summaries` (foreachBatch) for the
    per-micro-batch envelope, or run this under update/complete mode
    accepting stateful reaggregation. The per-batch envelope is complete
    only if a tx never spans files; the idempotent sink's committer
    guarantees exactly that (one batch = one atomic file set)."""
    return reports.groupBy("tx").agg(
        F.count(F.lit(1)).alias("n_datoms"),
        F.sum(F.when(F.col("added"), 1).otherwise(0)).cast("long").alias("n_asserts"),
        F.sum(F.when(~F.col("added"), 1).otherwise(0)).cast("long").alias("n_retracts"),
    )


def watch_summaries(reports: DataFrame, emit):
    """Streaming tx-report listener: a foreachBatch writer that computes
    `tx_summaries` over each micro-batch (a bounded, batch-mode
    DataFrame — no stateful aggregation, any output mode) and hands the
    envelope to `emit(envelope_df, batch_id)`. Returns the
    DataStreamWriter; callers add trigger/checkpoint options and
    .start(). This is the Datomic `(take! tx-report-queue)` loop shape:
    one delivered report per committed batch, exactly-once via the
    checkpointed cursor."""
    def _deliver(batch_df: DataFrame, batch_id: int) -> None:
        emit(tx_summaries(batch_df), batch_id)

    return reports.writeStream.foreachBatch(_deliver)
