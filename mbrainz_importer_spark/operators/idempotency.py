"""Exactly-once idempotent batch loading (SURVEY.md §2.1 K2/K3, §2.7, §3.3).

The reference's protocol (cognitect/xform/batch.clj:42-60,93-101;
importer.clj:298-316):

  1. query the target for already-loaded batch ids       (already-transacted)
  2. anti-join the incoming batch stream against them    (filter-batches, J5)
  3. write each batch with its batch-id asserted atomically WITH the data
     (`(cons batch-ident data)` — same transaction)
  4. a concurrent-duplicate conflict is swallowed as already-applied

Spark-first realization: the batch_id is a COLUMN on every row, so a
parquet append of a batch carries its id atomically with its data (one
file-commit per job); restart recomputes the done-set from the sink itself.
Partial-job failures are handled by Spark's output-committer (uncommitted
task files are invisible), so the done-set only ever contains fully
committed batches. This is the canonical `foreachBatch` idempotent-sink
recipe in batch clothing, and it needs no retry/backoff of its own — task
retries (`spark.task.maxFailures`) + committer atomicity replace the
reference's busy/unavailable/429/503 backoff loop (batch.clj:62-91), which
only exists because its sink is a remote transactor. For sinks that DO
commit per call (JDBC/REST/transactor via foreachBatch), that loop is
back in `operators/retry.py` with the same classification and
conflict-swallow semantics.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

BATCH_ID_COL = "batch_id"


@dataclass
class IdempotentParquetSink:
    """Append-only parquet table keyed by an embedded batch_id column."""

    path: str

    def done_ids(self, spark: SparkSession) -> DataFrame:
        """already-transacted (batch.clj:46-60): distinct batch ids present
        in the sink. Column-pruned scan — only batch_id pages are read."""
        try:
            return spark.read.parquet(self.path).select(BATCH_ID_COL).distinct()
        except AnalysisException:  # sink does not exist yet
            return spark.createDataFrame([], f"{BATCH_ID_COL} string")

    def filter_new(self, batches: DataFrame, spark: SparkSession) -> DataFrame:
        """filter-batches (batch.clj:42-44): drop already-loaded batches.
        The done-set is small (one id per 100 entities) — broadcast anti."""
        done = self.done_ids(spark)
        return batches.join(
            F.broadcast(done), on=BATCH_ID_COL, how="left_anti"
        )

    def load(self, batches: DataFrame, spark: SparkSession) -> dict:
        """load-parallel analog (batch.clj:115-135): write all not-yet-done
        batches; parallelism is partition-level. Returns
        {'txes': n_batches_written, 'datoms': n_rows_written} — the
        reference's result fold (G8)."""
        todo = self.filter_new(batches, spark)
        stats = todo.agg(
            F.countDistinct(BATCH_ID_COL).alias("txes"),
            F.count(F.lit(1)).alias("datoms"),
        ).collect()[0]
        if stats["txes"]:
            todo.write.mode("append").parquet(self.path)
        return {"txes": stats["txes"], "datoms": stats["datoms"]}


def load_envelopes(
    sink: IdempotentParquetSink, envelopes: DataFrame, spark: SparkSession
) -> dict:
    """Load envelope-shaped batches (batch_id, data array<struct>) by
    exploding members back to rows with the batch_id column attached."""
    rows = envelopes.select(
        F.col(BATCH_ID_COL), F.explode("data").alias("m")
    ).select(BATCH_ID_COL, "m.*")
    return sink.load(rows, spark)
