"""Exactly-once streaming sink (SURVEY.md §2.7 'Exactly-once sink').

The reference's protocol — batch-id asserted atomically with the data,
restart skips present ids, duplicate delivery swallowed
(cognitect/xform/batch.clj:93-101) — is precisely Structured Streaming's
canonical idempotent `foreachBatch` recipe. We reuse the batch-mode
IdempotentParquetSink: the micro-batch id becomes the batch_id column, so
a retried/replayed micro-batch (same epoch id) is filtered out by the
anti-join and the write is a no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.idempotency import BATCH_ID_COL, IdempotentParquetSink


def idempotent_foreach_batch(sink: IdempotentParquetSink, prefix: str = "epoch"):
    """Returns the (batch_df, batch_id) function for
    DataStreamWriter.foreachBatch."""

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        with_id = batch_df.withColumn(
            BATCH_ID_COL, F.concat_ws("-", F.lit(prefix), F.lit(epoch_id))
        )
        sink.load(with_id, batch_df.sparkSession)

    return write


def start_exactly_once(
    stream: DataFrame,
    sink_path: str,
    checkpoint: str,
    prefix: str = "epoch",
) -> StreamingQuery:
    """Wire a stream into the idempotent sink with availableNow (process
    everything pending, then stop — the reference's bounded-stream mode)."""
    sink = IdempotentParquetSink(sink_path)
    return (
        stream.writeStream.foreachBatch(idempotent_foreach_batch(sink, prefix))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
