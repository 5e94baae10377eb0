"""Streaming aggregation into the maintained view — the fourth ingest
face (datoms, vectors, docs, now grouped aggregates): each micro-batch
partial-aggregates and folds into the stored state through
merge_agg_increment (operators/matview.py).

Exactly-once comes from composing Structured Streaming's replay with
the view's ledger: foreachBatch re-delivers a batch with the SAME
epoch id after a failure, the epoch id IS the ledger batch id, so the
replayed delta is skipped whole — the canonical idempotent-sink recipe
(checkpoint gives at-least-once, the target dedupes on batch id), and
the view's stamped-stage crash protocol covers a crash inside the
merge itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def start_agg_ingest(
    row_stream: DataFrame,
    view_path: str,
    checkpoint: str,
    ledger_prefix: str = "epoch",
    weight_col: str | None = None,
) -> StreamingQuery:
    from ..operators.matview import merge_agg_increment

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        merge_agg_increment(
            batch_df.sparkSession,
            view_path,
            batch_df,
            batch_id=f"{ledger_prefix}_{epoch_id}",
            weight_col=weight_col,
        )

    return (
        row_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
