"""Streaming document ingest into the materialized fulltext index —
the third ingest face next to tx_ingest.start_store_indexing (datom
store) and vector_ingest.start_ivf_ingest (IVF lists): arriving
document micro-batches fold through merge_fulltext_increment
(operators/fulltext.py), so the postings stay query-fresh per epoch
while each batch rewrites only the term-hash partitions it touches.

Replay-safe without a batch-id sink: the merge's membership probe
(doc-hash-pruned doclen anti-join) dissolves redelivered docs, so a
re-delivered epoch re-merges to the same index content and the same
stats. Tombstoned (excised) ids are dropped by the merge itself — the
delete-then-readd contract holds under streaming too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def start_fulltext_ingest(
    doc_stream: DataFrame,
    index_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> StreamingQuery:
    from ..operators.fulltext import merge_fulltext_increment

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        merge_fulltext_increment(
            batch_df.sparkSession,
            index_path,
            batch_df.select(id_col, text_col),
            id_col=id_col,
            text_col=text_col,
        )

    return (
        doc_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
