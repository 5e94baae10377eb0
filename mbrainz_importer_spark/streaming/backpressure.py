"""Backpressure + availability triggers (SURVEY.md §2.7).

`Trigger.AvailableNow` processes everything available at start and then
stops — the reference's bounded-import shape (drain the channel, exit) —
while `maxFilesPerTrigger` bounds how much of the backlog each micro-batch
admits: the file-source backpressure knob. Together they give a bounded
replay in several bounded micro-batches: a restartable catch-up job whose
peak memory is set by the trigger bound, not the backlog size — exactly
what lets a 100 TB backlog drain through fixed-size executors.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def replay_counts_available_now(
    spark: SparkSession,
    src_dir: str,
    schema: str,
    group_col: str = "event_type",
    max_files_per_trigger: int = 2,
    min_triggers: int = 2,
    timeout_s: int = 300,
) -> DataFrame:
    """Drain a parquet directory through an AvailableNow stream with
    per-trigger file backpressure, aggregating counts per `group_col`
    (complete mode -> memory sink). Asserts the drain actually took
    multiple micro-batches (>= min_triggers with input rows) — the
    backpressure bound observably sliced the backlog — then returns the
    final counts, which are trigger-slicing-invariant and therefore
    batch-equivalent."""
    name = f"replay_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="bp-ckpt-")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    agg = stream.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_events"))
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    fed = [p for p in q.recentProgress if p["numInputRows"] > 0]
    if len(fed) < min_triggers:
        raise RuntimeError(
            f"expected >= {min_triggers} data-carrying micro-batches under "
            f"maxFilesPerTrigger={max_files_per_trigger}, saw {len(fed)}"
        )
    return spark.table(name)
