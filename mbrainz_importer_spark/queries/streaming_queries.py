"""Streaming-window queries for the driver gate, run in batch mode over the
events table (the unified-API equivalence: identical results streaming or
batch; tests/test_streaming.py proves the streaming side)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming.windows import session_counts, sliding_counts, tumbling_counts
from ..tables import load


def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return tumbling_counts(ev).orderBy("window_start", "event_type")


def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return sliding_counts(ev).orderBy("window_start")


def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return session_counts(ev).orderBy("user_id", "session_start")


def stream_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face of the applyInPandasWithState operator
    (streaming/stateful.py) — one declared semantics, two execution modes;
    the streaming side is proven equal in tests/test_stateful_streaming.py."""
    from ..streaming.stateful import running_user_totals

    ev = load(spark, sf_dir, "events")
    return running_user_totals(ev).orderBy("user_id")


def stream_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face of dropDuplicatesWithinWatermark (streaming/dedup.py):
    the surviving KEY SET is deterministic (which duplicate row survives
    is arrival-order-dependent by design, so the gate projects keys)."""
    from ..streaming.dedup import dedup_within_horizon

    ev = load(spark, sf_dir, "events")
    return (
        dedup_within_horizon(ev, ["user_id", "event_type"])
        .select("user_id", "event_type")
        .orderBy("user_id", "event_type")
    )


def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face of the watermarked stream-stream interval join
    (streaming/dedup.py): purchases within 30 minutes after a
    same-user click."""
    from pyspark.sql import functions as F

    from ..streaming.dedup import join_within_interval

    ev = load(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return (
        join_within_interval(
            clicks, purchases,
            left_key="cu", right_key="pu",
            left_ts="click_ts", right_ts="purchase_ts",
            within="30 minutes",
        )
        .select(
            F.col("cu").alias("user_id"), "click_id", "purchase_id",
            "click_ts", "purchase_ts",
        )
        .orderBy("user_id", "click_id", "purchase_id")
    )


def stream_dim_enriched_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face of the stream-static broadcast enrichment + tumbling
    agg (streaming/windows.py:dim_enriched_tumbling_counts); the
    streaming side is proven equal in tests/test_streaming.py."""
    from ..streaming.windows import dim_enriched_tumbling_counts

    ev = load(spark, sf_dir, "events")
    dim = load(spark, sf_dir, "customer")
    return dim_enriched_tumbling_counts(ev, dim).orderBy("window_start", "segment")


def stream_backpressure_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming run inside the gate: the events table is laid out
    as 8 parquet files and drained through Trigger.AvailableNow with
    maxFilesPerTrigger=2 — at least 3 data-carrying micro-batches (the
    backpressure bound observably slices the backlog; the operator
    raises otherwise) — and the complete-mode counts equal the batch
    aggregation, which is what the DuckDB oracle checks."""
    import tempfile

    from ..streaming.backpressure import replay_counts_available_now

    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "user_id")
    src = tempfile.mkdtemp(prefix="bp-src-")
    ev.repartition(8).write.mode("overwrite").parquet(src)
    return replay_counts_available_now(
        spark,
        src,
        schema="event_id long, event_type string, user_id long",
        group_col="event_type",
        max_files_per_trigger=2,
        min_triggers=3,
    ).orderBy("event_type")


def stream_layout_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming run inside the gate: the bucketed orders layout
    builds from 90% of the corpus, the remaining 10% drains through
    `streaming/layout_ingest.py:start_layout_ingest` in at least two
    file-sliced micro-batches (two single-file drops,
    maxFilesPerTrigger=1), each committed by the exactly-once manifest
    append with the in-sink compaction cadence (compact_after_files=1
    restores the single-file invariant every epoch). The q3-shaped
    orderkey join over the drained layout must hash-equal the
    full-corpus oracle — stream in, layout out, the maintenance cycle
    certified invisible. The base table rebuilds each run (fresh
    checkpoint + drop dirs), so re-runs stay hash-stable."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from ..plans.eav import _table_buckets
    from ..sources.bucketed import write_bucketed
    from ..streaming.layout_ingest import start_layout_ingest
    from .core import _BUCKETED_O_COLS, _bucketed_facts

    li, _o = _bucketed_facts(spark, sf_dir)
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    nb = _table_buckets(spark, f"b_lineitem_{tag}")
    orders = load(spark, sf_dir, "orders").select(*_BUCKETED_O_COLS)
    t = f"b_orders_stream_{tag}"
    write_bucketed(
        orders.where(F.col("o_orderkey") % 10 != 0), t, "o_orderkey", nb
    )
    inc = orders.where(F.col("o_orderkey") % 10 == 0)
    src = tempfile.mkdtemp(prefix="layout-inc-")
    inc.where(F.col("o_orderkey") % 20 == 0).coalesce(1).write.parquet(
        os.path.join(src, "d0")
    )
    inc.where(F.col("o_orderkey") % 20 != 0).coalesce(1).write.parquet(
        os.path.join(src, "d1")
    )
    stream = (
        spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*/")
    )
    q = start_layout_ingest(
        stream, t, tempfile.mkdtemp(prefix="layout-ckpt-"),
        compact_after_files=1,
    )
    if not q.awaitTermination(300):
        # a timed-out drain would leave a partially-ingested table and
        # fail the oracle with an opaque hash mismatch — fail loud and
        # attributable instead
        q.stop()
        raise TimeoutError(
            "stream_layout_ingest: drain did not finish within 300s"
        )
    o = spark.table(t).hint("merge")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.floor(F.col("l_quantity") * 100).cast("bigint"))
            .cast("bigint")
            .alias("qty_cents"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .orderBy("o_orderpriority")
    )


def stream_datom_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming run inside the gate: the entity-bucketed datom
    store builds from 90% of orders, the remaining 10% drains as full
    (e, a, v, v_num, tx, added) ops through
    `streaming/tx_ingest.py:start_datom_ingest` in two single-file
    micro-batches — each folded by the write-once merge swap with the
    in-sink compaction tripwire — and the datalog aggregation over the
    drained store must hash-equal the full-corpus DuckDB oracle
    (stream in, store out, maintenance cycle invisible). The store
    rebuilds each run (fresh checkpoint + dropped table), so re-runs
    stay hash-stable."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from ..plans.datalog import q
    from ..plans.eav import (
        _drop_stale_table,
        materialize_datoms_bucketed,
        read_datoms_bucketed,
        table_datoms,
    )
    from ..sources.bucketed import adaptive_buckets
    from ..streaming.tx_ingest import start_datom_ingest

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    table = f"datoms_orders_stream_{tag}"
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    nb = adaptive_buckets(os.path.join(sf_dir, "orders.parquet"), expand=3.0)
    _drop_stale_table(spark, table)
    materialize_datoms_bucketed(
        table_datoms(orders.where(F.col("o_orderkey") % 10 != 0),
                     "orders", "o_orderkey"),
        table, nb,
    )
    inc_orders = orders.where(F.col("o_orderkey") % 10 == 0)

    def _ops(df):
        return table_datoms(df, "orders", "o_orderkey").select(
            "e", "a", "v", "v_num",
            F.lit(1).cast("long").alias("tx"),
            F.lit(True).alias("added"),
        )

    # Split on the TENS digit: every increment key ends in 0 (the %10
    # filter above), so a last-digit split routed ALL rows to one file
    # and the second merge epoch was a guarded no-op (ADVICE r11) —
    # the gate claimed two epochs but exercised one.
    tens_even = (F.col("o_orderkey") / 10).cast("long") % 2 == 0
    src = tempfile.mkdtemp(prefix="datom-inc-")
    _ops(inc_orders.where(tens_even)).coalesce(1).write.parquet(
        os.path.join(src, "d0")
    )
    _ops(inc_orders.where(~tens_even)).coalesce(1).write.parquet(
        os.path.join(src, "d1")
    )
    n0 = spark.read.parquet(os.path.join(src, "d0")).count()
    n1 = spark.read.parquet(os.path.join(src, "d1")).count()
    if not (n0 and n1):
        raise RuntimeError(
            f"degenerate micro-batch split: d0={n0} d1={n1} rows — the "
            "gate must exercise two real merge epochs"
        )
    inc_schema = _ops(inc_orders.limit(0)).schema
    stream = (
        spark.readStream.schema(inc_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*/")
    )
    sq = start_datom_ingest(
        stream, table, tempfile.mkdtemp(prefix="datom-ckpt-")
    )
    if not sq.awaitTermination(300):
        sq.stop()
        raise TimeoutError(
            "stream_datom_ingest: drain did not finish within 300s"
        )
    # the sink's merges ran on the stream's cloned session; this
    # session's relation cache may predate them (reader contract in
    # start_datom_ingest's docstring)
    spark.catalog.refreshTable(table)
    store = read_datoms_bucketed(spark, table)
    query = {
        "find": ["?st", ("count", "?o"), ("min", "?tp"), ("max", "?tp")],
        "where": [
            ["?o", ":orders/o_orderstatus", "?st"],
            ["?o", ":orders/o_totalprice", "?tp"],
        ],
    }
    return q(query, store).orderBy("st")


def stream_datom_ingest_sliver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stream_datom_ingest at PRODUCTION shape (r11 verdict #8): the
    3-attribute gate's 10% increment touched every attribute, so each
    epoch rewrote the whole store — the worst case, not the claim. Here
    the store carries ALL FIVE orders attributes at full corpus except
    a held-back sliver (the o_totalprice datoms of keys % 10 == 0), and
    the stream drains ONLY that sliver: every merge epoch touches 1 of
    5 attribute partitions, so the per-epoch cost is O(touched
    partition), sublinear in store size — what `merge_datoms_increment_
    bucketed`'s touched-partitions contract actually buys at 100 TB
    (unit-pinned in test_merge_rewrites_only_touched_partitions; this
    gate makes it a measured tier row). Oracle: a datalog aggregation
    that CROSSES a streamed attribute and a static one must hash-equal
    the full-corpus DuckDB result."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from ..plans.datalog import q
    from ..plans.eav import (
        _drop_stale_table,
        materialize_datoms_bucketed,
        read_datoms_bucketed,
        table_datoms,
    )
    from ..sources.bucketed import adaptive_buckets
    from ..streaming.tx_ingest import start_datom_ingest

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    table = f"datoms_orders_sliver_{tag}"
    orders = load(spark, sf_dir, "orders")
    nb = adaptive_buckets(os.path.join(sf_dir, "orders.parquet"), expand=3.0)
    all_d = table_datoms(orders, "orders", "o_orderkey")
    key = F.split(F.col("e"), ":").getItem(1).cast("long")
    held = (F.col("a") == ":orders/o_totalprice") & (key % 10 == 0)
    _drop_stale_table(spark, table)
    materialize_datoms_bucketed(all_d.where(~held), table, nb)
    inc = all_d.where(held).select(
        "e", "a", "v", "v_num",
        F.lit(1).cast("long").alias("tx"),
        F.lit(True).alias("added"),
    )
    # two real merge epochs: split on the tens digit (last digit is
    # always 0 here — same pitfall the plain gate fixed)
    tens_even = (key / 10).cast("long") % 2 == 0
    src = tempfile.mkdtemp(prefix="datom-sliver-")
    inc.where(tens_even).coalesce(1).write.parquet(os.path.join(src, "d0"))
    inc.where(~tens_even).coalesce(1).write.parquet(os.path.join(src, "d1"))
    n0 = spark.read.parquet(os.path.join(src, "d0")).count()
    n1 = spark.read.parquet(os.path.join(src, "d1")).count()
    if not (n0 and n1):
        raise RuntimeError(
            f"degenerate micro-batch split: d0={n0} d1={n1} rows"
        )
    stream = (
        spark.readStream.schema(inc.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*/")
    )
    sq = start_datom_ingest(
        stream, table, tempfile.mkdtemp(prefix="datom-sliver-ckpt-")
    )
    if not sq.awaitTermination(300):
        sq.stop()
        raise TimeoutError(
            "stream_datom_ingest_sliver: drain did not finish within 300s"
        )
    spark.catalog.refreshTable(table)
    store = read_datoms_bucketed(spark, table)
    query = {
        "find": ["?pri", ("count", "?o"), ("min", "?tp"), ("max", "?tp")],
        "where": [
            ["?o", ":orders/o_orderpriority", "?pri"],
            ["?o", ":orders/o_totalprice", "?tp"],
        ],
    }
    return q(query, store).orderBy("pri")


QUERIES = {
    "stream_backpressure_replay": stream_backpressure_replay,
    "stream_layout_ingest": stream_layout_ingest,
    "stream_datom_ingest": stream_datom_ingest,
    "stream_datom_ingest_sliver": stream_datom_ingest_sliver,
    "stream_dim_enriched_counts": stream_dim_enriched_counts,
    "stream_dedup_keys": stream_dedup_keys,
    "stream_interval_join": stream_interval_join,
    "stream_tumbling_hourly": stream_tumbling_hourly,
    "stream_sliding_counts": stream_sliding_counts,
    "stream_session_windows": stream_session_windows,
    "stream_stateful_user_totals": stream_stateful_user_totals,
}

ORACLES = {
    "stream_datom_ingest_sliver": """
        SELECT o_orderpriority AS pri,
               CAST(COUNT(*) AS BIGINT) AS count_o,
               MIN(CAST(o_totalprice AS DOUBLE)) AS min_tp,
               MAX(CAST(o_totalprice AS DOUBLE)) AS max_tp
        FROM orders GROUP BY o_orderpriority ORDER BY pri
    """,
    "stream_datom_ingest": """
        SELECT o_orderstatus AS st,
               CAST(COUNT(*) AS BIGINT) AS count_o,
               MIN(CAST(o_totalprice AS DOUBLE)) AS min_tp,
               MAX(CAST(o_totalprice AS DOUBLE)) AS max_tp
        FROM orders GROUP BY o_orderstatus ORDER BY st
    """,
    "stream_layout_ingest": """
        SELECT o_orderpriority,
               CAST(SUM(CAST(FLOOR(l_quantity * 100) AS BIGINT)) AS BIGINT)
                   AS qty_cents,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "stream_backpressure_replay": """
        SELECT event_type, COUNT(*) AS n_events
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "stream_dim_enriched_counts": """
        SELECT date_trunc('hour', ts) AS window_start,
               COALESCE(c_mktsegment, 'UNKNOWN') AS segment,
               COUNT(*) AS n_events,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
        FROM events LEFT JOIN customer ON user_id = c_custkey
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "stream_dedup_keys": """
        SELECT DISTINCT user_id, event_type
        FROM events
        ORDER BY user_id, event_type
    """,
    "stream_interval_join": """
        SELECT c.user_id,
               c.event_id AS click_id,
               p.event_id AS purchase_id,
               c.ts AS click_ts,
               p.ts AS purchase_ts
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id
         AND p.ts > c.ts
         AND p.ts <= c.ts + INTERVAL 30 MINUTE
        ORDER BY c.user_id, click_id, purchase_id
    """,
    "stream_stateful_user_totals": """
        SELECT user_id, COUNT(*) AS n_events,
               ROUND(SUM(value), 6) AS total_value
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    "stream_tumbling_hourly": """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               COUNT(*) AS n_events,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    # each event belongs to 2 windows (width 1h, slide 30m): the one
    # starting at its 30-minute bucket and the one 30 minutes earlier
    "stream_sliding_counts": """
        WITH assigned AS (
            SELECT time_bucket(INTERVAL '30 minutes', ts) AS w FROM events
            UNION ALL
            SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' FROM events
        )
        SELECT w AS window_start, COUNT(*) AS n_events
        FROM assigned GROUP BY 1 ORDER BY 1
    """,
    # gaps-and-islands reproduction of session_window(ts, 5 min):
    # session_end = last event + gap
    "stream_session_windows": """
        WITH marked AS (
            SELECT user_id, ts,
                   CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             > INTERVAL '5 minutes'
                        OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ),
        sessions AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING) AS sid
            FROM marked
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL '5 minutes' AS session_end,
               COUNT(*) AS n_events
        FROM sessions
        GROUP BY user_id, sid
        ORDER BY user_id, session_start
    """,
}
