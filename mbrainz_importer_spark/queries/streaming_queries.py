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


QUERIES = {
    "stream_tumbling_hourly": stream_tumbling_hourly,
    "stream_sliding_counts": stream_sliding_counts,
    "stream_session_windows": stream_session_windows,
    "stream_stateful_user_totals": stream_stateful_user_totals,
}

ORACLES = {
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
