"""Batch sessionization and funnel analysis over event streams — the
batch twins of streaming/windows.py's session_window face (Datomic-side
analogue: grouping an entity's datoms by transaction time), and the
ordered-step funnel every product-analytics warehouse runs.

Both are single-shuffle window/aggregate plans:
- sessionize: one shuffle on the user key; the gap flags and running
  session numbers are per-user window functions over ts order (no
  global window, no driver state). At 100 TB this is the textbook
  sessionization shape — partition by user, sort within partition.
- funnel_counts: per-user min-timestamp per step + a strictly-ordered
  chain (step2 after step1, step3 after step2), then one count — two
  shuffles (user-step agg, then the final count), no self-join
  explosion: the chain compares ONE timestamp per step per user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign gap-based sessions: a new session starts when a user's
    inter-event gap exceeds `gap_minutes`. Returns one row per session:
    (user, session_id 0-based per user, session_start, session_end,
    n_events). Deterministic: ties in ts within a user order by ts
    alone (same second = same session regardless)."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(F.col(ts_col)).over(w)
    # interval arithmetic (microsecond-exact, TIMESTAMP_NTZ-safe) — the
    # same expression an oracle engine reproduces without epoch casts
    gap_over = (F.col(ts_col) - prev) > F.expr(
        f"INTERVAL {int(gap_minutes)} MINUTES"
    )
    new_session = F.when(prev.isNull() | gap_over, 1).otherwise(0)
    numbered = events.select(
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("__ts"),
        new_session.alias("__new"),
    ).withColumn(
        "session_id",
        (F.sum("__new").over(
            Window.partitionBy("user").orderBy("__ts")
            .rowsBetween(Window.unboundedPreceding, 0)
        ) - 1).cast("bigint"),
    )
    return (
        numbered.groupBy("user", "session_id")
        .agg(
            F.min("__ts").alias("session_start"),
            F.max("__ts").alias("session_end"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Strict-order funnel: how many users reached step k having done
    steps 1..k-1 in timestamp order. Uses each user's FIRST occurrence
    per step (the standard first-touch funnel); a later step counts
    only if its first occurrence is strictly after the previous step's.
    Returns (step, step_name, n_users) with step 1-based."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    firsts = (
        events.where(F.col(type_col).isin(steps))
        .groupBy(user_col, type_col)
        .agg(F.min(ts_col).alias("first_ts"))
        .groupBy(user_col)
        .pivot(type_col, steps)
        .agg(F.first("first_ts"))
    )
    reached = F.col(f"`{steps[0]}`").isNotNull()
    flags = [reached.alias("__s0")]
    for k in range(1, len(steps)):
        reached = (
            reached
            & F.col(f"`{steps[k]}`").isNotNull()
            & (F.col(f"`{steps[k]}`") > F.col(f"`{steps[k-1]}`"))
        )
        flags.append(reached.alias(f"__s{k}"))
    flagged = firsts.select(*flags)
    agg = flagged.agg(*[
        F.sum(F.col(f"__s{k}").cast("long")).alias(f"n{k}")
        for k in range(len(steps))
    ])
    # unpivot the one-row aggregate in-plan (no driver collect)
    stack_args = ", ".join(
        f"{k + 1}, '{steps[k]}', coalesce(n{k}, CAST(0 AS BIGINT))"
        for k in range(len(steps))
    )
    return agg.selectExpr(
        f"stack({len(steps)}, {stack_args}) AS (step, step_name, n_users)"
    ).select(
        F.col("step").cast("int").alias("step"),
        "step_name",
        F.col("n_users").cast("bigint").alias("n_users"),
    )
