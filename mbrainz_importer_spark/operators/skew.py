"""Skew mitigation for joins on hot keys (SURVEY.md scale notes; VERDICT
r1 next-round #8).

AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) handles most sort-merge-join skew at runtime by splitting
oversized partitions. Salting is the explicit fallback for the cases AQE
can't re-plan:

  - the skewed side feeds a same-key groupBy AFTER the join (AQE's split
    would break the co-partitioning the aggregate reuses);
  - broadcast is impossible (both sides large) and one key dominates so
    a single task would own the hot key's entire output;
  - deterministic partitioning is required run-to-run (AQE splits depend
    on observed sizes).

`salted_join(skewed, other, key, n_salts)` spreads each hot key over
`n_salts` shuffle partitions by hashing the skewed side's full row onto
a salt and replicating the other side once per salt value. Output rows
are identical to the unsalted join; only the partitioning changes. Cost:
`other` is shuffled n_salts× — use it when `other` is the (much) smaller
side but still too big or too row-multiplying to broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, n_salts: int) -> DataFrame:
    """Deterministic per-row salt in [0, n_salts): hash of the full row,
    NOT rand() (re-executed tasks must land rows on the same salt, or a
    retried stage double-counts). Identical duplicate rows share a salt
    by construction — acceptable: balance targets hot KEYS, whose rows
    differ on non-key columns."""
    return df.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)).cast("int"),
    )


def replicate_for_salt(df: DataFrame, n_salts: int) -> DataFrame:
    """Cross the other side with salt values 0..n_salts-1 (explode of a
    literal array — narrow, no shuffle by itself)."""
    return df.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i).cast("int") for i in range(n_salts)]))
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str] | str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join `skewed` with `other` on key columns `on`, spreading each key
    over n_salts partitions. Row-identical to skewed.join(other, on, how)
    for key-preserving join types (inner / left / left_semi)."""
    if how not in ("inner", "left", "left_outer", "left_semi"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi, not {how!r} "
            "(right/full would need the salt on the other side's nulls)"
        )
    keys = [on] if isinstance(on, str) else list(on)
    # MERGE hint: salting exists to control the SHUFFLE partitioning,
    # so the join must actually shuffle — Catalyst size-estimating the
    # replicated side under the broadcast threshold both defeats the
    # salt (broadcast has no skew problem to solve) and hands the
    # driver an n_salts-times-replicated fact build (killed the sf10g
    # run live: "Not enough memory to build and broadcast", r12). An
    # explicit F.broadcast by the caller still outranks the hint.
    return (
        with_salt(skewed, n_salts)
        .join(
            replicate_for_salt(other, n_salts).hint("merge"),
            keys + [SALT_COL],
            how,
        )
        .drop(SALT_COL)
    )
