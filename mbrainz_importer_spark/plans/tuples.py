"""Composite tuples — Datomic's `:db/tupleAttrs` (derived composite
attributes, auto-maintained from their component attrs, usually paired
with :db.unique/identity for compound uniqueness).

The tuple value's canonical form is a single string joining the
component values with U+001F (unit separator — cannot appear in the
component data), with nulls encoded as an explicit marker so
["a", null] != ["a", ""] — Datomic composite tuples likewise keep nil
components. The derived column is recomputed from components on every
call, which is exactly the auto-maintenance contract: you never write
the tuple, you write the components.

Scale: the tuple is a pure projection (no shuffle); uniqueness checking
is one hash groupBy on the tuple; tuple-keyed upsert reuses
operators/upsert.merge_upsert so compaction/merge behavior is identical
to plain unique-identity upserts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEP = "\x1f"  # unit separator - cannot occur in component data
_NULL = "\u2400"  # SYMBOL FOR NULL: nil component, distinct from ""


def composite_tuple(cols: list[str]) -> Column:
    """Canonical composite value of the component columns."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols
    ]
    return F.concat_ws(_SEP, *parts)


def with_composite(df: DataFrame, out_col: str, cols: list[str]) -> DataFrame:
    """Add (or recompute) the derived tuple attribute — the
    :db/tupleAttrs maintenance step. Always overwrites `out_col`:
    the tuple is derived data, never authored."""
    return df.withColumn(out_col, composite_tuple(cols))


def tuple_duplicates(df: DataFrame, cols: list[str]) -> DataFrame:
    """Audit view for compound uniqueness: one row per tuple value held
    by more than one row — (tuple, n_rows). Empty = the composite could
    be declared :db.unique/identity."""
    return (
        with_composite(df, "__tuple", cols)
        .groupBy(F.col("__tuple").alias("tuple"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .where(F.col("n_rows") > 1)
    )


def assert_tuple_unique(df: DataFrame, cols: list[str], sample: int = 5) -> DataFrame:
    """Raise if the composite is not unique (bounded sample in the
    message), else pass `df` through — the uniqueness boundary a
    :db.unique/identity tuple enforces at transaction time."""
    dup = tuple_duplicates(df, cols).limit(sample).collect()
    if dup:
        detail = ", ".join(f"{r['tuple']!r}x{r['n_rows']}" for r in dup)
        raise ValueError(f"composite tuple {cols} not unique: {detail}")
    return df


def upsert_by_tuple(
    target: DataFrame,
    updates: DataFrame,
    cols: list[str],
    set_union_cols: frozenset[str] | set[str] = frozenset(),
    tuple_col: str = "__tuple_key",
) -> DataFrame:
    """Unique-identity merge keyed by the composite tuple: both sides get
    the derived key, merge_upsert resolves per tuple value, and the
    derived key is dropped again (it is never stored — recomputed on
    demand)."""
    from ..operators.upsert import merge_upsert

    t = with_composite(target, tuple_col, cols)
    u = with_composite(updates, tuple_col, cols)
    return merge_upsert(t, u, tuple_col, set_union_cols=set_union_cols).drop(tuple_col)
