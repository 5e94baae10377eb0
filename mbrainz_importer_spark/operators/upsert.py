"""Unique-identity upsert with cardinality-many set-union (SURVEY.md §2.4 J2).

Datomic semantics being reproduced (schema.edn:29-33 + :db.cardinality/many):
transacting {:artist/gid X, ...} MERGES into the entity with that gid —
scalar (cardinality-one) attrs last-writer-wins, cardinality-many attrs
accumulate as a SET. Successive import passes depend on this: releases,
then releases-artists, then media all touch the same release entities
(importer.clj:40-44 O3).

Pure-DataFrame realization (no table-format dependency): union + grouped
compaction. On a real deployment this maps 1:1 onto `MERGE INTO` of any
ACID table format; the compaction below is the semantics, the format is
the transport.

Scale: the groupBy shuffles on the upsert key — the same key every import
pass uses, so a bucketed/pre-partitioned target makes every subsequent
merge co-located (no re-shuffle of the big side; SURVEY.md §7.2 M6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key: str,
    set_union_cols: tuple[str, ...] = (),
    check_unique: bool = True,
) -> DataFrame:
    """Merge `updates` into `target` by `key`.

    - scalar columns: the update's non-null value wins, else target's
      (null never clobbers — matches Datomic, where an absent attr in
      tx-data leaves the existing assertion alone);
    - `set_union_cols` (array columns): set-union of both sides;
    - rows only in updates are inserted, only in target are kept.

    PRECONDITION: each side has at most one row per key — the scalar
    resolution picks the first non-null per priority class, which is only
    deterministic under that invariant. Duplicate-key streams must be
    pre-compacted with `compact_by_key` (which has an explicit order
    column). `check_unique=True` enforces this with two bounded
    aggregations; pass False only when the caller guarantees uniqueness.
    """
    cols = target.columns
    if set(cols) != set(updates.columns):
        missing = set(cols) ^ set(updates.columns)
        raise ValueError(f"target/updates column mismatch: {sorted(missing)}")
    if check_unique:
        for name, side in (("target", target), ("updates", updates)):
            dup = (
                side.groupBy(key).agg(F.count(F.lit(1)).alias("__n"))
                .where(F.col("__n") > 1).limit(1).collect()
            )
            if dup:
                raise ValueError(
                    f"merge_upsert: {name} has >1 row for key "
                    f"{dup[0][key]!r}; pre-compact with compact_by_key"
                )

    tagged = target.withColumn("__pri", F.lit(0)).unionByName(
        updates.withColumn("__pri", F.lit(1))
    )
    aggs = []
    for c in cols:
        if c == key:
            continue
        if c in set_union_cols:
            aggs.append(
                F.array_sort(
                    F.array_distinct(F.flatten(F.collect_list(F.col(c))))
                ).alias(c)
            )
        else:
            # last-writer-wins among non-null values, priority to updates:
            # max_by over (priority, non-null) — ignoreNulls first
            aggs.append(
                F.coalesce(
                    F.first(F.when(F.col("__pri") == 1, F.col(c)), ignorenulls=True),
                    F.first(F.when(F.col("__pri") == 0, F.col(c)), ignorenulls=True),
                ).alias(c)
            )
    return tagged.groupBy(key).agg(*aggs).select(*cols)


def compact_by_key(df: DataFrame, key: str, order_col: str) -> DataFrame:
    """Collapse duplicate-key rows into one entity with Datomic's
    unique-identity merge semantics (:db.unique/identity, schema.edn:29-33):
    per attribute, the latest (highest order_col) NON-NULL assertion wins —
    a later partial row updates only the attributes it carries.

    One hash groupBy on the key; max_by ignores rows whose ordering value
    is null, which is exactly the ignore-absent-attrs behavior."""
    aggs = []
    for c in df.columns:
        if c in (key, order_col):
            continue
        aggs.append(
            F.max_by(F.col(c), F.when(F.col(c).isNotNull(), F.col(order_col))).alias(c)
        )
    out_cols = [c for c in df.columns if c != order_col]
    return df.groupBy(key).agg(*aggs).select(*out_cols)


def attach_many(
    parent: DataFrame,
    links: DataFrame,
    parent_key: str,
    link_parent_key: str,
    link_value_col: str,
    out_col: str,
) -> DataFrame:
    """Attach a cardinality-many ref column to a parent table from a link
    table (e.g. release.artists from releases-artists pairs, J2+J3):
    groupBy link parent -> sorted distinct array -> left join onto parent.
    Unmatched parents get an empty array (no assertion, not null-poison),
    typed from the link column's schema so non-string keys coalesce
    cleanly."""
    elem_type = links.schema[link_value_col].dataType
    grouped = links.groupBy(F.col(link_parent_key).alias(parent_key)).agg(
        F.array_sort(F.collect_set(link_value_col)).alias(out_col)
    )
    return parent.join(grouped, parent_key, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.array().cast(T.ArrayType(elem_type)))
    )


class CasConflict(ValueError):
    """A compare-and-swap update found a current value that differs from
    its expectation (the Datomic :db/cas abort)."""


def cas_update(
    target: DataFrame,
    updates: DataFrame,
    key: str,
    value_col: str,
    expected_col: str = "expected",
    new_col: str = "new_value",
    on_conflict: str = "error",
) -> DataFrame:
    """Compare-and-swap column update — the Datomic `:db/cas` transaction
    function as a set operation: for each update row (key, expected,
    new), the target's `value_col` becomes `new` ONLY IF its current
    value equals `expected` (null-safe, so CAS-from-absent works like
    cas from nil).

    on_conflict="error" mirrors Datomic's tx abort: ANY mismatch raises
    CasConflict with a bounded sample (this forces one action over the
    updates-joined frame — bounded by the update set, not the target).
    on_conflict="skip" applies the matching rows and leaves conflicting
    rows unchanged (the at-least-once retry-friendly mode).

    One broadcast-or-shuffle left join on the key; the target is never
    collected."""
    if on_conflict not in ("error", "skip"):
        raise ValueError(f"on_conflict must be 'error' or 'skip': {on_conflict}")
    upd = updates.select(
        F.col(key).alias("__k"),
        F.col(expected_col).alias("__exp"),
        F.col(new_col).alias("__new"),
        F.lit(True).alias("__has_upd"),
    )
    joined = target.join(upd, target[key] == F.col("__k"), "left")
    conflict = F.col("__has_upd") & ~F.col(value_col).eqNullSafe(F.col("__exp"))
    if on_conflict == "error":
        sample = joined.where(conflict).select(
            key, value_col, F.col("__exp").alias(expected_col)
        ).take(5)
        if sample:
            raise CasConflict(
                f"cas_update: current != expected for {len(sample)}+ rows, "
                f"e.g. {[tuple(r) for r in sample]}"
            )
    applied = F.col("__has_upd") & F.col(value_col).eqNullSafe(F.col("__exp"))
    return joined.withColumn(
        value_col, F.when(applied, F.col("__new")).otherwise(F.col(value_col))
    ).drop("__k", "__exp", "__new", "__has_upd")
