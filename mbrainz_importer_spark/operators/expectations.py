"""Data-quality expectations — the Deequ/Great-Expectations shape for a
training-data warehouse: declare per-column constraints (completeness,
uniqueness, bounds, set membership, pattern), compute every metric in
ONE aggregation pass over the table, and get back a (rule, column,
metric, threshold, passed) verdict frame plus a validate-or-throw
boundary for pipelines.

Scale shape: all constraints compile into a single `agg(...)` — one
scan, map-side combined, no shuffle beyond the final scalar reduce; a
hundred constraints cost one pass, not a hundred. (Uniqueness needs
countDistinct, which Spark computes in the same aggregate via expand —
still one scan.) Everything is built-in expressions; verdicts come
back through an in-plan unpivot, no driver loop.

The reference's analog is the validate-or-throw spec boundary
(plans/specs.py, cognitect spec asserts at stage edges); expectations
generalize it from per-entity predicates to corpus-level metrics.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One constraint: `kind` in {complete, unique, min, max, in_set,
    matches, non_negative}; `threshold` is the pass bar for ratio
    metrics (default 1.0 = every row)."""

    kind: str
    column: str
    value: object = None
    threshold: float = 1.0


KINDS = {"complete", "unique", "min", "max", "in_set", "matches", "non_negative"}


def _metric(rule: Rule, n: Column) -> Column:
    c = F.col(rule.column)
    if rule.kind == "complete":
        return F.sum(c.isNotNull().cast("long")) / n
    if rule.kind == "unique":
        return F.countDistinct(c) / n
    if rule.kind == "min":
        return F.min(c).cast("double")
    if rule.kind == "max":
        return F.max(c).cast("double")
    if rule.kind == "in_set":
        return F.sum(c.isin(list(rule.value)).cast("long")) / n
    if rule.kind == "matches":
        return F.sum(c.rlike(rule.value).cast("long")) / n
    # non_negative
    return F.sum((c >= 0).cast("long")) / n


def _passed(rule: Rule, metric: Column) -> Column:
    if rule.kind == "min":
        return metric >= F.lit(float(rule.value))
    if rule.kind == "max":
        return metric <= F.lit(float(rule.value))
    return metric >= F.lit(float(rule.threshold))


def check(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule in one aggregation pass. Returns
    (rule_id, kind, column, metric DOUBLE, passed BOOLEAN) ordered by
    rule_id — ratio metrics are fractions of non-null-qualifying rows
    over ALL rows; min/max compare against the rule value directly."""
    if not rules:
        raise ValueError("check() needs at least one rule")
    for r in rules:
        if r.kind not in KINDS:
            raise ValueError(f"unknown rule kind {r.kind!r} (have {sorted(KINDS)})")
        if r.column not in df.columns:
            raise ValueError(f"rule column {r.column!r} not in {df.columns}")
    n = F.greatest(F.count(F.lit(1)), F.lit(1))
    aggs = []
    for i, r in enumerate(rules):
        m = _metric(r, n)
        aggs.append(F.round(m, 9).alias(f"m{i}"))
        aggs.append(_passed(r, F.round(m, 9)).alias(f"p{i}"))
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"{i}, '{r.kind}', '{r.column}', m{i}, p{i}"
        for i, r in enumerate(rules)
    )
    return one.selectExpr(
        f"stack({len(rules)}, {stack_args}) AS "
        "(rule_id, kind, column, metric, passed)"
    ).select(
        F.col("rule_id").cast("int").alias("rule_id"),
        "kind", "column",
        F.col("metric").cast("double").alias("metric"),
        "passed",
    ).orderBy("rule_id")


ROW_KINDS = KINDS - {"unique"}


def _row_violation(rule: Rule) -> Column:
    """NULL when the row satisfies the rule, the rule's label when it
    violates it — concat_ws later drops the NULLs on both engines."""
    c = F.col(rule.column)
    if rule.kind == "complete":
        ok = c.isNotNull()
    elif rule.kind == "min":
        ok = c >= F.lit(rule.value)
    elif rule.kind == "max":
        ok = c <= F.lit(rule.value)
    elif rule.kind == "in_set":
        ok = c.isin(list(rule.value))
    elif rule.kind == "matches":
        ok = c.rlike(rule.value)
    else:  # non_negative
        ok = c >= 0
    return F.when(~ok, F.lit(f"{rule.kind}:{rule.column}"))


def quarantine_split(
    df: DataFrame, rules: list[Rule]
) -> tuple[DataFrame, DataFrame]:
    """ROW-level routing — the dead-letter shape every production
    pipeline pairs with corpus-level checks: rows satisfying every
    row-expressible rule flow on unchanged; failing rows land in the
    quarantine frame with a `violated` column naming each broken rule
    ('kind:column', comma-joined in rule order). The reference's analog
    is the channel's in-band error value (anomalies as data, not
    exceptions — P12); `check()` stays the corpus-metric face.

    Corpus-level kinds ('unique') are not row-expressible and are
    rejected. One projection, no shuffle, no second scan: both outputs
    are filters over the same labeled plan. NULL comparisons follow SQL
    three-valued logic: a NULL that makes a rule's predicate unknown
    counts as a violation only for 'complete' — the other kinds skip
    NULL rows, exactly as their SQL mirrors do."""
    if not rules:
        raise ValueError("quarantine_split() needs at least one rule")
    for r in rules:
        if r.kind not in ROW_KINDS:
            raise ValueError(
                f"rule kind {r.kind!r} is not row-expressible "
                f"(have {sorted(ROW_KINDS)})"
            )
        if r.column not in df.columns:
            raise ValueError(f"rule column {r.column!r} not in {df.columns}")
    labeled = df.withColumn(
        "violated", F.concat_ws(",", *[_row_violation(r) for r in rules])
    )
    good = labeled.where(F.col("violated") == "").drop("violated")
    bad = labeled.where(F.col("violated") != "")
    return good, bad


def validate_or_throw(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Pipeline boundary: raise with every failed rule named, else pass
    `df` through unchanged (the specs.py contract, corpus-level)."""
    failures = [
        (r["rule_id"], r["kind"], r["column"], r["metric"])
        for r in check(df, rules).collect()
        if not r["passed"]
    ]
    if failures:
        lines = "; ".join(
            f"rule {i} {k}({c}) metric={m}" for i, k, c, m in failures
        )
        raise ValueError(f"data-quality check failed: {lines}")
    return df
