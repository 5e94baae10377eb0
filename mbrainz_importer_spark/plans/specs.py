"""Entity specs — Datomic's `:db/ensure` (entity specs: required attrs
via :db.entity/attrs, predicates via :db.entity/preds; reference schema
declares per-attr shape the same way, subsets/entities/schema.edn).

A spec is declared data-side and checked at the transaction boundary:
`spec_violations` returns one row per (entity, failed check) — a normal
DataFrame you can gate, sample, or sink; `ensure_entities` is the
validate-or-throw boundary (SURVEY.md §2.2 P9): it raises with a bounded
sample of violations and passes the input through untouched when clean.

Scale: every check is a codegen'd boolean projection unioned per check —
no shuffle at all for the violations view; `ensure_entities` adds one
bounded `.limit(sample).collect()` (driver-side, capped) for the error
message, the same pattern as operators/enums.assert_no_misses.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class EntitySpecError(ValueError):
    """Raised by ensure_entities when any entity fails its spec."""


@dataclass(frozen=True)
class EntitySpec:
    """Required attributes + named boolean predicates over the row."""

    name: str
    required: tuple[str, ...] = ()
    preds: tuple[tuple[str, Column], ...] = field(default_factory=tuple)


def spec_violations(df: DataFrame, id_col: str, spec: EntitySpec) -> DataFrame:
    """(entity id, check, kind) for every failed check: kind 'required'
    for a missing (null) required attribute, 'pred' for a failed
    predicate. Predicates are only evaluated when their inputs are
    present — a null that a `required` rule already covers does not
    double-report through the predicate (Datomic preds see the entity
    after attr checks)."""
    parts: list[DataFrame] = []
    for attr in spec.required:
        parts.append(
            df.where(F.col(attr).isNull()).select(
                F.col(id_col).alias("entity"),
                F.lit(attr).alias("check"),
                F.lit("required").alias("kind"),
            )
        )
    for check_name, pred in spec.preds:
        parts.append(
            df.where(~F.coalesce(pred, F.lit(False))).select(
                F.col(id_col).alias("entity"),
                F.lit(check_name).alias("check"),
                F.lit("pred").alias("kind"),
            )
        )
    if not parts:
        raise ValueError(f"spec {spec.name!r} declares no checks")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def ensure_entities(
    df: DataFrame, id_col: str, spec: EntitySpec, sample: int = 5
) -> DataFrame:
    """`d/ensure` boundary: raise EntitySpecError with a bounded sample
    if any entity violates the spec, else return `df` unchanged (the
    passthru shape — validation must not alter the plan)."""
    bad = spec_violations(df, id_col, spec).limit(sample).collect()
    if bad:
        detail = ", ".join(f"{r['entity']}:{r['check']}({r['kind']})" for r in bad)
        raise EntitySpecError(
            f"entity spec {spec.name!r} violated (first {len(bad)}): {detail}"
        )
    return df
