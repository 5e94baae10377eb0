"""Pull API — Datomic's entity-projection surface (`d/pull` /
`pull-many`, e.g. the reference explores entities attribute-by-attribute
in examples/explore_db.clj) re-expressed over the derived EAV view
(plans/eav.py).

Datomic's pull walks an entity and materializes a selected attribute
map, following refs forward and reverse. The Spark-first shape is NOT a
per-entity walk (that's a driver-side loop): it's one conditional
aggregation per requested attribute inside a single groupBy(e) — so a
pull of K attrs over N entities is ONE shuffle on `e` with map-side
partial aggregation, regardless of K. Ref navigation is an equi-join
against the target entities' own pull (broadcast when the target is a
dim), and reverse refs are a groupBy on the referencing attribute's
value — exactly `:artist/_country`-style navigation as a shuffle, not
N+1 lookups.

Spec mini-language (Python mirror of the EDN pull pattern):

    pull_entities(datoms, {
        "name":    ":customer/c_name",             # string attr
        "balance": (":customer/c_acctbal", "num"), # numeric projection
        "seg":     (":customer/c_mktsegment", "str", "UNKNOWN"),  # default
    })

Entities with no matching datom for any requested attr are absent from
the result (EAV has no nulls — absent keys, like the reference); a
per-attr default fills only attrs missing on an otherwise-present
entity, mirroring Datomic's `(default :attr v)`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KINDS = {"str", "num"}


def _norm_spec(spec: dict) -> list[tuple[str, str, str, object]]:
    """Normalize {out_col: attr | (attr, kind[, default])} to
    (out_col, attr, kind, default) tuples."""
    out = []
    for col, s in spec.items():
        if isinstance(s, str):
            attr, kind, default = s, "str", None
        else:
            attr, kind = s[0], s[1]
            default = s[2] if len(s) > 2 else None
        if kind not in _KINDS:
            raise ValueError(f"pull kind must be one of {sorted(_KINDS)}: {kind}")
        out.append((col, attr, kind, default))
    return out


def pull_entities(datoms: DataFrame, spec: dict) -> DataFrame:
    """Pull a typed attribute projection per entity: `e` plus one column
    per spec entry. One filtered scan + one groupBy(e); every attr is a
    conditional max aggregate (max over the single asserted value ==
    the value; max keeps it deterministic if a store ever held
    duplicate assertions)."""
    entries = _norm_spec(spec)
    wanted = [a for _, a, _, _ in entries]
    scan = datoms.where(F.col("a").isin(wanted))
    aggs = []
    for col, attr, kind, default in entries:
        src = F.col("v_num") if kind == "num" else F.col("v")
        agg = F.max(F.when(F.col("a") == attr, src))
        if default is not None:
            agg = F.coalesce(agg, F.lit(default))
        aggs.append(agg.alias(col))
    return scan.groupBy("e").agg(*aggs)


def pull_ref(
    parent: DataFrame,
    datoms: DataFrame,
    fk_col: str,
    target_id_attr: str,
    sub_spec: dict,
    prefix: str = "",
    broadcast: bool = True,
) -> DataFrame:
    """Forward ref navigation ({:ref-attr [sub-pattern]}): join the
    parent's FK value column to the target entities' identity attribute
    and attach the target's own pull, columns prefixed. Broadcast by
    default — ref targets are usually dims; set broadcast=False for
    fact-to-fact refs so the planner shuffles both sides."""
    sub = dict(sub_spec)
    sub.setdefault("__ref_id", target_id_attr)
    pulled = pull_entities(datoms, sub)
    cols = [c for c in pulled.columns if c not in ("e", "__ref_id")]
    renamed = pulled.select(
        F.col("__ref_id").alias("__join_key"),
        *[F.col(c).alias(f"{prefix}{c}") for c in cols],
    )
    right = F.broadcast(renamed) if broadcast else renamed
    return parent.join(right, parent[fk_col] == right["__join_key"], "left").drop(
        "__join_key"
    )


def pull_reverse(datoms: DataFrame, ref_attr: str) -> DataFrame:
    """Reverse ref navigation (`:artist/_country`): for each referenced
    value, the sorted set of referencing entities. One groupBy on the
    ref attribute's value; the array is sorted so downstream hashing is
    representation-stable."""
    return (
        datoms.where(F.col("a") == ref_attr)
        .groupBy(F.col("v").alias("ref_value"))
        .agg(F.array_sort(F.collect_set("e")).alias("referrers"))
    )
