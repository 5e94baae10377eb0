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


def _norm_spec(spec: dict) -> list[dict]:
    """Normalize spec entries to option dicts. Accepted entry shapes:

        "attr"                          plain string attr
        (attr, kind[, default])         typed, optional default
        {"attr": a, "kind": k, "default": d,     full options form —
         "many": bool, "limit": n}               the :limit/:default
                                                 grammar options; the
                                                 out_col key IS :as
    """
    out = []
    for col, s in spec.items():
        if isinstance(s, str):
            entry = {"attr": s, "kind": "str", "default": None,
                     "many": False, "limit": None}
        elif isinstance(s, dict):
            entry = {"attr": s["attr"], "kind": s.get("kind", "str"),
                     "default": s.get("default"),
                     "many": bool(s.get("many")), "limit": s.get("limit")}
        else:
            entry = {"attr": s[0], "kind": s[1],
                     "default": s[2] if len(s) > 2 else None,
                     "many": False, "limit": None}
        if entry["kind"] not in _KINDS:
            raise ValueError(
                f"pull kind must be one of {sorted(_KINDS)}: {entry['kind']}"
            )
        if entry["limit"] is not None and not entry["many"]:
            raise ValueError(f":limit applies to cardinality-many attrs: {col}")
        if entry["many"] and entry["default"] is not None:
            raise ValueError(f":default on a many attr is unsupported: {col}")
        entry["col"] = col
        out.append(entry)
    return out


def pull_entities(datoms: DataFrame, spec: dict) -> DataFrame:
    """Pull a typed attribute projection per entity: `e` plus one column
    per spec entry. One filtered scan + one groupBy(e); a scalar attr is
    a conditional max aggregate (max over the single asserted value ==
    the value; max keeps it deterministic if a store ever held duplicate
    assertions), a many attr is a sorted collect_set, capped by its
    :limit — Datomic's `(:attr :limit n)` — as a slice of the sorted
    array (deterministic, unlike 'first n seen')."""
    entries = _norm_spec(spec)
    wanted = [en["attr"] for en in entries]
    scan = datoms.where(F.col("a").isin(wanted))
    aggs = []
    for en in entries:
        src = F.col("v_num") if en["kind"] == "num" else F.col("v")
        cond = F.when(F.col("a") == en["attr"], src)
        if en["many"]:
            agg = F.array_sort(F.collect_set(cond))
            if en["limit"] is not None:
                agg = F.slice(agg, 1, int(en["limit"]))
        else:
            agg = F.max(cond)
            if en["default"] is not None:
                agg = F.coalesce(agg, F.lit(en["default"]))
        aggs.append(agg.alias(en["col"]))
    return scan.groupBy("e").agg(*aggs)


def parse_pull_pattern(text: str, numeric=frozenset()) -> dict:
    """Parse VERBATIM Datomic pull-pattern text into the spec dict
    `pull_entities` consumes — the attribute-with-options grammar:

        [:customer/c_name
         (:customer/c_acctbal :as bal)
         (:customer/vip :default "no")
         (:customer/order :many true :limit 2)]

    `:as` names the output column (default: the attr name after '/');
    `:default` fills absent scalar attrs; `:limit` caps a many attr
    (`:many true` marks it — the EAV view has no schema to infer
    cardinality from unless you query schema_datoms first). Attrs in
    `numeric` project v_num. Wildcard and nested ref maps stay with
    pull_wildcard / pull_ref."""
    from ..edn import loads

    form = loads(text)
    if not isinstance(form, list):
        raise ValueError(f"pull pattern must be a vector: {text!r}")
    spec: dict = {}
    for item in form:
        opts: dict = {}
        if isinstance(item, str):
            attr = item
        elif isinstance(item, list) and item and isinstance(item[0], str):
            attr = item[0]
            rest = item[1:]
            if len(rest) % 2:
                raise ValueError(f"pull options must be key-value pairs: {item}")
            for k, v in zip(rest[::2], rest[1::2]):
                if k not in (":as", ":default", ":limit", ":many"):
                    raise ValueError(f"unsupported pull option {k!r} in {item}")
                opts[k] = v
        else:
            raise ValueError(f"unsupported pull pattern item: {item!r}")
        if not attr.startswith(":"):
            raise ValueError(f"pull attr must be a keyword: {attr!r}")
        col = str(opts.get(":as") or attr.rsplit("/", 1)[-1]).lstrip(":")
        spec[col] = {
            "attr": attr,
            "kind": "num" if attr in numeric else "str",
            "default": opts.get(":default"),
            "many": bool(opts.get(":many")),
            "limit": opts.get(":limit"),
        }
    return spec


def pull_many(
    datoms: DataFrame,
    spec: dict,
    entities,
    broadcast: bool = True,
) -> DataFrame:
    """`d/pull-many` — batch pull over an explicit entity collection.
    `entities` is a Python list of entity ids (bounded — it becomes a
    literal seed relation, like a datalog :in collection) or a
    single-column DataFrame for unbounded collections. EVERY requested
    entity yields a row — missing entities keep null attrs — matching
    Datomic's pull-many, which returns a result per input eid.

    Shape: a semi-join restricts the datom scan to the requested
    entities (broadcast by default — pull-many calls are id-list sized),
    then pull_entities' single groupBy(e) runs on the survivors, and a
    left join from the id relation preserves the per-eid contract."""
    spark = datoms.sparkSession
    if isinstance(entities, DataFrame):
        ents = entities.toDF("e")
    else:
        from ..operators.localrel import local_df

        ents = local_df(spark, [(str(x),) for x in entities], "e string")
    seed = F.broadcast(ents) if broadcast else ents
    pulled = pull_entities(datoms.join(seed, "e", "left_semi"), spec)
    return ents.join(pulled, "e", "left")


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


def pull_wildcard(datoms: DataFrame) -> DataFrame:
    """The `[*]` wildcard pull: every asserted attribute of every entity
    as a map column. One groupBy(e) regardless of attribute count;
    entries are sorted so the map is representation-stable. Assumes
    cardinality-one attrs (duplicate map keys raise under Spark's
    default EXCEPTION dedup policy — use pull_attr_many for many-valued
    attrs)."""
    return datoms.groupBy("e").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("a", "v")))
        ).alias("attrs")
    )


def pull_wildcard_serialized(datoms: DataFrame) -> DataFrame:
    """Wildcard pull with the attr map serialized as a sorted
    'a=v,a=v' string — the hash-stable form the driver oracle compares
    (map column ordering is engine-specific; this is not)."""
    entries = F.array_sort(F.collect_list(F.struct("a", "v")))
    return datoms.groupBy("e").agg(
        F.array_join(
            F.transform(entries, lambda s: F.concat_ws("=", s["a"], s["v"])), ","
        ).alias("attrs")
    )


def pull_attr_many(datoms: DataFrame, attr: str, out_col: str = "values") -> DataFrame:
    """Forward cardinality-many pull: per entity, the sorted value set
    of one attribute (`:artist/aliases`-style). groupBy(e) + collect_set;
    sorted for stable downstream hashing."""
    return (
        datoms.where(F.col("a") == attr)
        .groupBy("e")
        .agg(F.array_sort(F.collect_set("v")).alias(out_col))
    )


def pull_recursive_ref(
    datoms: DataFrame,
    id_attr: str,
    ref_attr: str,
    depth: int,
) -> DataFrame:
    """Depth-limited recursive ref navigation (the pull pattern
    `{:ref-attr N}`): follow `ref_attr` from each entity's `id_attr`
    value up to `depth` hops; returns (root, path array<string>) with
    the LONGEST reachable chain per root (shorter where the chain ends).

    Spark shape: `depth` self-joins of the (child, parent) edge
    relation — each hop is one equi-join on the frontier's last element,
    fan-out bounded by depth, never a per-entity driver walk. Datomic's
    unbounded `...` recursion belongs to the datalog fixpoint
    (plans/datalog.py rules), not pull."""
    if depth < 1:
        raise ValueError("depth must be >= 1")
    ids = datoms.where(F.col("a") == id_attr).select(
        F.col("e").alias("__ne"), F.col("v").alias("__nid")
    )
    refs = datoms.where(F.col("a") == ref_attr).select(
        F.col("e").alias("__re"), F.col("v").alias("__rv")
    )
    edges = ids.join(refs, F.col("__ne") == F.col("__re")).select(
        F.col("__nid").alias("child"), F.col("__rv").alias("parent")
    )
    frontier = edges.select(
        F.col("child").alias("root"), F.array("parent").alias("path")
    )
    out = frontier
    for _ in range(depth - 1):
        frontier = (
            frontier.alias("f")
            .join(
                edges.alias("g"),
                F.element_at(F.col("f.path"), -1) == F.col("g.child"),
            )
            .select(
                F.col("f.root").alias("root"),
                F.concat(F.col("f.path"), F.array(F.col("g.parent"))).alias("path"),
            )
        )
        out = out.unionByName(frontier)
    return out.groupBy("root").agg(F.max_by("path", F.size("path")).alias("path"))
