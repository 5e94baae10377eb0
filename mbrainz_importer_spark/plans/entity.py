"""`d/entity`-style lazy navigation over the datoms view.

Datomic's entity API is the interactive, point-oriented complement to
pull/datalog: `(d/entity db eid)` returns a lazy map-like value whose
attribute accesses hit the EAVT index on demand, `(d/touch e)` realizes
all attributes, `:ns/_attr` navigates refs in reverse. The round-5
verdict listed it as the final unimplemented Datomic surface (pull
covers the bulk use cases; this is the REPL/point-lookup ergonomic).

Spark-first framing: an Entity holds (datoms, eid) and each access is a
point query — `datoms.where(e == eid & a == attr)` — which on
attribute-partitioned, e/v-sorted storage (eav.materialize_datoms) is a
partition-pruned probe, the EAVT-index asymptotics. Accesses cache in
the Entity (d/entity semantics: a stable snapshot of facts, EAV has no
nulls so absent attr = None). touch() realizes everything in ONE scan
instead of per-attribute probes.

This is deliberately NOT a bulk API: navigating a million entities this
way is a million point queries. Set-oriented access belongs to
pull_entities / datalog; the docstring contract mirrors Datomic's own
guidance (entity for interactive walks, query for analytics).

Ref navigation: our entity ids are '{table}:{key}' and refs are
value-joins on the target's identity attribute (eav.py id scheme), so
`ref(attr, table)` wraps the attr's value as Entity('{table}:{v}') and
`reverse(attr)` finds entities asserting attr = this entity's key —
exactly the :ns/_attr reverse walk under the value-join convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class Entity:
    """Lazy entity map. `ent[attr]` / `ent.get(attr)` probe one
    attribute (cached); `touch()` realizes all; `ref`/`reverse`
    navigate. Cardinality-many attrs (in `many_attrs`) return a sorted
    tuple of values; others a scalar or None."""

    def __init__(
        self,
        datoms: DataFrame,
        eid: str,
        many_attrs: frozenset[str] | set[str] = frozenset(),
    ):
        self.datoms = datoms
        self.eid = eid
        self.many_attrs = frozenset(many_attrs)
        self._cache: dict[str, object] = {}
        self._touched = False

    def __repr__(self) -> str:  # pragma: no cover - repr cosmetics
        state = "touched" if self._touched else f"{len(self._cache)} cached"
        return f"Entity({self.eid!r}, {state})"

    def _realize(self, pairs: list[tuple[str, str]]) -> None:
        vals: dict[str, list[str]] = {}
        for a, v in pairs:
            vals.setdefault(a, []).append(v)
        for a, vs in vals.items():
            if a in self.many_attrs:
                self._cache[a] = tuple(sorted(vs))
            else:
                if len(vs) > 1:
                    raise ValueError(
                        f"attribute {a} of {self.eid} has {len(vs)} values "
                        f"but is not declared in many_attrs"
                    )
                self._cache[a] = vs[0]

    def get(self, attr: str, default=None):
        """One-attribute probe (EAVT point read), cached."""
        if attr in self._cache:
            return self._cache[attr]
        if self._touched:
            return default
        rows = (
            self.datoms.where(
                (F.col("e") == self.eid) & (F.col("a") == attr)
            )
            .select("a", "v")
            .collect()
        )
        if not rows:
            return default
        self._realize([(r["a"], r["v"]) for r in rows])
        return self._cache.get(attr, default)

    def __getitem__(self, attr: str):
        return self.get(attr)

    def touch(self) -> dict[str, object]:
        """Realize every attribute in one scan (d/touch); returns the
        attribute map (and caches it)."""
        if not self._touched:
            rows = (
                self.datoms.where(F.col("e") == self.eid)
                .select("a", "v")
                .collect()
            )
            self._cache = {}
            self._realize([(r["a"], r["v"]) for r in rows])
            self._touched = True
        return dict(self._cache)

    def keys(self) -> list[str]:
        return sorted(self.touch())

    @property
    def key(self) -> str:
        """The id part of '{table}:{key}' entity ids."""
        return self.eid.split(":", 1)[1] if ":" in self.eid else self.eid

    def ref(self, attr: str, table: str) -> "Entity | None":
        """Forward ref navigation: the attr's value is the target
        table's identity key; returns the target Entity (or None if the
        attr is absent). Datomic's `(:customer/nation e)` walk under the
        value-join id scheme."""
        v = self.get(attr)
        if v is None:
            return None
        if isinstance(v, tuple):
            raise ValueError(f"ref() on cardinality-many attr {attr}; iterate refs_many()")
        return Entity(self.datoms, f"{table}:{v}", self.many_attrs)

    def refs_many(self, attr: str, table: str) -> "list[Entity]":
        """Forward navigation over a cardinality-many ref attr."""
        vs = self.get(attr)
        if vs is None:
            return []
        if not isinstance(vs, tuple):
            vs = (vs,)
        return [Entity(self.datoms, f"{table}:{v}", self.many_attrs) for v in vs]

    def reverse(self, attr: str, limit: int = 1000) -> "list[Entity]":
        """Reverse navigation (:ns/_attr): entities asserting
        attr = THIS entity's key, sorted by id. Bounded by `limit` —
        a reverse walk from a hub entity can fan out arbitrarily; use
        pull_reverse / datalog for the unbounded set."""
        rows = (
            self.datoms.where(
                (F.col("a") == attr) & (F.col("v") == self.key)
            )
            .select("e")
            .distinct()
            .orderBy("e")
            .limit(limit)
            .collect()
        )
        return [Entity(self.datoms, r["e"], self.many_attrs) for r in rows]


def entity(
    datoms: DataFrame,
    eid: str,
    many_attrs: frozenset[str] | set[str] = frozenset(),
) -> Entity:
    """`(d/entity db eid)` — lazy entity map over the datoms view."""
    return Entity(datoms, eid, many_attrs)
