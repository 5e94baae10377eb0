"""Time-travel over a transaction-stamped datom log — Datomic's
`d/as-of`, `d/since`, and `d/history` database views (the reference's
target store keeps every datom with its transaction; asserting batch
ids on tx entities, cognitect/xform/batch.clj:36-37, is what makes the
import idempotent across time).

The log is an append-only DataFrame:

    log(e string, a string, v_num double, tx long, added boolean)

(`v_num` here; the same operators work over any value column — pass
`value_col`.) `added=false` is a retraction of the fact.

Semantics (cardinality-one default, per-attr cardinality-many opt-in):
  - as_of(log, t):   the database state at transaction t — for each
    (e, a) [or (e, a, v) for many-attrs], the value written by the
    LATEST tx <= t, kept only if that op was an assert. One groupBy
    with max_by — a single shuffle; the tx <= t predicate reaches the
    scan, so a log partitioned by tx-range prunes at 100 TB.
  - since(log, t):   the CURRENT state restricted to facts whose
    deciding tx came after t (what changed since t, Datomic d/since).
  - history(log):    the full op stream, unfiltered (d/history) — every
    assert and retract with its tx.

The cutoff `t` may be an int literal, a Column, or a ONE-ROW scalar
DataFrame (e.g. `log.agg(F.max("tx"))`-derived) — the scalar frame is
broadcast-cross-joined so the cutoff stays inside the plan with no
driver-side collect.

Same-tx resolution: ops are ordered by (tx, added), so within one
transaction an assert beats a retract on the same key — the replace
idiom [[:db/retract e a] [:db/add e a new]] lands on the new value.
Two DIFFERENT asserts to one cardinality-one (e, a) in one tx remain
undefined here (tx_fns.transact rejects them as a datoms-conflict
before they ever reach the log, mirroring Datomic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Cutoff = "int | Column | DataFrame"


def _with_cutoff(frame: DataFrame, t) -> tuple[DataFrame, Column, str | None]:
    """Normalize a cutoff into (frame', column, joined_col_name):
    scalar DataFrames broadcast-cross-join onto the frame."""
    if isinstance(t, DataFrame):
        name = t.columns[0]
        return frame.crossJoin(F.broadcast(t)), F.col(name), name
    return frame, (t if isinstance(t, Column) else F.lit(t)), None


def _latest(
    log: DataFrame,
    keys: list[str],
    value_col: str,
    value_is_key: bool,
) -> DataFrame:
    """Latest-op resolution: one groupBy over the keys with max_by on
    (tx, added) — the tx decides, and WITHIN one tx an assert beats a
    retract (struct ordering, false < true): the state after a tx is
    (state - retracts) + adds, so the replace idiom
    [[:db/retract e a] [:db/add e a new]] resolves deterministically to
    the new value. When the value column is itself a group key
    (cardinality-many), it is not re-aggregated."""
    ord_key = F.struct(F.col("tx"), F.col("added"))
    aggs = []
    if not value_is_key:
        aggs.append(F.max_by(F.col(value_col), ord_key).alias(value_col))
    aggs += [
        F.max_by(F.col("added"), ord_key).alias("__last_added"),
        F.max("tx").alias("tx"),
    ]
    out = log.groupBy(*[F.col(k) for k in keys]).agg(*aggs)
    cols = ["e", "a", value_col, "tx"]
    return out.where(F.col("__last_added")).select(*cols)


def _state(
    log: DataFrame,
    many_attrs,
    value_col: str,
) -> DataFrame:
    if not many_attrs:
        return _latest(log, ["e", "a"], value_col, False)
    one = _latest(
        log.where(~F.col("a").isin(*many_attrs)), ["e", "a"], value_col, False
    )
    many = _latest(
        log.where(F.col("a").isin(*many_attrs)),
        ["e", "a", value_col],
        value_col,
        True,
    )
    return one.unionByName(many)


def as_of(
    log: DataFrame,
    t,
    many_attrs: frozenset[str] | set[str] = frozenset(),
    value_col: str = "v_num",
) -> DataFrame:
    """Database state at tx t: (e, a, value, tx) rows. Cardinality-one
    attrs resolve per (e, a) — a newer assert implicitly retracts the
    old value; attrs in `many_attrs` resolve per (e, a, value) so each
    asserted value lives or dies independently (Datomic cardinality
    semantics)."""
    frame, cut, _ = _with_cutoff(log, t)
    return _state(frame.where(F.col("tx") <= cut), many_attrs, value_col)


def resolve_instant(
    instants: DataFrame,
    ts,
    tx_col: str = "tx",
    inst_col: str = "inst",
) -> DataFrame:
    """Resolve a wall-clock instant to a transaction cutoff — how
    Datomic's d/as-of / d/since accept a java.util.Date instead of a t:
    every transaction entity carries :db/txInstant, and the cutoff is
    the LATEST tx whose instant <= ts. Returns a one-row scalar frame
    (the shape as_of/since/tx_range already take), so the resolution
    stays inside the plan — broadcast, no driver collect. `ts` may be
    a timestamp string (cast to the instant column's type) or a
    Column."""
    dt = dict(instants.dtypes)[inst_col]
    cut = F.lit(ts).cast(dt) if isinstance(ts, str) else ts
    return instants.where(F.col(inst_col) <= cut).agg(
        F.max(tx_col).alias("__asof_t")
    )


def resolve_instant_after(
    instants: DataFrame,
    ts,
    tx_col: str = "tx",
    inst_col: str = "inst",
) -> DataFrame:
    """The FIRST tx whose :db/txInstant >= ts — the boundary resolution
    of d/tx-range's Date overloads (a start Date means 'transactions at
    or after this moment'; an exclusive end Date means 'before the
    first tx at or after it'). Resolves to Long.MAX when every instant
    precedes ts, so a start beyond the log is empty and an end beyond
    the log is unbounded — matching the int-boundary semantics."""
    dt = dict(instants.dtypes)[inst_col]
    cut = F.lit(ts).cast(dt) if isinstance(ts, str) else ts
    return instants.where(F.col(inst_col) >= cut).agg(
        F.coalesce(F.min(tx_col), F.lit(2**63 - 1)).alias("__after_t")
    )


def as_of_instant(
    log: DataFrame,
    instants: DataFrame,
    ts,
    many_attrs: frozenset[str] | set[str] = frozenset(),
    value_col: str = "v_num",
    tx_col: str = "tx",
    inst_col: str = "inst",
) -> DataFrame:
    """d/as-of with a Date: database state at the latest transaction
    whose :db/txInstant <= ts. Datomic assumes txInstants are
    monotonic in t; if they are not, the max-tx resolution here is
    still deterministic (the largest qualifying tx wins)."""
    return as_of(
        log, resolve_instant(instants, ts, tx_col, inst_col),
        many_attrs, value_col,
    )


def since_instant(
    log: DataFrame,
    instants: DataFrame,
    ts,
    many_attrs: frozenset[str] | set[str] = frozenset(),
    value_col: str = "v_num",
    tx_col: str = "tx",
    inst_col: str = "inst",
) -> DataFrame:
    """d/since with a Date — same :db/txInstant resolution as
    as_of_instant, then the since view at that t."""
    return since(
        log, resolve_instant(instants, ts, tx_col, inst_col),
        many_attrs, value_col,
    )


def since(
    log: DataFrame,
    t,
    many_attrs: frozenset[str] | set[str] = frozenset(),
    value_col: str = "v_num",
) -> DataFrame:
    """Current facts whose deciding transaction came AFTER t — the
    'what changed' view (d/since). Computed as the full current state
    filtered on its deciding tx, NOT as a scan cutoff from t: a fact
    asserted before t and still current must not appear, and a fact
    retracted after t must not reappear."""
    state = _state(log, many_attrs, value_col)
    frame, cut, joined = _with_cutoff(state, t)
    out = frame.where(F.col("tx") > cut)
    return out.drop(joined) if joined else out


def history(
    log: DataFrame,
    no_history_attrs: frozenset[str] | set[str] = frozenset(),
    value_col: str = "v_num",
) -> DataFrame:
    """The raw op stream (d/history): every assert/retract with its tx.
    Identity on the log — exposed for API parity and for composing
    with filters (history of one entity = .where(e == ...)).

    `no_history_attrs` honors the :db/noHistory schema flag: Datomic
    keeps no PAST ops for flagged attrs — history shows only each
    flagged (e, a)'s CURRENT deciding op (superseded asserts and the
    retracts that ended them vanish), while unflagged attrs keep their
    full op stream. as_of/since semantics are untouched by the flag in
    this engine (the log physically retains the ops; the flag shapes
    the HISTORY VIEW, which is the API contract callers observe —
    Datomic itself documents noHistory as best-effort trimming)."""
    if not no_history_attrs:
        return log
    flagged = F.col("a").isin(*no_history_attrs)
    keep = log.where(~flagged)
    current = _latest(
        log.where(flagged), ["e", "a"], value_col, False
    ).select(
        "e", "a", value_col, "tx", F.lit(True).alias("added")
    )
    return keep.unionByName(current)


def log_datoms(
    log: DataFrame, value_col: str = "v_num", keep: tuple[str, ...] = ()
) -> DataFrame:
    """The history db as a QUERYABLE DATOMS VIEW: (e, a, v, v_num, tx,
    added). Datalog patterns over this frame may bind the transaction
    and op positions — [?e ?a ?v ?tx ?op] — Datomic's history-db query
    shape ('what was asserted/retracted, when'), e.g.

        [:find ?e ?tx :where [?e :user/click _ ?tx false]]

    The canonical string `v` follows eav.table_datoms's formatting
    (integral doubles lose the trailing .0) so value joins against data
    datoms line up; v_num carries the numeric projection."""
    if value_col == "v_num":
        v = F.regexp_replace(F.col("v_num").cast("string"), r"\.0$", "")
        vn = F.col("v_num")
    else:
        v = F.col(value_col).cast("string")
        vn = F.col(value_col).try_cast("double")
    return log.select(
        "e", "a", v.alias("v"), vn.alias("v_num"), "tx", "added",
        *[c for c in keep if c in log.columns],
    )


def materialize_log(log: DataFrame, path: str) -> None:
    """Write the tx log as ATTRIBUTE-partitioned parquet — the durable
    shape that makes tx-fn point reads and attribute-scoped history
    partition-pruned scans (one attr's directory, not the log). The
    mirror of eav.materialize_datoms for the tx-stamped store."""
    log.write.mode("overwrite").partitionBy("a").parquet(path)


def read_log(spark, path: str, value_col: str = "v_num") -> DataFrame:
    """Read a materialized tx log; `.where(a == ...)` — including the
    filters tx_fns._pruned_state applies for cas — prunes to the
    attribute's partition directory (PartitionFilters in the scan)."""
    return spark.read.parquet(path).select(
        "e", "a", value_col, "tx", "added"
    )


def retract_entity(
    log: DataFrame,
    entity: str,
    tx: int,
    many_attrs: frozenset[str] | set[str] = frozenset(),
    value_col: str = "v_num",
) -> DataFrame:
    """The `:db.fn/retractEntity` transaction function: append a
    retraction op at `tx` for every fact of `entity` current just
    before `tx`. Purely log-structured — nothing is deleted, so
    as_of(t < tx) still sees the entity and as_of(t >= tx) does not.
    Returns the extended log."""
    current = _state(
        log.where((F.col("e") == entity) & (F.col("tx") < tx)),
        many_attrs,
        value_col,
    )
    retracts = current.select(
        "e", "a", value_col,
        F.lit(tx).cast("long").alias("tx"),
        F.lit(False).alias("added"),
    )
    return log.unionByName(retracts)


def retract_entity_cascade(
    log: DataFrame,
    entity: str,
    tx: int,
    component_attrs: frozenset[str] | set[str],
    many_attrs: frozenset[str] | set[str] = frozenset(),
    value_col: str = "v",
    max_depth: int = 5,
) -> DataFrame:
    """`:db.fn/retractEntity` with `:db/isComponent` semantics: retracting
    an entity also retracts every entity it owns through a component
    attribute, recursively (Datomic cascades component refs; plain refs
    are left alone). The ref value of a component attr IS the child
    entity id (string `value_col`).

    Distributed shape: the frontier expansion is a bounded driver loop
    (<= max_depth levels) of joins against the pre-tx state — each level
    one equi-join + anti-join, no per-entity walk. Returns the log
    extended with retraction ops at `tx` for the whole component tree."""
    spark = log.sparkSession
    state = _state(log.where(F.col("tx") < tx), many_attrs, value_col)
    frontier = spark.createDataFrame([(entity,)], "e string")
    seen = frontier
    for _ in range(max_depth):
        children = (
            state.join(frontier, "e")
            .where(F.col("a").isin(list(component_attrs)))
            .select(F.col(value_col).alias("e"))
            .distinct()
        )
        new = children.join(seen, "e", "left_anti")
        if not new.take(1):
            break
        seen = seen.unionByName(new)
        frontier = new
    retracts = state.join(seen, "e").select(
        "e", "a", value_col,
        F.lit(tx).cast("long").alias("tx"),
        F.lit(False).alias("added"),
    )
    return log.unionByName(retracts)


def retract_attribute(
    log: DataFrame,
    entity: str,
    attr: str,
    tx: int,
    many_attrs: frozenset[str] | set[str] = frozenset(),
    value_col: str = "v_num",
) -> DataFrame:
    """`[:db/retract e a]` with no value — retract EVERY currently
    asserted value of one attribute of one entity (for cardinality-many
    attrs that is each live value independently). Log-structured like
    retract_entity: appends retraction ops at `tx`, returns the
    extended log; other attributes are untouched."""
    current = _state(
        log.where(
            (F.col("e") == entity) & (F.col("a") == attr) & (F.col("tx") < tx)
        ),
        many_attrs,
        value_col,
    )
    retracts = current.select(
        "e", "a", value_col,
        F.lit(tx).cast("long").alias("tx"),
        F.lit(False).alias("added"),
    )
    return log.unionByName(retracts)


def excise(
    log: DataFrame,
    entity: str,
    tx: int,
    value_col: str = "v_num",
    attrs: frozenset[str] | set[str] | None = None,
    before: int | None = None,
) -> DataFrame:
    """`:db/excise` — permanent removal of every datom of `entity`,
    INCLUDING history (unlike retract_entity, which only ends the
    entity's present). Datomic excision erases the data but leaves an
    audit datom recording that an excision happened at `tx`; after it,
    as_of at ANY time shows nothing for the entity.

    Scoping knobs, exactly Datomic's: `attrs` (:db.excise/attrs) limits
    erasure to the named attributes — the entity's other facts keep
    their history; `before` (:db.excise/beforeT) erases only datoms
    whose tx < before — the retain-recent-history shape GDPR-style
    retention uses. Both compose (erase old values of one attr).

    The returned log = (log minus the entity's datoms) + one audit op.
    As in Datomic, the audit lives on a FRESH excision entity (here
    'db.excise:{entity}:{tx}', carrying the target in its id the way
    Datomic's excision entity carries it in :db/excise) — asserting it
    under the excised id would make as_of(t >= tx) show a datom for an
    entity whose every trace was just erased. The filter is a pushdown
    predicate — at scale this is the one operation that rewrites
    storage, exactly as in Datomic (excision is a segment rewrite
    there too)."""
    doomed = F.col("e") == entity
    if attrs is not None:
        doomed = doomed & F.col("a").isin(list(attrs))
    if before is not None:
        doomed = doomed & (F.col("tx") < before)
    survivors = log.where(~doomed)
    value_type = "double"
    try:
        from pyspark.sql import types as T

        if isinstance(log.schema[value_col].dataType, T.StringType):
            value_type = "string"
    except KeyError:
        pass
    audit = log.sparkSession.createDataFrame(
        [(f"db.excise:{entity}:{tx}", ":db/excise", None, tx, True)],
        f"e string, a string, {value_col} {value_type}, tx long, added boolean",
    )
    return survivors.unionByName(audit)


def entity_timeline(log: DataFrame, entity: str, value_col: str = "v_num") -> DataFrame:
    """All ops for one entity in tx order — the d/history-of-entity
    audit query."""
    return (
        log.where(F.col("e") == entity)
        .select("e", "a", value_col, "tx", "added")
        .orderBy("tx", "a")
    )


def with_tx(
    log: DataFrame,
    tx_data: DataFrame,
    tx: int,
    value_col: str = "v_num",
) -> DataFrame:
    """`d/with` — a SPECULATIVE database value: the log extended with
    `tx_data` ops stamped at `tx`. DataFrames are immutable, so the
    durable log is untouched; as_of/since/history over the returned
    frame see the speculation, callers holding the original do not.
    `tx_data` needs (e, a, value, added) columns."""
    ops = tx_data.select(
        "e", "a", F.col(value_col),
        F.lit(tx).cast("long").alias("tx"),
        F.col("added"),
    )
    return log.unionByName(ops)


def tx_range(
    log: DataFrame,
    start,
    end=None,
    no_history_attrs: frozenset[str] | set[str] = frozenset(),
    value_col: str = "v_num",
    instants: DataFrame | None = None,
) -> DataFrame:
    """`d/tx-range` — the op stream for start <= tx < end (end=None =
    unbounded), in tx order. Datomic's boundaries are t's OR Dates:
    pass timestamp strings with an `instants` frame (tx, inst) and each
    resolves through :db/txInstant (resolve_instant) as an in-plan
    broadcast scalar. On tx-partitioned storage the int-boundary
    predicate is a partition-pruned range scan. `no_history_attrs`
    applies the :db/noHistory trim (see `history`) before the range
    filter, so superseded ops of flagged attrs never surface in a
    range either."""
    def boundary(t):
        if isinstance(t, str):
            if instants is None:
                raise ValueError(
                    "tx_range instant boundary needs the instants frame "
                    "(tx, inst) — pass instants="
                )
            return resolve_instant_after(instants, t)
        return t

    out = history(log, no_history_attrs, value_col)
    frame, cut, joined = _with_cutoff(out, boundary(start))
    out = frame.where(F.col("tx") >= cut)
    if joined:
        out = out.drop(joined)
    if end is not None:
        frame, cut, joined = _with_cutoff(out, boundary(end))
        out = frame.where(F.col("tx") < cut)
        if joined:
            out = out.drop(joined)
    return out.orderBy("tx", "e", "a")
