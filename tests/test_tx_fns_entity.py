"""Tests for the Datomic deep tail closed in round 6: custom
transaction functions (plans/tx_fns.py — the :db/fn surface) and
d/entity-style lazy navigation (plans/entity.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mbrainz_importer_spark.plans.entity import entity
from mbrainz_importer_spark.plans.history import as_of
from mbrainz_importer_spark.plans.tx_fns import TxAbort, transact


@pytest.fixture()
def log(spark):
    rows = [
        ("acct:1", ":acct/bal", 100.0, 1, True),
        ("acct:2", ":acct/bal", 50.0, 1, True),
        ("acct:2", ":acct/flag", 1.0, 1, True),
        ("acct:3", ":acct/bal", 7.0, 1, True),
    ]
    return spark.createDataFrame(
        rows, "e string, a string, v_num double, tx long, added boolean"
    )


def _state_at(out, t):
    return {
        (r["e"], r["a"]): r["v_num"] for r in as_of(out, t).collect()
    }


def test_transact_add_and_point_retract(log):
    out = transact(log, [
        [":db/add", "acct:4", ":acct/bal", 9],     # int coerces to double
        [":db/retract", "acct:3", ":acct/bal", 7.0],
    ], tx=2)
    got = _state_at(out, 2)
    assert got[("acct:4", ":acct/bal")] == 9.0
    assert ("acct:3", ":acct/bal") not in got
    # history intact: tx 1 still sees acct:3
    assert ("acct:3", ":acct/bal") in _state_at(out, 1)


def test_transact_attr_wide_and_entity_retract(log):
    out = transact(log, [
        [":db/retract", "acct:2", ":acct/flag"],
        [":db.fn/retractEntity", "acct:1"],
    ], tx=2)
    got = _state_at(out, 2)
    assert ("acct:2", ":acct/flag") not in got
    assert got[("acct:2", ":acct/bal")] == 50.0
    assert not any(e == "acct:1" for (e, _) in got)


def test_cas_success_mismatch_and_absent(log):
    out = transact(log, [[":db/cas", "acct:1", ":acct/bal", 100.0, 80.0]], tx=2)
    assert _state_at(out, 2)[("acct:1", ":acct/bal")] == 80.0

    with pytest.raises(TxAbort, match="cas mismatch"):
        transact(log, [[":db/cas", "acct:1", ":acct/bal", 99.0, 80.0]], tx=2)
    # cas-from-absent (old=None) asserts only when no current value
    out = transact(log, [[":db/cas", "acct:9", ":acct/bal", None, 5.0]], tx=2)
    assert _state_at(out, 2)[("acct:9", ":acct/bal")] == 5.0
    with pytest.raises(TxAbort, match="cas mismatch"):
        transact(log, [[":db/cas", "acct:1", ":acct/bal", None, 5.0]], tx=2)


def test_custom_fn_expansion_recursive(log):
    def transfer(state, src, dst, amount):
        bal = {
            r["e"]: r["v_num"]
            for r in state.where(
                F.col("e").isin([src, dst]) & (F.col("a") == ":acct/bal")
            ).collect()
        }
        return [
            [":db/cas", src, ":acct/bal", bal[src], bal[src] - amount],
            [":db/cas", dst, ":acct/bal", bal[dst], bal[dst] + amount],
        ]

    def transfer_all(state, pairs, amount):
        # a tx fn returning INVOCATIONS of another tx fn — recursive
        # expansion, Datomic semantics
        return [["transfer", s, d, amount] for s, d in pairs]

    fns = {"transfer": transfer, "transfer_all": transfer_all}
    out = transact(
        log, [["transfer_all", [("acct:1", "acct:2")], 30.0]], tx=2, fns=fns
    )
    got = _state_at(out, 2)
    assert got[("acct:1", ":acct/bal")] == 70.0
    assert got[("acct:2", ":acct/bal")] == 80.0


def test_unknown_fn_runaway_and_builtin_shadow(log):
    with pytest.raises(TxAbort, match="unknown tx fn"):
        transact(log, [["nope", 1]], tx=2)
    with pytest.raises(TxAbort, match="non-terminating"):
        transact(
            log, [["loop"]], tx=2,
            fns={"loop": lambda state: [["loop"]]}, max_forms=20,
        )
    with pytest.raises(TxAbort, match="built-in"):
        transact(log, [], tx=2, fns={":db/add": lambda s: []})
    with pytest.raises(TxAbort, match="malformed"):
        transact(log, [[42]], tx=2)
    # empty tx-data is a no-op returning the log unchanged
    assert transact(log, [], tx=2).count() == log.count()


def test_transact_string_valued_log(spark):
    """transact over a CANONICAL-STRING log (value_col='v', the datom
    store's value shape): numbers canonicalize like eav.table_datoms
    (42 -> '42'), booleans to 'true'/'false', cas compares strings, and
    the conflict check sees through the canonicalization."""
    log = spark.createDataFrame(
        [("doc:1", ":doc/status", "draft", 1, True),
         ("doc:1", ":doc/rev", "3", 1, True)],
        "e string, a string, v string, tx long, added boolean",
    )
    out = transact(log, [
        [":db/cas", "doc:1", ":doc/status", "draft", "live"],
        [":db/cas", "doc:1", ":doc/rev", 3, 4],      # int canon -> '3'/'4'
        [":db/add", "doc:1", ":doc/flag", True],     # bool canon -> 'true'
    ], tx=2, value_col="v")
    got = {(r["e"], r["a"]): r["v"]
           for r in as_of(out, 2, value_col="v").collect()}
    assert got[("doc:1", ":doc/status")] == "live"
    assert got[("doc:1", ":doc/rev")] == "4"
    assert got[("doc:1", ":doc/flag")] == "true"
    with pytest.raises(TxAbort, match="cas mismatch"):
        transact(log, [[":db/cas", "doc:1", ":doc/rev", 2, 5]],
                 tx=2, value_col="v")
    with pytest.raises(TxAbort, match="datoms-conflict"):
        transact(log, [
            [":db/add", "doc:1", ":doc/rev", 7],
            [":db/add", "doc:1", ":doc/rev", "8"],
        ], tx=2, value_col="v")


def test_point_read_partition_pruned(log, tmp_path):
    """The exact frame transact's cas/retract point reads evaluate
    (_pruned_state) over a store-backed log must be a PARTITION-PRUNED
    scan: the attribute predicate reaches PartitionFilters, so a cas
    reads one attr directory, never the log."""
    from mbrainz_importer_spark.plans.history import materialize_log, read_log
    from mbrainz_importer_spark.plans.tx_fns import _pruned_state

    path = str(tmp_path / "txlog")
    materialize_log(log, path)
    store = read_log(log.sparkSession, path)
    frame = _pruned_state(
        store.where(F.col("tx") < 2), frozenset(), "v_num",
        e="acct:1", a=":acct/bal",
    )
    plan = frame._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert ":acct/bal" in plan.split("PartitionFilters")[1][:200]
    # and transact over the store-backed log behaves identically
    out = transact(store, [[":db/cas", "acct:1", ":acct/bal", 100.0, 80.0]], tx=2)
    assert _state_at(out, 2)[("acct:1", ":acct/bal")] == 80.0


def test_datoms_conflict_two_asserts_cardinality_one(log):
    """Two different values for one cardinality-one (e, a) in one tx —
    Datomic's :db.error/datoms-conflict. Both cas forms validate against
    the PRE-tx state, so without the conflict check two same-account
    transfers would silently double-spend."""
    with pytest.raises(TxAbort, match="datoms-conflict"):
        transact(log, [
            [":db/add", "acct:1", ":acct/bal", 80.0],
            [":db/add", "acct:1", ":acct/bal", 60.0],
        ], tx=2)
    with pytest.raises(TxAbort, match="datoms-conflict"):
        transact(log, [
            [":db/cas", "acct:1", ":acct/bal", 100.0, 80.0],
            [":db/cas", "acct:1", ":acct/bal", 100.0, 60.0],
        ], tx=2)
    # same value twice is idempotent, not a conflict (set semantics) —
    # and the op dedupes to a single log row
    out = transact(log, [
        [":db/add", "acct:1", ":acct/bal", 80.0],
        [":db/add", "acct:1", ":acct/bal", 80.0],
    ], tx=2)
    assert out.where(
        (F.col("tx") == 2) & (F.col("e") == "acct:1")
    ).count() == 1
    # distinct values on a cardinality-MANY attr are fine
    out = transact(log, [
        [":db/add", "acct:1", ":acct/tag", 1.0],
        [":db/add", "acct:1", ":acct/tag", 2.0],
    ], tx=2, many_attrs={":acct/tag"})
    assert out.where(F.col("a") == ":acct/tag").count() == 2


def test_datoms_conflict_add_vs_retract(log):
    """An assert and a retract of the SAME datom in one tx conflicts —
    both the literal form and the set-oriented expansions
    ([:db/retract e a] / retractEntity reading the pre-tx state)."""
    with pytest.raises(TxAbort, match="datoms-conflict"):
        transact(log, [
            [":db/add", "acct:1", ":acct/bal", 100.0],
            [":db/retract", "acct:1", ":acct/bal", 100.0],
        ], tx=2)
    # attr-wide retract expands to the CURRENT value 100.0 — re-adding
    # that exact datom in the same tx is add-vs-retract of one datom
    with pytest.raises(TxAbort, match="datoms-conflict"):
        transact(log, [
            [":db/retract", "acct:1", ":acct/bal"],
            [":db/add", "acct:1", ":acct/bal", 100.0],
        ], tx=2)
    # replacing with a DIFFERENT value alongside the wide retract is the
    # legitimate replace idiom, not a conflict
    out = transact(log, [
        [":db/retract", "acct:1", ":acct/bal"],
        [":db/add", "acct:1", ":acct/bal", 42.0],
    ], tx=2)
    assert _state_at(out, 2)[("acct:1", ":acct/bal")] == 42.0


@pytest.fixture(scope="module")
def datoms(spark):
    rows = [
        ("cust:1", ":cust/name", "alice", None),
        ("cust:1", ":cust/nation", "2", 2.0),
        ("cust:1", ":cust/tag", "a", None),
        ("cust:1", ":cust/tag", "b", None),
        ("cust:2", ":cust/nation", "2", 2.0),
        ("nation:2", ":nation/name", "FRANCE", None),
    ]
    return spark.createDataFrame(rows, "e string, a string, v string, v_num double")


def test_entity_lazy_access_and_touch(datoms):
    ent = entity(datoms, "cust:1", many_attrs={":cust/tag"})
    assert ent[":cust/name"] == "alice"
    assert ent[":cust/tag"] == ("a", "b")  # cardinality-many -> sorted tuple
    assert ent.get(":cust/missing") is None
    assert ent.get(":cust/missing", "dflt") == "dflt"
    assert ent.keys() == [":cust/name", ":cust/nation", ":cust/tag"]
    assert ent.touch()[":cust/nation"] == "2"
    # after touch, absent attrs answer from cache (no probe)
    assert ent.get(":cust/other") is None


def test_entity_ref_navigation(datoms):
    ent = entity(datoms, "cust:1", many_attrs={":cust/tag"})
    nation = ent.ref(":cust/nation", "nation")
    assert nation[":nation/name"] == "FRANCE"
    assert ent.ref(":cust/missing", "nation") is None
    with pytest.raises(ValueError, match="cardinality-many"):
        ent.ref(":cust/tag", "x")
    assert [e.eid for e in ent.refs_many(":cust/tag", "tag")] == [
        "tag:a", "tag:b",
    ]


def test_entity_reverse_navigation(datoms):
    nation = entity(datoms, "nation:2")
    back = nation.reverse(":cust/nation")
    assert [e.eid for e in back] == ["cust:1", "cust:2"]


def test_entity_many_undeclared_raises(datoms):
    ent = entity(datoms, "cust:1")  # :cust/tag not declared many
    with pytest.raises(ValueError, match="not declared in many_attrs"):
        ent[":cust/tag"]
