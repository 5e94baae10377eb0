"""The Connection facade (plans/client.py:connect) — the Datomic
connection lifecycle over durable storage: transact -> immediate
visibility (memory index) -> request_index (store fold) -> time travel
from the retained log -> durability across connections."""

from __future__ import annotations

import os

import pytest

from mbrainz_importer_spark.plans.client import connect
from mbrainz_importer_spark.plans.tx_fns import TxAbort


def _datoms(db):
    return sorted(tuple(r) for r in db.select("e", "a", "v").collect())


def test_connection_lifecycle(spark, tmp_path):
    conn = connect(spark, str(tmp_path / "db"))
    assert conn.basis_t() == 0
    assert conn.db().count() == 0

    r1 = conn.transact([
        [":db/add", "acct:1", ":acct/bal", 100],
        [":db/add", "acct:2", ":acct/bal", 50],
        [":db/add", "acct:1", ":acct/owner", "ada"],
    ])
    assert r1 == {"tx": 1, "n_ops": 3}
    # memory-index semantics: visible before any indexing
    assert ("acct:1", ":acct/bal", "100") in _datoms(conn.db())

    # cas against the current value; retract; both expand through tx_fns
    r2 = conn.transact([
        [":db/cas", "acct:1", ":acct/bal", 100, 80],
        [":db/retract", "acct:2", ":acct/bal", 50],
    ])
    assert r2["tx"] == 2
    now = _datoms(conn.db())
    assert ("acct:1", ":acct/bal", "80") in now
    assert all(not (e == "acct:2" and a == ":acct/bal") for e, a, _ in now)

    # a cas mismatch aborts the WHOLE tx and appends nothing
    with pytest.raises(TxAbort):
        conn.transact([[":db/cas", "acct:1", ":acct/bal", 999, 0]])
    assert conn.basis_t() == 2

    # background index job: store holds the state, db() unchanged
    before = _datoms(conn.db())
    assert conn.request_index() == 2
    assert os.path.exists(os.path.join(conn.store_path, "_SUCCESS"))
    assert _datoms(conn.db()) == before
    assert conn.request_index() == 2  # no-op when nothing is unindexed

    # post-index transacting keeps working; the fresh op is unindexed
    conn.transact([[":db/add", "acct:3", ":acct/bal", 7]])
    assert ("acct:3", ":acct/bal", "7") in _datoms(conn.db())

    # time travel from the retained log survives indexing
    asof1 = conn.as_of(1)
    vals = {(r["e"], r["a"]): r["v"] for r in asof1.collect()}
    assert vals[("acct:1", ":acct/bal")] == "100"
    assert vals[("acct:2", ":acct/bal")] == "50"

    # durability: a NEW connection over the same root sees everything
    conn2 = connect(spark, str(tmp_path / "db"))
    assert conn2.basis_t() == 3
    assert _datoms(conn2.db()) == _datoms(conn.db())


def test_connection_custom_tx_fn(spark, tmp_path):
    """An installed fn reads the pre-tx state and expands to primitive
    ops — the transfer idiom, end-to-end through the facade."""
    from pyspark.sql import functions as F

    conn = connect(spark, str(tmp_path / "db"))
    conn.transact([
        [":db/add", "acct:a", ":acct/bal", 100],
        [":db/add", "acct:b", ":acct/bal", 10],
    ])

    def transfer(state, src, dst, amount):
        rows = {r["e"]: float(r["v"]) for r in state.where(
            (F.col("a") == ":acct/bal") & F.col("e").isin([src, dst])
        ).collect()}
        return [
            [":db/cas", src, ":acct/bal", rows[src], rows[src] - amount],
            [":db/cas", dst, ":acct/bal", rows[dst], rows[dst] + amount],
        ]

    conn.transact([["transfer", "acct:a", "acct:b", 30]],
                  fns={"transfer": transfer})
    vals = {r["e"]: r["v"] for r in conn.db().where(
        "a = ':acct/bal'").collect()}
    assert vals == {"acct:a": "70", "acct:b": "40"}


def test_connection_query_front_door(spark, tmp_path):
    """q (dict + EDN text), pull, entity, datoms all read the live
    connection value — fresh transactions visible through every door."""
    conn = connect(spark, str(tmp_path / "db"))
    conn.transact([
        [":db/add", "acct:1", ":acct/bal", 100],
        [":db/add", "acct:2", ":acct/bal", 50],
    ])
    rows = conn.q({"find": ["?e", "?v"],
                   "where": [["?e", ":acct/bal", "?v"]]}).orderBy("e").collect()
    assert [(r[0], r[1]) for r in rows] == [("acct:1", "100"), ("acct:2", "50")]
    edn = conn.q('[:find ?e ?v :where [?e :acct/bal ?v]]').orderBy("e").collect()
    assert [(r[0], r[1]) for r in edn] == [("acct:1", "100"), ("acct:2", "50")]
    pulled = conn.pull({"bal": ":acct/bal"}).orderBy("e").collect()
    assert [(r["e"], r["bal"]) for r in pulled] == [("acct:1", "100"), ("acct:2", "50")]
    assert conn.entity("acct:1")[":acct/bal"] == "100"
    scan = conn.datoms("avet", a=":acct/bal").collect()
    # AVET orders by canonical-string v: "100" < "50" lexicographically
    assert [r["e"] for r in scan] == ["acct:1", "acct:2"]


def test_connection_with_speculative(spark, tmp_path):
    """d/with at the connection: the speculative value sees the
    expansion; the durable connection does not."""
    conn = connect(spark, str(tmp_path / "db"))
    conn.transact([[":db/add", "acct:1", ":acct/bal", 100]])
    spec = conn.with_([
        [":db/cas", "acct:1", ":acct/bal", 100, 1],
        [":db/add", "acct:9", ":acct/bal", 9],
    ])
    got = {r["e"]: r["v"] for r in spec.where("a = ':acct/bal'").collect()}
    assert got == {"acct:1": "1", "acct:9": "9"}
    durable = {r["e"]: r["v"] for r in conn.db().collect()}
    assert durable == {"acct:1": "100"}
    assert conn.basis_t() == 1
