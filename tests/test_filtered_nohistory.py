"""d/filter (plans/eav.filtered) and :db/noHistory (plans/history) —
round-7 additions: the filtered database value must compose with every
datoms/log consumer, and the noHistory trim must shape the history view
without disturbing current-state semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mbrainz_importer_spark.plans.datalog import q
from mbrainz_importer_spark.plans.eav import attr_namespace_pred, filtered
from mbrainz_importer_spark.plans.history import as_of, history, tx_range
from mbrainz_importer_spark.plans.pull import pull_entities


@pytest.fixture(scope="module")
def datoms(spark):
    rows = [
        ("cust:1", ":cust/name", "alice", None),
        ("cust:1", ":cust/bal", "10", 10.0),
        ("cust:1", ":secret/ssn", "123", 123.0),
        ("cust:2", ":cust/name", "bob", None),
        ("cust:2", ":secret/ssn", "456", 456.0),
    ]
    return spark.createDataFrame(
        rows, "e string, a string, v string, v_num double"
    )


def test_filtered_composes_with_q(datoms):
    db = filtered(datoms, attr_namespace_pred(":secret", exclude=True))
    out = q({"find": ["?a", ("count", "?e")], "where": [["?e", "?a", "_"]]}, db)
    got = {r["a"]: r["count_e"] for r in out.collect()}
    assert got == {":cust/name": 2, ":cust/bal": 1}
    # the inverse filter sees ONLY the trimmed namespace
    db2 = filtered(datoms, attr_namespace_pred(":secret"))
    out2 = q({"find": ["?a", ("count", "?e")], "where": [["?e", "?a", "_"]]}, db2)
    assert {r["a"]: r["count_e"] for r in out2.collect()} == {":secret/ssn": 2}


def test_filtered_composes_with_pull(datoms):
    db = filtered(datoms, attr_namespace_pred(":secret", exclude=True))
    out = pull_entities(db, {
        "name": ":cust/name", "ssn": ":secret/ssn",
    }).orderBy("e").collect()
    assert [r["name"] for r in out] == ["alice", "bob"]
    assert all(r["ssn"] is None for r in out)  # trimmed attr pulls absent


def test_filtered_pred_pushes_down(datoms, tmp_path):
    """On the attr-partitioned store the namespace trim must prune
    partitions — PartitionFilters in the scan, not a per-row filter."""
    from mbrainz_importer_spark.plans.eav import materialize_datoms, read_datoms

    path = str(tmp_path / "store")
    materialize_datoms(datoms, path)
    store = read_datoms(datoms.sparkSession, path)
    db = filtered(store, F.col("a") == ":cust/bal")
    plan = db._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "(a" in plan.split("PartitionFilters")[1][:120]


@pytest.fixture(scope="module")
def log(spark):
    rows = [
        # :acct/bal flagged noHistory: three supersessions + a retract era
        ("acct:1", ":acct/bal", 10.0, 1, True),
        ("acct:1", ":acct/bal", 20.0, 2, True),
        ("acct:1", ":acct/bal", None, 3, False),
        ("acct:1", ":acct/bal", 30.0, 4, True),
        # acct:2's bal currently retracted — no current op at all
        ("acct:2", ":acct/bal", 5.0, 1, True),
        ("acct:2", ":acct/bal", 5.0, 2, False),
        # unflagged attr keeps its full stream
        ("acct:1", ":acct/name", 1.0, 1, True),
        ("acct:1", ":acct/name", 2.0, 2, True),
    ]
    return spark.createDataFrame(
        rows, "e string, a string, v_num double, tx long, added boolean"
    )


def test_no_history_trims_superseded_ops(log):
    out = history(log, no_history_attrs={":acct/bal"}).collect()
    bal_ops = [(r["e"], r["v_num"], r["tx"], r["added"])
               for r in out if r["a"] == ":acct/bal"]
    # only acct:1's CURRENT deciding assert survives; acct:2 (currently
    # retracted) contributes nothing
    assert bal_ops == [("acct:1", 30.0, 4, True)]
    name_ops = sorted(r["tx"] for r in out if r["a"] == ":acct/name")
    assert name_ops == [1, 2]  # unflagged: full stream


def test_no_history_tx_range(log):
    out = tx_range(log, 1, 4, no_history_attrs={":acct/bal"}).collect()
    # the current bal op sits at tx 4, outside [1, 4) — only the
    # unflagged stream survives the range
    assert all(r["a"] == ":acct/name" for r in out)
    out2 = tx_range(log, 1, 5, no_history_attrs={":acct/bal"}).collect()
    assert [(r["a"], r["tx"]) for r in out2 if r["a"] == ":acct/bal"] == [
        (":acct/bal", 4)]


def test_no_history_as_of_now_equivalence(log):
    """The trimmed log still resolves the SAME current state: as-of over
    history(log, flags) at the head equals as-of over the raw log (the
    trim only drops ops that never decide the present)."""
    t = 4
    full = {(r["e"], r["a"]): (r["v_num"], r["tx"])
            for r in as_of(log, t).collect()}
    trimmed = {(r["e"], r["a"]): (r["v_num"], r["tx"])
               for r in as_of(history(log, {":acct/bal"}), t).collect()}
    assert full == trimmed


def test_filtered_composes_with_as_of(log):
    """d/filter over a LOG frame: trimming an attr namespace before
    as-of hides it from the resolved state."""
    db = as_of(filtered(log, F.col("a") != ":acct/bal"), 4)
    assert {r["a"] for r in db.collect()} == {":acct/name"}
