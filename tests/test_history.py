"""Time-travel semantics (plans/history.py): cardinality-one override,
retraction, re-assertion, cardinality-many independence, since-view
correctness."""

from __future__ import annotations

import pytest

from mbrainz_importer_spark.plans.history import (
    as_of,
    entity_timeline,
    history,
    since,
)


@pytest.fixture(scope="module")
def log(spark):
    # (e, a, v_num, tx, added)
    rows = [
        ("u1", ":u/score", 10.0, 1, True),
        ("u1", ":u/score", 20.0, 3, True),    # overrides tx1 (card-one)
        ("u1", ":u/level", 1.0, 2, True),
        ("u1", ":u/level", 1.0, 5, False),    # retracted at tx5
        ("u2", ":u/score", 7.0, 4, True),
        ("u2", ":u/score", 7.0, 6, False),    # retract...
        ("u2", ":u/score", 9.0, 8, True),     # ...then re-assert
        ("u1", ":u/tag", 100.0, 2, True),     # card-many attr
        ("u1", ":u/tag", 200.0, 3, True),     # second value coexists
        ("u1", ":u/tag", 100.0, 7, False),    # retract one value only
    ]
    return spark.createDataFrame(
        rows, "e string, a string, v_num double, tx long, added boolean"
    )


MANY = {":u/tag"}


def _state(df):
    return {(r["e"], r["a"], r["v_num"]) for r in df.collect()}


def test_as_of_latest_assert_wins(log):
    s = _state(as_of(log, 3, MANY))
    assert ("u1", ":u/score", 20.0) in s
    assert ("u1", ":u/score", 10.0) not in s


def test_as_of_before_override_sees_old_value(log):
    s = _state(as_of(log, 2, MANY))
    assert ("u1", ":u/score", 10.0) in s


def test_retraction_hides_fact(log):
    assert ("u1", ":u/level", 1.0) in _state(as_of(log, 4, MANY))
    assert ("u1", ":u/level", 1.0) not in _state(as_of(log, 5, MANY))


def test_reassert_after_retract(log):
    assert ("u2", ":u/score", 7.0) not in _state(as_of(log, 7, MANY))
    assert ("u2", ":u/score", 9.0) in _state(as_of(log, 8, MANY))


def test_cardinality_many_values_independent(log):
    s6 = _state(as_of(log, 6, MANY))
    assert ("u1", ":u/tag", 100.0) in s6 and ("u1", ":u/tag", 200.0) in s6
    s7 = _state(as_of(log, 7, MANY))
    assert ("u1", ":u/tag", 100.0) not in s7
    assert ("u1", ":u/tag", 200.0) in s7


def test_cardinality_one_without_many_collapses(log):
    """Without the many-attr declaration, :u/tag resolves per (e, a):
    only the latest value survives — the declaration is load-bearing."""
    s = _state(as_of(log, 3))
    assert ("u1", ":u/tag", 200.0) in s
    assert ("u1", ":u/tag", 100.0) not in s


def test_since_only_recent_deciding_tx(log):
    s = _state(since(log, 5, MANY))
    # u2 score re-asserted at tx8 -> in; u1 score decided at tx3 -> out
    assert ("u2", ":u/score", 9.0) in s
    assert ("u1", ":u/score", 20.0) not in s
    # u1 level retracted at tx5 must NOT reappear via the since window
    assert all(x[1] != ":u/level" for x in s)


def test_history_is_full_op_stream(log):
    assert history(log).count() == 10


def test_entity_timeline_ordered(log):
    rows = entity_timeline(log, "u2").collect()
    assert [(r["tx"], r["added"]) for r in rows] == [
        (4, True), (6, False), (8, True)
    ]


def test_retract_entity_log_structured(log):
    from mbrainz_importer_spark.plans.history import retract_entity

    extended = retract_entity(log, "u1", 10, MANY)
    # before the retraction tx the entity is fully visible
    before = _state(as_of(extended, 9, MANY))
    assert any(e == "u1" for e, _, _ in before)
    # at/after the retraction tx every fact of u1 is gone, u2 untouched
    after = _state(as_of(extended, 10, MANY))
    assert not any(e == "u1" for e, _, _ in after)
    assert ("u2", ":u/score", 9.0) in after
    # nothing was deleted: the op count grew by the retracted fact count
    assert extended.count() == log.count() + len(
        [x for x in before if x[0] == "u1"]
    )


def test_as_of_single_shuffle(log):
    """Cardinality-one as_of is one groupBy: exactly one Exchange."""
    plan = as_of(log, 5)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_retract_attribute_single_attr_only(spark):
    from mbrainz_importer_spark.plans.history import as_of, retract_attribute

    log = spark.createDataFrame(
        [
            ("u1", ":user/name", 1.0, 10, True),
            ("u1", ":user/score", 5.0, 10, True),
            ("u1", ":user/tag", 7.0, 11, True),
            ("u1", ":user/tag", 8.0, 12, True),   # many-attr: both live
        ],
        "e string, a string, v_num double, tx long, added boolean",
    )
    out = retract_attribute(log, "u1", ":user/tag", tx=20, many_attrs={":user/tag"})
    after = as_of(out, 25, many_attrs={":user/tag"})
    attrs = {(r["a"], r["v_num"]) for r in after.collect()}
    # both tag values retracted, other attrs untouched
    assert attrs == {(":user/name", 1.0), (":user/score", 5.0)}
    before = as_of(out, 15, many_attrs={":user/tag"})
    assert {(r["a"], r["v_num"]) for r in before.collect()} == {
        (":user/name", 1.0), (":user/score", 5.0),
        (":user/tag", 7.0), (":user/tag", 8.0),
    }


def test_with_tx_speculative_and_tx_range(spark):
    from mbrainz_importer_spark.plans.history import as_of, tx_range, with_tx

    log = spark.createDataFrame(
        [("u1", ":user/score", 5.0, 10, True),
         ("u2", ":user/score", 7.0, 12, True)],
        "e string, a string, v_num double, tx long, added boolean",
    )
    spec = spark.createDataFrame(
        [("u1", ":user/score", 9.0, True)],
        "e string, a string, v_num double, added boolean",
    )
    with_db = with_tx(log, spec, tx=20)
    # speculation visible in the with-db...
    got = {r["e"]: r["v_num"] for r in as_of(with_db, 25).collect()}
    assert got == {"u1": 9.0, "u2": 7.0}
    # ...and NOT in the original log
    got0 = {r["e"]: r["v_num"] for r in as_of(log, 25).collect()}
    assert got0 == {"u1": 5.0, "u2": 7.0}
    # tx-range is a half-open window over the op stream
    rng = tx_range(with_db, 12, 20)
    assert [(r["e"], r["tx"]) for r in rng.collect()] == [("u2", 12)]


def test_as_of_instant_resolution(spark):
    """d/as-of with a Date: the instant resolves to the latest tx whose
    txInstant <= ts; state equals as_of at that t."""
    from datetime import datetime

    from mbrainz_importer_spark.plans.history import (
        as_of, as_of_instant, resolve_instant,
    )

    log = spark.createDataFrame(
        [("e1", ":a/x", 1.0, 10, True),
         ("e1", ":a/x", 2.0, 20, True),
         ("e1", ":a/x", 3.0, 30, True)],
        "e string, a string, v_num double, tx long, added boolean",
    )
    instants = spark.createDataFrame(
        [(10, datetime(2024, 1, 1)), (20, datetime(2024, 1, 5)),
         (30, datetime(2024, 1, 9))],
        "tx long, inst timestamp",
    )
    # ts between tx 20 and 30 -> cutoff resolves to 20
    t = resolve_instant(instants, "2024-01-07 00:00:00").collect()[0][0]
    assert t == 20
    got = as_of_instant(log, instants, "2024-01-07 00:00:00").collect()
    want = as_of(log, 20).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # exact-boundary instant includes its tx (<=)
    assert resolve_instant(instants, "2024-01-09 00:00:00").collect()[0][0] == 30


def test_since_instant(spark):
    from datetime import datetime

    from mbrainz_importer_spark.plans.history import since, since_instant

    log = spark.createDataFrame(
        [("e1", ":a/x", 1.0, 10, True),
         ("e2", ":a/y", 2.0, 20, True),
         ("e3", ":a/z", 3.0, 30, True)],
        "e string, a string, v_num double, tx long, added boolean",
    )
    instants = spark.createDataFrame(
        [(10, datetime(2024, 1, 1)), (20, datetime(2024, 1, 5)),
         (30, datetime(2024, 1, 9))],
        "tx long, inst timestamp",
    )
    got = since_instant(log, instants, "2024-01-05 12:00:00").collect()
    want = since(log, 20).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert {r["e"] for r in got} == {"e3"}


def test_tx_range_instant_boundaries(spark):
    """d/tx-range Date overloads: boundaries resolve to the FIRST tx at
    or after the instant; an end past the log is unbounded, a start
    past the log is empty; mixed int/instant boundaries compose."""
    from datetime import datetime

    from mbrainz_importer_spark.plans.history import tx_range

    log = spark.createDataFrame(
        [("e1", ":a/x", 1.0, 10, True),
         ("e2", ":a/y", 2.0, 20, True),
         ("e3", ":a/z", 3.0, 30, True)],
        "e string, a string, v_num double, tx long, added boolean",
    )
    instants = spark.createDataFrame(
        [(10, datetime(2024, 1, 1)), (20, datetime(2024, 1, 5)),
         (30, datetime(2024, 1, 9))],
        "tx long, inst timestamp",
    )
    txs = lambda df: [r["tx"] for r in df.collect()]  # noqa: E731

    got = tx_range(log, "2024-01-02 00:00:00", "2024-01-09 00:00:00",
                   instants=instants)
    assert txs(got) == [20]  # end resolves to tx 30, exclusive

    assert txs(tx_range(log, "2024-01-02 00:00:00", instants=instants)) == [20, 30]
    assert txs(tx_range(log, "2025-01-01 00:00:00", instants=instants)) == []
    assert txs(tx_range(log, 15, "2024-12-31 00:00:00", instants=instants)) == [20, 30]

    import pytest as _pytest
    with _pytest.raises(ValueError, match="instants"):
        tx_range(log, "2024-01-02 00:00:00")
