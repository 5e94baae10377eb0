"""Data-quality expectations (operators/expectations.py): metric math,
thresholds, one-pass plan, validate-or-throw boundary."""

from __future__ import annotations

import pytest

from mbrainz_importer_spark.operators.expectations import (
    Rule,
    check,
    validate_or_throw,
)


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", -5.0), (3, None, 7.0), (3, "d", 2.0)],
        "id long, name string, val double",
    )


def test_metrics_and_thresholds(spark, df):
    rules = [
        Rule("complete", "name"),                      # 3/4 -> fail at 1.0
        Rule("complete", "name", threshold=0.7),       # pass
        Rule("unique", "id"),                          # 3 distinct / 4 -> fail
        Rule("min", "val", -10.0),                     # min=-5 >= -10 pass
        Rule("max", "val", 9.0),                       # max=10 > 9 fail
        Rule("in_set", "name", ("a", "b", "d")),       # nulls don't count: 3/4
        Rule("matches", "name", "^[a-b]$", threshold=0.5),  # 2/4 pass
        Rule("non_negative", "val", threshold=0.75),   # 3/4 pass
    ]
    out = {r["rule_id"]: r for r in check(df, rules).collect()}
    assert out[0]["metric"] == 0.75 and not out[0]["passed"]
    assert out[1]["passed"]
    assert out[2]["metric"] == 0.75 and not out[2]["passed"]
    assert out[3]["metric"] == -5.0 and out[3]["passed"]
    assert out[4]["metric"] == 10.0 and not out[4]["passed"]
    assert out[5]["metric"] == 0.75
    assert out[6]["passed"] and out[7]["passed"]


def test_one_pass_plan(spark, df):
    """All constraints compile to ONE aggregation over one scan — no
    join, no per-rule pass."""
    plan = check(df, [
        Rule("complete", "name"), Rule("min", "val", 0.0),
        Rule("non_negative", "id"), Rule("matches", "name", "a"),
    ])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan


def test_validate_or_throw(spark, df):
    ok = validate_or_throw(df, [Rule("complete", "id")])
    assert ok.count() == 4
    with pytest.raises(ValueError, match=r"unique\(id\)"):
        validate_or_throw(df, [Rule("unique", "id")])
    with pytest.raises(ValueError, match="unknown rule kind"):
        check(df, [Rule("bogus", "id")])
    with pytest.raises(ValueError, match="not in"):
        check(df, [Rule("complete", "nope")])
    with pytest.raises(ValueError, match="at least one"):
        check(df, [])


def test_quarantine_split_routes_and_labels(spark):
    """Row-level routing: good rows pass unchanged, bad rows carry every
    violated rule label in rule order; corpus-level kinds rejected;
    NULLs violate only 'complete' (SQL three-valued logic)."""
    import pytest

    from mbrainz_importer_spark.operators.expectations import (
        Rule,
        quarantine_split,
    )

    df = spark.createDataFrame(
        [(1, 10.0, "O"), (2, -3.0, "X"), (3, 5.0, None), (4, None, "F")],
        "id long, price double, status string",
    )
    rules = [
        Rule("non_negative", "price"),
        Rule("in_set", "status", ("O", "F")),
        Rule("complete", "status"),
    ]
    good, bad = quarantine_split(df, rules)
    assert [r.id for r in good.orderBy("id").collect()] == [1, 4]
    assert good.columns == df.columns  # passthrough shape, no label column
    got = {r.id: r.violated for r in bad.collect()}
    # row 2: both value rules fail, in rule order; row 3: NULL status
    # violates in_set? no — NULL makes it unknown, only 'complete' fires
    assert got == {
        2: "non_negative:price,in_set:status",
        3: "complete:status",
    }
    with pytest.raises(ValueError, match="not row-expressible"):
        quarantine_split(df, [Rule("unique", "id")])
