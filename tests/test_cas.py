"""Compare-and-swap update (:db/cas analog) and d/datoms index scans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mbrainz_importer_spark.operators.upsert import CasConflict, cas_update
from mbrainz_importer_spark.plans.eav import build_datoms, datoms_index


@pytest.fixture(scope="module")
def target(spark):
    return spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None)],
        "k long, bal double",
    )


def test_cas_applies_on_match(spark, target):
    upd = spark.createDataFrame(
        [(1, 10.0, 11.0)], "k long, expected double, new_value double"
    )
    out = {r["k"]: r["bal"] for r in
           cas_update(target, upd, "k", "bal").collect()}
    assert out == {1: 11.0, 2: 20.0, 3: None}


def test_cas_error_mode_aborts_on_mismatch(spark, target):
    upd = spark.createDataFrame(
        [(1, 10.0, 11.0), (2, 99.0, 0.0)],
        "k long, expected double, new_value double",
    )
    with pytest.raises(CasConflict, match="current != expected"):
        cas_update(target, upd, "k", "bal")


def test_cas_skip_mode_leaves_conflicts(spark, target):
    upd = spark.createDataFrame(
        [(1, 10.0, 11.0), (2, 99.0, 0.0)],
        "k long, expected double, new_value double",
    )
    out = {r["k"]: r["bal"] for r in
           cas_update(target, upd, "k", "bal", on_conflict="skip").collect()}
    assert out == {1: 11.0, 2: 20.0, 3: None}


def test_cas_from_absent_null_safe(spark, target):
    """CAS from nil: expected null matches a null current value."""
    upd = spark.createDataFrame(
        [(3, None, 7.0)], "k long, expected double, new_value double"
    )
    out = {r["k"]: r["bal"] for r in
           cas_update(target, upd, "k", "bal").collect()}
    assert out[3] == 7.0


def test_cas_bad_mode(spark, target):
    upd = spark.createDataFrame(
        [(1, 10.0, 11.0)], "k long, expected double, new_value double"
    )
    with pytest.raises(ValueError, match="on_conflict"):
        cas_update(target, upd, "k", "bal", on_conflict="merge")


def test_datoms_index_orders_and_filters(spark):
    df = spark.createDataFrame(
        [(2, "b", 1), (1, "a", 2)], "id int, name string, grp int"
    )
    datoms = build_datoms({"t": (df, "id")})
    avet = datoms_index(datoms, "avet", a=":t/grp").collect()
    assert [(r["a"], r["v"], r["e"]) for r in avet] == [
        (":t/grp", "1", "t:2"), (":t/grp", "2", "t:1")
    ]
    eavt = datoms_index(datoms, "eavt", e="t:1").collect()
    assert all(r["e"] == "t:1" for r in eavt)
    assert [r["a"] for r in eavt] == sorted(r["a"] for r in eavt)
    with pytest.raises(ValueError, match="index must be"):
        datoms_index(datoms, "teav")
    # vaet IS a real index now, but Datomic's VAET only covers
    # ref-typed attributes — it requires the ref-attr set
    with pytest.raises(ValueError, match="ref_attrs"):
        datoms_index(datoms, "vaet")
