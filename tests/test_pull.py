"""Pull API semantics: typed projection, defaults, absent-entity
behavior, forward/reverse ref navigation (Datomic d/pull analog over
the EAV view)."""

from __future__ import annotations

import pytest

from mbrainz_importer_spark.plans.eav import build_datoms, table_datoms
from mbrainz_importer_spark.plans.pull import (
    pull_entities,
    pull_ref,
    pull_reverse,
)


@pytest.fixture(scope="module")
def datoms(spark):
    artists = spark.createDataFrame(
        [
            ("a1", "Miles", 5, 100.5),
            ("a2", "Trane", 7, None),
            ("a3", None, 5, 3.0),
        ],
        "gid string, name string, country int, score double",
    )
    countries = spark.createDataFrame(
        [(5, "US"), (7, "JP")], "code int, cname string"
    )
    return build_datoms({
        "artist": (artists, "gid"),
        "country": (countries, "code"),
    })


def test_pull_typed_projection(datoms):
    out = pull_entities(datoms, {
        "name": ":artist/name",
        "score": (":artist/score", "num"),
    })
    rows = {r["e"]: (r["name"], r["score"]) for r in out.collect()}
    assert rows["artist:a1"] == ("Miles", 100.5)
    assert rows["artist:a2"] == ("Trane", None)   # no score datom -> null col
    assert rows["artist:a3"] == (None, 3.0)       # no name datom -> null col


def test_pull_default_fills_missing_attr(datoms):
    """A default fills a missing attr on an otherwise-present entity
    (a3 is present via :artist/country but has no name datom)."""
    out = pull_entities(datoms, {
        "name": (":artist/name", "str", "UNKNOWN"),
        "ck": ":artist/country",
    })
    rows = {r["e"]: r["name"] for r in out.collect()}
    assert rows["artist:a3"] == "UNKNOWN"
    assert rows["artist:a1"] == "Miles"


def test_pull_absent_entity_not_fabricated(datoms):
    """An entity with none of the requested attrs is absent, not a row
    of nulls — EAV has no nulls (absent keys, like the reference)."""
    out = pull_entities(datoms, {"cname": ":country/cname"})
    assert {r["e"] for r in out.collect()} == {"country:5", "country:7"}


def test_pull_bad_kind_raises(datoms):
    with pytest.raises(ValueError, match="pull kind"):
        pull_entities(datoms, {"x": (":artist/name", "text")})


def test_pull_ref_forward_navigation(datoms):
    prof = pull_entities(datoms, {
        "name": ":artist/name",
        "ck": ":artist/country",
    })
    out = pull_ref(prof, datoms, "ck", ":country/code", {"cname": ":country/cname"})
    rows = {r["e"]: r["cname"] for r in out.collect()}
    assert rows == {"artist:a1": "US", "artist:a2": "JP", "artist:a3": "US"}


def test_pull_ref_no_broadcast_path(datoms):
    prof = pull_entities(datoms, {"ck": ":artist/country"})
    out = pull_ref(
        prof, datoms, "ck", ":country/code", {"cname": ":country/cname"},
        broadcast=False,
    )
    assert out.count() == 3


def test_pull_reverse_navigation(datoms):
    out = pull_reverse(datoms, ":artist/country")
    rows = {r["ref_value"]: r["referrers"] for r in out.collect()}
    assert rows["5"] == ["artist:a1", "artist:a3"]
    assert rows["7"] == ["artist:a2"]


def test_pull_single_shuffle_plan(datoms):
    """The K-attr pull is ONE aggregate over one filtered scan — the
    plan must contain exactly one Exchange (grade: no per-attr joins)."""
    out = pull_entities(datoms, {
        "name": ":artist/name",
        "score": (":artist/score", "num"),
        "ck": ":artist/country",
    })
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_pull_wildcard_map_and_serialized(spark):
    from mbrainz_importer_spark.plans.pull import pull_wildcard, pull_wildcard_serialized

    df = spark.createDataFrame([("x", "N1", 7)], "id string, name string, sz int")
    datoms = table_datoms(df, "t", "id")
    m = {r["e"]: r["attrs"] for r in pull_wildcard(datoms).collect()}
    assert m["t:x"] == {":t/id": "x", ":t/name": "N1", ":t/sz": "7"}
    s = {r["e"]: r["attrs"] for r in pull_wildcard_serialized(datoms).collect()}
    assert s["t:x"] == ":t/id=x,:t/name=N1,:t/sz=7"


def test_pull_attr_many(spark):
    from mbrainz_importer_spark.plans.pull import pull_attr_many
    from pyspark.sql import Row

    datoms = spark.createDataFrame(
        [Row(e="a", a=":t/tag", v="z", v_num=None),
         Row(e="a", a=":t/tag", v="b", v_num=None),
         Row(e="a", a=":t/other", v="q", v_num=None),
         Row(e="b", a=":t/tag", v="b", v_num=None)],
        "e string, a string, v string, v_num double",
    )
    out = {r["e"]: r["values"] for r in pull_attr_many(datoms, ":t/tag").collect()}
    assert out == {"a": ["b", "z"], "b": ["b"]}


def test_pull_recursive_ref_depth_and_chain_end(spark):
    from mbrainz_importer_spark.plans.pull import pull_recursive_ref

    # chain 5 -> 4 -> 3 -> 2 -> 1 (1 has no parent)
    df = spark.createDataFrame(
        [(str(i), str(i - 1)) for i in range(2, 6)], "id string, parent string"
    )
    datoms = table_datoms(df, "node", "id")
    out = pull_recursive_ref(datoms, ":node/id", ":node/parent", depth=3)
    paths = {r["root"]: r["path"] for r in out.collect()}
    assert paths["5"] == ["4", "3", "2"]   # full depth
    assert paths["3"] == ["2", "1"]        # chain ends early -> longest available
    assert paths["2"] == ["1"]
    with pytest.raises(ValueError, match="depth"):
        pull_recursive_ref(datoms, ":node/id", ":node/parent", depth=0)


def test_pull_many_per_eid_contract(spark):
    from mbrainz_importer_spark.plans.eav import build_datoms
    from mbrainz_importer_spark.plans.pull import pull_many

    df = spark.createDataFrame(
        [("a", "Ann", 10.0), ("b", "Bob", 20.0)],
        "id string, name string, bal double",
    )
    datoms = build_datoms({"u": (df, "id")})
    out = {
        r["e"]: (r["name"], r["bal"])
        for r in pull_many(
            datoms,
            {"name": ":u/name", "bal": (":u/bal", "num")},
            ["u:a", "u:zzz"],
        ).collect()
    }
    assert out["u:a"] == ("Ann", 10.0)
    assert out["u:zzz"] == (None, None)  # absent eid still yields a row


def test_parse_pull_pattern_options():
    from mbrainz_importer_spark.plans.pull import parse_pull_pattern

    spec = parse_pull_pattern(
        '[:u/name (:u/bal :as money) (:u/tag :default "none") '
        "(:u/kid :many true :limit 2)]",
        numeric={":u/bal"},
    )
    assert spec["name"]["attr"] == ":u/name" and spec["name"]["kind"] == "str"
    assert spec["money"] == {"attr": ":u/bal", "kind": "num", "default": None,
                             "many": False, "limit": None}
    assert spec["tag"]["default"] == "none"
    assert spec["kid"]["many"] is True and spec["kid"]["limit"] == 2
    with pytest.raises(ValueError, match="unsupported pull option"):
        parse_pull_pattern("[(:u/x :frobnicate 1)]")


def test_pull_entities_many_limit_and_default(spark):
    from mbrainz_importer_spark.plans.pull import pull_entities

    rows = [
        ("u:1", ":u/name", "Ann", None),
        ("u:1", ":u/kid", "k3", None),
        ("u:1", ":u/kid", "k1", None),
        ("u:1", ":u/kid", "k2", None),
        ("u:2", ":u/name", "Bob", None),
        ("u:2", ":u/tag", "vip", None),
    ]
    datoms = spark.createDataFrame(rows, "e string, a string, v string, v_num double")
    out = {
        r["e"]: r
        for r in pull_entities(datoms, {
            "name": ":u/name",
            "tag": (":u/tag", "str", "none"),
            "kids": {"attr": ":u/kid", "many": True, "limit": 2},
        }).collect()
    }
    assert out["u:1"]["kids"] == ["k1", "k2"]  # sorted, capped at 2
    assert out["u:1"]["tag"] == "none"  # :default fills the absent attr
    assert out["u:2"]["kids"] == []
    assert out["u:2"]["tag"] == "vip"
    with pytest.raises(ValueError, match=":limit applies"):
        pull_entities(datoms, {"x": {"attr": ":u/kid", "limit": 2}})
