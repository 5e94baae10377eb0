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
