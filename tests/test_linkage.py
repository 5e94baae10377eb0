"""Entity resolution (operators/linkage.py): blocking, the hot-block
cap, fuzzy verification, and transitive resolution."""

from __future__ import annotations

from pyspark.sql import functions as F

from mbrainz_importer_spark.operators import linkage as L


def _forms(spark, rows):
    return spark.createDataFrame(rows, "name string")


def test_candidate_pairs_blocked(spark):
    forms = _forms(
        spark, [("cold gear",), ("old gear",), ("hot gear",), ("red ring",)]
    )
    block = F.split(F.col("name"), " ").getItem(1)
    pairs = L.candidate_pairs(forms, "name", block).collect()
    got = {(r.key_a, r.key_b) for r in pairs}
    # only within the "gear" block; ring is a singleton; always key_a < key_b
    assert got == {
        ("cold gear", "hot gear"),
        ("cold gear", "old gear"),
        ("hot gear", "old gear"),
    }


def test_max_block_drops_oversized_blocks_whole(spark):
    forms = _forms(
        spark,
        [("a x",), ("b x",), ("c x",), ("d y",), ("e y",)],
    )
    block = F.split(F.col("name"), " ").getItem(1)
    pairs = L.candidate_pairs(forms, "name", block, max_block=2).collect()
    # block x (3 members) dropped whole; block y (2 members) survives
    assert {(r.key_a, r.key_b) for r in pairs} == {("d y", "e y")}


def test_fuzzy_matches_threshold_and_projection(spark):
    forms = _forms(
        spark, [("cold gear",), ("old gear",), ("red gear",), ("blue ring",)]
    )
    block = F.split(F.col("name"), " ").getItem(1)
    cmp = F.split(F.col("name"), " ").getItem(0)
    m1 = L.fuzzy_matches(forms, "name", block, cmp, max_edit=1).collect()
    assert {(r.key_a, r.key_b, r.edit_dist) for r in m1} == {
        ("cold gear", "old gear", 1)
    }
    # widening the threshold admits red~old (lev 2), never cross-block
    m3 = L.fuzzy_matches(forms, "name", block, cmp, max_edit=3).collect()
    names = {(r.key_a, r.key_b) for r in m3}
    assert ("old gear", "red gear") in names
    assert all("ring" not in a and "ring" not in b for a, b in names)


def test_resolve_entities_transitive_and_singletons(spark):
    records = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "a")], "id int, name string"
    )
    matches = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1)], "key_a string, key_b string, edit_dist int"
    )
    out = L.resolve_entities(records, matches, "name").collect()
    canon = {r.id: r.canonical for r in out}
    # a-b-c chain resolves to min form "a"; d is its own singleton
    assert canon == {1: "a", 2: "a", 3: "a", 4: "d", 5: "a"}
    flags = {r.id: r.is_canonical_form for r in out}
    assert flags == {1: True, 2: False, 3: False, 4: True, 5: True}
    # original columns pass through untouched
    assert {r.name for r in out} == {"a", "b", "c", "d"}
