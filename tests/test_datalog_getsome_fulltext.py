"""Tests for the (get-some ...) and (fulltext ...) datalog clauses —
the round-5 additions, pinned down per VERDICT r5 next-round #1, plus
regression tests for every round-5 ADVICE finding:

  - numeric binding derived from the SAME first-present winner as the
    value (a non-numeric winner must not fall through to a later
    attribute's number);
  - cardinality-many attributes bind ONE [attr value] per entity;
  - multi-term fulltext is Lucene default-OR, like the reference;
  - gs/ft scan aliases carry the recursion depth (no ambiguous columns
    when the clause appears both at top level and inside a rule body);
  - :in-substituted entity constants are accepted by get-some.
"""

from __future__ import annotations

import pytest

from mbrainz_importer_spark.plans.datalog import DatalogError, q
from mbrainz_importer_spark.plans.query_edn import q_edn


@pytest.fixture(scope="module")
def datoms(spark):
    rows = [
        ("t:1", ":t/id", "1", 1.0),
        ("t:1", ":t/tag", "zzz", None),     # non-numeric, wins over score
        ("t:1", ":t/score", "50", 50.0),
        ("t:2", ":t/id", "2", 2.0),
        ("t:2", ":t/score", "50", 50.0),    # only score
        ("t:3", ":t/id", "3", 3.0),         # neither -> get-some drops
        ("t:4", ":t/id", "4", 4.0),
        ("t:4", ":t/tag", "alpha", None),   # cardinality-many tag
        ("t:4", ":t/tag", "beta", None),
        ("t:1", ":t/text", "Big red fox", None),
        ("t:2", ":t/text", "small blue whale", None),
        ("t:4", ":t/text", "red whale", None),
    ]
    return spark.createDataFrame(rows, "e string, a string, v string, v_num double")


GS = ("get-some", "$", "?e", ":t/tag", ":t/score")


def test_get_some_first_present_and_nil_drop(datoms):
    out = q(
        {"find": ["?i", "?v"],
         "where": [["?e", ":t/id", "?i"], [GS, "?v"]]},
        datoms,
    )
    got = {r["i"]: r["v"] for r in out.collect()}
    # t:3 has neither attr -> dropped (nil fails the clause)
    assert got == {"1": "zzz", "2": "50", "4": "alpha"}


def test_get_some_cardinality_many_one_row(datoms):
    """ADVICE r5 medium #2: two :t/tag datoms on t:4 must NOT duplicate
    the row — one [attr value] per entity, deterministically min v."""
    out = q(
        {"find": ["?i", "?v"],
         "with": ["?e"],  # keep per-entity bag: duplicates would show
         "where": [["?e", ":t/id", "?i"], [GS, "?v"]]},
        datoms,
    )
    rows = [(r["i"], r["v"]) for r in out.collect() if r["i"] == "4"]
    assert rows == [("4", "alpha")]


def test_get_some_numeric_from_winner_only(datoms):
    """ADVICE r5 medium #1: t:1's winner is :t/tag 'zzz' (non-numeric);
    a numeric predicate must see null (row drops), NOT :t/score's 50."""
    out = q(
        {"find": ["?i", "?v"],
         "where": [["?e", ":t/id", "?i"], [GS, "?v"], [(">", "?v", 10)]]},
        datoms,
    )
    got = {r["i"]: r["v"] for r in out.collect()}
    assert got == {"2": "50"}  # t:1 and t:4 winners are strings -> dropped


def test_get_some_destructured_winner_pair(datoms):
    out = q(
        {"find": ["?i", "?a2", "?v"],
         "where": [["?e", ":t/id", "?i"], [GS, ["?a2", "?v"]]]},
        datoms,
    )
    got = {r["i"]: (r["a2"], r["v"]) for r in out.collect()}
    assert got == {
        "1": (":t/tag", "zzz"),
        "2": (":t/score", "50"),
        "4": (":t/tag", "alpha"),
    }


def test_get_some_in_entity_constant(datoms):
    """ADVICE r5 low #3: (get-some $ ?ent ...) with ?ent supplied as an
    :in scalar param compiles (entity constant filters the sub-scans)."""
    out = q(
        {"find": ["?v"],
         "in": ["?ent"],
         "where": [["?x", ":t/id", "_"], [GS[:2] + ("?ent",) + GS[3:], "?v"]]},
        datoms, "t:2",
    )
    assert [r["v"] for r in out.collect()] == ["50"]


def test_get_some_in_rule_body_depth_alias(datoms):
    """ADVICE r5 low #4: the same clause index at top level (depth 0)
    and inside a rule body (depth 1) must not collide on scan aliases."""
    rules = [[("tagval", "?e", "?v"),
              ["?e", ":t/id", "_"],
              [GS, "?v"]]]
    out = q(
        {"find": ["?i", "?v", "?v2"],
         "rules": rules,
         "where": [["?e", ":t/id", "?i"],
                   [GS, "?v2"],
                   [("tagval", "?e", "?v")]]},
        datoms,
    )
    got = {r["i"]: (r["v"], r["v2"]) for r in out.collect()}
    assert got == {"1": ("zzz", "zzz"), "2": ("50", "50"), "4": ("alpha", "alpha")}


def test_get_some_errors(datoms):
    with pytest.raises(DatalogError, match="must be bound"):
        q({"find": ["?v"], "where": [[GS, "?v"]]}, datoms)
    with pytest.raises(DatalogError, match="attrs must be constants"):
        q({"find": ["?v"],
           "where": [["?e", ":t/id", "_"],
                     [("get-some", "$", "?e", "?attr"), "?v"]]}, datoms)
    with pytest.raises(DatalogError, match="already bound"):
        q({"find": ["?i"],
           "where": [["?e", ":t/id", "?i"], [GS, "?i"]]}, datoms)
    with pytest.raises(DatalogError, match=r"\[\?a \?v\]"):
        q({"find": ["?i"],
           "where": [["?e", ":t/id", "?i"], [GS, ["?a", "?b", "?c"]]]}, datoms)


FT = ("fulltext", "$", ":t/text", "red whale")


def test_fulltext_or_semantics(datoms):
    """ADVICE r5 low #1: multi-term search is Lucene default-OR — any
    term matches (t:1 has only 'red', t:2 only 'whale', t:4 both)."""
    out = q({"find": ["?e", "?v"], "where": [[FT, [["?e", "?v"]]]]}, datoms)
    got = sorted(r["e"] for r in out.collect())
    assert got == ["t:1", "t:2", "t:4"]


def test_fulltext_case_insensitive_single_row_per_match(datoms):
    # 'Big' tokenizes lowercased; t:4 matching BOTH terms yields one row
    out = q({"find": ["?e"], "where": [[("fulltext", "$", ":t/text", "BIG whale"),
                                        [["?e", "?v"]]]]}, datoms)
    assert sorted(r["e"] for r in out.collect()) == ["t:1", "t:2", "t:4"]


def test_fulltext_bound_var_join_back(datoms):
    out = q(
        {"find": ["?i"],
         "where": [["?e", ":t/id", "?i"],
                   [(">", "?i", 1)],
                   [FT, [["?e", "?v"]]]]},
        datoms,
    )
    assert sorted(r["i"] for r in out.collect()) == ["2", "4"]


def test_fulltext_as_first_clause(datoms):
    out = q({"find": ["?e"], "where": [[FT, [["?e"]]]]}, datoms)
    assert sorted(r["e"] for r in out.collect()) == ["t:1", "t:2", "t:4"]


def test_fulltext_in_param_search(datoms):
    out = q(
        {"find": ["?e"],
         "in": ["?s"],
         "where": [[("fulltext", "$", ":t/text", "?s"), [["?e", "?v"]]]]},
        datoms, "blue",
    )
    assert [r["e"] for r in out.collect()] == ["t:2"]


def test_fulltext_in_rule_body_depth_alias(datoms):
    """ft{idx}_{depth}: same clause index at depth 0 and inside a rule
    body must not produce ambiguous scan aliases."""
    rules = [[("redish", "?e"),
              [FT, [["?e", "?w"]]]]]
    out = q(
        {"find": ["?e", "?v"],
         "rules": rules,
         "where": [[FT, [["?e", "?v"]]],
                   [("redish", "?e")]]},
        datoms,
    )
    assert sorted(r["e"] for r in out.collect()) == ["t:1", "t:2", "t:4"]


def test_fulltext_errors(datoms):
    with pytest.raises(DatalogError, match="must be a string"):
        q({"find": ["?e"],
           "where": [[("fulltext", "$", ":t/text", 5), [["?e", "?v"]]]]}, datoms)
    with pytest.raises(DatalogError, match="must be an :in param"):
        q({"find": ["?e"],
           "where": [[("fulltext", "$", ":t/text", "?s"), [["?e", "?v"]]]]}, datoms)
    with pytest.raises(DatalogError, match="attr must be a constant"):
        q({"find": ["?e"],
           "where": [[("fulltext", "$", "?a", "red"), [["?e", "?v"]]]]}, datoms)
    with pytest.raises(DatalogError, match="destructure"):
        q({"find": ["?e"],
           "where": [["?e", ":t/id", "_"], [FT, ["?x", "?y", "?z"]]]}, datoms)


@pytest.fixture(scope="module")
def zone_datoms(spark):
    rows = [
        ("zone:a", ":zone/id", "1", 1.0),
        ("zone:a", ":zone/name", "north", None),
        ("zone:b", ":zone/id", "2", 2.0),
        ("zone:b", ":zone/name", "south", None),
    ]
    return spark.createDataFrame(rows, "e string, a string, v string, v_num double")


def test_multi_db_join_dict_form(datoms, zone_datoms):
    """Datomic multi-db :in ($2): a pattern prefixed with the marker
    scans the extra db; shared vars join across databases."""
    out = q(
        {"find": ["?i", "?zname"],
         "in": ["$2"],
         "where": [["?e", ":t/id", "?i"],
                   ["$2", "?z", ":zone/id", "?i"],
                   ["$2", "?z", ":zone/name", "?zname"]]},
        datoms, zone_datoms,
    )
    got = {r["i"]: r["zname"] for r in out.collect()}
    assert got == {"1": "north", "2": "south"}


def test_multi_db_edn_text(datoms, zone_datoms):
    out = q_edn(
        """[:find ?i ?zname
            :in $ $2
            :where
            [?e :t/id ?i]
            [$2 ?z :zone/id ?i]
            [$2 ?z :zone/name ?zname]]""",
        datoms, zone_datoms,
    )
    got = {r["i"]: r["zname"] for r in out.collect()}
    assert got == {"1": "north", "2": "south"}


def test_multi_db_errors(datoms, zone_datoms):
    with pytest.raises(DatalogError, match="unknown db marker"):
        q({"find": ["?i"], "where": [["$2", "?e", ":t/id", "?i"]]}, datoms)
    with pytest.raises(DatalogError, match="positional datoms argument"):
        q({"find": ["?i"], "in": ["$"],
           "where": [["?e", ":t/id", "?i"]]}, datoms, zone_datoms)
    with pytest.raises(DatalogError, match="needs a datoms DataFrame"):
        q({"find": ["?i"], "in": ["$2"],
           "where": [["?e", ":t/id", "?i"]]}, datoms, "not-a-df")


def test_multi_db_marker_inside_not(datoms, zone_datoms):
    """The db map flows into sub-compilations: (not [$2 ...]) subtracts
    entities present in the extra db (t:3 and t:4 have no zone)."""
    out = q(
        {"find": ["?i"],
         "in": ["$2"],
         "where": [["?e", ":t/id", "?i"],
                   [("not", ["$2", "?z", ":zone/id", "?i"])]]},
        datoms, zone_datoms,
    )
    assert sorted(r["i"] for r in out.collect()) == ["3", "4"]


def test_tuple_untuple_roundtrip_and_errors(datoms):
    out = q(
        {"find": ["?i", "?i2", "?v2"],
         "where": [["?e", ":t/id", "?i"],
                   ["?e", ":t/score", "?sc"],
                   [("tuple", "?i", "?sc"), "?t"],
                   [("untuple", "?t"), ["?i2", "?v2"]]]},
        datoms,
    )
    got = {r["i"]: (r["i2"], r["v2"]) for r in out.collect()}
    assert got == {"1": ("1", "50"), "2": ("2", "50")}
    # over-destructuring a short tuple binds null (short-vector semantics)
    out = q(
        {"find": ["?i", "?x3"],
         "where": [["?e", ":t/id", "?i"],
                   [("tuple", "?i"), "?t"],
                   [("untuple", "?t"), ["?x1", "?x3"]]]},
        datoms,
    )
    assert all(r["x3"] is None for r in out.collect())
    with pytest.raises(DatalogError, match="bound tuple var"):
        q({"find": ["?a2"],
           "where": [["?e", ":t/id", "?i"],
                     [("untuple", "?nope"), ["?a2"]]]}, datoms)
    with pytest.raises(DatalogError, match="needs operands"):
        q({"find": ["?t"],
           "where": [["?e", ":t/id", "?i"], [("tuple",), "?t"]]}, datoms)


def test_sample_aggregate_deterministic(datoms):
    """(sample n ?x): md5-ordered deterministic subset, value-sorted."""
    import hashlib

    out1 = q(
        {"find": [("sample", 2, "?i")],
         "where": [["?e", ":t/id", "?i"]]},
        datoms,
    ).collect()
    out2 = q(
        {"find": [("sample", 2, "?i")],
         "where": [["?e", ":t/id", "?i"]]},
        datoms,
    ).collect()
    assert out1 == out2  # reproducible
    ids = ["1", "2", "3", "4"]
    expect = sorted(sorted(ids, key=lambda s: hashlib.md5(s.encode()).hexdigest())[:2])
    assert list(out1[0]["sample_2_i"]) == expect
    # bound larger than the distinct set returns everything
    big = q(
        {"find": [("sample", 99, "?i")],
         "where": [["?e", ":t/id", "?i"]]},
        datoms,
    ).collect()
    assert sorted(big[0]["sample_99_i"]) == ids
    with pytest.raises(DatalogError, match="positive int"):
        q({"find": [("sample", 0, "?i")],
           "where": [["?e", ":t/id", "?i"]]}, datoms)


def test_offset_paging_deterministic(datoms):
    """:offset pins lexicographic order over output columns; pages are
    disjoint, contiguous, and reproducible."""
    base = {"find": ["?i"], "where": [["?e", ":t/id", "?i"]]}
    all_ids = sorted(
        r["i"] for r in q(base, datoms).collect()
    )
    page1 = q({**base, "offset": 0, "limit": 2}, datoms).collect()
    page2 = q({**base, "offset": 2, "limit": 2}, datoms).collect()
    assert sorted(r["i"] for r in page1) == all_ids[:2]
    assert sorted(r["i"] for r in page2) == all_ids[2:4]
    # offset beyond the result set -> empty page
    assert q({**base, "offset": 99, "limit": 2}, datoms).count() == 0


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 2), st.integers(0, 9)),
    min_size=0, max_size=30,
))
def test_get_some_property_random_eav(spark, data):
    """For EVERY sparse EAV instance (random (entity, attr, value)
    triples, attr 2 a distractor): get-some(a0, a1) == first-present of
    {min a0 value, min a1 value}, entities with neither dropped — the
    reference model computed in plain Python."""
    rows = [(f"x:{e}", ":p/id", str(e), float(e)) for e in range(7)]
    for e, j, v in data:
        rows.append((f"x:{e}", f":p/a{j}", str(v), float(v)))
    datoms = spark.createDataFrame(
        rows, "e string, a string, v string, v_num double"
    )
    expect = {}
    for e in range(7):
        a0 = sorted({str(v) for (ee, j, v) in data if ee == e and j == 0})
        a1 = sorted({str(v) for (ee, j, v) in data if ee == e and j == 1})
        if a0:
            expect[str(e)] = a0[0]
        elif a1:
            expect[str(e)] = a1[0]
    out = q(
        {"find": ["?i", "?v"],
         "where": [["?e", ":p/id", "?i"],
                   [("get-some", "$", "?e", ":p/a0", ":p/a1"), "?v"]]},
        datoms,
    )
    got = {r["i"]: r["v"] for r in out.collect()}
    assert got == expect


def test_edn_text_get_some_and_fulltext(datoms):
    """Verbatim Datomic query text through the EDN front door exercises
    both new fn heads (VERDICT r5 next-round #5)."""
    out = q_edn(
        """[:find ?i ?a2 ?v
            :where
            [?e :t/id ?i]
            [(get-some $ ?e :t/tag :t/score) [?a2 ?v]]]""",
        datoms,
    )
    got = {r["i"]: (r["a2"], r["v"]) for r in out.collect()}
    assert got["1"] == (":t/tag", "zzz")

    out = q_edn(
        """[:find ?e
            :in $ ?search
            :where
            [(fulltext $ :t/text ?search) [[?e ?v]]]
            [?e :t/id _]]""",
        datoms, "fox whale",
    )
    assert sorted(r["e"] for r in out.collect()) == ["t:1", "t:2", "t:4"]
