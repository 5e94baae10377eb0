"""EDN query front door: real Datomic query text -> the datalog
compiler (plans/query_edn.py). Mirrors examples/explore_db.clj usage."""

from __future__ import annotations

import pytest

from mbrainz_importer_spark.plans.datalog import DatalogError
from mbrainz_importer_spark.plans.eav import build_datoms, table_datoms
from mbrainz_importer_spark.plans.query_edn import edn_query, q_edn


@pytest.fixture(scope="module")
def datoms(spark):
    df = spark.createDataFrame(
        [("a", 1, "x", 10), ("b", 2, "y", 20), ("c", 1, "y", 30)],
        "id string, grp int, tag string, qty int",
    )
    return build_datoms({"t": (df, "id")})


def test_vector_query_patterns_and_aggregate(datoms):
    out = q_edn(
        "[:find ?tag (count ?e) :where [?e :t/tag ?tag]]", datoms
    )
    got = {r["tag"]: r["count_e"] for r in out.collect()}
    assert got == {"x": 1, "y": 2}


def test_map_form_query(datoms):
    out = q_edn("{:find [?id] :where [[?e :t/id ?id] [?e :t/grp 1]]}", datoms)
    assert sorted(r["id"] for r in out.collect()) == ["a", "c"]


def test_in_params_dollar_and_collection(datoms):
    out = q_edn(
        "[:find ?id :in $ ?g :where [?e :t/grp ?g] [?e :t/id ?id]]",
        datoms, "2",
    )
    assert [r["id"] for r in out.collect()] == ["b"]
    out = q_edn(
        "[:find ?id :in $ [?g ...] :where [?e :t/grp ?g] [?e :t/id ?id]]",
        datoms, ["1"],
    )
    assert sorted(r["id"] for r in out.collect()) == ["a", "c"]


def test_predicates_fn_bindings_not_or(datoms):
    out = q_edn(
        """[:find ?id
            :where [?e :t/qty ?q]
                   [?e :t/id ?id]
                   [(> ?q 15)]]""",
        datoms,
    )
    assert sorted(r["id"] for r in out.collect()) == ["b", "c"]
    out = q_edn(
        """[:find ?id ?dbl
            :where [?e :t/qty ?q]
                   [(* ?q 2) ?dbl]
                   [?e :t/id ?id]
                   (not [?e :t/tag "y"])]""",
        datoms,
    )
    assert [(r["id"], r["dbl"]) for r in out.collect()] == [("a", 20.0)]
    out = q_edn(
        """[:find ?id
            :where (or [?e :t/grp 2]
                       (and [?e :t/grp 1] [?e :t/tag "x"]))
                   [?e :t/id ?id]]""",
        datoms,
    )
    assert sorted(r["id"] for r in out.collect()) == ["a", "b"]


def test_rules_edn_text(datoms):
    out = q_edn(
        "[:find ?id :in $ % :where [(small ?e)] [?e :t/id ?id]]",
        datoms,
        rules="[[(small ?e) [?e :t/qty ?q] [(< ?q 25)]]]",
    )
    assert sorted(r["id"] for r in out.collect()) == ["a", "b"]


def test_with_and_limit_sections(datoms):
    qd = edn_query(
        "[:find ?g (sum ?q) :with ?e :where [?e :t/grp ?g] [?e :t/qty ?q] :limit 5]"
    )
    assert qd["with"] == ["?e"] and qd["limit"] == 5


def test_errors(datoms):
    with pytest.raises(DatalogError, match="needs :find"):
        edn_query("[:where [?e :t/id ?id]]")
    with pytest.raises(DatalogError, match="section keyword"):
        edn_query("[?x :find ?y]")
    # 4/5-element patterns are the history shapes now — only longer
    # clauses are unrecognized at the parse layer
    assert edn_query("[:find ?x :where [?e :t/id ?x ?tx]]")["where"] == [
        ["?e", ":t/id", "?x", "?tx"]]
    with pytest.raises(DatalogError, match="unrecognized :where"):
        edn_query("[:find ?x :where [?e :t/id ?x ?tx ?op ?extra]]")


def test_schema_datoms_verbatim_unique_attrs(spark):
    """The REAL schema view answers the verbatim explore_db.clj:13-18
    text: [?e :db/unique] is a 2-element attribute-presence pattern."""
    from mbrainz_importer_spark.plans.eav import schema_datoms

    df = spark.createDataFrame(
        [("a", 1, 2.5, True)], "id string, n long, x double, f boolean"
    )
    tables = {"t": (df, "id")}
    db = build_datoms(tables).unionByName(schema_datoms(spark, tables))
    out = q_edn(
        "[:find ?attr :where [?e :db/unique] [?e :db/ident ?attr]]", db
    )
    assert [r["attr"] for r in out.collect()] == [":t/id"]


def test_schema_datoms_types_and_components(spark):
    from mbrainz_importer_spark.plans.eav import schema_datoms

    df = spark.createDataFrame(
        [("a", 1, 2.5, True)], "id string, n long, x double, f boolean"
    )
    sd = schema_datoms(spark, {"t": (df, "id")}, components={":t/n"})
    vt = {
        r["e"]: r["v"]
        for r in sd.where("a = ':db/valueType'").collect()
    }
    assert vt["db.attr:t/id"] == ":db.type/string"
    assert vt["db.attr:t/n"] == ":db.type/long"
    assert vt["db.attr:t/x"] == ":db.type/double"
    assert vt["db.attr:t/f"] == ":db.type/boolean"
    comp = sd.where("a = ':db/isComponent'").collect()
    assert [(r["e"], r["v"]) for r in comp] == [("db.attr:t/n", "true")]
    # Datomic-style absence: no :db/unique datom for non-id attrs
    uniq = sd.where("a = ':db/unique'").collect()
    assert [(r["e"], r["v"]) for r in uniq] == [("db.attr:t/id", ":db.unique/identity")]


def test_keys_section_renames_columns(datoms):
    out = q_edn(
        "[:find ?g (sum ?q) :keys grp total :where [?e :t/grp ?g] [?e :t/qty ?q] [?e :t/id _]]",
        datoms,
    )
    assert out.columns == ["grp", "total"]
    got = {r["grp"]: r["total"] for r in out.collect()}
    assert got == {"1": 40.0, "2": 20.0}


def test_strs_section_and_arity_error(datoms):
    out = q_edn("[:find ?id :strs ident :where [?e :t/id ?id]]", datoms)
    assert out.columns == ["ident"]
    with pytest.raises(DatalogError, match=":keys arity"):
        q_edn("[:find ?id :keys a b :where [?e :t/id ?id]]", datoms).collect()


def test_explicit_primary_db_pattern(datoms):
    """[$ ?e ?a ?v] — Datomic's explicit primary-db form maps to the
    unmarked datoms view; a named db symbol is rejected with a clear
    message instead of the generic pattern error."""
    out = q_edn("[:find ?id :where [$ ?e :t/id ?id]]", datoms)
    assert sorted(r["id"] for r in out.collect()) == ["a", "b", "c"]
    with pytest.raises(DatalogError, match="db marker"):
        q_edn("[:find ?id :where [$named ?e :t/id ?id]]", datoms)


def test_history_pattern_verbatim_edn(spark):
    """The [e a v tx op] history shape as verbatim Datomic query text,
    with the op position a boolean literal."""
    from mbrainz_importer_spark.plans.history import log_datoms

    log = spark.createDataFrame(
        [("u:1", ":t/score", 10.0, 1, True),
         ("u:1", ":t/score", 10.0, 3, False),
         ("u:2", ":t/score", 5.0, 2, True)],
        "e string, a string, v_num double, tx long, added boolean",
    )
    out = q_edn(
        "[:find ?e ?tx :where [?e :t/score _ ?tx false]]",
        log_datoms(log),
    )
    assert [(r["e"], r["tx"]) for r in out.collect()] == [("u:1", 3)]


def test_edn_string_fns(spark):
    """Verbatim Datomic text with clojure.string fns and predicates."""
    from mbrainz_importer_spark.plans.eav import build_datoms
    from mbrainz_importer_spark.plans.query_edn import q_edn

    df = spark.createDataFrame(
        [(1, "Alpha"), (2, "beta")], "id int, name string"
    )
    datoms = build_datoms({"t": (df, "id")})
    out = q_edn(
        """[:find ?n ?u ?len
            :where [?e :t/name ?n]
                   [(clojure.string/starts-with? ?n "A")]
                   [(clojure.string/upper-case ?n) ?u]
                   [(count ?n) ?len]]""",
        datoms,
    ).collect()
    assert [(r["n"], r["u"], r["len"]) for r in out] == [("Alpha", "ALPHA", 5)]


def test_find_specifications(spark):
    """Datomic find specs: scalar '.', collection [?x ...], single
    tuple [?x ?y] — deterministic materialization (ordered pick)."""
    from mbrainz_importer_spark.plans.eav import build_datoms
    from mbrainz_importer_spark.plans.query_edn import q_edn, q_edn_spec

    df = spark.createDataFrame(
        [(1, "b", 10), (2, "a", 20), (3, "c", 30)],
        "id int, name string, v int",
    )
    datoms = build_datoms({"t": (df, "id")})

    # scalar: lexically first name (deterministic, not arbitrary)
    assert q_edn_spec(
        "[:find ?n . :where [?e :t/name ?n]]", datoms
    ) == "a"
    # collection
    assert q_edn_spec(
        "[:find [?n ...] :where [?e :t/name ?n]]", datoms
    ) == ["a", "b", "c"]
    # single tuple
    assert q_edn_spec(
        "[:find [?n ?v] :where [?e :t/name ?n] [?e :t/v ?v]]", datoms
    ) == ("a", "20")
    # relation spec passes through as a DataFrame
    rel = q_edn_spec("[:find ?n :where [?e :t/name ?n]]", datoms)
    assert hasattr(rel, "collect") and rel.count() == 3
    # empty relation -> None scalar, [] collection
    assert q_edn_spec(
        '[:find ?n . :where [?e :t/name ?n] [(= ?n "zz")]]', datoms
    ) is None
    assert q_edn_spec(
        '[:find [?n ...] :where [?e :t/name ?n] [(= ?n "zz")]]', datoms
    ) == []
    # plain q_edn ignores the spec metadata and stays columnar
    assert q_edn("[:find ?n :where [?e :t/name ?n]]", datoms).count() == 3
    # an aggregate call in a single bracketed group is NOT a tuple spec
    out = q_edn("[:find (min ?v) :where [?e :t/v ?v]]", datoms).collect()
    assert out[0]["min_v"] == 10.0


def test_bare_rule_invocation(spark):
    """Datomic's unwrapped rule-call spelling `(rule ?a ?b)` in :where
    and inside recursive rule bodies — compiled as an invocation, not
    a triple pattern (plans/query_edn._conv_entry head check)."""
    df = spark.createDataFrame(
        [("1", None), ("2", "1"), ("3", "2"), ("4", "2")],
        "id string, parent string",
    )
    datoms = table_datoms(df, "node", "id")
    rules = """[[(ancestor ?x ?y)
                 [?e :node/id ?x] [?e :node/parent ?y]]
                [(ancestor ?x ?y)
                 [?e :node/id ?x] [?e :node/parent ?z]
                 (ancestor ?z ?y)]]"""
    bare = q_edn(
        "[:find ?x ?y :in $ % :where (ancestor ?x ?y)]",
        datoms, rules=rules,
    )
    got = sorted((r["x"], r["y"]) for r in bare.collect())
    assert got == [("2", "1"), ("3", "1"), ("3", "2"), ("4", "1"), ("4", "2")]
    # wrapped spelling gives the identical relation
    wrapped = q_edn(
        "[:find ?x ?y :in $ % :where [(ancestor ?x ?y)]]",
        datoms, rules=rules,
    )
    assert sorted((r["x"], r["y"]) for r in wrapped.collect()) == got


def test_bare_rule_inside_not_and_or(spark):
    """Bare invocations nested under (not ...) and (or ...) convert
    through the same rule-aware path."""
    df = spark.createDataFrame(
        [("1", None), ("2", "1"), ("3", "2")], "id string, parent string"
    )
    datoms = table_datoms(df, "node", "id")
    rules = """[[(child-of ?x ?y)
                 [?e :node/id ?x] [?e :node/parent ?y]]]"""
    out = q_edn(
        """[:find ?x
            :in $ %
            :where
            [?e :node/id ?x]
            (not (child-of ?x "1"))]""",
        datoms, rules=rules,
    )
    assert sorted(r["x"] for r in out.collect()) == ["1", "3"]


def test_unknown_head_symbol_errors(datoms):
    """A plain-symbol head that names no declared rule must raise, not
    silently scan as a triple pattern."""
    with pytest.raises(DatalogError, match="unknown head symbol"):
        q_edn("[:find ?x :where (ancestor ?x ?y)]", datoms)
    # same inside a rules context that declares a DIFFERENT rule
    with pytest.raises(DatalogError, match="unknown head symbol"):
        q_edn(
            "[:find ?x :in $ % :where (ancestro ?x ?y)]",
            datoms,
            rules="[[(ancestor ?x ?y) [?e :t/id ?x] [?e :t/tag ?y]]]",
        )
