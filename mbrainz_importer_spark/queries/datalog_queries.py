"""Datalog layer queries for the driver gate (SURVEY.md §3.4, J4, G7).

Each runs the datalog-lite compiler over an EAV view derived from the
driver's testdata tables; the oracle reproduces the same semantics as
plain relational SQL — which is exactly the equivalence the compiler is
supposed to guarantee.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.datalog import q
from ..plans.eav import build_datoms
from ..tables import load


def _datoms_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_datoms({
        "nation": (load(spark, sf_dir, "nation"), "n_nationkey"),
        "region": (load(spark, sf_dir, "region"), "r_regionkey"),
    })


def datalog_attr_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G7 analog (explore_db.clj:25-31): datoms per attribute, attribute as
    a VARIABLE — [:find ?a (count ?e) :where [?e ?a _]]."""
    datoms = _datoms_small(spark, sf_dir)
    return q({"find": ["?a", ("count", "?e")], "where": [["?e", "?a", "_"]]},
             datoms).orderBy("a")


def datalog_region_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: implicit equi-joins across three patterns (value-joins region key,
    entity-joins nation name)."""
    datoms = _datoms_small(spark, sf_dir)
    query = {
        "find": ["?rname", ("count", "?n")],
        "where": [
            ["?n", ":nation/n_regionkey", "?rk"],
            ["?r", ":region/r_regionkey", "?rk"],
            ["?r", ":region/r_name", "?rname"],
        ],
    }
    return q(query, datoms).orderBy("rname")


def datalog_param_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:in scalar parameter (batch.clj:50-53 passes the attr as input)."""
    datoms = _datoms_small(spark, sf_dir)
    query = {
        "find": ["?name"],
        "in": ["?rk"],
        "where": [
            ["?n", ":nation/n_regionkey", "?rk"],
            ["?n", ":nation/n_name", "?name"],
        ],
    }
    return q(query, datoms, "2").orderBy("name")


def datalog_predicate_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate clauses beyond triple patterns — `[(> ?v c)]` const
    comparison and `[(< ?u ?v)]` var-var comparison, the first things a
    datalog user writes past explore_db.clj's pattern-only ceiling.
    Compiled to `.where` on v_num-projected bound columns."""
    datoms = _datoms_small(spark, sf_dir)
    query = {
        "find": ["?name"],
        "where": [
            ["?n", ":nation/n_nationkey", "?nk"],
            ["?n", ":nation/n_regionkey", "?rk"],
            ["?n", ":nation/n_name", "?name"],
            [(">", "?nk", 5)],
            [("<", "?rk", "?nk")],
        ],
    }
    return q(query, datoms).orderBy("name")


def datalog_rules_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named rules with union semantics (the :in % analog, Datomic rule
    surface): two definitions of extreme-nation OR together; the
    invocation joins a further pattern for the region name."""
    datoms = _datoms_small(spark, sf_dir)
    rules = [
        [("extreme-nation", "?n", "?name"),
         ["?n", ":nation/n_nationkey", "?nk"],
         ["?n", ":nation/n_name", "?name"],
         [("<", "?nk", 3)]],
        [("extreme-nation", "?n", "?name"),
         ["?n", ":nation/n_nationkey", "?nk"],
         ["?n", ":nation/n_name", "?name"],
         [(">", "?nk", 20)]],
    ]
    query = {
        "find": ["?name", "?rname"],
        "rules": rules,
        "where": [
            [("extreme-nation", "?n", "?name")],
            ["?n", ":nation/n_regionkey", "?rk"],
            ["?r", ":region/r_regionkey", "?rk"],
            ["?r", ":region/r_name", "?rname"],
        ],
    }
    return q(query, datoms).orderBy("name")


QUERIES = {
    "datalog_attr_counts": datalog_attr_counts,
    "datalog_region_nations": datalog_region_nations,
    "datalog_param_in": datalog_param_in,
    "datalog_predicate_filter": datalog_predicate_filter,
    "datalog_rules_union": datalog_rules_union,
}

ORACLES = {
    "datalog_attr_counts": """
        SELECT a, count_e FROM (
            SELECT ':nation/n_nationkey' AS a, COUNT(n_nationkey) AS count_e FROM nation
            UNION ALL
            SELECT ':nation/n_name', COUNT(n_name) FROM nation
            UNION ALL
            SELECT ':nation/n_regionkey', COUNT(n_regionkey) FROM nation
            UNION ALL
            SELECT ':region/r_regionkey', COUNT(r_regionkey) FROM region
            UNION ALL
            SELECT ':region/r_name', COUNT(r_name) FROM region
        ) ORDER BY a
    """,
    "datalog_region_nations": """
        SELECT r_name AS rname, COUNT(*) AS count_n
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY rname
    """,
    "datalog_param_in": """
        SELECT n_name AS name FROM nation WHERE n_regionkey = 2 ORDER BY name
    """,
    "datalog_predicate_filter": """
        SELECT DISTINCT n_name AS name FROM nation
        WHERE n_nationkey > 5 AND n_regionkey < n_nationkey
        ORDER BY name
    """,
    "datalog_rules_union": """
        SELECT DISTINCT n_name AS name, r_name AS rname
        FROM nation JOIN region ON n_regionkey = r_regionkey
        WHERE n_nationkey < 3 OR n_nationkey > 20
        ORDER BY name
    """,
}
