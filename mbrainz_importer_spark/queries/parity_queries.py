"""Driver-gate queries for the round-3 Datomic-parity surfaces:
d/index-range (plans/eav.py), entity specs / :db/ensure (plans/specs.py),
composite tuples / :db/tupleAttrs (plans/tuples.py), and :db/excise
(plans/history.py). Each oracle reproduces the semantics bit-for-bit in
DuckDB over the same parquet tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.eav import build_datoms, index_range
from ..plans.history import as_of, excise
from ..plans.specs import EntitySpec, spec_violations
from ..plans.tuples import tuple_duplicates
from ..tables import load


def index_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d/index-range: the AVET slice of :customer/c_acctbal with
    v_num in [0, 5000) — a numeric half-open index range."""
    datoms = build_datoms({"customer": (load(spark, sf_dir, "customer"), "c_custkey")})
    return index_range(datoms, ":customer/c_acctbal", start=0.0, end=5000.0, numeric=True)


def index_pull_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d/index-pull: walk AVET from the [:customer/c_name \"Customer#000000050\"]
    boundary, pulling (name, balance) for the first 20 entities in walk
    order — the paged bulk-read Datomic uses to stream an attribute's
    entities from a resume point."""
    from ..plans.eav import index_pull

    datoms = build_datoms({"customer": (load(spark, sf_dir, "customer"), "c_custkey")})
    return index_pull(
        datoms,
        {"name": ":customer/c_name", "bal": (":customer/c_acctbal", "num")},
        index="avet",
        start=(":customer/c_name", "Customer#000000050"),
        limit=20,
    )


def _customer_spec() -> EntitySpec:
    # built lazily: Column expressions need an active SparkContext
    return EntitySpec(
        name="customer/strict",
        required=("c_name", "c_mktsegment"),
        preds=(
            ("acctbal-nonneg", F.col("c_acctbal") >= 0),
            ("core-segment", F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY")),
        ),
    )


def entity_spec_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:db/ensure audit view: every (entity, failed check) for a strict
    customer spec — negative balances and off-core segments fail preds;
    required attrs are never null in TPC-H so those rules prove the
    no-false-positive side."""
    cust = load(spark, sf_dir, "customer")
    return (
        spec_violations(cust, "c_custkey", _customer_spec())
        .orderBy("entity", "check")
    )


def composite_tuple_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:db/tupleAttrs audit: composite (o_custkey, o_orderdate) values
    held by more than one order — the check run before declaring a
    composite :db.unique/identity."""
    orders = load(spark, sf_dir, "orders")
    return (
        tuple_duplicates(orders, ["o_custkey", "o_orderdate"])
        .orderBy("tuple")
    )


def excision_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:db/excise semantics: after excising one entity, as-of at a
    cutoff BEFORE the excision tx still shows nothing for it (excision
    erases history, unlike retraction), while other entities are
    untouched and the audit datom records the event."""
    ev = load(spark, sf_dir, "events")
    log = ev.select(
        F.concat(F.lit("user:"), F.col("user_id").cast("string")).alias("e"),
        F.concat(F.lit(":user/"), F.col("event_type")).alias("a"),
        F.col("value").alias("v_num"),
        F.col("event_id").alias("tx"),
        (F.col("event_id") % 7 != 0).alias("added"),
    )
    excised = excise(log, "user:1", tx=10_000_000)
    cutoff = log.agg(F.floor(F.max("tx") * 0.6).cast("long").alias("cutoff"))
    return as_of(excised, cutoff).orderBy("e", "a")


QUERIES = {
    "index_range_scan": index_range_scan,
    "index_pull_page": index_pull_page,
    "entity_spec_violations": entity_spec_violations,
    "composite_tuple_duplicates": composite_tuple_duplicates,
    "excision_as_of": excision_as_of,
}

ORACLES = {
    "index_pull_page": """
        SELECT CONCAT('customer:', CAST(c_custkey AS VARCHAR)) AS e,
               c_name AS name,
               CAST(c_acctbal AS DOUBLE) AS bal
        FROM customer
        WHERE c_name >= 'Customer#000000050'
        ORDER BY c_name LIMIT 20
    """,
    "index_range_scan": r"""
        SELECT CONCAT('customer:', CAST(c_custkey AS VARCHAR)) AS e,
               ':customer/c_acctbal' AS a,
               regexp_replace(CAST(c_acctbal AS VARCHAR), '\.0$', '') AS v,
               CAST(c_acctbal AS DOUBLE) AS v_num
        FROM customer
        WHERE CAST(c_acctbal AS DOUBLE) >= 0.0 AND CAST(c_acctbal AS DOUBLE) < 5000.0
        ORDER BY v_num, e
    """,
    "entity_spec_violations": """
        SELECT c_custkey AS entity, 'c_name' AS "check", 'required' AS kind
        FROM customer WHERE c_name IS NULL
        UNION ALL
        SELECT c_custkey, 'c_mktsegment', 'required'
        FROM customer WHERE c_mktsegment IS NULL
        UNION ALL
        SELECT c_custkey, 'acctbal-nonneg', 'pred'
        FROM customer WHERE NOT COALESCE(c_acctbal >= 0, FALSE)
        UNION ALL
        SELECT c_custkey, 'core-segment', 'pred'
        FROM customer
        WHERE NOT COALESCE(c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY'), FALSE)
        ORDER BY entity, "check"
    """,
    "composite_tuple_duplicates": """
        SELECT CAST(o_custkey AS VARCHAR) || chr(31) || CAST(o_orderdate AS VARCHAR)
                   AS tuple,
               count(*) AS n_rows
        FROM orders
        GROUP BY 1
        HAVING count(*) > 1
        ORDER BY tuple
    """,
    "excision_as_of": """
        WITH log AS (
            SELECT 'user:' || CAST(user_id AS VARCHAR) AS e,
                   ':user/' || event_type AS a,
                   value AS v_num,
                   event_id AS tx,
                   event_id % 7 <> 0 AS added
            FROM events
        ),
        cutoff AS (SELECT CAST(floor(max(tx) * 0.6) AS BIGINT) AS t FROM log),
        survivors AS (SELECT * FROM log WHERE e <> 'user:1'),
        latest AS (
            SELECT e, a,
                   arg_max(v_num, tx) AS v_num,
                   arg_max(added, tx) AS last_added,
                   max(tx) AS tx
            FROM survivors, cutoff
            WHERE tx <= cutoff.t
            GROUP BY e, a
        )
        SELECT e, a, v_num, tx FROM latest WHERE last_added
        ORDER BY e, a
    """,
}
