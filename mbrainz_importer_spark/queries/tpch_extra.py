"""Additional TPC-H-shaped gate queries (round 2): min-cost-per-group
join-back (Q2), returned-item revenue report (Q10), priority shipping
buckets (Q12), promo revenue ratio (Q14), large-order HAVING (Q18),
disjunctive multi-range predicates (Q19) — each adapted to the driver's
testdata schema (no partsupp/shipmode/container columns; the SHAPE of
each plan — the thing that matters at 100 TB — is preserved).

All money arithmetic routes through DECIMAL(18,2) (exact,
partition-order independent) and casts to DOUBLE only at the edge, per
the established oracle-equivalence rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from .core import _dec

_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"
)


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: per-group minimum + join-back to the achieving rows.
    Adapted (no partsupp): for each part of size >= 48, the supplier(s)
    selling it at the minimum observed extended price.

    Scale shape: groupBy-min then equi-join back on (key, min) — two
    shuffles on l_partkey, NO correlated per-row subquery; the oracle
    expresses the same thing correlated, which is exactly the
    decorrelation Catalyst/engines must agree on."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").where(F.col("p_size") >= 48)
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    mins = li.groupBy(F.col("l_partkey").alias("m_partkey")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    achieving = li.join(
        mins,
        (F.col("l_partkey") == F.col("m_partkey"))
        & (F.col("l_extendedprice") == F.col("min_price")),
    ).select(F.col("l_partkey").alias("partkey"), "l_suppkey", "min_price")
    return (
        achieving.join(part, F.col("partkey") == part.p_partkey)
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            "p_partkey", "p_name", "s_name",
            F.col("n_name").alias("supp_nation"),
            F.col("min_price").cast("double").alias("min_price"),
        )
        .distinct()
        .orderBy("p_partkey", "s_name")
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: revenue lost to returns per customer, one quarter,
    top 20. Filters reach the scans before the joins; the customer/nation
    dims broadcast."""
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: conditional-count buckets per group. Adapted (no
    shipmode): per ship year, line counts of critical (1-URGENT/2-HIGH)
    vs other order priorities, for lines shipped > 30 days after the
    order date. Integer counts — engine-exact."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(crit, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: conditional revenue ratio over a one-month window.
    Both sums are exact decimals; the single division happens once at
    the edge in double, rounded once."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    part = load(spark, sf_dir, "part")
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(18,2)"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0) * F.sum(promo).cast("double") / F.sum(rev).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: HAVING over a child aggregate, joined back to parents.
    The quantity aggregate shuffles on l_orderkey once and its result
    (few rows) broadcast-joins the parents."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("total_qty"))
        .where(F.col("total_qty") > 250)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: OR-of-ANDs multi-range predicate join. Catalyst keeps
    the equi-join on partkey and evaluates the disjunction as a single
    post-join filter (common partkey conjunct extracted) — never a
    nested loop."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    cases = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 45)
        )
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .where(cases)
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q10_returned_items": q10_returned_items,
    "q12_priority_shipping": q12_priority_shipping,
    "q14_promo_revenue": q14_promo_revenue,
    "q18_large_orders": q18_large_orders,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
}

ORACLES = {
    "q2_min_cost_supplier": """
        SELECT DISTINCT p_partkey, p_name, s_name,
               n_name AS supp_nation,
               l_extendedprice AS min_price
        FROM lineitem
          JOIN part ON l_partkey = p_partkey AND p_size >= 48
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
        WHERE l_extendedprice = (
            SELECT MIN(l2.l_extendedprice) FROM lineitem l2
            WHERE l2.l_partkey = lineitem.l_partkey
        )
        ORDER BY p_partkey, s_name
    """,
    "q10_returned_items": f"""
        SELECT c_custkey, c_name, n_name,
               CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-07-01'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "q12_priority_shipping": """
        SELECT CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS ship_year,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
        GROUP BY 1 ORDER BY ship_year
    """,
    "q14_promo_revenue": f"""
        SELECT ROUND(
            100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                                  THEN {_DISC_PRICE}
                                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                  / CAST(SUM({_DISC_PRICE}) AS DOUBLE),
            6) AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
    "q18_large_orders": """
        WITH big AS (
            SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
        )
        SELECT c_custkey, c_name, o_orderkey,
               o_totalprice,
               CAST(total_qty AS DOUBLE) AS total_qty
        FROM big
          JOIN orders ON big.l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
        ORDER BY total_qty DESC, o_orderkey ASC
        LIMIT 100
    """,
    "q19_disjunctive_revenue": f"""
        SELECT CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 15)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 45)
    """,
}
