"""The remaining TPC-H query shapes (Q4, Q6, Q8, Q9, Q11, Q13, Q15,
Q17, Q20, Q21, Q22) — with q1/q3/q5 (core.py), q7/q16 (extra.py) and
q2/q10/q12/q14/q18/q19 (tpch_extra.py) this completes all 22 TPC-H
plan shapes over the driver's testdata schema.

Adaptations (the testdata has no partsupp/shipmode/commitdate/
receiptdate/phone columns; each keeps the PLAN SHAPE that matters at
100 TB):
  - "late" lines (Q4/Q21) = l_shipdate > o_orderdate + lateness window
    (replaces commitdate < receiptdate);
  - supply cost (Q9) = p_retailprice * quantity (replaces
    ps_supplycost);
  - part-value (Q11) aggregates lineitem revenue instead of
    partsupp stock value;
  - country code (Q22) = c_nationkey % 10 (replaces phone prefix).

Determinism rules (oracle hash-equivalence): money stays
DECIMAL(18,2)-exact until one edge cast to DOUBLE; correlated
average thresholds (Q17, Q22) are rewritten as integer/decimal
cross-multiplication (qty * 5 * cnt < sum) so neither engine ever
compares against a float whose value depends on summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from .core import _dec

_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"
)


def _rev() -> F.Column:
    return _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS-decorrelated semi-join + priority rollup.
    Orders of one quarter that had at least one late line (shipped
    > 60 days after order), counted per priority.

    Scale shape: the semi join shuffles once on orderkey and never
    duplicates orders with many late lines — exactly why Q4 is written
    EXISTS and not JOIN-DISTINCT."""
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    li = load(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: pure scan-filter-aggregate, zero joins. The yardstick
    query for predicate pushdown: every filter reaches the parquet
    scan, the aggregate is a map-side partial + one-row exchange."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        (F.sum(_dec("l_extendedprice") * _dec("l_discount")))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: two nation lookups on opposite sides of the fact
    (supplier nation vs customer nation->region), conditional share
    per order year. Both nation/region dims broadcast; the division
    happens once at the edge over exact decimal sums."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    part = load(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    s_nation = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    c_nation = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    rev = _rev()
    target = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(s_nation), supp.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(c_nation), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == region.r_regionkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(target).cast("double") / F.sum(rev).cast("double"), 6
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: multi-dim star join + profit expression per (nation,
    year). Supply cost adapted to p_retailprice * quantity (no
    partsupp); the amount stays decimal-exact through the subtraction."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    supp = load(spark, sf_dir, "supplier")
    part = load(spark, sf_dir, "part").where(F.col("p_name").contains("gear"))
    nation = load(spark, sf_dir, "nation")
    amount = _rev() - _dec("p_retailprice") * _dec("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: group-agg + HAVING against a global scalar aggregate
    of the SAME feed. The scalar side is a one-row plan cross-joined
    (broadcast) onto the groups — no driver-side collect; the fraction
    compare happens on exact decimals scaled integer-side
    (value * 1000 > total) so no float threshold exists."""
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    feed = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("l_partkey", _rev().alias("rev"))
    )
    per_part = feed.groupBy("l_partkey").agg(F.sum("rev").alias("value"))
    total = feed.agg(F.sum("rev").alias("total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("value") * 1000 > F.col("total"))
        .select("l_partkey", F.col("value").cast("double").alias("value"))
        .orderBy(F.col("value").desc(), F.col("l_partkey").asc())
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: left outer join preserved-side count, then a
    histogram of the counts. Two shuffles (custkey, then c_count);
    customers with zero orders must survive with c_count = 0 — the
    left join, not an inner, is the point."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: revenue view + max-of-view + equality join-back
    (ties kept). The max is a one-row broadcast; equality is on the
    exact decimal, so ties resolve identically in both engines."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    supp = load(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("r_suppkey")).agg(
        F.sum(_rev()).alias("total_rev")
    )
    top = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.crossJoin(F.broadcast(top))
        .where(F.col("total_rev") == F.col("max_rev"))
        .join(supp, F.col("r_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey", "s_name",
            F.col("total_rev").cast("double").alias("total_rev"),
        )
        .orderBy("s_suppkey")
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: correlated per-part average threshold, decorrelated
    to groupBy + join-back. The `qty < 0.2 * avg(qty)` predicate is
    cross-multiplied to `qty * 5 * cnt < sum_qty` over exact decimals
    — no float average whose value depends on summation order."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    stats = li.groupBy(F.col("l_partkey").alias("s_partkey")).agg(
        F.sum(_dec("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt_qty"),
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(stats, li.l_partkey == F.col("s_partkey"))
        .where(_dec("l_quantity") * 5 * F.col("cnt_qty") < F.col("sum_qty"))
        .agg(
            F.round(F.sum(_dec("l_extendedprice")).cast("double") / 7.0, 6).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: nested IN over a grouped HAVING subquery, then a
    nation-filtered projection. The inner aggregate shuffles on
    (suppkey, partkey); its distinct supplier set semi-joins the
    supplier dim."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    part = load(spark, sf_dir, "part").where(F.col("p_name").startswith("b"))
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_2", "NATION_12", "NATION_22")
    )
    heavy = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("sum_qty"))
        .where(F.col("sum_qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
        .orderBy("s_suppkey")
    )


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: the EXISTS / NOT-EXISTS double self-join on the fact
    table. A supplier "kept the order waiting" when its line shipped
    > 90 days after a finished order that other suppliers also fed,
    and no OTHER supplier's line on that order was late. Semi + anti
    join, both shuffling on orderkey; per-supplier counts after."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    supp = load(spark, sf_dir, "supplier")
    l1 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("k3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("ship3"),
    )
    waited = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("k3"))
        & (F.col("l_suppkey") != F.col("s3"))
        & (F.col("ship3") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_anti",
    )
    return (
        waited.join(supp, waited.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: anti-join against orders + global-average threshold.
    Country code adapted to c_nationkey % 10; the `bal > avg(bal)`
    filter is cross-multiplied to `bal * cnt > sum` over exact
    decimals (no order-dependent float average)."""
    cust = load(spark, sf_dir, "customer").where(
        (F.col("c_nationkey") % 10).isin(1, 3, 5, 7, 9)
    )
    orders = load(spark, sf_dir, "orders")
    pos = load(spark, sf_dir, "customer").where(F.col("c_acctbal") > 0)
    avg_parts = pos.agg(
        F.sum(_dec("c_acctbal")).alias("sum_bal"),
        F.count(F.lit(1)).alias("cnt_bal"),
    )
    return (
        cust.crossJoin(F.broadcast(avg_parts))
        .where(_dec("c_acctbal") * F.col("cnt_bal") > F.col("sum_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 10).cast("bigint").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


QUERIES = {
    "q4_order_priority": q4_order_priority,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q8_market_share": q8_market_share,
    "q9_product_type_profit": q9_product_type_profit,
    "q11_important_parts": q11_important_parts,
    "q13_customer_distribution": q13_customer_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q20_excess_suppliers": q20_excess_suppliers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q22_global_sales_opportunity": q22_global_sales_opportunity,
}

ORACLES = {
    "q4_order_priority": """
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate < TIMESTAMP '1996-10-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q6_forecast_revenue": """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "q8_market_share": f"""
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
               ROUND(CAST(SUM(CASE WHEN sn.n_name = 'NATION_3'
                                   THEN {_DISC_PRICE}
                                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                     / CAST(SUM({_DISC_PRICE}) AS DOUBLE), 6) AS mkt_share
        FROM lineitem
          JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation sn ON s_nationkey = sn.n_nationkey
          JOIN nation cn ON c_nationkey = cn.n_nationkey
          JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
        GROUP BY 1 ORDER BY o_year
    """,
    "q9_product_type_profit": f"""
        SELECT n_name AS nation,
               CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
               CAST(SUM({_DISC_PRICE}
                        - CAST(p_retailprice AS DECIMAL(18,2))
                          * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_profit
        FROM lineitem
          JOIN part ON l_partkey = p_partkey AND p_name LIKE '%gear%'
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN nation ON s_nationkey = n_nationkey
        GROUP BY 1, 2
        ORDER BY nation ASC, o_year DESC
    """,
    "q11_important_parts": f"""
        WITH feed AS (
            SELECT l_partkey, {_DISC_PRICE} AS rev
            FROM lineitem
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_7'
        )
        SELECT l_partkey, CAST(SUM(rev) AS DOUBLE) AS value
        FROM feed
        GROUP BY l_partkey
        HAVING SUM(rev) * 1000 > (SELECT SUM(rev) FROM feed)
        ORDER BY value DESC, l_partkey ASC
    """,
    "q13_customer_distribution": """
        WITH per_cust AS (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        )
        SELECT CAST(c_count AS BIGINT) AS c_count,
               CAST(COUNT(*) AS BIGINT) AS custdist
        FROM per_cust
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "q15_top_supplier": f"""
        WITH rev AS (
            SELECT l_suppkey, SUM({_DISC_PRICE}) AS total_rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
        FROM supplier JOIN rev ON s_suppkey = l_suppkey
        WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
        ORDER BY s_suppkey
    """,
    "q17_small_quantity_revenue": """
        WITH stats AS (
            SELECT l_partkey AS s_partkey,
                   SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
                   COUNT(*) AS cnt_qty
            FROM lineitem GROUP BY l_partkey
        )
        SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                     / 7.0, 6) AS avg_yearly,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem
          JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#23'
          JOIN stats ON l_partkey = s_partkey
        WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt_qty < sum_qty
    """,
    "q20_excess_suppliers": """
        SELECT s_suppkey, s_name, n_name AS nation
        FROM supplier
          JOIN nation ON s_nationkey = n_nationkey
                     AND n_name IN ('NATION_2', 'NATION_12', 'NATION_22')
        WHERE s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE 'b%'
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY l_suppkey, l_partkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 50)
        ORDER BY s_suppkey
    """,
    "q21_waiting_suppliers": """
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM lineitem l1
          JOIN orders ON l1.l_orderkey = o_orderkey AND o_orderstatus = 'F'
          JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name ASC
        LIMIT 100
    """,
    "q22_global_sales_opportunity": """
        WITH avg_parts AS (
            SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS sum_bal,
                   COUNT(*) AS cnt_bal
            FROM customer WHERE c_acctbal > 0
        )
        SELECT CAST(c_nationkey % 10 AS BIGINT) AS cntrycode,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM customer, avg_parts
        WHERE c_nationkey % 10 IN (1, 3, 5, 7, 9)
          AND CAST(c_acctbal AS DECIMAL(18,2)) * cnt_bal > sum_bal
          AND NOT EXISTS (
            SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY 1 ORDER BY cntrycode
    """,
}
