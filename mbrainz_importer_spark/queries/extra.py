"""Extended engine surface beyond the reference's own operators
(SURVEY.md §2.4 note: 'the new engine gets the rest for free from Spark
SQL and declares them in the engine API'): as-of join, range join,
pivot/unpivot, rollup, exact percentiles, correlation/stddev, JSON
construction, approximate distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load
from .core import _dec


def asof_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: for each purchase event, the most recent prior click of
    the same user. Implemented scalably as a union + ordered window with
    IGNORE NULLS last_value — one shuffle on user_id, no range join, no
    per-row subquery (the classic streaming-friendly as-of pattern)."""
    ev = load(spark, sf_dir, "events").where(F.col("event_type").isin("click", "purchase"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    last_click_ts = F.last(
        F.when(F.col("event_type") == "click", F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        ev.withColumn("last_click_ts", last_click_ts)
        .where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "last_click_ts")
        .orderBy("event_id")
    )


def range_join_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: line items shipped within 7 days after their
    order date — an equi-join on the key plus a range predicate, so Spark
    keeps the hash join and applies the range as a post-filter (never a
    nested-loop over the cross product)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(
            (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS"))
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_fast_lines"))
        .orderBy("o_orderpriority")
    )


def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-user event-type counts as columns (explicit value list
    keeps the plan static — no extra distinct pass)."""
    ev = load(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
        .orderBy("user_id")
    )


def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt via stack: lineitem measures to (orderkey, measure,
    value) rows — the G9/G10 dim-flatten shape applied to facts."""
    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 200)
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.expr(
                "stack(3, 'quantity', l_quantity, 'price', l_extendedprice, 'discount', l_discount)"
            ).alias("measure", "value"),
        )
        .orderBy("l_orderkey", "l_linenumber", "measure")
    )


def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: subtotals per (status, priority), per status, grand total."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (interpolated, SQL PERCENTILE_CONT semantics) of
    order totals per status."""
    orders = load(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
            F.round(F.min(price), 4).alias("min_price"),
            F.round(F.max(price), 4).alias("max_price"),
        )
        .orderBy("o_orderstatus")
    )


def stats_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: correlation, sample stddev/variance."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.stddev("l_discount"), 6).alias("stddev_disc"),
        F.round(F.var_samp("l_tax"), 6).alias("var_tax"),
    )


def json_construction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_json/struct construction (§2.6 declared surface): serialize rows
    back to JSON documents."""
    nation = load(spark, sf_dir, "nation")
    return nation.select(
        "n_nationkey",
        F.to_json(F.struct(F.col("n_name").alias("name"), F.col("n_regionkey").alias("region"))).alias("doc"),
    ).orderBy("n_nationkey")


def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers that have at least one order,
    counted by segment — the membership-probe complement of the anti-join
    (J5). Semi joins never duplicate the probe side."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .orderBy("c_mktsegment")
    )


def scalar_subquery_small_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery shape (TPC-H Q17): revenue of line items whose
    quantity is below half the average quantity of their part. Expressed
    as a grouped-average join (the plan Spark would rewrite the correlated
    subquery into anyway)."""
    li = load(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum(_x := F.col("l_quantity").cast("decimal(18,2)")) / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.join(avg_qty, li.l_partkey == avg_qty.pk)
        .where(F.col("l_quantity").cast("decimal(18,2)") < F.lit(0.5).cast("decimal(18,2)") * F.col("avg_qty"))
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("small_revenue"),
        )
    )


def json_parse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with a declared schema (the schema-on-read half of §2.6's
    JSON surface): parse events.props into a typed struct and project."""
    ev = load(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id",
        F.from_json(F.col("props"), "k BIGINT").alias("p"),
    )
    return (
        parsed.select("event_id", F.col("p.k").alias("k"))
        .where(F.col("k").isNotNull())
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(F.count(F.lit(1)).alias("n"), F.max("k").alias("max_k"))
        .orderBy("k_mod")
    )


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approximate distinct (sketch differs per engine — rows-only
    check) alongside the exact value for calibration."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    ).orderBy("event_type")


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between nation pairs by year —
    double dimension join (both broadcast) + derived grouping key."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    sup = load(spark, sf_dir, "supplier")
    n1 = F.broadcast(load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n1, sup.s_nationkey == F.col("s_nk"))
        .join(n2, cust.c_nationkey == F.col("c_nk"))
        .where(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(F.sum(_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount")))
             .cast("double").alias("revenue"))
        .where(F.col("l_year") == 1996)
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q16_excluding_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per part attribute with a
    NOT IN exclusion list (anti-join on a computed predicate set)."""
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    excluded = (
        load(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(excluded, li.l_suppkey == excluded.s_suppkey, "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
        .limit(50)
    )


def cas_conditional_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:db/cas as a set operation (operators/upsert.cas_update): one
    deterministic update batch where keys ending in 0 carry a correct
    expectation (applied: +100) and keys ending in 5 a stale one
    (skipped) — on_conflict='skip' retry semantics."""
    from ..operators.upsert import cas_update

    cust = load(spark, sf_dir, "customer")
    updates = cust.where((F.col("c_custkey") % 10).isin(0, 5)).select(
        "c_custkey",
        F.when(F.col("c_custkey") % 10 == 0, F.col("c_acctbal"))
        .otherwise(F.col("c_acctbal") + 1)
        .alias("expected"),
        (F.col("c_acctbal") + 100).alias("new_value"),
    )
    out = cas_update(
        cust, updates, "c_custkey", "c_acctbal", on_conflict="skip"
    )
    return out.select("c_custkey", "c_acctbal", "c_mktsegment").orderBy("c_custkey")


def datoms_index_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d/datoms AVET index scan: one attribute's datoms in value order
    (the lookup index), component filter pushed to the scan."""
    from ..plans.eav import build_datoms, datoms_index

    datoms = build_datoms({"nation": (load(spark, sf_dir, "nation"), "n_nationkey")})
    return datoms_index(datoms, "avet", a=":nation/n_regionkey")










def event_type_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information between event types over user
    'documents': PMI(a,b) = log2(P(a,b) / (P(a)P(b))) with P the
    fraction of users exhibiting the type(s) — the association measure
    behind co-occurrence analysis. Distinct user-type pairs self-join
    on user (bounded fan-out: |types| per user), tiny aggregates."""
    ev = load(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    n_users = ut.select("user_id").distinct().count()
    singles = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n1"))
    a = ut.select(F.col("user_id"), F.col("event_type").alias("ta"))
    b = ut.select(F.col("user_id"), F.col("event_type").alias("tb"))
    both = (
        a.join(b, "user_id")
        .where(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    return (
        both.join(F.broadcast(singles.withColumnRenamed("event_type", "ta")
                              .withColumnRenamed("n1", "na")), "ta")
        .join(F.broadcast(singles.withColumnRenamed("event_type", "tb")
                          .withColumnRenamed("n1", "nb")), "tb")
        .select(
            "ta", "tb", "n_both",
            F.round(
                F.log2(
                    (F.col("n_both") * F.lit(float(n_users)))
                    / (F.col("na") * F.col("nb"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy("ta", "tb")
    )


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-activity week,
    counted as active in each subsequent week offset — the canonical
    product-analytics rollup. Week index is an integer day-diff
    division (engine-portable; no date_trunc('week') locale edges).
    Two linear shuffles: per-user cohort, then the (cohort, offset)
    count."""
    ev = load(spark, sf_dir, "events")
    week = F.floor(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")) / 7
    ).cast("bigint")
    activity = ev.select("user_id", week.alias("week")).distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        activity.join(cohorts, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transitions over each user's event sequence:
    counts and conditional probabilities P(next | prev) from per-user
    lag pairs ordered by (ts, event_id) — the behavioral-sequence
    analytics every event warehouse runs; one shuffle on the user key
    plus a tiny (|types|^2) aggregate."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    totals = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type", "next_type", "n",
        F.round(F.col("n") / F.sum("n").over(totals), 6).alias("p_next"),
    ).orderBy("prev_type", "next_type")


def rolling_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per event type, the 3-day moving sum/count of
    daily event value (range between 2 preceding days and current) —
    decimal-exact sums so the frame aggregation hashes across engines."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type", F.to_date("ts").alias("day")
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).alias("day_value"),
            F.count(F.lit(1)).alias("day_events"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.datediff(F.col("day"), F.lit("1970-01-01")))
        .rangeBetween(-2, 0)
    )
    return daily.select(
        "event_type", "day",
        F.sum("day_value").over(w).cast("double").alias("rolling_value"),
        F.sum("day_events").over(w).cast("bigint").alias("rolling_events"),
    ).orderBy("event_type", "day")


def feature_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature conditioning: z-score + min-max + exact-percentile
    winsorization over a bounded lineitem slice — stats in one pass,
    broadcast into a pure projection (the corpus never shuffles)."""
    from ..operators.features import minmax_normalize, winsorize, zscore_normalize

    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 200)
    out = zscore_normalize(li, ["l_quantity"])
    out = minmax_normalize(out, ["l_extendedprice"])
    out = winsorize(out, "l_quantity", 0.05, 0.95)
    return out.select(
        "l_orderkey", "l_linenumber",
        "l_quantity_z", "l_extendedprice_mm",
        F.round(F.col("l_quantity_w"), 6).alias("l_quantity_w"),
    ).orderBy("l_orderkey", "l_linenumber")


def scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 merge: customers' market segment versioned through three
    deterministic change waves (a real change, a chained second change,
    and a NO-OP repeat that must collapse) — the warehouse twin of the
    engine's datom history. One shuffle on the key."""
    from ..operators.scd import scd2_apply

    cust = load(spark, sf_dir, "customer")
    d = lambda s: F.lit(s).cast("date")  # noqa: E731
    dim = cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        d("2024-01-01").alias("effective_from"),
        F.lit(None).cast("date").alias("effective_to"),
    )
    waves = [
        (3, "SEG-A", "2024-02-01"),
        (6, "SEG-B", "2024-03-01"),
        (6, "SEG-B", "2024-04-01"),  # no-op: collapses
    ]
    changes = None
    for mod, seg, eff in waves:
        w = cust.where(F.col("c_custkey") % mod == 0).select(
            "c_custkey", F.lit(seg).alias("segment"),
            d(eff).alias("effective_from"),
        )
        changes = w if changes is None else changes.unionByName(w)
    return scd2_apply(dim, changes, "c_custkey", ["segment"]).orderBy(
        "c_custkey", "effective_from"
    )


def data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-shaped expectations on orders: completeness, uniqueness,
    bounds, set membership, pattern — ALL metrics in one aggregation
    pass, verdicts via in-plan unpivot."""
    from ..operators.expectations import Rule, check

    orders = load(spark, sf_dir, "orders")
    rules = [
        Rule("complete", "o_orderkey"),
        Rule("unique", "o_orderkey"),
        Rule("min", "o_totalprice", 0.0),
        Rule("in_set", "o_orderstatus", ("O", "F", "P")),
        Rule("matches", "o_orderpriority", "^[1-5]-"),
        Rule("non_negative", "o_custkey"),
        Rule("complete", "o_orderdate", threshold=0.5),
    ]
    return check(orders, rules)


def data_quality_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level dead-letter routing (expectations.quarantine_split):
    orders failing any row rule land in quarantine labeled with every
    violated rule in rule order; the good side flows on. The gate
    certifies the labels and the split cardinality in one frame:
    quarantined rows with their violation strings, plus counts are
    implied by the row set itself."""
    from ..operators.expectations import Rule, quarantine_split

    orders = load(spark, sf_dir, "orders")
    rules = [
        Rule("min", "o_totalprice", 50000.0),
        Rule("in_set", "o_orderstatus", ("O", "F")),
        Rule("matches", "o_orderpriority", "^[1-3]-"),
    ]
    _good, bad = quarantine_split(orders, rules)
    return bad.select("o_orderkey", "violated").orderBy("o_orderkey")


def zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton keys for orders over (custkey, order-date-days): the
    integer bit-interleave behind ZORDER BY clustering, certified
    bit-exactly (layout itself is physical; the key is the contract)."""
    from ..operators.layout import zvalue

    orders = load(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
    return orders.select(
        "o_orderkey",
        zvalue([F.col("o_custkey"), days], bits=16).alias("z"),
    ).orderBy("o_orderkey")


def session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (24h gap): per-(user, session) bounds
    and event counts — the batch twin of the streaming session window,
    one shuffle on the user key."""
    from ..operators.sessions import sessionize

    ev = load(spark, sf_dir, "events")
    return sessionize(ev, gap_minutes=1440).orderBy("user", "session_id")


def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order first-touch funnel signup -> view -> purchase: one
    timestamp per step per user, chained comparisons, in-plan unpivot."""
    from ..operators.sessions import funnel_counts

    ev = load(spark, sf_dir, "events")
    return funnel_counts(ev, ["signup", "view", "purchase"]).orderBy("step")


def _symmetrize(eg: DataFrame) -> DataFrame:
    """Both directions of the DISTINCT customer-supplier edge set.

    No distinct after the union (r13 optimization, guide §2.4 — remove
    shuffles outright): `eg` is already distinct, and its node ids are
    PARITY-DISJOINT by construction (src = o_custkey*2 is even, dst =
    l_suppkey*2+1 is odd), so a forward row (even, odd) can never equal
    a reversed row (odd, even) — the union of the two directions is
    distinct by construction, and the old outer .distinct() was a full
    exchange + aggregate over 2|E| rows for nothing. Result set
    identical (oracle-certified on every consumer gate)."""
    return eg.unionByName(
        eg.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def graph_pagerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer PageRank (3 rounds) over the symmetric customer-supplier
    trade graph (distinct (cust, supp) pairs from lineitem x orders,
    node ids disjoint by parity, both edge directions) — the
    weighted-propagation member of the iterative family next to label
    propagation (dedup clusters) and semi-naive datalog. All-BIGINT
    arithmetic (operators/graph.py), so three unrolled DuckDB rounds
    must reproduce every rank bit-for-bit."""
    from ..operators.graph import pagerank_topk

    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    eg = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = _symmetrize(eg)
    return pagerank_topk(edges, k=20, iters=3)


def graph_pagerank_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """graph_pagerank_topk with the edge derivation riding the bucketed
    fact layout (_trade_edges_bucketed) — identical rounds, identical
    oracle. The plain gate's steady state is flat (the statics cache
    persists the derived edges), so what this face buys is the BUILD
    run: the first derivation on a fresh graph pays the co-located scan
    instead of the full fact-fact shuffle — the cost every new-graph
    session pays once."""
    from ..operators.graph import pagerank_topk

    eg = (
        _trade_edges_bucketed(spark, sf_dir)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = _symmetrize(eg)
    return pagerank_topk(edges, k=20, iters=3)


def graph_pagerank_directed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank with dangling-mass redistribution on a sink-bearing
    DIRECTED graph (customer -> supplier trade edges, un-symmetrized:
    every supplier node is a sink). Each round adds one scalar
    aggregation — the sinks' total mass, integer-split dm DIV n and
    teleported into every node's update (operators/graph.py
    dangling="redistribute"); the default drop policy stays exact for
    the symmetric gate. Three unrolled DuckDB rounds with the same
    scalar subquery must reproduce every rank bit-for-bit."""
    from ..operators.graph import pagerank_topk

    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    return pagerank_topk(edges, k=20, iters=3, dangling="redistribute")


def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop distance (operators/graph.py:bfs_hops) over
    the symmetric customer-supplier trade graph, seeded at the first
    five customer nodes, 3 hops: hop 1 = their suppliers, hop 2 = other
    customers sharing a supplier, hop 3 = those customers' suppliers.
    Semi-naive frontier expansion — work per round is frontier-incident
    edges, never path enumeration. The DuckDB oracle walks the same
    graph with a recursive CTE (UNION-dedup keeps states bounded by
    nodes x hops) and takes MIN(hop) — first-reach order certified
    equal to minimum distance."""
    from ..operators.graph import bfs_hops

    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    eg = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = _symmetrize(eg)
    seeds = spark.range(5).select((F.col("id") * 2).alias("node"))
    return bfs_hops(edges, seeds, max_hops=3).orderBy("node")


def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous mode-label propagation (operators/graph.py:
    label_propagation), 3 rounds over the symmetric trade graph: every
    node simultaneously adopts its neighbors' most frequent label (ties
    to the smallest). All-integer and fully deterministic, so the
    DuckDB oracle unrolling the same 3 rounds (count -> per-node argmax
    with the same tie order) must reproduce every label bit-for-bit —
    distinct from pointer-jumping connected components, which converge
    on ANY spanning structure; the mode rule is density-sensitive."""
    from ..operators.graph import label_propagation

    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    eg = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = _symmetrize(eg)
    return label_propagation(edges, iters=3).orderBy("node")


def graph_sssp_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-round weighted shortest paths (operators/graph.py:
    sssp_bounded — distributed Bellman-Ford, 3 relaxations) over the
    symmetric trade graph weighted by the number of distinct orders
    linking each customer-supplier pair: after 3 rounds every node
    reachable within 3 hops carries its minimum path weight — min-PLUS,
    so a cheap 2-hop route beats an expensive direct edge (the
    semantics BFS's first-reach cannot express). All-integer; the
    DuckDB oracle unrolls the same 3 relax+min rounds."""
    from ..operators.graph import sssp_bounded

    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    pair_orders = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
            F.col("l_orderkey").alias("ok"),
        )
        .distinct()
    )
    eg = pair_orders.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("bigint").alias("w")
    )
    edges = eg.unionByName(
        eg.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    seeds = spark.range(5).select((F.col("id") * 2).alias("node"))
    return sssp_bounded(edges, seeds, rounds=3).orderBy("node")


def layout_append_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bucketed fact layout under CONTINUOUS ARRIVAL
    (sources/bucketed.py:append_bucketed / bucketed_compaction_due /
    compact_bucketed): 90% of orders build the layout, the last 10%
    fold in as an O(increment) append (each bucket gains one
    spec-carrying file — co-location survives, sort trust is spent),
    the census flags the multi-file buckets and compaction collapses
    them back to the single-file invariant. The q3-shaped orderkey
    join over the appended-then-compacted layout must hash-equal the
    full-corpus oracle — the maintenance cycle certified invisible.
    Build-once per sf_dir (the row-count guard skips rebuild on
    re-runs; appends are deliberately not idempotent — redelivery
    discipline belongs to the ingest sink, operators/idempotency.py)."""
    import os

    from ..plans.eav import _table_buckets
    from ..sources.bucketed import (
        append_bucketed,
        bucketed_compaction_due,
        compact_bucketed,
        ensure_bucketed_table,
        write_bucketed,
    )
    from .core import _BUCKETED_O_COLS, _bucketed_facts

    li, _o = _bucketed_facts(spark, sf_dir)
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    t = f"b_orders_app_{tag}"
    orders = load(spark, sf_dir, "orders").select(*_BUCKETED_O_COLS)
    full = orders.count()
    nb = _table_buckets(spark, f"b_lineitem_{tag}")
    fresh = (
        ensure_bucketed_table(spark, t)
        and spark.table(t).count() == full
        and _table_buckets(spark, t) == nb
    )
    if not fresh:
        write_bucketed(
            orders.where(F.col("o_orderkey") % 10 != 0), t, "o_orderkey", nb
        )
        append_bucketed(orders.where(F.col("o_orderkey") % 10 == 0), t)
        if bucketed_compaction_due(spark, t, max_files_per_bucket=1):
            compact_bucketed(spark, t)
    o = spark.table(t).hint("merge")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.floor(F.col("l_quantity") * 100).cast("bigint"))
            .cast("bigint")
            .alias("qty_cents"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .orderBy("o_orderpriority")
    )


def _trade_edges_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lineitem-orders join of the trade-graph edge derivation over
    the ORDERKEY-BUCKETED fact layout (queries/core.py:_bucketed_facts)
    — the cost that dominates every plain graph gate at the sf100 tier:
    the plain derivation shuffles both full fact tables into the SMJ
    (101.6s of graph_bfs_hops' sf100 run is mostly this join; the
    weighted SSSP variant OOMs the 8g heap inside it). Bucketed, both
    fact sides scan co-located and the join plans Exchange-free
    (plan-asserted in test_plan_properties); only the projected
    (src, dst[, ok]) pairs reach the distinct, whose map-side partial
    aggregation collapses the replication-factor duplicates before its
    small shuffle. Same rows as the plain derivation by construction —
    the bucketed gates share their plain twins' oracles."""
    from .core import _bucketed_facts

    li, o = _bucketed_facts(spark, sf_dir)
    return li.join(o, li.l_orderkey == o.o_orderkey)


def graph_bfs_hops_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """graph_bfs_hops with the edge derivation riding the bucketed fact
    layout (_trade_edges_bucketed): identical BFS, identical oracle —
    the gate certifies that moving the derivation onto the layout
    changes the plan, not the graph."""
    from ..operators.graph import bfs_hops

    eg = (
        _trade_edges_bucketed(spark, sf_dir)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = _symmetrize(eg)
    seeds = spark.range(5).select((F.col("id") * 2).alias("node"))
    return bfs_hops(edges, seeds, max_hops=3).orderBy("node")


def graph_bfs_appended_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS whose edge derivation consumes an APPENDED bucketed layout —
    the gate the r10 verdict asked for (#3): a real deployment's trade
    graph grows continuously, and the graph faces were build-once. The
    orders side builds from 90% of the corpus and the remaining 10%
    arrives as TWO `append_bucketed_once` epochs (the exactly-once
    manifest/ledger discipline of the streaming sink, including a
    replayed epoch proven a no-op), compaction restoring the
    single-file invariant; lineitem rides the shared workload layout.
    The li-orders join stays Exchange-free across the whole cycle
    (plan-asserted in test_plan_properties) and the BFS result must
    hash-equal the FULL-corpus recursive-CTE oracle — append, replay,
    and compaction all invisible to the graph."""
    import os

    from ..operators.graph import bfs_hops
    from ..plans.eav import _table_buckets
    from ..sources.bucketed import (
        append_bucketed_once,
        bucketed_compaction_due,
        compact_bucketed,
        ensure_bucketed_table,
        write_bucketed,
    )
    from .core import _BUCKETED_O_COLS, _bucketed_facts

    li, _o = _bucketed_facts(spark, sf_dir)
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    t = f"b_orders_gstream_{tag}"
    orders = load(spark, sf_dir, "orders").select(*_BUCKETED_O_COLS)
    full = orders.count()
    nb = _table_buckets(spark, f"b_lineitem_{tag}")
    fresh = (
        ensure_bucketed_table(spark, t)
        and spark.table(t).count() == full
        and _table_buckets(spark, t) == nb
    )
    if not fresh:
        write_bucketed(
            orders.where(F.col("o_orderkey") % 10 != 0), t, "o_orderkey", nb
        )
        inc = orders.where(F.col("o_orderkey") % 10 == 0)
        # NOT assert statements: the appends are real side effects the
        # gate depends on, and `python -O` strips asserts — a skipped
        # append would leave the table at 90% of the corpus and corrupt
        # the full-corpus oracle comparison (ADVICE r11).
        e1 = append_bucketed_once(
            inc.where(F.col("o_orderkey") % 20 == 0), t, "g_e1"
        )
        e2 = append_bucketed_once(
            inc.where(F.col("o_orderkey") % 20 != 0), t, "g_e2"
        )
        # a redelivered epoch must be a whole-batch no-op
        replay = append_bucketed_once(
            inc.where(F.col("o_orderkey") % 20 == 0), t, "g_e1"
        )
        if not (e1 and e2 and not replay):
            raise RuntimeError(
                f"append epochs broke exactly-once: e1={e1} e2={e2} "
                f"replay={replay}"
            )
        if bucketed_compaction_due(spark, t, max_files_per_bucket=1):
            compact_bucketed(spark, t)
    o = spark.table(t).hint("merge")
    eg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = _symmetrize(eg)
    seeds = spark.range(5).select((F.col("id") * 2).alias("node"))
    return bfs_hops(edges, seeds, max_hops=3).orderBy("node")


def graph_sssp_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """graph_sssp_bounded with the weighted edge derivation riding the
    bucketed fact layout — the variant whose plain form OOMs the 8g
    heap at sf100 inside the fact-fact shuffle (TIERS_r10.md session-3
    dagger): bucketed, the join carries no Exchange and the
    (src, dst, orderkey) distinct is the only shuffle. Same rows, same
    oracle as graph_sssp_bounded."""
    from ..operators.graph import sssp_bounded

    pair_orders = (
        _trade_edges_bucketed(spark, sf_dir)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
            F.col("l_orderkey").alias("ok"),
        )
        .distinct()
    )
    eg = pair_orders.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("bigint").alias("w")
    )
    edges = eg.unionByName(
        eg.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    seeds = spark.range(5).select((F.col("id") * 2).alias("node"))
    return sssp_bounded(edges, seeds, rounds=3).orderBy("node")


def graph_label_propagation_bucketed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """graph_label_propagation with the edge derivation riding the
    bucketed fact layout (_trade_edges_bucketed) — same 3 synchronous
    mode-label rounds, same oracle; only the derivation's plan
    changes."""
    from ..operators.graph import label_propagation

    eg = (
        _trade_edges_bucketed(spark, sf_dir)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = _symmetrize(eg)
    return label_propagation(edges, iters=3).orderBy("node")


def _copurchase_edges(li: DataFrame) -> DataFrame:
    """Canonical (p1 < p2) distinct co-purchase edges: parts sharing an
    order. ONE groupBy on l_orderkey + in-JVM pair expansion instead of
    the previous lineitem SELF-join (guide §2.4 — remove shuffles
    outright): the join shuffled BOTH projections of lineitem by
    l_orderkey and materialized the full pre-distinct pair mass through
    the join, where the groupBy shuffles each lineitem row once (with
    partial aggregation) and expands the per-order part sets to sorted
    pairs inside whole-stage codegen. Exactly the same edge set — the
    per-order pair expansion over the DEDUPED sorted part set
    enumerates {(x, y) : x < y, both in order} like the p1 < p2
    self-join did (A/B'd with exceptAll both ways = 0 at sf0.1; both
    triangle gates stay on the same DuckDB oracle). Scale shape: the
    per-order set is bounded by order size (a data-model constant,
    ~7 lineitems in TPC-H shapes), not corpus size, so the expansion
    is O(1) per order at any tier."""
    sets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    return (
        sets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps)), "
                    "y -> struct(x AS src, y AS dst))))"
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
    )


def graph_triangle_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """graph_triangle_count with the co-purchase edge derivation over
    the bucketed lineitem table. Each face keeps the best formulation
    its layout affords (r13 A/B): the plain face's groupBy pair
    expansion wins THERE because it removes the derivation shuffle,
    but over the orderkey-bucketed layout the SELF-join is already
    Exchange-AND-Sort-free (co-located sorted scans, whole-stage
    codegen SMJ) and measured faster than the ObjectHashAggregate
    collect_set pass (interleaved reps 0.9-1.6 s vs 1.2-2.5 s at
    sf0.1), so the join derivation stays. Same canonical edges, same
    wedge core, same oracle as the plain gate."""
    from ..operators.graph import triangle_count
    from .core import _bucketed_facts

    li, _o = _bucketed_facts(spark, sf_dir)
    a = li.select("l_orderkey", F.col("l_partkey").alias("p1"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("p2"))
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("p1") < F.col("p2"))
        .select(F.col("p1").alias("src"), F.col("p2").alias("dst"))
        .distinct()
    )
    return triangle_count(edges)


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count of the co-purchase graph (parts sharing an order,
    canonical p1 < p2 edges) — the clustering-structure probe next to
    PageRank's centrality; degree-ordered orientation caps wedge
    fan-out near sqrt(|E|) at any skew, and the orientation is
    hash-certified invisible: the oracle enumerates id-sorted triangles
    (operators/graph.py)."""
    from ..operators.graph import triangle_count

    li = load(spark, sf_dir, "lineitem")
    return triangle_count(_copurchase_edges(li))


def agg_incremental_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance (operators/matview.py): the
    per-customer order rollup materializes from 90% of orders, the
    remaining 10% folds in as an increment batch (partial-aggregated,
    touched key-hash partitions only, exactly-once ledger skips the
    redelivered batch on gate re-runs). Reading the maintained state
    must hash-equal the full-corpus GROUP BY oracle — the IVM identity
    certified, not assumed. Measures in integer cents (FLOOR both
    engines) so every addition is exact."""
    import os

    from ..operators.matview import (
        materialize_agg_view,
        merge_agg_increment,
        read_agg_view,
    )

    orders = load(spark, sf_dir, "orders")
    proj = orders.select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    path = os.path.join(
        "spark-warehouse", "agg_view",
        os.path.basename(os.path.normpath(sf_dir)) + "_cust_orders_v1",
    )
    if not os.path.exists(os.path.join(path, "_meta.json")):
        materialize_agg_view(
            proj.where(F.col("o_orderkey") % 10 != 0), path,
            keys=["o_custkey"], measures=["price_cents"],
        )
    merge_agg_increment(
        spark, path, proj.where(F.col("o_orderkey") % 10 == 0),
        batch_id="orders_tail_mod10",
    )
    return read_agg_view(spark, path).orderBy("o_custkey")


def gapfill_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily gap fill + forward fill over the event log: a
    dense (user, day) spine across each user's observed span, zero-
    filled counts, decimal-exact day sums, last-observation carry across
    gaps, and the synthesized-row marker. DuckDB mirrors the spine with
    generate_series and the carry with LAST_VALUE IGNORE NULLS."""
    from ..operators.timeseries import gapfill_daily

    ev = load(spark, sf_dir, "events")
    return gapfill_daily(ev, "user_id", "ts", "value").orderBy("user_id", "day_idx")


def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all four grouping sets of (status, priority) in one pass —
    the other half of the grouping-sets surface next to rollup_revenue
    (Catalyst expands both into a single Expand + hash aggregate)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def window_analytics_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking/navigation window surface in one certified pass:
    lag/lead/row_number/ntile over the customer's order timeline, rank/
    dense_rank/cume_dist over the price ordering (ties exercised — rank
    semantics depend only on key values, so both engines agree). One
    shuffle on o_custkey serves every function."""
    orders = load(spark, sf_dir, "orders")
    w_time = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_price = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.lag("o_totalprice").over(w_time).alias("prev_price"),
        F.lead("o_totalprice").over(w_time).alias("next_price"),
        F.row_number().over(w_time).cast("int").alias("order_seq"),
        F.ntile(4).over(w_time).cast("int").alias("quarter_of_history"),
        F.rank().over(w_price).cast("int").alias("price_rank"),
        F.dense_rank().over(w_price).cast("int").alias("price_dense_rank"),
        F.round(F.cume_dist().over(w_price), 6).alias("price_cume_dist"),
    ).orderBy("o_orderkey")


def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted skew join, hash-certified: lineitem (the skewed fact
    side) joins orders through `salted_join`, which spreads each order
    key over 8 salt partitions and replicates the orders side once per
    salt — then aggregates revenue by priority. The oracle is the PLAIN
    join: salting must be invisible in the result, only in the
    partitioning. This is the fallback for the skew AQE can't re-plan
    (post-join same-key groupBy, deterministic partitioning)."""
    from ..operators.skew import salted_join

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("orderkey"), "l_extendedprice"
    )
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("orderkey"), "o_orderpriority"
    )
    return (
        salted_join(li, orders, "orderkey", n_salts=8)
        .groupBy("o_orderpriority")
        .agg(
            # decimal accumulation (the repo-wide discipline for this
            # column): float sums drift with add order at large SF and
            # this gate runs in the sf100 tier
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("o_orderpriority")
    )


QUERIES = {
    "gapfill_daily_activity": gapfill_daily_activity,
    "cube_revenue": cube_revenue,
    "window_analytics_surface": window_analytics_surface,
    "skew_salted_join": skew_salted_join,
    "event_type_pmi": event_type_pmi,
    "cohort_retention": cohort_retention,
    "event_transition_matrix": event_transition_matrix,
    "rolling_daily_value": rolling_daily_value,
    "feature_normalization": feature_normalization,
    "scd2_dimension": scd2_dimension,
    "data_quality_checks": data_quality_checks,
    "data_quality_quarantine": data_quality_quarantine,
    "zorder_keys": zorder_keys,
    "session_stats": session_stats,
    "funnel_steps": funnel_steps,
    "cas_conditional_update": cas_conditional_update,
    "datoms_index_scan": datoms_index_scan,
    "q7_nation_volume": q7_nation_volume,
    "q16_excluding_suppliers": q16_excluding_suppliers,
    "asof_last_click_before_purchase": asof_last_click_before_purchase,
    "range_join_shipments": range_join_shipments,
    "pivot_event_counts": pivot_event_counts,
    "unpivot_measures": unpivot_measures,
    "rollup_revenue": rollup_revenue,
    "exact_percentiles": exact_percentiles,
    "stats_surface": stats_surface,
    "json_construction": json_construction,
    "semi_join_active_customers": semi_join_active_customers,
    "scalar_subquery_small_orders": scalar_subquery_small_orders,
    "json_parse_roundtrip": json_parse_roundtrip,
    "approx_distinct_users": approx_distinct_users,
    "graph_pagerank_topk": graph_pagerank_topk,
    "graph_pagerank_bucketed": graph_pagerank_bucketed,
    "graph_pagerank_directed": graph_pagerank_directed,
    "graph_bfs_hops": graph_bfs_hops,
    "graph_bfs_hops_bucketed": graph_bfs_hops_bucketed,
    "graph_bfs_appended_layout": graph_bfs_appended_layout,
    "graph_label_propagation": graph_label_propagation,
    "graph_label_propagation_bucketed": graph_label_propagation_bucketed,
    "graph_sssp_bounded": graph_sssp_bounded,
    "graph_sssp_bucketed": graph_sssp_bucketed,
    "graph_triangle_count": graph_triangle_count,
    "graph_triangle_bucketed": graph_triangle_bucketed,
    "agg_incremental_view": agg_incremental_view,
    "layout_append_compact": layout_append_compact,
}

ORACLES = {
    "gapfill_daily_activity": """
        WITH d AS (
            SELECT user_id,
                   CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INTEGER) AS day_idx,
                   value
            FROM events
        ),
        daily AS (
            SELECT user_id, day_idx, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS dv
            FROM d GROUP BY 1, 2
        ),
        spans AS (
            SELECT user_id, MIN(day_idx) AS lo, MAX(day_idx) AS hi
            FROM daily GROUP BY 1
        ),
        spine AS (
            SELECT user_id, CAST(UNNEST(generate_series(lo, hi)) AS INTEGER) AS day_idx
            FROM spans
        ),
        filled AS (
            SELECT s.user_id, s.day_idx, dl.n, dl.dv
            FROM spine s LEFT JOIN daily dl
              ON s.user_id = dl.user_id AND s.day_idx = dl.day_idx
        )
        SELECT user_id, day_idx,
               COALESCE(n, 0) AS n_events,
               COALESCE(dv, 0.0) AS day_value,
               LAST_VALUE(dv IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY day_idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS ffill_value,
               dv IS NULL AS is_gap
        FROM filled
        ORDER BY user_id, day_idx
    """,
    "cube_revenue": """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """,
    "window_analytics_surface": """
        SELECT o_orderkey, o_custkey,
               LAG(o_totalprice) OVER w_time AS prev_price,
               LEAD(o_totalprice) OVER w_time AS next_price,
               CAST(ROW_NUMBER() OVER w_time AS INTEGER) AS order_seq,
               CAST(NTILE(4) OVER w_time AS INTEGER) AS quarter_of_history,
               CAST(RANK() OVER w_price AS INTEGER) AS price_rank,
               CAST(DENSE_RANK() OVER w_price AS INTEGER) AS price_dense_rank,
               ROUND(CUME_DIST() OVER w_price, 6) AS price_cume_dist
        FROM orders
        WINDOW w_time AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               w_price AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC)
        ORDER BY o_orderkey
    """,
    "skew_salted_join": """
        SELECT o.o_orderpriority,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue,
               COUNT(*) AS n_items
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1 ORDER BY o_orderpriority
    """,
    "cas_conditional_update": """
        SELECT c_custkey,
               CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100
                    ELSE c_acctbal END AS c_acctbal,
               c_mktsegment
        FROM customer
        ORDER BY c_custkey
    """,
    "datoms_index_scan": """
        SELECT CONCAT('nation:', CAST(n_nationkey AS VARCHAR)) AS e,
               ':nation/n_regionkey' AS a,
               CAST(n_regionkey AS VARCHAR) AS v,
               CAST(n_regionkey AS DOUBLE) AS v_num
        FROM nation
        ORDER BY a, v, e
    """,
    "q7_nation_volume": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(YEAR(l_shipdate) AS INTEGER) AS l_year,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE n1.n_name < n2.n_name AND YEAR(l_shipdate) = 1996
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    "q16_excluding_suppliers": """
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        excluded AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM ps
          JOIN part ON l_partkey = p_partkey
        WHERE l_suppkey NOT IN (SELECT s_suppkey FROM excluded)
        GROUP BY p_brand, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_size
        LIMIT 50
    """,
    "asof_last_click_before_purchase": """
        WITH ev AS (
            SELECT * FROM events WHERE event_type IN ('click', 'purchase')
        ), marked AS (
            SELECT event_id, user_id, ts, event_type,
                   LAST_VALUE(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
            FROM ev
        )
        SELECT event_id, user_id, ts, last_click_ts
        FROM marked WHERE event_type = 'purchase'
        ORDER BY event_id
    """,
    "range_join_shipments": """
        SELECT o_orderpriority, COUNT(*) AS n_fast_lines
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= o_orderdate
          AND l_shipdate < o_orderdate + INTERVAL 7 DAY
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "pivot_event_counts": """
        SELECT user_id,
               COUNT(*) FILTER (event_type = 'click') AS click,
               COUNT(*) FILTER (event_type = 'error') AS error,
               COUNT(*) FILTER (event_type = 'purchase') AS purchase,
               COUNT(*) FILTER (event_type = 'signup') AS signup,
               COUNT(*) FILTER (event_type = 'view') AS view
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    "unpivot_measures": """
        SELECT l_orderkey, l_linenumber, measure, value FROM (
            SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value
            FROM lineitem WHERE l_orderkey < 200
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'price', l_extendedprice
            FROM lineitem WHERE l_orderkey < 200
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'discount', l_discount
            FROM lineitem WHERE l_orderkey < 200
        )
        ORDER BY l_orderkey, l_linenumber, measure
    """,
    "rollup_revenue": """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """,
    "exact_percentiles": """
        SELECT o_orderstatus,
               ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
               ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
               ROUND(MIN(o_totalprice), 4) AS min_price,
               ROUND(MAX(o_totalprice), 4) AS max_price
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "stats_surface": """
        SELECT ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
               ROUND(stddev_samp(l_discount), 6) AS stddev_disc,
               ROUND(var_samp(l_tax), 6) AS var_tax
        FROM lineitem
    """,
    "json_construction": """
        SELECT n_nationkey,
               '{"name":"' || n_name || '","region":' || n_regionkey || '}' AS doc
        FROM nation ORDER BY n_nationkey
    """,
    "semi_join_active_customers": """
        SELECT c_mktsegment, COUNT(*) AS n_active
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "scalar_subquery_small_orders": """
        WITH avg_qty AS (
            SELECT l_partkey AS pk,
                   SUM(CAST(l_quantity AS DECIMAL(18,2))) / COUNT(*) AS avg_qty
            FROM lineitem GROUP BY l_partkey
        )
        SELECT COUNT(*) AS n_small,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_revenue
        FROM lineitem JOIN avg_qty ON l_partkey = pk
        WHERE CAST(l_quantity AS DECIMAL(18,2)) < CAST(0.5 AS DECIMAL(18,2)) * avg_qty
    """,
    "json_parse_roundtrip": """
        WITH parsed AS (
            SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events
        )
        SELECT k % 10 AS k_mod, COUNT(*) AS n, MAX(k) AS max_k
        FROM parsed WHERE k IS NOT NULL
        GROUP BY 1 ORDER BY 1
    """,
    # approx_distinct_users: no oracle (sketches differ) -> rows-only check
    "session_stats": """
        WITH flagged AS (
            SELECT user_id AS user, ts,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR ts - LAG(ts) OVER w > INTERVAL 1440 MINUTE
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), numbered AS (
            SELECT "user", ts,
                   CAST(SUM(new_s) OVER (
                       PARTITION BY "user" ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) - 1 AS BIGINT) AS session_id
            FROM flagged
        )
        SELECT "user", session_id,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM numbered
        GROUP BY "user", session_id
        ORDER BY "user", session_id
    """,
    "funnel_steps": """
        WITH f AS (
            SELECT user_id,
                   MIN(ts) FILTER (WHERE event_type = 'signup') AS s1,
                   MIN(ts) FILTER (WHERE event_type = 'view') AS s2,
                   MIN(ts) FILTER (WHERE event_type = 'purchase') AS s3
            FROM events
            WHERE event_type IN ('signup', 'view', 'purchase')
            GROUP BY user_id
        ), fl AS (
            SELECT (s1 IS NOT NULL) AS r1,
                   (s1 IS NOT NULL AND s2 IS NOT NULL AND s2 > s1) AS r2,
                   (s1 IS NOT NULL AND s2 IS NOT NULL AND s2 > s1
                    AND s3 IS NOT NULL AND s3 > s2) AS r3
            FROM f
        )
        SELECT 1 AS step, 'signup' AS step_name,
               CAST(COALESCE(SUM(CASE WHEN r1 THEN 1 END), 0) AS BIGINT) AS n_users
        FROM fl
        UNION ALL
        SELECT 2, 'view',
               CAST(COALESCE(SUM(CASE WHEN r2 THEN 1 END), 0) AS BIGINT)
        FROM fl
        UNION ALL
        SELECT 3, 'purchase',
               CAST(COALESCE(SUM(CASE WHEN r3 THEN 1 END), 0) AS BIGINT)
        FROM fl
        ORDER BY step
    """,
}

ORACLES["zorder_keys"] = """
    SELECT o_orderkey,
           CAST((((o_custkey & 65535) >> 0) & 1) * 1 + (((o_custkey & 65535) >> 1) & 1) * 4 + (((o_custkey & 65535) >> 2) & 1) * 16 + (((o_custkey & 65535) >> 3) & 1) * 64 + (((o_custkey & 65535) >> 4) & 1) * 256 + (((o_custkey & 65535) >> 5) & 1) * 1024 + (((o_custkey & 65535) >> 6) & 1) * 4096 + (((o_custkey & 65535) >> 7) & 1) * 16384 + (((o_custkey & 65535) >> 8) & 1) * 65536 + (((o_custkey & 65535) >> 9) & 1) * 262144 + (((o_custkey & 65535) >> 10) & 1) * 1048576 + (((o_custkey & 65535) >> 11) & 1) * 4194304 + (((o_custkey & 65535) >> 12) & 1) * 16777216 + (((o_custkey & 65535) >> 13) & 1) * 67108864 + (((o_custkey & 65535) >> 14) & 1) * 268435456 + (((o_custkey & 65535) >> 15) & 1) * 1073741824 + (((datediff('day', DATE '1970-01-01', o_orderdate) & 65535) >> 0) & 1) * 2 + (((datediff('day', DATE '1970-01-01', o_orderdate) & 65535) >> 1) & 1) * 8 + (((datediff('day', DATE '1970-01-01', o_orderdate) & 65535) >> 2) & 1) * 32 + (((datediff('day', DATE '1970-01-01', o_orderdate) & 65535) >> 3) & 1) * 128 + (((datediff('day', DATE '1970-01-01', o_orderdate) & 65535) >> 4) & 1) * 512 + (((datediff('day', DATE '1970-01-01', o_orderdate) & 65535) >> 5) & 1) * 2048 + (((datediff('day', DATE '1970-01-01', o_orderdate) & 65535) >> 6) & 1) * 8192 + (((datediff('day', DATE '1970-01-01', o_orderdate) & 65535) >> 7) & 1) * 32768 + (((datediff('day', DATE '1970-01-01', o_orderdate) & 65535) >> 8) & 1) * 131072 + (((datediff('day', DATE '1970-01-01', o_orderdate) & 65535) >> 9) & 1) * 524288 + (((datediff('day', DATE '1970-01-01', o_orderdate) & 65535) >> 10) & 1) * 2097152 + (((datediff('day', DATE '1970-01-01', o_orderdate) & 65535) >> 11) & 1) * 8388608 + (((datediff('day', DATE '1970-01-01', o_orderdate) & 65535) >> 12) & 1) * 33554432 + (((datediff('day', DATE '1970-01-01', o_orderdate) & 65535) >> 13) & 1) * 134217728 + (((datediff('day', DATE '1970-01-01', o_orderdate) & 65535) >> 14) & 1) * 536870912 + (((datediff('day', DATE '1970-01-01', o_orderdate) & 65535) >> 15) & 1) * 2147483648 AS BIGINT) AS z
    FROM orders
    ORDER BY o_orderkey
"""

ORACLES["data_quality_quarantine"] = """
    SELECT o_orderkey,
           concat_ws(',',
               CASE WHEN NOT (o_totalprice >= 50000.0) THEN 'min:o_totalprice' END,
               CASE WHEN NOT (o_orderstatus IN ('O', 'F')) THEN 'in_set:o_orderstatus' END,
               CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-3]-') THEN 'matches:o_orderpriority' END
           ) AS violated
    FROM orders
    WHERE NOT (o_totalprice >= 50000.0)
       OR NOT (o_orderstatus IN ('O', 'F'))
       OR NOT regexp_matches(o_orderpriority, '^[1-3]-')
    ORDER BY o_orderkey
"""

ORACLES["data_quality_checks"] = """
    WITH s AS (
        SELECT GREATEST(COUNT(*), 1) AS n,
               ROUND(SUM(CASE WHEN o_orderkey IS NOT NULL THEN 1 ELSE 0 END)
                     / GREATEST(COUNT(*), 1), 9) AS m0,
               ROUND(COUNT(DISTINCT o_orderkey)
                     / GREATEST(COUNT(*), 1), 9) AS m1,
               ROUND(CAST(MIN(o_totalprice) AS DOUBLE), 9) AS m2,
               ROUND(SUM(CASE WHEN o_orderstatus IN ('O','F','P')
                              THEN 1 ELSE 0 END)
                     / GREATEST(COUNT(*), 1), 9) AS m3,
               ROUND(SUM(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-')
                              THEN 1 ELSE 0 END)
                     / GREATEST(COUNT(*), 1), 9) AS m4,
               ROUND(SUM(CASE WHEN o_custkey >= 0 THEN 1 ELSE 0 END)
                     / GREATEST(COUNT(*), 1), 9) AS m5,
               ROUND(SUM(CASE WHEN o_orderdate IS NOT NULL THEN 1 ELSE 0 END)
                     / GREATEST(COUNT(*), 1), 9) AS m6
        FROM orders
    )
    SELECT 0 AS rule_id, 'complete' AS kind, 'o_orderkey' AS column,
           m0 AS metric, m0 >= 1.0 AS passed FROM s
    UNION ALL SELECT 1, 'unique', 'o_orderkey', m1, m1 >= 1.0 FROM s
    UNION ALL SELECT 2, 'min', 'o_totalprice', m2, m2 >= 0.0 FROM s
    UNION ALL SELECT 3, 'in_set', 'o_orderstatus', m3, m3 >= 1.0 FROM s
    UNION ALL SELECT 4, 'matches', 'o_orderpriority', m4, m4 >= 1.0 FROM s
    UNION ALL SELECT 5, 'non_negative', 'o_custkey', m5, m5 >= 1.0 FROM s
    UNION ALL SELECT 6, 'complete', 'o_orderdate', m6, m6 >= 0.5 FROM s
    ORDER BY rule_id
"""

ORACLES["scd2_dimension"] = """
    WITH cur AS (
        SELECT c_custkey AS k, c_mktsegment AS seg, DATE '2024-01-01' AS eff
        FROM customer
    ), ch AS (
        SELECT c_custkey, 'SEG-A', DATE '2024-02-01'
        FROM customer WHERE c_custkey % 3 = 0
        UNION ALL
        SELECT c_custkey, 'SEG-B', DATE '2024-03-01'
        FROM customer WHERE c_custkey % 6 = 0
        UNION ALL
        SELECT c_custkey, 'SEG-B', DATE '2024-04-01'
        FROM customer WHERE c_custkey % 6 = 0
    ), cand AS (
        SELECT * FROM cur UNION ALL SELECT * FROM ch
    ), kept AS (
        SELECT k, seg, eff FROM (
            SELECT k, seg, eff,
                   LAG(seg) OVER (PARTITION BY k ORDER BY eff) AS prev_seg,
                   LAG(eff) OVER (PARTITION BY k ORDER BY eff) AS prev_eff
            FROM cand
        )
        WHERE prev_eff IS NULL OR seg IS DISTINCT FROM prev_seg
    )
    SELECT k AS c_custkey, seg AS segment, eff AS effective_from,
           LEAD(eff) OVER (PARTITION BY k ORDER BY eff) AS effective_to
    FROM kept
    ORDER BY c_custkey, effective_from
"""

ORACLES["feature_normalization"] = """
    WITH li AS (SELECT * FROM lineitem WHERE l_orderkey < 200),
    s AS (
        SELECT AVG(l_quantity) AS m, STDDEV_SAMP(l_quantity) AS sd,
               MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi,
               quantile_cont(l_quantity, 0.05) AS wlo,
               quantile_cont(l_quantity, 0.95) AS whi
        FROM li
    )
    SELECT l_orderkey, l_linenumber,
           ROUND(CASE WHEN sd IS NOT NULL AND sd <> 0
                      THEN (l_quantity - m) / sd END, 6) AS l_quantity_z,
           ROUND(CASE WHEN hi <> lo
                      THEN (l_extendedprice - lo) / (hi - lo) END, 6)
               AS l_extendedprice_mm,
           ROUND(LEAST(GREATEST(CAST(l_quantity AS DOUBLE), wlo), whi), 6)
               AS l_quantity_w
    FROM li, s
    ORDER BY l_orderkey, l_linenumber
"""

ORACLES["rolling_daily_value"] = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               SUM(CAST(value AS DECIMAL(18,2))) AS day_value,
               COUNT(*) AS day_events
        FROM events
        GROUP BY event_type, CAST(ts AS DATE)
    )
    SELECT event_type, day,
           CAST(SUM(day_value) OVER w AS DOUBLE) AS rolling_value,
           CAST(SUM(day_events) OVER w AS BIGINT) AS rolling_events
    FROM daily
    WINDOW w AS (
        PARTITION BY event_type
        ORDER BY datediff('day', DATE '1970-01-01', day)
        RANGE BETWEEN 2 PRECEDING AND CURRENT ROW
    )
    ORDER BY event_type, day
"""

ORACLES["event_transition_matrix"] = """
    WITH pairs AS (
        SELECT LAG(event_type) OVER w AS prev_type,
               event_type AS next_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), counts AS (
        SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM pairs WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
    )
    SELECT prev_type, next_type, n,
           ROUND(n / SUM(n) OVER (PARTITION BY prev_type), 6) AS p_next
    FROM counts
    ORDER BY prev_type, next_type
"""

ORACLES["cohort_retention"] = """
    WITH activity AS (
        SELECT DISTINCT user_id,
               CAST(FLOOR(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7)
                    AS BIGINT) AS week
        FROM events
    ), cohorts AS (
        SELECT user_id, MIN(week) AS cohort_week FROM activity GROUP BY user_id
    )
    SELECT c.cohort_week,
           a.week - c.cohort_week AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM activity a JOIN cohorts c USING (user_id)
    GROUP BY c.cohort_week, a.week - c.cohort_week
    ORDER BY cohort_week, week_offset
"""

ORACLES["event_type_pmi"] = """
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    nu AS (SELECT CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS n FROM ut),
    singles AS (SELECT event_type, COUNT(*) AS n1 FROM ut GROUP BY event_type),
    pairs2 AS (
        SELECT a.event_type AS ta, b.event_type AS tb,
               CAST(COUNT(*) AS BIGINT) AS n_both
        FROM ut a JOIN ut b ON a.user_id = b.user_id
        WHERE a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    )
    SELECT ta, tb, n_both,
           ROUND(log2((n_both * (SELECT n FROM nu)) / (sa.n1 * sb.n1)), 6)
               AS pmi
    FROM pairs2
      JOIN singles sa ON sa.event_type = ta
      JOIN singles sb ON sb.event_type = tb
    ORDER BY ta, tb
"""

ORACLES["graph_pagerank_topk"] = """
    WITH eg AS (
        SELECT DISTINCT o_custkey * 2 AS s, l_suppkey * 2 + 1 AS t
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS (
        SELECT s, t FROM eg UNION SELECT t AS s, s AS t FROM eg
    ),
    nodes AS (
        SELECT DISTINCT s AS v FROM edges
        UNION SELECT DISTINCT t FROM edges
    ),
    outd AS (
        SELECT s AS v, CAST(COUNT(*) AS BIGINT) AS od
        FROM edges GROUP BY s
    ),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS (SELECT v, 1000000000000 // (SELECT n FROM nn) AS r FROM nodes),
    c1 AS (
        SELECT e.t AS v, SUM(r.r // o.od) AS c
        FROM edges e
          JOIN r0 r ON e.s = r.v
          JOIN outd o ON e.s = o.v
        GROUP BY e.t
    ),
    r1 AS (
        SELECT n.v,
               (15 * (1000000000000 // (SELECT n FROM nn))) // 100
                   + (85 * COALESCE(c1.c, 0)) // 100 AS r
        FROM nodes n LEFT JOIN c1 ON n.v = c1.v
    ),
    c2 AS (
        SELECT e.t AS v, SUM(r.r // o.od) AS c
        FROM edges e
          JOIN r1 r ON e.s = r.v
          JOIN outd o ON e.s = o.v
        GROUP BY e.t
    ),
    r2 AS (
        SELECT n.v,
               (15 * (1000000000000 // (SELECT n FROM nn))) // 100
                   + (85 * COALESCE(c2.c, 0)) // 100 AS r
        FROM nodes n LEFT JOIN c2 ON n.v = c2.v
    ),
    c3 AS (
        SELECT e.t AS v, SUM(r.r // o.od) AS c
        FROM edges e
          JOIN r2 r ON e.s = r.v
          JOIN outd o ON e.s = o.v
        GROUP BY e.t
    ),
    r3 AS (
        SELECT n.v,
               (15 * (1000000000000 // (SELECT n FROM nn))) // 100
                   + (85 * COALESCE(c3.c, 0)) // 100 AS r
        FROM nodes n LEFT JOIN c3 ON n.v = c3.v
    )
    SELECT CAST(v AS BIGINT) AS node, CAST(r AS BIGINT) AS rank
    FROM r3
    ORDER BY rank DESC, node ASC
    LIMIT 20
"""
ORACLES["graph_pagerank_bucketed"] = ORACLES["graph_pagerank_topk"]

def _pagerank_directed_oracle() -> str:
    """Three unrolled integer-PageRank rounds with the dangling term:
    each round's dm = total rank mass on out-degree-0 nodes, teleported
    as dm DIV n into every node's update — the SQL twin of
    operators/graph.py dangling='redistribute'."""
    head = """
    WITH edges AS (
        SELECT DISTINCT o_custkey * 2 AS s, l_suppkey * 2 + 1 AS t
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    nodes AS (
        SELECT DISTINCT s AS v FROM edges
        UNION SELECT DISTINCT t FROM edges
    ),
    outd AS (
        SELECT s AS v, CAST(COUNT(*) AS BIGINT) AS od
        FROM edges GROUP BY s
    ),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS (SELECT v, 1000000000000 // (SELECT n FROM nn) AS r FROM nodes)"""
    rounds = []
    for i in range(1, 4):
        p = i - 1
        rounds.append(f""",
    d{i} AS (
        SELECT COALESCE(SUM(r.r), 0) // (SELECT n FROM nn) AS ds
        FROM r{p} r LEFT JOIN outd o ON r.v = o.v
        WHERE o.v IS NULL
    ),
    c{i} AS (
        SELECT e.t AS v, SUM(r.r // o.od) AS c
        FROM edges e
          JOIN r{p} r ON e.s = r.v
          JOIN outd o ON e.s = o.v
        GROUP BY e.t
    ),
    r{i} AS (
        SELECT n.v,
               (15 * (1000000000000 // (SELECT n FROM nn))) // 100
                   + (85 * (COALESCE(c{i}.c, 0)
                            + (SELECT ds FROM d{i}))) // 100 AS r
        FROM nodes n LEFT JOIN c{i} ON n.v = c{i}.v
    )""")
    return (
        head
        + "".join(rounds)
        + """
    SELECT CAST(v AS BIGINT) AS node, CAST(r AS BIGINT) AS rank
    FROM r3
    ORDER BY rank DESC, node ASC
    LIMIT 20
    """
    )


ORACLES["graph_pagerank_directed"] = _pagerank_directed_oracle()

def _label_propagation_oracle(iters: int = 3) -> str:
    """The same 3 synchronous mode-label rounds, unrolled: per round a
    (node, label) count over in-edges, argmax with (cnt DESC, lab ASC)
    ties, keep-own-label for in-degree-0 nodes."""
    head = """
    WITH eg AS (
        SELECT DISTINCT o_custkey * 2 AS s, l_suppkey * 2 + 1 AS t
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS (
        SELECT s, t FROM eg UNION SELECT t AS s, s AS t FROM eg
    ),
    nodes AS (
        SELECT DISTINCT s AS v FROM edges
        UNION SELECT DISTINCT t FROM edges
    ),
    l0 AS (SELECT v, v AS lab FROM nodes)"""
    rounds = []
    for i in range(1, iters + 1):
        p = i - 1
        rounds.append(f""",
    c{i} AS (
        SELECT e.t AS v, l.lab, COUNT(*) AS cnt
        FROM edges e JOIN l{p} l ON e.s = l.v
        GROUP BY e.t, l.lab
    ),
    b{i} AS (
        SELECT v, lab FROM c{i}
        QUALIFY row_number() OVER (
            PARTITION BY v ORDER BY cnt DESC, lab ASC) = 1
    ),
    l{i} AS (
        SELECT n.v, COALESCE(b.lab, p.lab) AS lab
        FROM nodes n
          JOIN l{p} p ON p.v = n.v
          LEFT JOIN b{i} b ON b.v = n.v
    )""")
    return (
        head
        + "".join(rounds)
        + f"""
    SELECT CAST(v AS BIGINT) AS node, CAST(lab AS BIGINT) AS label
    FROM l{iters} ORDER BY node
    """
    )


ORACLES["graph_label_propagation"] = _label_propagation_oracle()
ORACLES["graph_label_propagation_bucketed"] = _label_propagation_oracle()

def _sssp_bounded_oracle(rounds: int = 3) -> str:
    """The same bounded Bellman-Ford, unrolled: per round one relax
    (dist + edge weight over out-edges) unioned with the carried
    distances, MIN per node."""
    head = """
    WITH pair_orders AS (
        SELECT DISTINCT o_custkey * 2 AS s, l_suppkey * 2 + 1 AS t,
               l_orderkey AS ok
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    eg AS (
        SELECT s, t, CAST(COUNT(*) AS BIGINT) AS w
        FROM pair_orders GROUP BY s, t
    ),
    edges AS (
        SELECT s, t, w FROM eg UNION ALL SELECT t AS s, s AS t, w FROM eg
    ),
    d0 AS (
        SELECT CAST(v.node AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist
        FROM (VALUES (0), (2), (4), (6), (8)) AS v(node)
    )"""
    rounds_sql = []
    for i in range(1, rounds + 1):
        p = i - 1
        rounds_sql.append(f""",
    d{i} AS (
        SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM (
            SELECT node, dist FROM d{p}
            UNION ALL
            SELECT e.t AS node, d.dist + e.w AS dist
            FROM d{p} d JOIN edges e ON e.s = d.node
        ) GROUP BY node
    )""")
    return (
        head
        + "".join(rounds_sql)
        + f"""
    SELECT node, dist FROM d{rounds} ORDER BY node
    """
    )


ORACLES["graph_sssp_bounded"] = _sssp_bounded_oracle()
# the bucketed faces change the physical plan, never the graph: same oracles
ORACLES["graph_sssp_bucketed"] = _sssp_bounded_oracle()

ORACLES["graph_bfs_hops"] = """
    WITH RECURSIVE eg AS (
        SELECT DISTINCT o_custkey * 2 AS s, l_suppkey * 2 + 1 AS t
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS (
        SELECT s, t FROM eg UNION SELECT t AS s, s AS t FROM eg
    ),
    walk(node, hop) AS (
        SELECT CAST(v.node AS BIGINT), CAST(0 AS BIGINT)
        FROM (VALUES (0), (2), (4), (6), (8)) AS v(node)
        UNION
        SELECT e.t, w.hop + 1
        FROM walk w JOIN edges e ON e.s = w.node
        WHERE w.hop < 3
    )
    SELECT CAST(node AS BIGINT) AS node, CAST(MIN(hop) AS BIGINT) AS hop
    FROM walk GROUP BY node ORDER BY node
"""
ORACLES["graph_bfs_hops_bucketed"] = ORACLES["graph_bfs_hops"]
# the appended-layout face changes WHERE the orders rows live (90% build
# + two exactly-once append epochs + compaction), never which rows exist:
# same full-corpus oracle
ORACLES["graph_bfs_appended_layout"] = ORACLES["graph_bfs_hops"]

ORACLES["graph_triangle_count"] = """
    WITH pairs AS (
        SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS t
        FROM lineitem a
          JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey < b.l_partkey
    ),
    wedges AS (
        SELECT p1.s AS a, p1.t AS b, p2.t AS c
        FROM pairs p1 JOIN pairs p2 ON p1.t = p2.s
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM wedges w JOIN pairs p3 ON w.a = p3.s AND w.c = p3.t
"""
ORACLES["graph_triangle_bucketed"] = ORACLES["graph_triangle_count"]

ORACLES["layout_append_compact"] = """
    SELECT o_orderpriority,
           CAST(SUM(CAST(FLOOR(l_quantity * 100) AS BIGINT)) AS BIGINT)
               AS qty_cents,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""

ORACLES["agg_incremental_view"] = """
    SELECT o_custkey,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_price_cents,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM orders
    GROUP BY o_custkey
    ORDER BY o_custkey
"""
