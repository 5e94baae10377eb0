"""Time-travel gate queries (plans/history.py): as-of, since, and
entity-timeline views over a transaction log derived deterministically
from the events table (entity = user, attr = event type, tx = event id,
every 7th op a retraction — both engines derive the same log, so the
oracle certifies the time-travel semantics, not the derivation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.history import as_of, entity_timeline, since
from ..tables import load


def _tx_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select(
        F.concat(F.lit("user:"), F.col("user_id").cast("string")).alias("e"),
        F.concat(F.lit(":user/"), F.col("event_type")).alias("a"),
        F.col("value").alias("v_num"),
        F.col("event_id").alias("tx"),
        (F.col("event_id") % 7 != 0).alias("added"),
    )


def _cutoff(log: DataFrame) -> DataFrame:
    return log.agg(F.floor(F.max("tx") * 0.6).cast("long").alias("cutoff"))


def history_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d/as-of analog: state at 60% of the log — latest op per (e, a)
    up to the cutoff, surviving only if it was an assert. The cutoff is
    a plan-side broadcast scalar, not a driver collect."""
    log = _tx_log(spark, sf_dir)
    return as_of(log, _cutoff(log)).orderBy("e", "a")


def history_as_of_from_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d/as-of OVER THE DATOM STORE: the same state-at-60% view as
    history_as_of, but the tx log round-trips through
    materialize_datoms -> read_datoms (plans/eav.py) — the attribute-
    partitioned parquet layout, carrying the history projection
    (e, a, v_num, tx, added). Certifies that the time-travel operators,
    like datalog and pull, run against durable storage with the same
    hash as the in-memory view; an attribute-constrained as-of is then
    a partition-pruned scan (asserted in test_plan_properties)."""
    import os

    from ..plans.eav import materialize_datoms, read_datoms

    path = os.path.join(
        "spark-warehouse", "datom_store",
        os.path.basename(os.path.normpath(sf_dir)) + "_txlog",
    )
    materialize_datoms(_tx_log(spark, sf_dir), path)
    log = read_datoms(spark, path, columns=("e", "a", "v_num", "tx", "added"))
    return as_of(log, _cutoff(log)).orderBy("e", "a")


def history_since(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d/since analog: current facts whose deciding tx is after the
    cutoff. Facts retracted after the cutoff stay gone; facts current
    since before it stay absent."""
    log = _tx_log(spark, sf_dir)
    return since(log, _cutoff(log)).orderBy("e", "a")


def history_since_from_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d/since OVER THE DATOM STORE — the same post-cutoff view as
    history_since through the attribute-partitioned layout
    (materialize_datoms -> read_datoms), completing the store-backed
    time-travel pair: as-of reads the state at t, since reads what the
    state learned after t, both hash-equal their in-memory twins."""
    import os

    from ..plans.eav import materialize_datoms, read_datoms

    path = os.path.join(
        "spark-warehouse", "datom_store",
        os.path.basename(os.path.normpath(sf_dir)) + "_txlog",
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        materialize_datoms(_tx_log(spark, sf_dir), path)
    log = read_datoms(spark, path, columns=("e", "a", "v_num", "tx", "added"))
    return since(log, _cutoff(log)).orderBy("e", "a")


def history_as_of_instant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d/as-of with a DATE: the cutoff t resolves through the
    transaction-instant table (every event's ts plays :db/txInstant) as
    the latest tx at or before 2024-01-18 — then the state view is
    identical to as_of at that t. Resolution happens in-plan (scalar
    broadcast), certified end-to-end by the oracle recomputing both the
    resolution and the state."""
    from ..plans.history import as_of_instant

    ev = load(spark, sf_dir, "events")
    instants = ev.select(
        F.col("event_id").alias("tx"), F.col("ts").alias("inst")
    )
    log = _tx_log(spark, sf_dir)
    return as_of_instant(
        log, instants, "2024-01-18 00:00:00"
    ).orderBy("e", "a")


def history_entity_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d/history-of-entity audit: every assert/retract for one entity
    in tx order."""
    log = _tx_log(spark, sf_dir)
    return entity_timeline(log, "user:7")


def history_with_speculative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d/with — a speculative database value: the events log extended
    with two literal ops stamped at max(tx)+1 (one new fact, one
    retraction of user:7's click), then read via as-of. The durable log
    is an immutable DataFrame, so callers holding it are unaffected —
    this gate certifies the speculation is visible in the returned
    value."""
    from ..plans.history import with_tx

    SPEC_TX = 10**12  # past every real event id — no driver-side max needed
    log = _tx_log(spark, sf_dir)
    tx_data = spark.createDataFrame(
        [("user:9999", ":user/speculative", 42.0, True),
         ("user:7", ":user/click", 0.0, False)],
        "e string, a string, v_num double, added boolean",
    )
    spec = with_tx(log, tx_data, SPEC_TX)
    return (
        as_of(spec, SPEC_TX)
        .where(F.col("e").isin(["user:9999", "user:7"]))
        .orderBy("e", "a")
    )


def history_tx_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d/tx-range — the op stream for start <= tx < end in tx order
    (a partition-pruned range scan on tx-partitioned storage)."""
    from ..plans.history import tx_range

    log = _tx_log(spark, sf_dir)
    return tx_range(log, 100, 200)


def history_no_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:db/noHistory — the history view with :user/click flagged: click
    ops collapse to each (e, a)'s CURRENT deciding assert (superseded
    asserts and the retracts that ended them vanish; entities whose
    click is currently retracted contribute nothing), while every other
    attribute keeps its full op stream. The oracle recomputes both
    branches in SQL."""
    from ..plans.history import history

    log = _tx_log(spark, sf_dir)
    return history(log, no_history_attrs={":user/click"}).orderBy(
        "e", "a", "tx", "added"
    )


def datalog_history_retractions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datalog OVER THE HISTORY DB (history.log_datoms): the [e a v tx
    op] pattern shape binds the transaction and the assert/retract flag
    — here every retraction of :user/click with its tx, the 'who lost
    what, when' audit query Datomic runs against (d/history db)."""
    from ..plans.datalog import q
    from ..plans.history import log_datoms

    db = log_datoms(_tx_log(spark, sf_dir))
    return q(
        {"find": ["?e", "?tx"],
         "where": [["?e", ":user/click", "_", "?tx", False]]},
        db,
    ).orderBy("e", "tx")


def datalog_history_superseded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """History-db self-join on tx variables: values asserted and LATER
    retracted — two patterns over the same (e, a, v) with [(< ?t1 ?t2)]
    ordering the asserting and retracting transactions. Aggregated per
    attribute for a compact certified result."""
    from ..plans.datalog import q
    from ..plans.history import log_datoms

    db = log_datoms(_tx_log(spark, sf_dir))
    return q(
        {"find": ["?a", ("count", "?t2")],
         "with": ["?e", "?t1"],
         "where": [
             ["?e", "?a", "?v", "?t1", True],
             ["?e", "?a", "?v", "?t2", False],
             [("<", "?t1", "?t2")],
         ]},
        db,
    ).orderBy("a")


def datalog_log_tx_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datomic's Log API inside query: the canonical tx-ids → tx-data
    chain — [(tx-ids ?log t1 t2) [?tx ...]] range-scans the log for the
    transactions in [100, 200), [(tx-data ?log ?tx) [[?e]]] joins their
    datoms (an equi-join on tx, never a per-tx loop), and the find
    aggregates touched transactions per entity. The log rides in as a
    DataFrame-valued :in param, Datomic's `:in $ ?log` + (d/log conn)."""
    from ..plans.datalog import q
    from ..plans.history import log_datoms

    log = _tx_log(spark, sf_dir)
    db = log_datoms(log)
    return q(
        {"find": ["?e", ("count", "?tx")],
         "in": ["?log", "?t1", "?t2"],
         "where": [
             [("tx-ids", "?log", "?t1", "?t2"), ["?tx", "..."]],
             [("tx-data", "?log", "?tx"), [["?e"]]],
         ]},
        db, log, 100, 200,
    ).orderBy("e")


def datalog_log_tx_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log API datom accessor with a seeded tx set: :in binds a
    collection of transaction ids, (tx-data ?log ?tx) equi-joins the
    log on the bound ?tx and destructures all five datom positions —
    'show me exactly what these transactions did', the Datomic log
    audit idiom. Values certify through the canonical string form."""
    from ..plans.datalog import q
    from ..plans.history import log_datoms

    log = _tx_log(spark, sf_dir)
    db = log_datoms(log)
    return q(
        {"find": ["?tx", "?e", "?a", "?v", "?op"],
         "in": ["?log", ["?tx", "..."]],
         "where": [
             [("tx-data", "?log", "?tx"), [["?e", "?a", "?v", "_", "?op"]]],
         ]},
        db, log, [100, 105, 150, 199],
    ).orderBy("tx")


def history_cascade_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:db.fn/retractEntity with :db/isComponent cascade: customers own
    their orders through the component attr :cust/order; retracting
    cust:1 at tx 2 also retracts every order it owns (the component
    tree), while other customers' facts survive untouched. The gate
    reads the post-retraction state via as-of."""
    from ..plans.history import retract_entity_cascade

    cust = load(spark, sf_dir, "customer").where(F.col("c_custkey") <= 50)
    orders = load(spark, sf_dir, "orders").where(F.col("o_custkey") <= 50)
    ce = F.concat(F.lit("cust:"), F.col("c_custkey").cast("string"))
    oe = F.concat(F.lit("order:"), F.col("o_orderkey").cast("string"))
    owner = F.concat(F.lit("cust:"), F.col("o_custkey").cast("string"))
    log = (
        cust.select(
            ce.alias("e"), F.lit(":cust/name").alias("a"),
            F.col("c_name").alias("v"),
            F.lit(1).cast("long").alias("tx"), F.lit(True).alias("added"),
        )
        .unionByName(orders.select(
            oe.alias("e"), F.lit(":order/status").alias("a"),
            F.col("o_orderstatus").alias("v"),
            F.lit(1).cast("long").alias("tx"), F.lit(True).alias("added"),
        ))
        .unionByName(orders.select(
            owner.alias("e"), F.lit(":cust/order").alias("a"),
            oe.alias("v"),
            F.lit(1).cast("long").alias("tx"), F.lit(True).alias("added"),
        ))
    )
    out = retract_entity_cascade(
        log, "cust:1", tx=2,
        component_attrs={":cust/order"},
        many_attrs={":cust/order"},
        value_col="v",
    )
    return (
        as_of(out, 2, many_attrs={":cust/order"}, value_col="v")
        .orderBy("e", "a", "v")
    )


def tx_fn_transfer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom transaction function end-to-end (plans/tx_fns.py): seed a
    balance log from customer at tx 1, install a `transfer` fn that
    reads both balances from the pre-tx state and expands into two
    :db/cas forms, transact it at tx 2, and read the as-of-2 state. The
    oracle recomputes final balances with a CASE — certifying the cas
    reads, the expansion, and the as-of resolution in one row-hash."""
    from ..plans.tx_fns import transact

    cust = load(spark, sf_dir, "customer").where(F.col("c_custkey") <= 100)
    log = cust.select(
        F.concat(F.lit("cust:"), F.col("c_custkey").cast("string")).alias("e"),
        F.lit(":cust/bal").alias("a"),
        F.col("c_acctbal").cast("double").alias("v_num"),
        F.lit(1).cast("long").alias("tx"),
        F.lit(True).alias("added"),
    )

    def transfer(state, src, dst, amount):
        bal = {
            r["e"]: r["v_num"]
            for r in state.where(
                F.col("e").isin([src, dst]) & (F.col("a") == ":cust/bal")
            ).collect()
        }
        return [
            [":db/cas", src, ":cust/bal", bal[src], bal[src] - amount],
            [":db/cas", dst, ":cust/bal", bal[dst], bal[dst] + amount],
        ]

    out = transact(
        log, [["transfer", "cust:1", "cust:2", 500.0]],
        tx=2, fns={"transfer": transfer},
    )
    return (
        as_of(out, 2)
        .select("e", F.col("v_num").alias("bal"))
        .orderBy("e")
    )


QUERIES = {
    "history_as_of": history_as_of,
    "history_as_of_from_store": history_as_of_from_store,
    "history_since": history_since,
    "history_since_from_store": history_since_from_store,
    "history_as_of_instant": history_as_of_instant,
    "history_entity_timeline": history_entity_timeline,
    "history_with_speculative": history_with_speculative,
    "history_tx_range": history_tx_range,
    "history_no_history": history_no_history,
    "datalog_history_retractions": datalog_history_retractions,
    "datalog_history_superseded": datalog_history_superseded,
    "datalog_log_tx_ids": datalog_log_tx_ids,
    "datalog_log_tx_data": datalog_log_tx_data,
    "history_cascade_retract": history_cascade_retract,
    "tx_fn_transfer": tx_fn_transfer,
}

_LOG_CTE = """
    WITH log AS (
        SELECT CONCAT('user:', CAST(user_id AS VARCHAR)) AS e,
               CONCAT(':user/', event_type) AS a,
               value AS v_num,
               event_id AS tx,
               (event_id % 7 <> 0) AS added
        FROM events
    ), cut AS (
        SELECT CAST(FLOOR(MAX(tx) * 0.6) AS BIGINT) AS cutoff FROM log
    ), latest AS (
        SELECT e, a, MAX_BY(v_num, tx) AS v_num,
               MAX_BY(added, tx) AS last_added,
               CAST(MAX(tx) AS BIGINT) AS tx
        FROM log GROUP BY e, a
    )
"""

ORACLES = {
    "history_as_of": _LOG_CTE + """
        SELECT e, a, v_num, tx FROM (
            SELECT e, a, MAX_BY(v_num, tx) AS v_num,
                   MAX_BY(added, tx) AS last_added,
                   CAST(MAX(tx) AS BIGINT) AS tx
            FROM log, cut WHERE tx <= cutoff GROUP BY e, a
        ) WHERE last_added
        ORDER BY e, a
    """,
    "history_since": _LOG_CTE + """
        SELECT e, a, v_num, tx FROM latest, cut
        WHERE last_added AND tx > cutoff
        ORDER BY e, a
    """,
    "history_as_of_instant": _LOG_CTE + """
        , icut AS (
            SELECT CAST(MAX(event_id) AS BIGINT) AS cutoff
            FROM events WHERE ts <= TIMESTAMP '2024-01-18 00:00:00'
        )
        SELECT e, a, v_num, tx FROM (
            SELECT e, a, MAX_BY(v_num, tx) AS v_num,
                   MAX_BY(added, tx) AS last_added,
                   CAST(MAX(tx) AS BIGINT) AS tx
            FROM log, icut WHERE tx <= cutoff GROUP BY e, a
        ) WHERE last_added
        ORDER BY e, a
    """,
    "history_entity_timeline": """
        SELECT CONCAT('user:', CAST(user_id AS VARCHAR)) AS e,
               CONCAT(':user/', event_type) AS a,
               value AS v_num,
               event_id AS tx,
               (event_id % 7 <> 0) AS added
        FROM events
        WHERE user_id = 7
        ORDER BY tx, a
    """,
    "history_with_speculative": """
        WITH log AS (
            SELECT CONCAT('user:', CAST(user_id AS VARCHAR)) AS e,
                   CONCAT(':user/', event_type) AS a,
                   value AS v_num,
                   CAST(event_id AS BIGINT) AS tx,
                   (event_id % 7 <> 0) AS added
            FROM events
            UNION ALL
            SELECT 'user:9999', ':user/speculative', 42.0,
                   CAST(1000000000000 AS BIGINT), true
            UNION ALL
            SELECT 'user:7', ':user/click', 0.0,
                   CAST(1000000000000 AS BIGINT), false
        ),
        latest AS (
            SELECT e, a, MAX_BY(v_num, tx) AS v_num,
                   MAX_BY(added, tx) AS last_added,
                   CAST(MAX(tx) AS BIGINT) AS tx
            FROM log GROUP BY e, a
        )
        SELECT e, a, v_num, tx FROM latest
        WHERE last_added AND e IN ('user:9999', 'user:7')
        ORDER BY e, a
    """,
    "history_tx_range": """
        SELECT CONCAT('user:', CAST(user_id AS VARCHAR)) AS e,
               CONCAT(':user/', event_type) AS a,
               value AS v_num,
               event_id AS tx,
               (event_id % 7 <> 0) AS added
        FROM events
        WHERE event_id >= 100 AND event_id < 200
        ORDER BY tx, e, a
    """,
    "datalog_history_retractions": _LOG_CTE + """
        SELECT DISTINCT e, tx FROM log
        WHERE a = ':user/click' AND NOT added
        ORDER BY e, tx
    """,
    "datalog_history_superseded": _LOG_CTE + """
        , pairs AS (
            SELECT DISTINCT l1.a AS a, l2.tx AS t2, l1.e AS e, l1.tx AS t1
            FROM log l1 JOIN log l2
              ON l1.e = l2.e AND l1.a = l2.a AND l1.v_num = l2.v_num
            WHERE l1.added AND NOT l2.added AND l1.tx < l2.tx
        )
        SELECT a, CAST(COUNT(*) AS BIGINT) AS count_t2
        FROM pairs GROUP BY a ORDER BY a
    """,
    "history_no_history": _LOG_CTE + """
        SELECT e, a, v_num, tx, added FROM log WHERE a <> ':user/click'
        UNION ALL
        SELECT e, a, v_num, tx, true AS added FROM (
            SELECT e, a, MAX_BY(v_num, tx) AS v_num,
                   CAST(MAX(tx) AS BIGINT) AS tx,
                   MAX_BY(added, tx) AS last_added
            FROM log WHERE a = ':user/click' GROUP BY e, a
        ) WHERE last_added
        ORDER BY e, a, tx, added
    """,
    "datalog_log_tx_ids": """
        SELECT CONCAT('user:', CAST(user_id AS VARCHAR)) AS e,
               CAST(COUNT(DISTINCT event_id) AS BIGINT) AS count_tx
        FROM events
        WHERE event_id >= 100 AND event_id < 200
        GROUP BY 1
        ORDER BY e
    """,
    "datalog_log_tx_data": """
        SELECT DISTINCT
               CAST(event_id AS BIGINT) AS tx,
               CONCAT('user:', CAST(user_id AS VARCHAR)) AS e,
               CONCAT(':user/', event_type) AS a,
               REGEXP_REPLACE(CAST(value AS VARCHAR), '\\.0$', '') AS v,
               (event_id % 7 <> 0) AS op
        FROM events
        WHERE event_id IN (100, 105, 150, 199)
        ORDER BY tx
    """,
    "history_cascade_retract": """
        WITH facts AS (
            SELECT CONCAT('cust:', CAST(c_custkey AS VARCHAR)) AS e,
                   ':cust/name' AS a, c_name AS v
            FROM customer WHERE c_custkey <= 50
            UNION ALL
            SELECT CONCAT('order:', CAST(o_orderkey AS VARCHAR)),
                   ':order/status', o_orderstatus
            FROM orders WHERE o_custkey <= 50
            UNION ALL
            SELECT CONCAT('cust:', CAST(o_custkey AS VARCHAR)),
                   ':cust/order', CONCAT('order:', CAST(o_orderkey AS VARCHAR))
            FROM orders WHERE o_custkey <= 50
        )
        SELECT e, a, v, CAST(1 AS BIGINT) AS tx FROM facts
        WHERE e <> 'cust:1'
          AND e NOT IN (
            SELECT CONCAT('order:', CAST(o_orderkey AS VARCHAR))
            FROM orders WHERE o_custkey = 1)
        ORDER BY e, a, v
    """,
    "tx_fn_transfer": """
        SELECT CONCAT('cust:', CAST(c_custkey AS VARCHAR)) AS e,
               CASE WHEN c_custkey = 1 THEN CAST(c_acctbal AS DOUBLE) - 500
                    WHEN c_custkey = 2 THEN CAST(c_acctbal AS DOUBLE) + 500
                    ELSE CAST(c_acctbal AS DOUBLE) END AS bal
        FROM customer WHERE c_custkey <= 100
        ORDER BY e
    """,
}

# the store round-trip must hash-equal the in-memory view — same oracle
ORACLES["history_as_of_from_store"] = ORACLES["history_as_of"]
ORACLES["history_since_from_store"] = ORACLES["history_since"]
