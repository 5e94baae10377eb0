"""Bucketed storage: the same join that shuffles on plain parquet runs
exchange-free on bucketed tables — the property that makes repeated
same-key merges viable at warehouse scale."""

from __future__ import annotations

import pytest

from mbrainz_importer_spark.sources.bucketed import (
    count_exchanges,
    joined_bucketed,
    write_bucketed,
)
from mbrainz_importer_spark.tables import load

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load(spark, SF, "orders")
    lineitem = load(spark, SF, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    # disable auto-broadcast so the join strategy comparison is about
    # partitioning, not size
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    write_bucketed(orders, "b_orders", "o_orderkey", 8)
    write_bucketed(lineitem, "b_lineitem", "o_orderkey", 8)
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    j = joined_bucketed(spark, "b_orders", "b_lineitem", "o_orderkey")
    n = j.count()
    assert n == 6000  # every lineitem finds its order
    assert count_exchanges(j) == 0, "bucketed join must not shuffle"


def test_plain_parquet_join_does_exchange(spark, bucketed_tables):
    orders = load(spark, SF, "orders")
    li = load(spark, SF, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    j = orders.join(li, "o_orderkey")
    j.count()
    assert count_exchanges(j) >= 1, "unbucketed join should shuffle (control)"


def test_stale_managed_location_is_replaced(spark, tmp_path):
    """Build-once across processes: the in-memory catalog forgets a
    managed table between sessions while its warehouse directory
    survives; a rebuild must replace the orphaned location instead of
    failing with LOCATION_ALREADY_EXISTS (hit live at the sf100 tier)."""
    import os

    from mbrainz_importer_spark.plans.eav import (
        materialize_datoms_bucketed, table_datoms,
    )

    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, s string")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for prefix in ("file://", "file:"):
        if wh.startswith(prefix):
            wh = wh[len(prefix):]
    # simulate the orphan: a location on disk with no catalog entry
    stale = os.path.join(wh, "stale_datoms_tbl")
    os.makedirs(stale, exist_ok=True)
    open(os.path.join(stale, "junk"), "w").write("stale")
    assert not spark.catalog.tableExists("stale_datoms_tbl")

    materialize_datoms_bucketed(
        table_datoms(df, "t", "id"), "stale_datoms_tbl", n_buckets=2
    )
    got = spark.table("stale_datoms_tbl")
    assert got.where("a = ':t/s'").count() == 2
    assert not os.path.exists(os.path.join(stale, "junk"))


def test_workload_layout_serves_q3_and_q5_exchange_free(spark):
    """One orderkey-bucketed fact layout (_bucketed_facts) serves BOTH
    q3 and q5: neither plan shuffles a fact side — q3's post-join
    groupBy starts with the bucket key, so even its aggregation reuses
    the bucket partitioning (hashpartitioning on a subset of the group
    keys satisfies the clustered requirement). The only hash Exchange
    allowed in q3 is none; q5's dims broadcast."""
    from mbrainz_importer_spark.queries.core import (
        q3_shipping_priority_bucketed,
        q5_region_revenue_bucketed,
        q18_large_orders_bucketed,
    )
    from mbrainz_importer_spark.sources.bucketed import (
        count_exchanges,
        physical_plan,
    )

    q3 = q3_shipping_priority_bucketed(spark, SF)
    q3.collect()
    assert count_exchanges(q3) == 0, "q3 over the layout must not hash-shuffle"
    q5 = q5_region_revenue_bucketed(spark, SF)
    q5.collect()
    # q5's groupBy keys are dim attributes, so its (tiny, post-join)
    # aggregation exchange is expected — the property is that no
    # Exchange partitions on a FACT key, i.e. neither fact side of the
    # orderkey join moves
    plan = physical_plan(q5)
    fact_shuffles = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln
        and ("l_orderkey" in ln or "o_orderkey" in ln or "l_suppkey" in ln)
    ]
    assert not fact_shuffles, f"q5 fact side shuffled: {fact_shuffles}"
    # q18: the child aggregate groups BY the bucket key, so even the
    # full-corpus quantity rollup needs no Exchange — bucketing pays for
    # the aggregation as well as the join
    q18 = q18_large_orders_bucketed(spark, SF)
    q18.collect()
    assert count_exchanges(q18) == 0, "q18 over the layout must not hash-shuffle"
    for t in ("b_lineitem_sf0_001", "b_orders_sf0_001"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_adopt_bucketed_layout_across_catalog_loss(spark):
    """Catalog re-attach (sources/bucketed.py:adopt_bucketed_table):
    bucket metadata lives only in the session catalog, and this
    deployment's catalog is in-memory — a new process would REBUILD a
    layout whose files sit intact in the warehouse (380s at the sf100
    tier) unless it can re-create the catalog entry over the existing
    location from the `_bucketspec.json` the write drops beside the
    data. Simulated catalog loss: copy the table directory to a name
    the catalog has never seen, adopt, and require the full layout
    contract over the adopted table — same rows, same bucket count,
    and the entity self-join still plans SMJ / zero Exchange / zero
    Sort. A directory with no spec (a write that crashed before the
    metadata drop) must NOT be adoptable."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from mbrainz_importer_spark.plans.eav import (
        _table_buckets,
        materialize_datoms_bucketed,
        read_datoms_bucketed,
        table_datoms,
    )
    from mbrainz_importer_spark.sources.bucketed import (
        adopt_bucketed_table,
        ensure_bucketed_table,
        table_location,
    )

    df = spark.createDataFrame(
        [(i, f"s{i % 3}", float(i)) for i in range(1, 40)],
        "id long, status string, total double",
    )
    materialize_datoms_bucketed(
        table_datoms(df, "t", "id"), "adopt_probe_src", n_buckets=4
    )
    src = table_location(spark, "adopt_probe_src")
    dst = table_location(spark, "adopt_probe_dst")
    spark.sql("DROP TABLE IF EXISTS adopt_probe_dst")
    if os.path.exists(dst):
        shutil.rmtree(dst)
    shutil.copytree(src, dst)

    assert adopt_bucketed_table(spark, "adopt_probe_dst")
    assert _table_buckets(spark, "adopt_probe_dst") == 4
    assert (
        spark.table("adopt_probe_dst").orderBy("e", "a").collect()
        == spark.table("adopt_probe_src").orderBy("e", "a").collect()
    )
    store = read_datoms_bucketed(spark, "adopt_probe_dst")
    j = (
        store.where(F.col("a") == ":t/status")
        .select("e", F.col("v").alias("st"))
        .join(
            store.where(F.col("a") == ":t/total")
            .select("e", F.col("v_num").alias("tp")),
            "e",
        )
    )
    assert j.count() == 39
    from mbrainz_importer_spark.sources.bucketed import physical_plan

    p = physical_plan(j)
    assert "SortMergeJoin" in p and "BroadcastHashJoin" not in p, p
    assert not [ln for ln in p.splitlines() if "Exchange hashpartitioning" in ln], p
    assert not [ln for ln in p.splitlines() if " Sort [e#" in ln], p

    # crash posture: no _bucketspec.json -> not adoptable
    nospec = table_location(spark, "adopt_probe_nospec")
    spark.sql("DROP TABLE IF EXISTS adopt_probe_nospec")
    if os.path.exists(nospec):
        shutil.rmtree(nospec)
    os.makedirs(nospec)
    assert not ensure_bucketed_table(spark, "adopt_probe_nospec")

    for t in ("adopt_probe_src", "adopt_probe_dst"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    for d in (dst, nospec):
        if os.path.exists(d):
            shutil.rmtree(d)


def test_sort_trust_toggle_is_per_query(spark, bucketed_tables):
    """sources/bucketed.py:sort_trust — the shape-dependent lever from
    the sf100 A/B (PLAN_NOTES_r09.md §14): under trust the bucketed SMJ
    elides the Sorts (the write discipline sorted the files), with it
    off the explicit Sorts come back (the near-full-corpus-merge plan
    that measured ~20% faster on q5's shape). The flag is plan-time and
    must restore afterward."""
    from mbrainz_importer_spark.sources.bucketed import (
        physical_plan,
        sort_trust,
    )

    key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    before = spark.conf.get(key)

    def sorts(df):
        return physical_plan(df).count(" Sort [")

    with sort_trust(spark, True):
        trusted = joined_bucketed(spark, "b_orders", "b_lineitem", "o_orderkey")
        assert sorts(trusted) == 0, physical_plan(trusted)
    with sort_trust(spark, False):
        explicit = joined_bucketed(spark, "b_orders", "b_lineitem", "o_orderkey")
        assert sorts(explicit) == 2, physical_plan(explicit)
        # same rows either way — the toggle is a physical choice only
        assert explicit.count() == 6000
    assert spark.conf.get(key) == before


def test_bucket_spec_validation_rejects_corruption(spark, tmp_path):
    """ADVICE r9: a stale or hand-edited _bucketspec.json must not be
    adopted silently — with sort-trust ON a wrong n_buckets plans
    Exchange-free joins over wrongly-bucketed files (silent wrong
    results). Malformed specs raise loudly instead of rebuilding."""
    import json
    import os

    import pytest

    from mbrainz_importer_spark.sources.bucketed import (
        _validate_bucket_spec,
        adopt_bucketed_table,
        table_location,
    )

    good = {
        "schema_ddl": "`e` bigint, `a` string, `v` string",
        "bucket_key": "e",
        "sort_key": "e",
        "n_buckets": 4,
        "partition_col": None,
    }
    _validate_bucket_spec(good, "probe")  # no raise

    for mutate, frag in [
        (lambda s: s.pop("n_buckets"), "missing"),
        (lambda s: s.update(n_buckets=0), "positive int"),
        (lambda s: s.update(n_buckets="4"), "positive int"),
        (lambda s: s.update(n_buckets=True), "positive int"),
        (lambda s: s.update(bucket_key="nope"), "not a column"),
        (lambda s: s.update(sort_key="nope"), "not a column"),
        (lambda s: s.update(partition_col="nope"), "not a column"),
    ]:
        bad = dict(good)
        mutate(bad)
        with pytest.raises(ValueError, match=frag):
            _validate_bucket_spec(bad, "probe")

    # end-to-end: a directory with a corrupt spec raises on adopt
    loc = table_location(spark, "adopt_probe_corrupt")
    spark.sql("DROP TABLE IF EXISTS adopt_probe_corrupt")
    os.makedirs(loc, exist_ok=True)
    bad = dict(good)
    bad["n_buckets"] = -1
    with open(os.path.join(loc, "_bucketspec.json"), "w") as f:
        json.dump(bad, f)
    with pytest.raises(ValueError, match="positive int"):
        adopt_bucketed_table(spark, "adopt_probe_corrupt")
    import shutil

    shutil.rmtree(loc)


def test_table_location_rejects_qualified_names(spark):
    """ADVICE r9: db.tbl does not live at <warehouse>/<name> — guessing
    would read/write the bucket spec in the wrong directory."""
    import pytest

    from mbrainz_importer_spark.sources.bucketed import table_location

    with pytest.raises(ValueError, match="qualified name"):
        table_location(spark, "otherdb.facts")


def test_shape_selected_trust_picks_measured_best_plan(spark):
    """Verdict r9 #1 — the engine picks the q5-shape plan it measured
    to be best, automatically (sources/bucketed.py:shape_selected_trust).
    The sf100 A/B (PLAN_NOTES_r09.md §14/§25) is the ground truth the
    rule encodes: a near-full-corpus bucketed fact-fact merge prefers
    the explicit Sort (trust OFF, ~12-20% at sf100), every thinned
    merge (selective filters, pruned partitions) prefers trusting the
    on-disk bucket sort (up to 3.7x), and a plan with no certifiable
    bucketed merge leaves the session default alone."""
    from mbrainz_importer_spark.queries.core import (
        q1_pricing_summary,
        q3_shipping_priority_bucketed,
        q5_region_revenue_bucketed,
        q18_large_orders_bucketed,
    )
    from mbrainz_importer_spark.sources.bucketed import (
        physical_plan,
        shape_selected_trust,
        shape_trust,
    )

    q5 = q5_region_revenue_bucketed(spark, SF)
    q3 = q3_shipping_priority_bucketed(spark, SF)
    q18 = q18_large_orders_bucketed(spark, SF)

    # unfiltered fact-fact merge -> explicit Sort (the §14 q5 winner)
    assert shape_selected_trust(q5) is False
    # date-thinned merge -> trust the on-disk sort (the §14 q3 winner)
    assert shape_selected_trust(q3) is True
    # q18's lineitem side reaches the merge through an aggregate — the
    # scan fraction is not the merge input's size, so no certification
    assert shape_selected_trust(q18) is None
    # no bucketed merge at all -> hands off
    assert shape_selected_trust(q1_pricing_summary(spark, SF)) is None

    # the picked setting actually lands in the physical plan: q5 under
    # shape_trust plans explicit Sorts before its SMJ; q3 stays
    # Sort-free; rows are flag-invariant (same oracle either way)
    with shape_trust(q5) as pick:
        assert pick is False
        assert q5.count() == 10
        merge_sorts = [
            ln for ln in physical_plan(q5).splitlines()
            if " Sort [l_orderkey" in ln or " Sort [o_orderkey" in ln
        ]
        assert merge_sorts, physical_plan(q5)
    with shape_trust(q3) as pick:
        assert pick is True
        assert q3.count() == 10
        smj_sorts = [
            ln for ln in physical_plan(q3).splitlines()
            if " Sort [l_orderkey" in ln or " Sort [o_orderkey" in ln
        ]
        assert not smj_sorts, smj_sorts


def test_shape_selected_trust_survives_estimator_failure(spark, monkeypatch):
    """A filter whose Expression.sql() doesn't round-trip through the
    single-file sample read must degrade to "shape not certifiable"
    (session default untouched), never crash the query runner."""
    import mbrainz_importer_spark.sources.bucketed as B
    from mbrainz_importer_spark.queries.core import q5_region_revenue_bucketed

    def boom(spark_, scan):
        raise RuntimeError("unparseable condition")

    monkeypatch.setattr(B, "_scan_merge_fraction", boom)
    q5 = q5_region_revenue_bucketed(spark, SF)
    assert B.shape_selected_trust(q5) is None
    with B.shape_trust(q5) as pick:
        assert pick is None
        assert q5.count() == 10


def test_append_bucketed_keeps_colocation_compact_restores_sort(spark):
    """The append/compact cadence (append_bucketed / bucketed_compaction_due
    / compact_bucketed): an append adds exactly one spec-carrying file per
    touched bucket — the join stays Exchange-free — but spends the
    single-file sort trust (the SMJ re-inserts its per-bucket Sort);
    compaction collapses each bucket back to one file, restores the
    Sort-free plan, and preserves content exactly."""
    from pyspark.sql import functions as F

    from mbrainz_importer_spark.sources.bucketed import (
        append_bucketed,
        bucket_file_counts,
        bucketed_compaction_due,
        compact_bucketed,
    )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load(spark, SF, "orders")
        base = orders.where(F.col("o_orderkey") % 10 != 0)
        inc = orders.where(F.col("o_orderkey") % 10 == 0)
        write_bucketed(base, "b_app_orders", "o_orderkey", 4)
        li = load(spark, SF, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        write_bucketed(li, "b_app_li", "o_orderkey", 4)
        assert not bucketed_compaction_due(spark, "b_app_orders")

        append_bucketed(inc, "b_app_orders")
        assert spark.table("b_app_orders").count() == orders.count()
        assert bucketed_compaction_due(spark, "b_app_orders")
        assert max(bucket_file_counts(spark, "b_app_orders").values()) == 2

        def join_plan():
            j = joined_bucketed(spark, "b_app_orders", "b_app_li", "o_orderkey")
            from mbrainz_importer_spark.sources.bucketed import physical_plan

            return j, physical_plan(j)

        j, plan = join_plan()
        assert count_exchanges(j) == 0, "append broke bucket co-location"
        assert any(
            " Sort [o_orderkey" in ln for ln in plan.splitlines()
        ), "multi-file buckets must re-insert the SMJ Sort"

        before = sorted(
            tuple(r)
            for r in spark.table("b_app_orders")
            .select("o_orderkey", "o_orderstatus")
            .collect()
        )
        compact_bucketed(spark, "b_app_orders")
        after = sorted(
            tuple(r)
            for r in spark.table("b_app_orders")
            .select("o_orderkey", "o_orderstatus")
            .collect()
        )
        assert before == after, "compaction changed content"
        assert max(bucket_file_counts(spark, "b_app_orders").values()) == 1
        assert not bucketed_compaction_due(spark, "b_app_orders")
        j, plan = join_plan()
        assert count_exchanges(j) == 0
        assert not any(
            " Sort [o_orderkey" in ln for ln in plan.splitlines()
        ), "compaction must restore the Sort-free merge"
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_app_orders")
        spark.sql("DROP TABLE IF EXISTS b_app_li")


def test_shj_face_plans_shuffled_hash_join_when_bound_fits(spark):
    """q5_region_revenue_colocated_shj: when the orders-side build
    provably fits (any small sf), the fact join plans as a CO-LOCATED
    ShuffledHashJoin — no fact-key Exchange, no per-bucket Sort on the
    fact sides — and the results equal the SMJ face bit-for-bit."""
    from mbrainz_importer_spark.queries.core import (
        q5_region_revenue_bucketed,
        q5_region_revenue_colocated_shj,
    )
    from mbrainz_importer_spark.sources.bucketed import (
        physical_plan,
        shj_build_plan,
    )

    shj = q5_region_revenue_colocated_shj(spark, SF)
    # precondition, pinned for real (the old `fits or <df> is not None`
    # could never fail — ADVICE r11): at test scale the build must fit,
    # otherwise the SHJ plan assertions below are vacuous.
    assert shj_build_plan(spark, "b_orders_sf0_001", heap_bytes=8 << 30)[
        "fits"
    ], "test-scale build should fit an 8g heap"
    got = shj.collect()
    plan = physical_plan(shj)
    assert "ShuffledHashJoin" in plan, "bound fits -> SHJ expected"
    fact_shuffles = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln
        and ("l_orderkey" in ln or "o_orderkey" in ln)
    ]
    assert not fact_shuffles, f"fact side shuffled: {fact_shuffles}"
    fact_sorts = [
        ln for ln in plan.splitlines()
        if ln.strip().startswith("Sort ")
        and ("l_orderkey" in ln or "o_orderkey" in ln)
    ]
    assert not fact_sorts, f"SHJ face must not sort the fact sides: {fact_sorts}"
    want = q5_region_revenue_bucketed(spark, SF).collect()
    assert got == want
    for t in ("b_lineitem_sf0_001", "b_orders_sf0_001"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_shj_face_falls_back_to_smj_when_bound_fails(spark, monkeypatch):
    """A layout whose per-bucket build does NOT fit must degrade to the
    spill-capable SMJ — same results, no SHJ node. This is the exact
    failure r10's probe measured (sf100/8g build OOM) turned into a
    planning decision. The bound is forced to fail via monkeypatch
    (test-scale data fits any real heap, so an env-based simulation
    can't exercise the branch)."""
    from mbrainz_importer_spark import sources
    from mbrainz_importer_spark.queries.core import (
        q5_region_revenue_bucketed,
        q5_region_revenue_colocated_shj,
    )
    from mbrainz_importer_spark.sources.bucketed import physical_plan

    monkeypatch.setattr(
        sources.bucketed, "shj_build_plan",
        lambda *a, **k: {"fits": False},
    )
    shj = q5_region_revenue_colocated_shj(spark, SF)
    got = shj.collect()
    assert "ShuffledHashJoin" not in physical_plan(shj)
    assert got == q5_region_revenue_bucketed(spark, SF).collect()
    for t in ("b_lineitem_sf0_001", "b_orders_sf0_001"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_shj_bound_model_matches_recorded_datapoints(spark):
    """Calibration pin: with the per-row cost measured from REAL orders
    projection data, the model must (a) reject the sf100 shape that
    OOM'd live (150M rows, 128 buckets, 8g heap, 32 cores —
    PLAN_NOTES_r10.md §18) and (b) admit the sf10 shape that ran and
    won 20% (15M rows, 64 buckets). A model that can't reproduce both
    datapoints is a guess, not a bound."""
    from mbrainz_importer_spark.queries.core import _bucketed_facts
    from mbrainz_importer_spark.sources.bucketed import shj_build_plan

    _bucketed_facts(spark, SF)
    plan = shj_build_plan(spark, "b_orders_sf0_001", heap_bytes=8 << 30, cores=32)
    per_row = plan["per_row_cost"]
    budget = (8 << 30) * 0.25
    oomed = 150e6 / 128 * per_row * 32
    ran = 15e6 / 64 * per_row * 32
    assert oomed > budget, "model must reject the shape that OOM'd live"
    assert ran <= budget, "model must admit the shape that ran at 8g"
    for t in ("b_lineitem_sf0_001", "b_orders_sf0_001"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_multicol_sorted_layout_adopts_with_sort_metadata(spark):
    """A (group, order...) sorted layout — the window-topk twin's shape —
    must survive catalog loss: adoption replays the multi-column SORTED
    BY from _bucketspec.json, and the re-attached table still feeds a
    WindowExec with no Exchange and no extra Sort."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mbrainz_importer_spark.sources.bucketed import (
        physical_plan,
        write_bucketed,
    )
    from mbrainz_importer_spark.tables import load as _load

    t = "b_topk_adopt_probe"
    df = _load(spark, SF, "orders").select(
        "o_custkey",
        (-F.col("o_totalprice")).alias("neg_price"),
        "o_orderkey",
    )
    write_bucketed(df, t, "o_custkey", 4,
                   sort_cols=["o_custkey", "neg_price", "o_orderkey"])
    t2 = t + "_adopted"
    try:
        # simulate a fresh process: copy the layout to a name the
        # catalog has never seen (same dance as
        # test_adopt_bucketed_layout_across_catalog_loss)
        import os
        import shutil

        from mbrainz_importer_spark.sources.bucketed import (
            ensure_bucketed_table,
            table_location,
        )

        src, dst = table_location(spark, t), table_location(spark, t2)
        spark.sql(f"DROP TABLE IF EXISTS {t2}")
        if os.path.exists(dst):
            shutil.rmtree(dst)
        shutil.copytree(src, dst)
        assert ensure_bucketed_table(spark, t2)
        t = t2  # run the plan assertions over the ADOPTED table
        w = Window.partitionBy("o_custkey").orderBy(
            F.asc("neg_price"), F.asc("o_orderkey")
        )
        ranked = (
            spark.table(t)
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= 2)
        )
        p = physical_plan(ranked)
        assert "Exchange hashpartitioning" not in p, p
        assert "+- Sort " not in p, p
        assert ranked.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_topk_adopt_probe")
        spark.sql(f"DROP TABLE IF EXISTS {t2}")
