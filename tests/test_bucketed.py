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
