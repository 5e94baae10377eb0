"""operators/localrel.local_df — JVM LocalRelation replacement for
spark.createDataFrame(<tiny python list>) in query paths (r14: the
Python-RDD scan behind createDataFrame launched defaultParallelism
Python workers per tiny relation — 50.3 s of task time for a 3-term
query relation). Pins: row/schema equivalence with createDataFrame
(values, dtypes, nullability), escaping, fallbacks, and the zero-jobs
property of a folded collect."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from mbrainz_importer_spark.operators.localrel import local_df


def _key(r):
    return tuple((v is None, str(v)) for v in r)


@pytest.mark.parametrize("rows,schema", [
    ([("a'b\\c",), ("héllo wörld",), (None,), ("",)], "term string"),
    ([(1, "x"), (2, None), (-3, "y")], "qid int, term string"),
    ([(3.5, True, 7), (None, False, -2), (1e-30, None, 0)],
     "v double, f boolean, n bigint"),
    ([("e1", ":a", "v", None), ("e2", ":b", "w", 2.5)],
     "e string, a string, v string, v_num double"),
])
def test_matches_create_dataframe(spark, rows, schema):
    a = spark.createDataFrame(rows, schema)
    b = local_df(spark, rows, schema)
    assert a.schema == b.schema
    assert sorted(map(tuple, a.collect()), key=_key) == sorted(
        map(tuple, b.collect()), key=_key
    )


def test_non_nullable_structtype(spark):
    sch = T.StructType([
        T.StructField("a", T.StringType(), False),
        T.StructField("b", T.LongType(), False),
    ])
    rows = [("x", 1), ("y", 2)]
    a = spark.createDataFrame(rows, sch)
    b = local_df(spark, rows, sch)
    assert a.schema == b.schema
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_fallbacks_preserve_behavior(spark):
    # empty input, complex types, non-finite floats: createDataFrame path
    assert local_df(spark, [], "x string").count() == 0
    rows = [(0, [1, 2])]
    got = local_df(spark, rows, "a int, b array<int>").collect()
    assert [tuple(r) for r in got] == [(0, [1, 2])]
    nan = local_df(spark, [(float("nan"),)], "v double").collect()
    assert len(nan) == 1 and nan[0]["v"] != nan[0]["v"]


def test_folded_collect_runs_zero_jobs(spark):
    store = spark.sparkContext._jsc.sc().statusStore()
    df = local_df(
        spark, [("vector",), ("table",), ("scan",)], "term string"
    ).select(F.pmod(F.xxhash64("term"), F.lit(64)).alias("p"))
    j0 = store.jobsList(None).size()
    rows = df.collect()
    assert store.jobsList(None).size() == j0, (
        "LocalRelation projection collected through a job"
    )
    assert len(rows) == 3


def test_pfx_of_terms_matches_spark_hash(spark):
    """_pfx_of_terms (now a folded LocalRelation) must agree with
    xxhash64 evaluated over a real column — the partition-pruning
    contract of every serving read."""
    from mbrainz_importer_spark.operators.fulltext import (
        _pfx_of_terms,
        _term_pfx,
    )

    terms = ["vector", "table", "scan", "hash", "join", "mérge"]
    got = _pfx_of_terms(spark, terms, 64)
    want = sorted({
        r["p"]
        for r in spark.createDataFrame([(t,) for t in terms], "term string")
        .select(_term_pfx(F.col("term"), 64).alias("p"))
        .collect()
    })
    assert got == want
