"""RRF hybrid retrieval (operators/retrieval.py): fusion math,
overlap boosting, determinism."""

from __future__ import annotations

import pytest

from mbrainz_importer_spark.operators.retrieval import (
    RRF_SCALE,
    ranked,
    rrf_fuse,
)

from pyspark.sql import functions as F


def test_rrf_fuse_math_and_overlap(spark):
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc long, rank long")
    b = spark.createDataFrame([(2, 1), (4, 2)], "doc long, rank long")
    out = {r["doc"]: r for r in rrf_fuse([a, b], top_k=10).collect()}
    # doc 2 appears in both lists: 1/(60+2) + 1/(60+1) quantized
    assert out[2]["rrf_score"] == RRF_SCALE // 62 + RRF_SCALE // 61
    assert out[2]["n_lists"] == 2
    # singles contribute once
    assert out[1]["rrf_score"] == RRF_SCALE // 61 and out[1]["n_lists"] == 1
    assert out[4]["rrf_score"] == RRF_SCALE // 62
    # overlap outranks a better single-list rank
    docs_in_order = [r["doc"] for r in rrf_fuse([a, b], top_k=10).collect()]
    assert docs_in_order[0] == 2

    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])


def test_ranked_tiebreak(spark):
    df = spark.createDataFrame(
        [(5, 10), (3, 10), (9, 7)], "doc long, score long"
    )
    out = ranked(df, "doc", [F.desc("score"), F.asc("doc")]).collect()
    got = {r["doc"]: r["rank"] for r in out}
    assert got == {3: 1, 5: 2, 9: 3}  # tie at score 10 broken by doc asc
