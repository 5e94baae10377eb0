"""Hashed-linear classifier (operators/classifier.py): stand-in and
trained-weight paths, integer-exact scoring, threshold labels."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mbrainz_importer_spark.operators.classifier import (
    classify_text,
    hashed_feature_id,
    linear_text_scores,
)


def test_standin_scores_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the quick brown fox"), (3, "xyzzy")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in linear_text_scores(df).collect()}
    # identical text -> identical integer score
    assert out[1]["score_int"] == out[2]["score_int"]
    assert out[1]["n_tokens"] == 4
    # score is the normalized mean weight
    assert out[1]["score"] == out[1]["score_int"] / (4 * 498.0)


def test_trained_weights_and_bias(spark):
    df = spark.createDataFrame([(1, "good good bad")], "doc_id long, text string")
    fids = {
        r["tok"]: r["fid"]
        for r in spark.createDataFrame([("good",), ("bad",)], "tok string")
        .select("tok", hashed_feature_id(F.col("tok"), 4096).alias("fid"))
        .collect()
    }
    weights = {int(fids["good"]): 10, int(fids["bad"]): -5}
    row = linear_text_scores(df, weights=weights, bias=2).collect()[0]
    assert row["score_int"] == 2 + 10 + 10 - 5
    # unknown tokens weigh zero
    df2 = spark.createDataFrame([(1, "unseen tokens only")], "doc_id long, text string")
    assert linear_text_scores(df2, weights=weights).collect()[0]["score_int"] == 0


def test_classify_threshold(spark):
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    )
    out = classify_text(df, threshold=-1.1)
    assert all(r["label"] for r in out.collect())  # every score > -1.1
    out2 = classify_text(df, threshold=1.1)
    assert not any(r["label"] for r in out2.collect())
