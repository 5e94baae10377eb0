"""zlib compression-ratio signal (operators/compress.py): exact math on
known strings, filter banding, determinism."""

from __future__ import annotations

import zlib

import pytest

from mbrainz_importer_spark.operators.compress import (
    compression_filter,
    compression_ratios,
)


def test_ratios_exact_and_deterministic(spark):
    rep = "spam " * 400                      # highly compressible
    prose = ("the quick brown fox jumps over the lazy dog and keeps "
             "running through fields of green grass toward sunset ") * 3
    df = spark.createDataFrame(
        [(1, rep), (2, prose), (3, "")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in compression_ratios(df).collect()}

    for i, txt in [(1, rep), (2, prose), (3, "")]:
        raw = txt.encode()
        assert out[i]["n_bytes"] == len(raw)
        assert out[i]["n_compressed"] == len(zlib.compress(raw, 6))
        assert out[i]["compression_ratio"] == (
            out[i]["n_compressed"] / max(len(raw), 1)
        )
    # repetition compresses far better than prose
    assert out[1]["compression_ratio"] < 0.05 < out[2]["compression_ratio"]

    again = {r["doc_id"]: r["n_compressed"] for r in compression_ratios(df).collect()}
    assert again == {i: out[i]["n_compressed"] for i in out}


def test_compression_filter_bands(spark):
    rep = "x" * 5000
    prose = ("a modest amount of ordinary natural language text that "
             "should compress to a middling ratio overall ") * 4
    df = spark.createDataFrame(
        [(1, rep), (2, prose)], "doc_id long, text string"
    )
    kept = [r["doc_id"] for r in
            compression_filter(df, min_ratio=0.2, max_ratio=1.0).collect()]
    assert kept == [2]  # the repetition spam fails the lower band

    with pytest.raises(ValueError, match="level"):
        compression_ratios(df, level=42)
