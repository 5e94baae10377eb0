"""Feature conditioning (operators/features.py)."""

from __future__ import annotations

import pytest

from mbrainz_importer_spark.operators.features import (
    minmax_normalize,
    winsorize,
    zscore_normalize,
)


def test_zscore_and_minmax(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 5.0), (2, 20.0, 5.0), (3, 30.0, 5.0)],
        "id long, x double, const double",
    )
    out = {r["id"]: r for r in
           minmax_normalize(zscore_normalize(df, ["x", "const"]),
                            ["x", "const"]).collect()}
    # x: mean 20, stddev_samp 10
    assert out[1]["x_z"] == -1.0 and out[3]["x_z"] == 1.0
    assert out[1]["x_mm"] == 0.0 and out[2]["x_mm"] == 0.5 and out[3]["x_mm"] == 1.0
    # constant columns -> null, never inf/NaN
    assert all(out[i]["const_z"] is None and out[i]["const_mm"] is None
               for i in (1, 2, 3))


def test_winsorize_bounds(spark):
    rows = [(i, float(i)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "id long, x double")
    out = {r["id"]: r["x_w"] for r in winsorize(df, "x", 0.05, 0.95).collect()}
    lo, hi = min(out.values()), max(out.values())
    # exact percentile_cont of 1..100 at 0.05/0.95
    assert lo == 1 + 0.05 * 99 and hi == 1 + 0.95 * 99
    assert out[50] == 50.0  # interior untouched

    with pytest.raises(ValueError, match="p_low"):
        winsorize(df, "x", 0.9, 0.1)
    with pytest.raises(ValueError, match="columns"):
        zscore_normalize(df, [])
