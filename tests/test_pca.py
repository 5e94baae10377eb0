"""Distributed PCA (operators/pca.py): exactness of the moment
summaries, float-face/integer-face agreement in the certification
regime, eigen-stage properties the oracle can't see, and the
no-shuffle projection plan."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mbrainz_importer_spark.operators.pca import (
    covariance_stats, integer_moments, merge_integer_moments,
    moment_partials, pca_components, pca_project,
)

VECS = [
    [1.0, 2.0, 3.0],
    [4.0, 0.0, 1.0],
    [2.0, 2.0, 2.0],
    [0.0, 5.0, 1.0],
    [3.0, 1.0, 4.0],
]


@pytest.fixture(scope="module")
def vdf(spark):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(VECS)], "vec_id long, v array<double>"
    ).repartition(3)


def test_integer_moments_exact(spark, vdf):
    X = np.array(VECS)
    got = {(r["i"], r["j"]): r for r in integer_moments(vdf, "v", 3).collect()}
    assert len(got) == 6
    for i in range(3):
        for j in range(i, 3):
            r = got[(i + 1, j + 1)]
            assert r["sxy"] == int((X[:, i] * X[:, j]).sum())
            assert r["sx"] == int(X[:, i].sum())
            assert r["sy"] == int(X[:, j].sum())
            assert r["n"] == len(VECS)


def test_merge_of_halves_equals_single_pass(spark, vdf):
    a = integer_moments(vdf.where(F.col("vec_id") % 2 == 0), "v", 3)
    b = integer_moments(vdf.where(F.col("vec_id") % 2 == 1), "v", 3)
    merged = {
        (r["i"], r["j"]): (r["sxy"], r["sx"], r["sy"], r["n"])
        for r in merge_integer_moments(a, b).collect()
    }
    full = {
        (r["i"], r["j"]): (r["sxy"], r["sx"], r["sy"], r["n"])
        for r in integer_moments(vdf, "v", 3).collect()
    }
    assert merged == full


def test_covariance_stats_matches_numpy(spark, vdf):
    X = np.array(VECS)
    mean, cov, n = covariance_stats(vdf, "v", 3)
    assert n == len(VECS)
    assert np.allclose(mean, X.mean(axis=0))
    assert np.allclose(cov, np.cov(X, rowvar=False))


def test_float_face_equals_integer_face_on_codes(spark, vdf):
    """The certification regime: on integer-valued vectors every float64
    partial sum is exact, so covariance_stats' driver combine and
    integer_moments' distributed reduce see the SAME integers."""
    mean, cov, n = covariance_stats(vdf, "v", 3)
    mom = {(r["i"], r["j"]): r for r in integer_moments(vdf, "v", 3).collect()}
    for i in range(3):
        for j in range(i, 3):
            r = mom[(i + 1, j + 1)]
            want = (r["sxy"] - r["sx"] * r["sy"] / n) / (n - 1)
            assert cov[i, j] == pytest.approx(want, rel=0, abs=1e-12)


def test_partials_bounded_one_row_per_batch(spark, vdf):
    rows = moment_partials(vdf, "v", 3).collect()
    assert sum(r["n"] for r in rows) == len(VECS)
    assert all(len(r["ss"]) == 6 and len(r["s"]) == 3 for r in rows)


def test_dim_mismatch_raises(spark, vdf):
    with pytest.raises(Exception, match="dim mismatch"):
        moment_partials(vdf, "v", 4).collect()


def test_pca_components_properties():
    rng_free = np.array(
        [[4.0, 1.0, 0.5], [1.0, 3.0, 0.2], [0.5, 0.2, 1.0]]
    )
    comps, vals = pca_components(rng_free, 3)
    # descending explained variance
    assert vals[0] >= vals[1] >= vals[2]
    # orthonormal rows
    assert np.allclose(comps @ comps.T, np.eye(3), atol=1e-12)
    # sign convention: largest-|coeff| entry positive
    for c in comps:
        assert c[int(np.argmax(np.abs(c)))] > 0
    # they are eigenvectors: C v = λ v
    for c, lam in zip(comps, vals):
        assert np.allclose(rng_free @ c, lam * c, atol=1e-10)


def test_whitened_projection_has_unit_variance(spark, vdf):
    X = np.array(VECS)
    mean, cov, _ = covariance_stats(vdf, "v", 3)
    comps, vals = pca_components(cov, 3, whiten=True)
    out = (
        pca_project(vdf, "v", mean, comps)
        .orderBy("vec_id")
        .select("pc1", "pc2", "pc3")
        .collect()
    )
    P = np.array([[r["pc1"], r["pc2"], r["pc3"]] for r in out])
    assert np.allclose(P.var(axis=0, ddof=1), 1.0, atol=1e-9)
    # eigenvalues reported raw, not whitened
    _, raw_vals = pca_components(cov, 3)
    assert np.allclose(vals, raw_vals)


def test_project_matches_numpy_and_full_rank_preserves_distance(spark, vdf):
    X = np.array(VECS)
    mean, cov, _ = covariance_stats(vdf, "v", 3)
    comps, _ = pca_components(cov, 3)
    out = (
        pca_project(vdf, "v", mean, comps)
        .orderBy("vec_id")
        .select("pc1", "pc2", "pc3")
        .collect()
    )
    P = np.array([[r["pc1"], r["pc2"], r["pc3"]] for r in out])
    want = (X - mean) @ np.array(comps).T
    assert np.allclose(P, want, atol=1e-9)
    # full-rank projection is an isometry of the centered data
    d_orig = np.linalg.norm(X[0] - X[1])
    d_proj = np.linalg.norm(P[0] - P[1])
    assert d_proj == pytest.approx(d_orig, abs=1e-9)


def test_projection_plan_has_no_shuffle(spark, vdf):
    mean, cov, _ = covariance_stats(vdf, "v", 3)
    comps, _ = pca_components(cov, 2)
    flat = spark.createDataFrame(
        [(i, v) for i, v in enumerate(VECS)], "vec_id long, v array<double>"
    )
    p = (
        pca_project(flat, "v", mean, comps)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in p, p


def test_sign_determinism_across_rebuilds(spark, vdf):
    mean1, cov1, _ = covariance_stats(vdf, "v", 3)
    mean2, cov2, _ = covariance_stats(vdf.repartition(2), "v", 3)
    c1, _ = pca_components(cov1, 3)
    c2, _ = pca_components(cov2, 3)
    assert np.allclose(np.array(c1), np.array(c2), atol=1e-9)
