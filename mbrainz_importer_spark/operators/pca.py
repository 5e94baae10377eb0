"""Distributed PCA for embedding columns: second-moment (covariance)
aggregation as a mergeable summary, driver-side eigendecomposition of
the tiny d×d result, and a JVM-expression projection.

Why this exists at 100 TB: dimensionality reduction is the standard
pre-step before clustering / IVF coarse quantization on a web-scale
embedding corpus (e.g. OPQ's rotation, or plain PCA-64→16 before
k-means). The heavy part — Σx and Σxxᵀ over 10^11 vectors — is an
ASSOCIATIVE aggregation, so it runs as one Arrow-batched pass emitting
ONE bounded summary row per batch (d + d(d+1)/2 int64/float64 sums),
followed by an element-wise reduce of those summaries. The corpus never
shuffles; only O(batches × d²) summary cells do. The eigendecomposition
runs on the driver over a d×d matrix (d ≤ a few hundred) — the same
bounded-artifact contract as clustering.py's k-row centroid collects.

Certification (the repo's SQ8 trick, quantize.py): on integer-valued
vectors every partial sum is exact in int64, and the whole moments
pipeline is oracle-paired corpus-wide against a DuckDB twin that has
never heard of mapInPandas (queries/pca_queries.py). The float face is
bit-equal to the integer face on code-valued input because every sum
stays below 2^53 there (pinned in tests/test_pca.py); the eig + project
stages are engine-side with property tests (orthonormality, descending
explained variance, exact reconstruction at k = d).

Reference parity: the reference has no linear algebra — this is part of
the beyond-reference LLM-data tier (SURVEY.md §6), public-knowledge PCA
(Pearson 1901; mergeable moment summaries as in Chan et al. 1982
pairwise update, simplified here to exact sums).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _upper_pairs(dim: int) -> list[tuple[int, int]]:
    return [(i, j) for i in range(dim) for j in range(dim) if i <= j]


def moment_partials(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """One summary row per Arrow batch: (n, s = Σx as array<double>,
    ss = Σ x_i·x_j for i ≤ j, flattened row-major as array<double>).
    The batch matmul (Xᵀ X) is BLAS; nothing else touches the rows.
    Sums are float64 — exact whenever inputs are integer-valued and
    below 2^53 (the certification regime); int64 accumulation would
    overflow no earlier and cannot represent the float production case.
    """
    import numpy as np
    import pandas as pd

    iu = [i for (i, _) in _upper_pairs(dim)]
    ju = [j for (_, j) in _upper_pairs(dim)]

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64, copy=False)
            if X.shape[1] != dim:
                raise ValueError(
                    f"moment_partials: dim mismatch {X.shape[1]} != {dim}"
                )
            G = X.T @ X
            yield pd.DataFrame(
                {
                    "n": [np.int64(len(pdf))],
                    "s": [X.sum(axis=0).tolist()],
                    "ss": [G[iu, ju].tolist()],
                }
            )

    return df.select(vec_col).mapInPandas(
        run, schema="n long, s array<double>, ss array<double>"
    )


def integer_moments(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """The oracle-facing moments frame over integer-valued vectors:
    one row per upper-triangle pair (i, j) with exact BIGINT sums —
    (i, j, sxy = Σ x_i·x_j, sx = Σ x_i, sy = Σ x_j, n).

    Plan: moment_partials (bounded: one row per batch) → ALL sums ride
    one concatenated array (ss ++ s ++ [n]) through a single posexplode
    + groupBy(pos).sum, so the corpus is read ONCE and the only shuffle
    is over O(batches × d²) summary cells; the (i, j) assembly joins are
    broadcasts of the tiny reduced frame against itself. No driver
    collect anywhere. Sums cast long AFTER the reduce: each float64
    partial is exact on code-valued input, so the cast is lossless in
    the certification regime (and the gate's hash would catch drift).
    """
    from .litexpr import lit_ints

    pairs = _upper_pairs(dim)
    P = len(pairs)
    # one py4j call per map instead of one per element — ~2 s of
    # driver-side plan-construction chatter per query call at dim=64
    # (d(d+1)/2 = 2080 literals each; measured in the r13 round)
    i_map = lit_ints([i + 1 for (i, _) in pairs])
    j_map = lit_ints([j + 1 for (_, j) in pairs])
    sums = (
        moment_partials(df, vec_col, dim)
        .select(
            F.posexplode(
                F.concat("ss", "s", F.array(F.col("n").cast("double")))
            ).alias("pos", "v")
        )
        .groupBy("pos")
        .agg(F.sum("v").cast("bigint").alias("v"))
    )
    ss = sums.where(F.col("pos") < P).select(
        F.element_at(i_map, F.col("pos") + 1).alias("i"),
        F.element_at(j_map, F.col("pos") + 1).alias("j"),
        F.col("v").alias("sxy"),
    )
    s = sums.where((F.col("pos") >= P) & (F.col("pos") < P + dim)).select(
        (F.col("pos") - P + 1).cast("int").alias("d"), F.col("v").alias("sd")
    )
    n = sums.where(F.col("pos") == P + dim).select(F.col("v").alias("n"))
    return (
        ss.join(F.broadcast(s.withColumnRenamed("sd", "sx")), ss.i == F.col("d"))
        .drop("d")
        .join(F.broadcast(s.withColumnRenamed("sd", "sy")), ss.j == F.col("d"))
        .drop("d")
        .crossJoin(F.broadcast(n))
        .select("i", "j", "sxy", "sx", "sy", "n")
    )


def merge_integer_moments(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two moments frames (i, j, sxy, sx, sy, n) by addition —
    moment summaries are mergeable exactly (the PODS'12 mergeable-
    summaries property, with zero error here: sums add). This is the
    incremental path for corpus growth: re-aggregate only the arrivals,
    never rescan the history. Contract: both frames must come from the
    SAME quantization grid (the trained artifact is fixed at build time;
    sums over codes from two grids are meaningless) — the same
    fixed-artifact rule ann.py enforces for centroids/codebooks.
    """
    return (
        a.unionByName(b)
        .groupBy("i", "j")
        .agg(
            F.sum("sxy").alias("sxy"),
            F.sum("sx").alias("sx"),
            F.sum("sy").alias("sy"),
            F.sum("n").alias("n"),
        )
    )


def covariance_stats(df: DataFrame, vec_col: str, dim: int):
    """Driver-side (mean, cov, n) from the bounded partials — the
    sample covariance matrix (n-1 denominator). The collect is one row
    per Arrow batch (the declared bounded artifact, like clustering.py's
    k centroid rows), each d(d+1)/2 + d + 1 doubles."""
    import numpy as np

    rows = moment_partials(df, vec_col, dim).collect()
    if not rows:
        raise ValueError("covariance_stats: empty input")
    n = sum(r["n"] for r in rows)
    s = np.zeros(dim)
    ssu = np.zeros(dim * (dim + 1) // 2)
    for r in rows:
        s += np.array(r["s"])
        ssu += np.array(r["ss"])
    G = np.zeros((dim, dim))
    for k, (i, j) in enumerate(_upper_pairs(dim)):
        G[i, j] = ssu[k]
        G[j, i] = ssu[k]
    mean = s / n
    cov = (G - np.outer(s, s) / n) / max(n - 1, 1)
    return mean, cov, n


def pca_components(cov, k: int, whiten: bool = False, eps: float = 1e-12):
    """Top-k principal axes of a covariance matrix: eigh (symmetric,
    deterministic), eigenvalues descending, and a fixed SIGN convention
    (the largest-|coefficient| entry of each component is positive;
    first index wins ties) so repeated builds produce identical
    components — eigenvectors are only defined up to sign.

    whiten=True scales each axis by 1/sqrt(eigenvalue) so projected
    coordinates have unit variance per dimension (PCA whitening — the
    standard conditioning step before k-means / cosine work on
    anisotropic embeddings); near-zero eigenvalues are floored at `eps`
    so a rank-deficient corpus can't blow a coordinate up to infinity.
    Returned eigenvalues are always the RAW variances either way."""
    import numpy as np

    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T.copy()
    for c in comps:
        pivot = int(np.argmax(np.abs(c)))
        if c[pivot] < 0:
            c *= -1.0
    if whiten:
        comps = comps / np.sqrt(np.maximum(vals[order], eps))[:, None]
    return comps, vals[order]


def project_expr(vec: Column, mean: list[float], component: list[float]) -> Column:
    """(x - mean)·component as a single JVM fold — centering folded into
    the constant term: x·c - mean·c, so the hot path is one zip_with/
    aggregate over the array column (whole-stage codegen, no UDF)."""
    from .litexpr import lit_doubles

    const = float(sum(m * c for m, c in zip(mean, component)))
    dot = F.aggregate(
        F.zip_with(
            vec,
            lit_doubles(component),
            lambda x, c: x.cast("double") * c,
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return dot - F.lit(const)


def pca_project(
    df: DataFrame,
    vec_col: str,
    mean,
    components,
    out_prefix: str = "pc",
) -> DataFrame:
    """Attach the top-k PC coordinates as columns — a pure projection
    (no shuffle), pipelined into whatever scan feeds it."""
    mean = list(map(float, mean))
    cols = [
        project_expr(F.col(vec_col), mean, list(map(float, comp))).alias(
            f"{out_prefix}{idx + 1}"
        )
        for idx, comp in enumerate(components)
    ]
    return df.select("*", *cols)
