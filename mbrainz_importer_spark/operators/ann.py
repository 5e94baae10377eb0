"""IVF-style approximate nearest neighbor search (the scale path the brief
names alongside LSH).

Coarse quantization: KMeans (Spark ML, seeded => deterministic) learns
`n_cells` centroids; every corpus vector is assigned to its nearest
centroid (one narrow pass, centroids broadcast as literals). A query probes
only the `n_probe` nearest cells and re-ranks exactly within them — the
classic IVF trade: recall vs fraction of corpus scanned.

Engine-specific training makes this rows-only for the oracle gate; recall
against brute force is asserted in tests/test_llm_operators.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import cosine

IVF_SEED = 42


def train_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 16,
    max_iter: int = 20,
) -> list[list[float]]:
    """Seeded KMeans over the corpus; returns centroid vectors.

    Training is SEPARABLE from querying: centroids are a statistic of
    the embedding distribution, so at production scale they are trained
    offline on a sample and shipped to `ivf_topk` as plan literals —
    query latency never includes the KMeans iterations."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    ml_df = df.select(array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    model = KMeans(k=n_cells, seed=IVF_SEED, maxIter=max_iter).fit(ml_df)
    return [[float(x) for x in c] for c in model.clusterCenters()]


def train_centroids_sample(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    max_iter: int = 8,
    sample_limit: int = 4096,
    seed: int = IVF_SEED,
) -> list[list[float]]:
    """Driver-side seeded KMeans (Lloyd's, numpy) on a bounded ordered
    sample — the offline-training shape production IVF uses: centroid
    fitting needs only a distribution sample, so <=sample_limit vectors
    come to the driver (a TakeOrdered, deterministic by `id_col`) and
    the corpus itself never does. Orders of magnitude cheaper than
    spinning Spark ML jobs per iteration for what is driver-scale math."""
    import numpy as np

    rows = df.select(id_col, vec_col).orderBy(id_col).limit(sample_limit).collect()
    X = np.array([list(r[1]) for r in rows], dtype=np.float64)
    if len(X) < n_cells:
        raise ValueError(f"sample of {len(X)} vectors < n_cells={n_cells}")
    rng = np.random.RandomState(seed)
    centers = X[rng.choice(len(X), size=n_cells, replace=False)].copy()
    for _ in range(max_iter):
        d2 = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(axis=-1)
        assign = d2.argmin(axis=1)
        for j in range(n_cells):
            members = X[assign == j]
            if len(members):
                centers[j] = members.mean(axis=0)
    return [[float(x) for x in c] for c in centers]


def _nearest_cells(vec_col: F.Column, centroids: list[list[float]], n: int) -> F.Column:
    """Array of the `n` nearest centroid ids (by cosine, descending)."""
    sims = F.array(*[
        F.struct(
            cosine(vec_col, F.array(*[F.lit(x) for x in c])).alias("sim"),
            F.lit(i).alias("cell"),
        )
        for i, c in enumerate(centroids)
    ])
    ranked = F.reverse(F.array_sort(sims))
    return F.transform(F.slice(ranked, 1, n), lambda s: s["cell"])


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_probe: int = 4,
) -> DataFrame:
    """Top-k per query, scanning only the n_probe nearest cells.
    The corpus-side assignment is a narrow map (centroid literals travel
    with the plan); the probe join is an equi-join on cell id — shuffle
    proportional to probed cells, not the whole corpus."""
    assign = corpus.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).alias("nv"),
        _nearest_cells(F.col(vec_col), centroids, 1)[0].alias("cell"),
    )
    probes = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qv"),
        F.explode(_nearest_cells(F.col(vec_col), centroids, n_probe)).alias("cell"),
    )
    sim = F.round(cosine(F.col("qv"), F.col("nv")), 6)
    pairs = (
        probes.join(assign, "cell")
        .where(F.col("qid") != F.col("nid"))
        .select("qid", "nid", sim.alias("cos_sim"))
        .groupBy("qid", "nid")
        .agg(F.max("cos_sim").alias("cos_sim"))  # dedupe multi-probe hits
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("nid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )
