"""Deterministic Lloyd k-means over an embedding column — the
semantic-clustering primitive of LLM data curation (SemDeDup's paper
clusters with k-means before its within-cell dedup; topic bucketing and
mixture design start from the same assignment).

Spark-first shape — the textbook way to run iterative ML on a cluster:
centroids are DRIVER-SIDE state (k x dim doubles, kilobytes), embedded
into each round's plan as literal arrays. Per iteration the corpus pays

  - assignment: a pure PROJECTION (nearest-centroid over literal
    arrays) — no shuffle, no Python, whole-stage-codegen'd;
  - update: one posexplode + (cell, pos) hash aggregation — map-side
    combined, k·dim output rows collected to the driver (bounded).

The corpus is never joined against itself and never shuffles on a data
key; scaling 100x multiplies scan cost only. Contrast ann.py's
`train_centroids_sample` (engine-specific KMeans on a bounded sample,
rows-only contract): this one is the cross-engine-certified loop — every
arithmetic step is pinned (squared distances and centroid means rounded
to 6 decimals, ties to the smaller cell id) so a DuckDB oracle unrolling
the same iterations reproduces the assignment hash-for-hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ROUND_DP = 6


def _sq_dist(vec: Column, centroid: list[float]) -> Column:
    """Squared euclidean distance to a literal centroid, rounded to the
    pinned precision — expression-only (zip_with + aggregate)."""
    from .litexpr import lit_doubles

    c = lit_doubles(centroid)
    return F.round(
        F.aggregate(
            F.zip_with(vec, c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        ROUND_DP,
    )


def nearest_centroid(vec: Column, centroids: list[list[float]]) -> Column:
    """Index of the nearest centroid — min over (rounded distance,
    cell id) structs, so ties break to the smaller cell in every
    engine."""
    pairs = F.array(*[
        F.struct(_sq_dist(vec, c).alias("d"), F.lit(i).alias("cell"))
        for i, c in enumerate(centroids)
    ])
    return F.array_min(pairs)["cell"]


def kmeans_fit_assign(
    df: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run `iters` Lloyd rounds from a deterministic init (the first k
    vectors by id) and return the final assignment (id, cluster int)
    under the post-update centroids.

    Semantics pinned for cross-engine certification:
      - init: centroids 0..k-1 = the k smallest-id vectors;
      - round t: assign every vector to its nearest centroid (squared
        distance rounded to 6dp, ties to smaller cell), then recompute
        each centroid as the per-position mean of its members rounded
        to 6dp; a cell that lost all members keeps its previous
        centroid;
      - output: assignment under the centroids of the last round.

    Empty input raises (k-means over nothing is a caller bug)."""
    base = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    seed = base.orderBy("vid").limit(k).collect()
    if not seed:
        raise ValueError("kmeans_fit_assign: empty input")
    centroids = [list(r["v"]) for r in seed]
    dim = len(centroids[0])
    for _ in range(iters):
        assigned = base.select(
            "vid", "v", nearest_centroid(F.col("v"), centroids).alias("cell")
        )
        means = (
            assigned.select("cell", F.posexplode("v"))
            .groupBy("cell", "pos")
            .agg(F.round(F.avg("col"), ROUND_DP).alias("m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r["cell"], {})[r["pos"]] = r["m"]
        centroids = [
            [by_cell[i][p] for p in range(dim)] if i in by_cell else centroids[i]
            for i in range(len(centroids))
        ]
    return base.select(
        F.col("vid").alias(id_col),
        nearest_centroid(F.col("v"), centroids).cast("int").alias("cluster"),
    )
