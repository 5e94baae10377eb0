"""Fixed-iteration integer PageRank — the graph-centrality member of
the iterative-algorithm family (the duplicate-cluster operator in
dedup.py runs label propagation; datalog's recursive rules run
semi-naive fixpoints; this is the weighted-propagation variant).

Engine-portable twist, same policy as RRF/BM25: ranks are BIGINT
multiples of 1e-12 (SCALE DIV n at init) and every propagation step is
integer arithmetic —

    contrib(v) = sum over in-edges (u,v) of  rank(u) DIV outdeg(u)
    rank'(v)   = (15 * (SCALE DIV n)) DIV 100 + (85 * contrib(v)) DIV 100

so T iterations reproduce bit-for-bit in any engine (float PageRank
sums differ in the last ulp by add order). Quantization loses < 1e-12
per term — ranking-irrelevant at any realistic fan-in.

Scale shape: per iteration ONE shuffle keyed on the destination node
(the contribution groupBy); the rank frame is node-keyed so AQE reuses
the same partitioning across the join and the aggregate. Edges and
out-degrees compute once and persist across rounds (the
delta-independent prefix, same trick as datalog's semi-naive cache).
Dangling nodes: a symmetric edge set has none; with directed input
their leaked mass is dropped (documented standard simplification).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 1_000_000_000_000


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Rank every node of the directed edge list after `iters` integer
    PageRank rounds. Returns (node BIGINT, rank BIGINT). The caller
    dedups edges; parallel edges would double-count contributions."""
    e = edges.select(
        F.col(src_col).cast("long").alias("s"),
        F.col(dst_col).cast("long").alias("t"),
    )
    nodes = (
        e.select(F.col("s").alias("v"))
        .unionByName(e.select(F.col("t").alias("v")))
        .distinct()
    )
    outd = e.groupBy(F.col("s").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("od")
    )
    # the delta-independent prefix: edges / out-degrees / nodes persist
    # across rounds and stay cached for the caller's evaluation of the
    # returned plan (unpersisting here would drop the cache BEFORE the
    # final action runs — lazy evaluation outlives this function)
    e = e.persist()
    outd = outd.persist()
    nodes = nodes.persist()
    n_nodes = nodes.count()
    e.count()
    outd.count()
    base = PR_SCALE // n_nodes
    rank = nodes.select("v", F.lit(base).cast("long").alias("r"))
    for _ in range(iters):
        contrib = (
            e.join(rank, e["s"] == rank["v"])
            .join(outd, e["s"] == outd["v"])
            .select("t", F.expr("r DIV od").alias("c"))
            .groupBy("t")
            .agg(F.sum("c").cast("long").alias("c"))
        )
        rank = nodes.join(
            contrib, nodes["v"] == contrib["t"], "left"
        ).select(
            "v",
            F.expr(
                f"CAST((15 * {base}L) DIV 100 + "
                "(85 * COALESCE(c, 0L)) DIV 100 AS BIGINT)"
            ).alias("r"),
        )
    return rank.select(
        F.col("v").cast("long").alias("node"),
        F.col("r").cast("long").alias("rank"),
    )


def pagerank_topk(
    edges: DataFrame,
    k: int = 20,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Top-k by (rank desc, node asc) — TakeOrdered, no global sort."""
    return (
        pagerank(edges, iters=iters, src_col=src_col, dst_col=dst_col)
        .orderBy(F.desc("rank"), F.asc("node"))
        .limit(k)
    )


def triangle_count(edges: DataFrame, src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Count triangles of an undirected graph given as CANONICAL edges
    (src < dst, deduped — the caller's contract). Classic two-join
    enumeration: wedges a<b<c from (a,b),(b,c), closed by (a,c); each
    triangle counts exactly once because its vertices appear in sorted
    order. Returns one row (n_triangles BIGINT).

    Scale shape: two shuffle joins keyed on vertices. The canonical
    orientation already bounds wedge fan-out by out-degree; at heavy
    skew the standard refinement is degree-ordered orientation (point
    high-degree vertices at higher-degree neighbors), which caps
    per-vertex fan-out near sqrt(|E|) — same join plan, different
    orientation rule, noted here for the 100 TB path."""
    e = edges.select(
        F.col(src_col).cast("long").alias("s"),
        F.col(dst_col).cast("long").alias("t"),
    )
    ab = e.select(F.col("s").alias("a"), F.col("t").alias("b"))
    bc = e.select(F.col("s").alias("b"), F.col("t").alias("c"))
    ac = e.select(F.col("s").alias("a"), F.col("t").alias("c"))
    wedges = ab.join(bc, "b")
    closed = wedges.join(ac, ["a", "c"])
    return closed.agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
