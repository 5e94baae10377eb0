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
delta-independent prefix, same trick as datalog's semi-naive cache),
and every round's rank frame localCheckpoints — the plan for round T
starts from round T-1's materialized rows, not a T-deep join tree
(the datalog fixpoint's lineage-cut pattern; without it iters=20 is a
20-round nested plan Catalyst re-analyzes in full each action).
Because the final rank frame is checkpoint-materialized, the static
frames unpersist BEFORE returning — the caller's action replays
nothing. Dangling nodes: a symmetric edge set has none; with directed
input their leaked mass is dropped (documented standard
simplification).
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
    # across rounds; released below once the final rank frame is
    # checkpoint-materialized and no longer references them
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
        # eager lineage cut: round T's plan reads round T-1's rows (a
        # |V|-row, two-long frame — cheap to materialize every round)
        rank = rank.localCheckpoint()
    for frame in (e, outd, nodes):
        frame.unpersist()
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


def triangle_count(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    degree_ordered: bool = True,
) -> DataFrame:
    """Count triangles of an undirected graph given as CANONICAL edges
    (src < dst, deduped — the caller's contract). Returns one row
    (n_triangles BIGINT).

    Degree-ordered orientation (the default, and the skew-proof
    formulation): every edge points from its lower-(degree, id)
    endpoint to the higher, so each triangle is counted exactly once
    from its LOWEST vertex in that total order, and per-vertex wedge
    fan-out is capped near sqrt(|E|) — a hub vertex of degree d has
    out-degree only toward its >= d-degree neighbors, of which there
    can be at most 2|E|/d. Total wedge work is O(|E|^1.5) on ANY
    degree distribution (Schank & Wagner's forward algorithm /
    Suri-Vassilvitskii's MR formulation), where id-canonical
    orientation is Theta(d^2) at a low-id hub.

    Orientation is invisible in the count — the gate's DuckDB oracle
    enumerates id-sorted triangles and must hash-match, the same
    certification discipline as `skew_salted_join` (salting invisible
    in results). `degree_ordered=False` keeps the id-canonical plan;
    an equality test pins the two orientations to the same count.

    Scale shape: one degree aggregation, two vertex-keyed degree
    attach joins (AQE broadcasts the |V|-row degree frame when it
    fits), then the same two shuffle joins as the classic plan. The
    oriented edge set persists — it feeds all three legs of the
    wedge-close join, so without the cache the upstream edge
    derivation (often a self-join + distinct) would compute three
    times."""
    e = edges.select(
        F.col(src_col).cast("long").alias("s"),
        F.col(dst_col).cast("long").alias("t"),
    )
    if not degree_ordered:
        ab = e.select(F.col("s").alias("a"), F.col("t").alias("b"))
        bc = e.select(F.col("s").alias("b"), F.col("t").alias("c"))
        ac = e.select(F.col("s").alias("a"), F.col("t").alias("c"))
        wedges = ab.join(bc, "b")
        closed = wedges.join(ac, ["a", "c"])
        return closed.agg(
            F.count(F.lit(1)).cast("long").alias("n_triangles")
        )
    deg = (
        e.select(F.col("s").alias("v"))
        .unionByName(e.select(F.col("t").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    et = (
        e.join(deg.select(F.col("v").alias("s"), F.col("d").alias("ds")), "s")
        .join(deg.select(F.col("v").alias("t"), F.col("d").alias("dt")), "t")
    )
    # s-first iff (deg, id) of s sorts below t's; input has s < t so the
    # equal-degree tie keeps the canonical direction
    s_first = (F.col("ds") < F.col("dt")) | (
        (F.col("ds") == F.col("dt")) & (F.col("s") < F.col("t"))
    )
    oriented = et.select(
        F.when(s_first, F.col("s")).otherwise(F.col("t")).alias("u"),
        F.when(s_first, F.col("t")).otherwise(F.col("s")).alias("w"),
        F.when(s_first, F.col("dt")).otherwise(F.col("ds")).alias("dw"),
    ).persist()
    oriented.count()
    try:
        lo = oriented.select(
            F.col("u").alias("a"), F.col("w").alias("b"),
            F.col("dw").alias("db"),
        )
        hi = oriented.select(
            F.col("u").alias("a"), F.col("w").alias("c"),
            F.col("dw").alias("dc"),
        )
        # wedge (b, c) from the lowest vertex a, with b below c in the
        # same (degree, id) order — the closing edge, if present, is
        # then oriented exactly b -> c
        wedges = lo.join(hi, "a").where(
            (F.col("db") < F.col("dc"))
            | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
        )
        close = oriented.select(
            F.col("u").alias("b"), F.col("w").alias("c")
        )
        n = wedges.join(close, ["b", "c"]).count()
    finally:
        oriented.unpersist()
    spark = edges.sparkSession
    return spark.createDataFrame([(n,)], "n_triangles bigint")
