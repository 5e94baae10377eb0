#!/usr/bin/env python
"""Skewed-graph probe for triangle counting (r8 verdict item #1): a
synthetic hub graph where ONE vertex carries most of the edge mass.

The id-canonical wedge join's work is sum_b indeg(b) * outdeg(b) in
the a<b<c orientation, so its adversary is a MID-ID hub — half its
neighbors sort below it, half above, and the hub alone generates
(d/2)^2 wedges (a low-id hub is harmless there: indeg 0). Degree
ordering is immune BY CONSTRUCTION: the max-degree hub sorts last in
(degree, id) order, every hub edge points AT it, its out-degree is 0,
and the hub generates nothing — the work bound is O(|E|^1.5)
regardless of where the hub's id falls.

Graph: hub vertex id H/2 adjacent to all leaves; rim ring edges
(i, i+1) close triangles through the hub; plus a pseudo-random
leaf-leaf edge set. Both orientations must return the same count
(asserted); the probe prints wall seconds.

Usage: python tools/graph_skew_probe.py [hub_degree] [n_random]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    hub_deg = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    n_rand = int(sys.argv[2]) if len(sys.argv) > 2 else 60000

    from pyspark.sql import functions as F

    from mbrainz_importer_spark.operators.graph import triangle_count
    from mbrainz_importer_spark.session import get_spark

    spark = get_spark("graph_skew_probe")
    hub_id = hub_deg // 2
    # leaves 0..hub_deg, skipping the hub's own id -> indeg ~ outdeg ~ d/2
    hub = (
        spark.range(0, hub_deg + 1)
        .where(F.col("id") != hub_id)
        .select(
            F.least(F.col("id"), F.lit(hub_id)).alias("src"),
            F.greatest(F.col("id"), F.lit(hub_id)).alias("dst"),
        )
    )
    rim = spark.range(0, hub_deg).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    ).where((F.col("src") != hub_id) & (F.col("dst") != hub_id))
    rand = spark.range(n_rand).select(
        F.pmod(F.col("id") * 7919 + 13, F.lit(hub_deg)).alias("a"),
        F.pmod(F.col("id") * 104729 + 7, F.lit(hub_deg)).alias("b"),
    ).where((F.col("a") != F.col("b")) & (F.col("a") != hub_id) & (F.col("b") != hub_id)).select(
        F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst")
    )
    edges = hub.unionByName(rim).unionByName(rand).distinct().persist()
    n_edges = edges.count()
    print(f"# edges={n_edges} hub_degree={hub_deg}", file=sys.stderr)

    results = {}
    for label, flag in (("degree_ordered", True), ("id_canonical", False)):
        t0 = time.perf_counter()
        n = triangle_count(edges, degree_ordered=flag).collect()[0][0]
        dt = time.perf_counter() - t0
        results[label] = (n, round(dt, 2))
        print(f"# {label}: {n} triangles in {dt:.2f}s", file=sys.stderr)
    assert results["degree_ordered"][0] == results["id_canonical"][0], results
    import json

    print(json.dumps({
        "metric": "triangle_skew_probe_seconds",
        "edges": n_edges,
        "hub_degree": hub_deg,
        "n_triangles": results["degree_ordered"][0],
        "degree_ordered_seconds": results["degree_ordered"][1],
        "id_canonical_seconds": results["id_canonical"][1],
    }))


if __name__ == "__main__":
    main()
