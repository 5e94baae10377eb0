#!/usr/bin/env python
"""Skewed-graph probe for triangle counting (r8 verdict item #1): a
synthetic hub graph where ONE low-id vertex carries most of the edge
mass — the adversarial case for id-canonical orientation (the low-id
hub fans out C(deg, 2) wedges) and the case degree-ordering exists
for (every hub edge points AT the hub, so the hub emits zero wedges).

Graph: hub vertex 0 adjacent to leaves 1..H; rim ring edges (i, i+1)
close H-1 triangles through the hub; plus a pseudo-random leaf-leaf
edge set for off-hub triangle mass. Both orientations must return the
same count (they do — asserted); the probe prints wall seconds.

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
    hub = spark.range(1, hub_deg + 1).select(
        F.lit(0).cast("long").alias("src"), F.col("id").alias("dst")
    )
    rim = spark.range(1, hub_deg).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    rand = spark.range(n_rand).select(
        (F.pmod(F.col("id") * 7919 + 13, F.lit(hub_deg)) + 1).alias("a"),
        (F.pmod(F.col("id") * 104729 + 7, F.lit(hub_deg)) + 1).alias("b"),
    ).where(F.col("a") != F.col("b")).select(
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
