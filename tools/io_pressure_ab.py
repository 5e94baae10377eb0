#!/usr/bin/env python
"""Plain-IVF vs IVF×PQ probe A/B under REAL I/O pressure (r9 verdict
#3, finishing PLAN_NOTES_r09.md §24): the 17.4x fetch-bytes cut was
measured from parquet column-chunk metadata; this demonstrates it as
end-to-end latency by evicting the page cache before EVERY probe
(`echo 3 > /proc/sys/vm/drop_caches`, root-only), so each probe's
reads actually hit storage instead of RAM. A no-eviction control runs
in the same process for the cached baseline. JVM startup and plan
compile amortize away: run 1 of each arm is discarded, medians over
the rest.

Usage: python tools/io_pressure_ab.py [SF_DIR] [--iters N]
Writes one JSON line; record it in BENCH_r10 notes with the profile.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def drop_caches() -> None:
    with open("/proc/sys/vm/drop_caches", "w") as f:
        f.write("3")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default=".bench_data/sf100")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--n-probe", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mbrainz_importer_spark.operators.ann import (
        ivf_pq_topk_from_index_arrow,
        ivf_topk_from_index_arrow,
        stored_centroids,
        stored_codebooks,
    )
    from mbrainz_importer_spark.session import get_spark
    from mbrainz_importer_spark.tables import load

    tag = os.path.basename(os.path.normpath(args.sf_dir))
    ivf_path = os.path.join("spark-warehouse", "ivf_index", f"{tag}_prod_v1")
    pq_path = os.path.join(
        "spark-warehouse", "ivf_pq_index", f"{tag}_serving_v1"
    )
    spark = get_spark("io_pressure_ab")
    cents = stored_centroids(ivf_path)
    pq_cents = stored_centroids(pq_path)
    books = stored_codebooks(pq_path)

    queries = (
        load(spark, args.sf_dir, "embeddings")
        .where(F.col("vec_id") < 50)
        .select("vec_id", "embedding")
    )
    queries = queries.sparkSession.createDataFrame(
        queries.collect(), "vec_id long, embedding array<double>"
    )  # requify: probe timings must not re-read the corpus parquet

    def probe_ivf():
        return ivf_topk_from_index_arrow(
            spark, ivf_path, queries, cents, k=3, n_probe=args.n_probe
        ).count()

    def probe_pq():
        return ivf_pq_topk_from_index_arrow(
            spark, pq_path, queries, pq_cents, books, 64,
            k=3, n_probe=args.n_probe, rerank=8,
        ).count()

    arms = {"plain_ivf": probe_ivf, "ivf_pq": probe_pq}
    out: dict = {}
    for mode in ("cached", "evicted"):
        for name, fn in arms.items():
            samples = []
            for i in range(args.iters):
                if mode == "evicted":
                    drop_caches()
                t0 = time.perf_counter()
                fn()
                samples.append(round(time.perf_counter() - t0, 3))
            rest = sorted(samples[1:])
            out[f"{name}_{mode}"] = {
                "median_seconds": rest[len(rest) // 2],
                "samples": samples,
            }
            print(f"# {name} {mode}: {samples}", file=sys.stderr)

    doc = {
        "metric": "ann_probe_io_pressure_ab",
        "unit": "sec",
        "sf_dir": args.sf_dir,
        "n_probe": args.n_probe,
        "eviction": "drop_caches=3 before every probe",
        "arms": out,
    }
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
