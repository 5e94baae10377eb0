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


def throttle_reads(device: str, bps: int) -> None:
    """Enroll this process (and the Spark JVM it is ABOUT to launch —
    children inherit the cgroup) into a blkio cgroup with a read
    bandwidth cap. This is the missing half of the instrument: on
    local NVMe, drop_caches makes probes hit storage but the reads
    still are not the bottleneck (§24 measured the 200 MB delta as
    ~25 ms); a cluster's cost model is fetch bytes x CONSTRAINED
    bandwidth, and the cap recreates that constraint honestly —
    buffered reads are synchronous, so blkio v1 throttling applies to
    the cache-missing probe reads."""
    cg = "/sys/fs/cgroup/blkio/graft_io_ab"
    os.makedirs(cg, exist_ok=True)
    with open(os.path.join(cg, "blkio.throttle.read_bps_device"), "w") as f:
        f.write(f"{device} {bps}")
    with open(os.path.join(cg, "cgroup.procs"), "w") as f:
        f.write(str(os.getpid()))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default=".bench_data/sf100")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--n-probe", type=int, default=4)
    ap.add_argument(
        "--read-bps", type=int, default=0,
        help="blkio read-bandwidth cap in bytes/s (0 = uncapped); "
        "applied before the JVM starts so Spark inherits it",
    )
    ap.add_argument(
        "--device", default="254:0",
        help="block device MAJ:MIN for the throttle (vda here)",
    )
    args = ap.parse_args()
    if args.read_bps:
        throttle_reads(args.device, args.read_bps)

    from pyspark.sql import functions as F

    from mbrainz_importer_spark.operators.ann import (
        ivf_pq_sq8_refine_topk,
        ivf_pq_topk_from_index_arrow,
        ivf_topk_from_index_arrow,
        stored_centroids,
        stored_codebooks,
        stored_sq8_bounds,
    )
    from mbrainz_importer_spark.session import get_spark
    from mbrainz_importer_spark.tables import load

    tag = os.path.basename(os.path.normpath(args.sf_dir))
    ivf_path = os.path.join("spark-warehouse", "ivf_index", f"{tag}_prod_v1")
    pq_path = os.path.join(
        "spark-warehouse", "ivf_pq_index", f"{tag}_serving_v1"
    )
    refine_path = os.path.join(
        "spark-warehouse", "ivf_pq_refine_index", f"{tag}_serving_v1"
    )
    spark = get_spark("io_pressure_ab")
    cents = stored_centroids(ivf_path)
    pq_cents = stored_centroids(pq_path)
    books = stored_codebooks(pq_path)
    have_refine = os.path.exists(os.path.join(refine_path, "_SUCCESS"))
    if have_refine:
        ref_cents = stored_centroids(refine_path)
        ref_books = stored_codebooks(refine_path)
        ref_lo, ref_hi = stored_sq8_bounds(refine_path)

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

    def cg_read_bytes() -> int:
        """Bytes actually read from disk by this cgroup (throttle
        accounting) — attributes the probe's REAL fetch, including
        re-faulted jars and rerank row-groups, not just the columns
        the plan claims."""
        p = "/sys/fs/cgroup/blkio/graft_io_ab/blkio.throttle.io_service_bytes"
        if not os.path.exists(p):
            return -1
        total = 0
        for ln in open(p):
            parts = ln.split()
            if len(parts) == 3 and parts[1] == "Read":
                total += int(parts[2])
        return total

    def probe_pq_adc_only():
        return ivf_pq_topk_from_index_arrow(
            spark, pq_path, queries, pq_cents, books, 64,
            k=3, n_probe=args.n_probe, rerank=0,
        ).count()

    def probe_pq_sq8_refine():
        return ivf_pq_sq8_refine_topk(
            spark, refine_path, queries, ref_cents, ref_books,
            ref_lo, ref_hi, 64, k=3, n_probe=args.n_probe, rerank=8,
        ).count()

    arms = {
        "plain_ivf": probe_ivf,
        "ivf_pq": probe_pq,
        "ivf_pq_adc_only": probe_pq_adc_only,
    }
    if have_refine:
        # the r10 two-stage stack: ADC candidates + SQ8 refine, nv never
        # read — the arm that should hold BOTH the ADC arm's flat latency
        # AND a real (re-scored) refine stage under the cap
        arms["ivf_pq_sq8_refine"] = probe_pq_sq8_refine
    out: dict = {}
    for mode in ("cached", "evicted"):
        for name, fn in arms.items():
            samples, fetched = [], []
            for i in range(args.iters):
                if mode == "evicted":
                    drop_caches()
                b0 = cg_read_bytes()
                t0 = time.perf_counter()
                fn()
                samples.append(round(time.perf_counter() - t0, 3))
                fetched.append(cg_read_bytes() - b0)
            rest = sorted(samples[1:])
            entry = {
                "median_seconds": rest[len(rest) // 2],
                "samples": samples,
            }
            if fetched[-1] >= 0:
                fb = sorted(fetched[1:])
                entry["median_read_mb"] = round(
                    fb[len(fb) // 2] / 1048576, 1
                )
                entry["read_mb_samples"] = [
                    round(x / 1048576, 1) for x in fetched
                ]
            out[f"{name}_{mode}"] = entry
            print(f"# {name} {mode}: {samples} read_mb={entry.get('read_mb_samples')}",
                  file=sys.stderr)

    doc = {
        "metric": "ann_probe_io_pressure_ab",
        "unit": "sec",
        "sf_dir": args.sf_dir,
        "n_probe": args.n_probe,
        "eviction": "drop_caches=3 before every probe",
        "read_bps_cap": args.read_bps or None,
        "arms": out,
    }
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
