#!/usr/bin/env python
"""Per-query profiling: run one registry query N times and print a
per-sample breakdown of construction vs execution wall time plus
stage-level totals (task time, GC, shuffle bytes, spill) from the
status store — the guide §1 'measure first' harness for single
queries at any sf_dir.

Usage: python tools/profile_query.py <query> [runs] [--jobs]
Honors $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stage_totals(spark):
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    # Spark 4.1 signature: stageList(statuses, details, withSummaries,
    # unsortedQuantiles, taskStatus)
    empty = sc._jvm.java.util.ArrayList()
    quantiles = sc._gateway.new_array(sc._jvm.double, 0)
    it = store.stageList(
        empty, False, False, quantiles, sc._jvm.java.util.ArrayList()
    ).iterator()
    tot = {
        "n_stages": 0, "task_time_ms": 0, "gc_ms": 0,
        "shuffle_read_mb": 0.0, "shuffle_write_mb": 0.0,
        "spill_disk_mb": 0.0, "input_mb": 0.0, "n_tasks": 0,
    }
    while it.hasNext():
        s = it.next()
        tot["n_stages"] += 1
        tot["task_time_ms"] += s.executorRunTime()
        tot["gc_ms"] += s.jvmGcTime()
        tot["shuffle_read_mb"] += s.shuffleReadBytes() / 1e6
        tot["shuffle_write_mb"] += s.shuffleWriteBytes() / 1e6
        tot["spill_disk_mb"] += s.diskBytesSpilled() / 1e6
        tot["input_mb"] += s.inputBytes() / 1e6
        tot["n_tasks"] += s.numCompleteTasks()
    return tot


def main() -> int:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2].isdigit() else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from mbrainz_importer_spark.queries import all_queries
    from mbrainz_importer_spark.session import get_spark
    from mbrainz_importer_spark.sources.bucketed import shape_trust

    spark = get_spark("profile_query")
    queries = all_queries()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    for i in range(runs):
        pre = _stage_totals(spark)
        j0 = spark.sparkContext._jsc.sc().statusStore().jobsList(None).size()
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        t1 = time.perf_counter()
        with shape_trust(df):
            n = df.count()
        t2 = time.perf_counter()
        post = _stage_totals(spark)
        j1 = spark.sparkContext._jsc.sc().statusStore().jobsList(None).size()
        d = {k: post[k] - pre[k] for k in post}
        print(
            f"run {i}: total {t2 - t0:.3f}s  construct {t1 - t0:.3f}s  "
            f"exec {t2 - t1:.3f}s  rows={n}\n"
            f"   jobs {j1 - j0}  stages {d['n_stages']}  tasks {d['n_tasks']}  "
            f"task_time {d['task_time_ms'] / 1000:.2f}s  gc {d['gc_ms']}ms\n"
            f"   shuffle r/w {d['shuffle_read_mb']:.1f}/{d['shuffle_write_mb']:.1f} MB  "
            f"spill {d['spill_disk_mb']:.1f} MB  input {d['input_mb']:.1f} MB",
            flush=True,
        )
        spark.sparkContext._jvm.System.gc()
    return 0


if __name__ == "__main__":
    sys.exit(main())
