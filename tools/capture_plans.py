"""Capture .explain("formatted") for named registry queries into
plans/r14/<query>_<tag>.txt (the optimization round's evidence files).

Usage: python tools/capture_plans.py <tag> [name ...]
  tag: 'before' or 'after' (file suffix)
  names: query names; default = the bench HEADLINE list.

Honors $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    tag = argv[0] if argv else "before"
    names = argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from mbrainz_importer_spark.queries import all_queries
    from mbrainz_importer_spark.session import get_spark

    if not names:
        import bench

        names = list(bench.HEADLINE)

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r14",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    queries = all_queries()
    for name in names:
        if name not in queries:
            print(f"{name}: not in registry, skipped", flush=True)
            continue
        try:
            df = queries[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"EXPLAIN FAILED: {e}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan)} bytes -> {path}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
