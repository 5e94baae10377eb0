"""Run named registry queries against their DuckDB oracles (the driver's
t2 gate, locally). Usage: python tools/check_gates.py [name ...] — no
names = all oracle-paired queries."""

from __future__ import annotations

import sys
import time
import traceback

from mbrainz_importer_spark.queries import all_oracles, all_queries
from mbrainz_importer_spark.session import get_spark
from tests.oracle import compare, duckdb_conn

SF_DIR = "/root/testdata/sf0.01"


def main(names: list[str]) -> int:
    queries, oracles = all_queries(), all_oracles()
    names = names or sorted(oracles)
    spark = get_spark()
    con = duckdb_conn(SF_DIR)
    failed = []
    for name in names:
        t0 = time.time()
        try:
            df = queries[name](spark, SF_DIR)
            if name in oracles:
                compare(df, con, oracles[name])
                status = "OK"
            else:
                n = df.count()
                status = f"rows-only ({n} rows)"
        except Exception as e:  # noqa: BLE001
            status = f"FAIL: {e}"
            traceback.print_exc()
            failed.append(name)
        print(f"{name}: {status} [{time.time()-t0:.2f}s]", flush=True)
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
