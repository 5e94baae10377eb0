#!/usr/bin/env python
"""Degree-controlled scale corpus for the graph / ER / skew tiers
(r11 verdict #2): `make_scale.py` replicates facts with shifted order
keys but REUSES the part/customer/supplier vocabularies, so a 100x
corpus makes the co-purchase graph ~100x DENSER (mean part degree
x100 -> triangle/wedge mass superquadratic) and the trade graph
saturates toward a complete bipartite core — a workload no real crawl
has, which is why triangle/LPA/ER stopped at sf10 with documented
skips. Real growth adds NODES at roughly constant degree.

This generator replicates with DOMAIN-CONSISTENT shifts: every copy
gets a disjoint order/customer/supplier/part key space (parent dim and
fact FK shift in lockstep, so referential integrity holds per copy),
which makes every per-copy subgraph an exact disjoint clone of the
sf0.1 graph — node count and edge count grow LINEARLY with the factor,
degree distribution constant. Same trick as tools/make_unique_docs.py
for the LSH tier, applied to the graph key domains.

ER blocking: p_name's noun token (the blocking key) is salted per copy
("hot gear" -> "hot gearq7" in copy 7), so linkage blocks stay
fixture-sized and the block COUNT grows linearly — cross-copy names
can never match (different blocks), within-copy edit structure is
byte-identical to the fixture. The adjective token (the Levenshtein
verify field) is untouched.

events/documents/embeddings copy through unchanged (no riding query
here reads them; the LSH tier has its own unique corpus).

Usage: python tools/make_graph_corpus.py [factor] [src] [out]
Defaults: 10 /root/testdata/sf0.1 .bench_data/sf1g

The replication is ONE narrow plan per table (range cross-join
carrying the copy index) — a factor-branch union is an analyzer
chokepoint at factor=1000.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mbrainz_importer_spark.session import get_spark  # noqa: E402
from mbrainz_importer_spark.tables import TABLE_NAMES, load  # noqa: E402

# key domain -> [(table, column), ...]; parent key and every FK shift
# by the SAME per-domain base so joins stay valid inside each copy and
# can never cross copies
DOMAINS = {
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
}
PASSTHROUGH = ("region", "nation", "events", "documents", "embeddings")


def _domain_bases(spark, src: str) -> dict[str, int]:
    bases = {}
    for dom, cols in DOMAINS.items():
        top = 0
        for table, col in cols:
            mx = load(spark, src, table).agg(F.max(col)).collect()[0][0]
            top = max(top, int(mx))
        bases[dom] = 10 ** math.ceil(math.log10(top + 1))
    return bases


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else ".bench_data/sf1g"
    spark = get_spark("make_graph_corpus")
    bases = _domain_bases(spark, src)
    shift_of = {
        (table, col): bases[dom]
        for dom, cols in DOMAINS.items()
        for table, col in cols
    }
    copies = F.broadcast(
        spark.range(factor).select(F.col("id").alias("_copy"))
    )
    for name in TABLE_NAMES:
        df = load(spark, src, name)
        if name in PASSTHROUGH:
            df.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
            print(f"{name}: passthrough", file=sys.stderr)
            continue
        exprs = []
        for c in df.columns:
            base = shift_of.get((name, c))
            if base is not None:
                exprs.append(
                    (F.col(c) + F.col("_copy") * F.lit(base)).alias(c)
                )
            elif name == "part" and c == "p_name":
                # salt the BLOCKING token per copy; copy 0 verbatim
                exprs.append(
                    F.when(
                        F.col("_copy") > 0,
                        F.concat(
                            F.col("p_name"), F.lit("q"),
                            F.col("_copy").cast("string"),
                        ),
                    ).otherwise(F.col("p_name")).alias(c)
                )
            else:
                exprs.append(F.col(c))
        df.crossJoin(copies).select(*exprs).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )
        print(f"{name}: x{factor} (domain-shifted)", file=sys.stderr)
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
