#!/usr/bin/env python
"""Generate a UNIQUE-document corpus tier for the dedup family — the
documents-side twin of the sf100u embeddings corpus (PLAN_NOTES_r10.md
§15, which gave the ANN tier its full-decade datapoint on real unique
payloads).

Why: make_scale.py replicates document text VERBATIM, so every doc has
`factor` byte-identical copies. For MinHash-LSH that makes the TRUE
near-dup pair mass quadratic in the copy count (~2.5B pairs at sf100 —
the TIERS skip), which measures result-size arithmetic, not the
operator. A real 100 TB crawl is the opposite shape: mostly unique
text with a bounded near-dup fraction.

How: copy 0 passes through verbatim; copy i > 0 rewrites every token
at position p ≡ 0 (mod 3) to `token + "q" + i`. Every 3-token window
contains exactly one such position, so EVERY 3-shingle of copy i
differs from every shingle of copy j ≠ i (the salt carries the copy
index): cross-copy Jaccard is exactly 0 and no cross-copy LSH pairs
form beyond md5-coincidence noise. Within one copy the transformation
is position-keyed, not doc-keyed, so byte-identical texts stay
byte-identical (exact-dup groups survive per copy) and aligned
near-dup pairs keep their similarity — pair mass grows LINEARLY with
the corpus, the realistic shape. All JVM expressions; n_chars is
recomputed for the rewritten text.

Usage: python tools/make_unique_docs.py [factor] [src_dir] [out_dir]
Defaults: 1000 /root/testdata/sf0.1 .bench_data/sf100u
(region.parquet is copied through for the tier runner's warmup read.)
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mbrainz_importer_spark.session import get_spark  # noqa: E402
from mbrainz_importer_spark.tables import load  # noqa: E402


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    src = sys.argv[2] if len(sys.argv) > 2 else ".bench_data/sf100u"
    out = sys.argv[3] if len(sys.argv) > 3 else ".bench_data/sf100u"
    if len(sys.argv) <= 2:
        src = "/root/testdata/sf0.1"
    spark = get_spark("make_unique_docs")
    docs = load(spark, src, "documents")
    base = 10 ** math.ceil(
        math.log10(docs.agg(F.max("doc_id")).collect()[0][0] + 1)
    )
    # one copy-index column instead of `factor` union branches: the plan
    # stays O(1) in the factor (a 1000-branch union is an analyzer/
    # codegen chokepoint, and each branch would re-read the source)
    copies = spark.range(factor).select(F.col("id").alias("__copy"))
    joined = docs.crossJoin(copies)
    c = F.col("__copy")
    toks = F.split(F.col("text"), r"\s+")
    jittered = F.when(c == 0, F.col("text")).otherwise(
        F.array_join(
            F.transform(
                toks,
                lambda t, p: F.when(
                    p % 3 == 0,
                    F.concat(t, F.lit("q"), c.cast("string")),
                ).otherwise(t),
            ),
            " ",
        )
    )
    scaled = joined.select(
        (F.col("doc_id") + c * F.lit(base)).alias("doc_id"),
        jittered.alias("text"),
        "lang",
        "source",
        F.length(jittered).cast("bigint").alias("n_chars"),
    )
    scaled.repartition(max(32, factor // 8)).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    load(spark, src, "region").write.mode("overwrite").parquet(
        f"{out}/region.parquet"
    )
    print(f"wrote {out}: documents x{factor} (unique texts), region dim",
          file=sys.stderr)


if __name__ == "__main__":
    main()
