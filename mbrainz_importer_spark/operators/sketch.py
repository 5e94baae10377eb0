"""Mergeable frequency sketches for web-scale vocabularies: Misra–Gries
heavy hitters with per-partition bounded summaries.

Reference parity: the reference's `frequencies` fold
(`/root/reference/src/datomic/mbrainz/importer.clj` examples use exact
`(frequencies ...)` over a single node). Exact token counting in Spark is
already one shuffle with map-side combine — fine when the distinct-token
set fits a shuffle. At 100 TB of web text the distinct-token set itself
is the problem (URLs, hashes, typos: billions of near-singleton keys all
crossing the wire). The Misra–Gries summary bounds what each partition
emits to `capacity` rows REGARDLESS of distinct count, with a provable
undercount bound, and summaries merge by addition — the classic
mergeable-summaries result (Agarwal et al., PODS'12: MG summaries are
mergeable with error ≤ sum of per-summary errors).

Shape: one `mapInPandas` pass (Arrow-batched, no Python row loop over
the wire) emitting ≤ capacity rows per partition, one groupBy over a
≤ capacity × n_partitions frame, one TakeOrdered. The full token
multiset never shuffles.

Exactness contract (what the oracle gate certifies): when every
partition's distinct-token count is ≤ capacity, no decrement ever fires,
every per-partition error is 0, and the sketch IS the exact frequency
table — so a capacity chosen above the corpus vocabulary yields
bit-exact counts (`count_lower == count_upper == true count`). The
approximate regime's guarantees (any token with true frequency
> N/capacity survives; undercount ≤ Σ per-partition errors) are pinned
by tests/test_sketch.py.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

_PARTIAL_SCHEMA = "pid bigint, token string, cnt bigint, err bigint"


def _compress(counts: Counter, capacity: int) -> tuple[Counter, int]:
    """MG 'compress' (Agarwal et al. §3): subtract the (capacity+1)-th
    largest count from everything, keep the positive remainder — at most
    `capacity` survivors, every kept count undercounts by ≤ d, every
    dropped token had true (partial) count ≤ d."""
    if len(counts) <= capacity:
        return counts, 0
    ranked = counts.most_common()
    d = ranked[capacity][1]
    kept = Counter({t: c - d for t, c in ranked if c > d})
    return kept, d


def mg_partials(df: DataFrame, text_col: str, capacity: int) -> DataFrame:
    """Per-partition Misra–Gries summaries: (pid, token, cnt, err).

    `cnt` is the partition-local lower bound; `err` is that partition's
    uniform decrement d (repeated on every row of the partition so the
    merge can recover Σd without a second pass). Tokenization is
    operators.text.tokens — the one tokenizer every text operator and
    oracle in this repo shares."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1: {capacity}")
    toks = df.select(F.explode(tokens(F.col(text_col))).alias("token")).where(
        F.col("token") != ""
    )
    toks = toks.withColumn("pid", F.spark_partition_id().cast("bigint"))

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: Counter = Counter()
        pid = 0
        err = 0
        for b in batches:
            if len(b):
                pid = int(b["pid"].iloc[0])
            counts.update(b["token"].tolist())
            if len(counts) > 4 * capacity:
                counts, d = _compress(counts, capacity)
                err += d
        counts, d = _compress(counts, capacity)
        err += d
        if counts:
            yield pd.DataFrame(
                {
                    "pid": pid,
                    "token": list(counts.keys()),
                    "cnt": list(counts.values()),
                    "err": err,
                }
            )
        elif err:
            # every counter was evicted, but the partition's decrement
            # total must still reach the merge — dropping it would
            # UNDERSTATE the error bound (count_upper could fall below
            # the true count). A null-token sentinel carries err only;
            # mergers exclude it from token counts.
            yield pd.DataFrame(
                {"pid": [pid], "token": [None], "cnt": [0], "err": [err]}
            )

    return toks.mapInPandas(summarize, schema=_PARTIAL_SCHEMA)


def heavy_hitters(
    df: DataFrame, text_col: str, capacity: int, k: int
) -> DataFrame:
    """Top-k corpus tokens from merged MG summaries:
    (token, count_lower, count_upper), ranked count_lower DESC, token ASC.

    count_lower ≤ true count ≤ count_upper = count_lower + Σ partition
    errors (the mergeable-summary bound; conservative for partitions
    where the token survived, exact when all errors are 0). The Σerr
    scalar is a one-row broadcast join, not a driver collect."""
    partials = mg_partials(df, text_col, capacity)
    total_err = partials.groupBy("pid").agg(F.max("err").alias("d")).agg(
        F.coalesce(F.sum("d"), F.lit(0)).alias("total_err")
    )
    merged = (
        partials.where(F.col("token").isNotNull())
        .groupBy("token")
        .agg(F.sum("cnt").alias("count_lower"))
    )
    out = merged.join(F.broadcast(total_err))
    out = out.withColumn(
        "count_upper", (F.col("count_lower") + F.col("total_err")).cast("bigint")
    ).drop("total_err")
    return out.orderBy(F.col("count_lower").desc(), F.col("token")).limit(k)
