"""Hashed-linear text classification — the fastText supervised shape
(Joulin et al., "Bag of Tricks for Efficient Text Classification"):
tokens hash into a fixed-dimension feature space, a linear model scores
the mean of the feature weights, a threshold yields the label. This is
the architecture behind the public quality classifiers of pretraining
pipelines (CCNet's fastText LM filter, LLaMA's wiki-ref classifier):
train offline, score the corpus at scale with nothing but a weight
table.

Spark-first and engine-portable:
- Feature hashing uses md5 (identical in Spark and DuckDB) rather than
  Murmur3, so the oracle gate can recompute scores bit-exactly.
- Weights are INTEGERS (quantized, the fastText `-qnorm` idea): the
  per-document score accumulates as an integer sum — associative and
  order-independent, so cross-engine sums match exactly; the single
  final division is correctly rounded. No float-accumulation drift.
- Everything is built-in column expressions (transform/aggregate over
  the token array) — whole-stage codegen, zero UDFs, zero shuffles:
  scoring is a pure per-row projection that pipelines into the scan.

At 100 TB: scoring never shuffles; a real trained weight table (dim
~1e5-1e6 int entries) rides into the plan as a broadcast literal map —
the same contract as the stand-in weight function used when `weights`
is None.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens


def hashed_feature_id(token: Column, dim: int) -> Column:
    """Feature-hash a token into [0, dim): md5 -> 60-bit int -> mod.
    md5 (not Spark's Murmur3 hash()) so any engine reproduces the
    bucketing."""
    h = F.conv(F.substring(F.md5(token), 1, 15), 16, 10).cast("bigint")
    return F.pmod(h, F.lit(dim))


def _standin_weight(fid: Column, modulus: int) -> Column:
    """Deterministic stand-in for trained weights: centered residue
    (fid % modulus) - (modulus-1)/2 — integer, mean ~0, fixed spread.
    Production swaps in a trained table via `weights`."""
    return (fid % modulus - F.lit((modulus - 1) // 2)).cast("bigint")


def linear_text_scores(
    df: DataFrame,
    text_col: str = "text",
    dim: int = 4096,
    modulus: int = 997,
    weights: dict[int, int] | None = None,
    bias: int = 0,
) -> DataFrame:
    """Append integer-exact linear-model columns:

        score_int = bias + sum over tokens of w[feature_id(token)]
        n_tokens  = token count
        score     = score_int / (n_tokens * (modulus-1)/2)   -- mean in ~[-1,1]

    `weights` maps feature id -> integer weight (missing ids weigh 0);
    None uses the deterministic stand-in. The sum is a BIGINT aggregate
    over the token array — order-independent, so two engines computing
    it over differently-ordered data agree bit-for-bit."""
    toks = tokens(F.col(text_col))
    fid = lambda t: hashed_feature_id(t, dim)  # noqa: E731
    if weights is None:
        w = lambda t: _standin_weight(fid(t), modulus)  # noqa: E731
    else:
        wmap = F.create_map(
            *[F.lit(x) for kv in weights.items() for x in kv]
        )
        w = lambda t: F.coalesce(  # noqa: E731
            F.element_at(wmap, fid(t).cast("int")), F.lit(0)
        ).cast("bigint")
    score_int = F.aggregate(
        F.transform(toks, w), F.lit(bias).cast("bigint"), lambda acc, x: acc + x
    )
    n = F.greatest(F.size(toks), F.lit(1))
    half = (modulus - 1) // 2
    return df.withColumn("score_int", score_int).withColumn(
        "n_tokens", F.size(toks).cast("bigint")
    ).withColumn(
        "score", F.col("score_int").cast("double") / (n * F.lit(float(half)))
    )


def classify_text(
    df: DataFrame,
    text_col: str = "text",
    dim: int = 4096,
    modulus: int = 997,
    weights: dict[int, int] | None = None,
    bias: int = 0,
    threshold: float = 0.0,
    label_col: str = "label",
) -> DataFrame:
    """Binary classification: label = score > threshold. The standard
    keep/drop quality-filter face of the linear scorer."""
    scored = linear_text_scores(df, text_col, dim, modulus, weights, bias)
    return scored.withColumn(label_col, F.col("score") > F.lit(threshold))
