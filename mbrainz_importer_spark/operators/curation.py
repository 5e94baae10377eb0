"""Corpus-curation operators for LLM training-data pipelines: PII
redaction, span-level (C4-style) dedup, concat-and-chunk sequence
packing, benchmark decontamination, and deterministic global
shuffle/sharding.

Everything here is built-in pyspark.sql.functions (JVM-side, whole-stage
codegen) — no Python UDFs anywhere. Each operator has an exact ANSI-SQL
twin in queries/curation_queries.py so the DuckDB oracle hash-checks it.

Scale notes (100 TB):
- `redact_pii` is a pure per-row projection: no shuffle, pipelined into
  the scan, pushdown-friendly.
- `dedup_spans` shuffles the exploded spans ONCE (the first-owner
  groupBy) and the surviving spans once more on the doc id (reassembly);
  the groupBy output is already the kept set, so no self-join ever
  re-shuffles the span corpus, and spans_total is a closed form of the
  token count (no second explode).
- `pack_sequences` uses the value-bucketed two-phase cumulative sum
  (operators/batching.stable_cumsum): parallel windows per bucket plus a
  driver-side prefix of <=256 bucket subtotals — no single-partition
  window at any size.
- `ngram_contamination` broadcasts the benchmark shingle set (benchmarks
  are small by definition) so the corpus side never shuffles.
- `assign_shards` is a stateless md5 projection; the companion writer
  repartitions by shard so each output file is one shard — the layout
  a training loader wants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .batching import stable_cumsum
from .text import tokens

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Pattern order matters: emails first (their local parts may contain
# digit runs), then IPv4 (dotted digits would half-match the phone rule),
# then SSN before the general phone shape. All patterns use only syntax
# shared by Java regex (Spark) and RE2 (DuckDB): \b \d {m,n} [...].
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
]


def redact_pii(col: Column) -> Column:
    """Replace emails / IPv4s / SSNs / phone numbers with typed tags.
    Chained regexp_replace — single codegen'd projection, no shuffle."""
    out = col
    for _, pat, tag in PII_PATTERNS:
        out = F.regexp_replace(out, pat, tag)
    return out


def pii_flags(col: Column) -> dict[str, Column]:
    """Per-category presence booleans, computed on the RAW text (before
    redaction) so categories don't mask each other."""
    return {name: col.rlike(pat) for name, pat, _ in PII_PATTERNS}


def with_pii_redaction(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    flags = pii_flags(c)
    return df.select(
        "*",
        redact_pii(c).alias(f"{text_col}_redacted"),
        *[v.alias(f"has_{k}") for k, v in flags.items()],
    )


# ---------------------------------------------------------------------------
# span-level dedup (C4-style, token-window granularity)
# ---------------------------------------------------------------------------

def dedup_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 10,
) -> DataFrame:
    """Corpus-global span dedup: split each document into consecutive
    non-overlapping windows of `span_tokens` tokens; each distinct span
    survives only at its first occurrence (lowest id, then lowest
    position — C4 dedups repeated 3-sentence spans the same way, cf.
    Raffel et al. 2020 §2.2); reassemble the surviving spans in order.

    Returns (id, text_deduped, spans_kept, spans_total); documents whose
    every span already occurred elsewhere drop out (fully duplicate
    content). First-owner resolution is min(struct(id, pos)) per span —
    one hash groupBy, no window over the whole corpus, and no join back
    against the exploded stream: the group key carries the span text and
    min(struct(doc, pos)) IS the surviving occurrence, so the groupBy's
    output is already the kept set. (The first version joined the full
    span corpus against its own firsts — a second shuffle of every span
    byte that bought nothing.) spans_total is a closed form of the token
    count (ceil(|tokens|/k)), computed on the un-exploded frame.
    """
    k = span_tokens
    toks = df.select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("__t")
    ).where(F.size("__t") > 0)
    n_spans = F.ceil(F.size("__t") / F.lit(float(k))).cast("int")
    totals = toks.select("doc", n_spans.cast("bigint").alias("spans_total"))
    spans = toks.select(
        "doc",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_spans - 1),
                lambda i: F.array_join(F.slice(F.col("__t"), i * k + 1, k), " "),
            )
        ).alias("pos", "span"),
    )
    kept = (
        spans.groupBy("span")
        .agg(F.min(F.struct(F.col("doc"), F.col("pos"))).alias("__first"))
        .select(
            F.col("__first.doc").alias("doc"),
            F.col("__first.pos").alias("pos"),
            "span",
        )
    )
    return (
        kept.groupBy("doc")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "span"))),
                    lambda s: s["span"],
                ),
                " ",
            ).alias("text_deduped"),
            F.count(F.lit(1)).alias("spans_kept"),
        )
        .join(totals, "doc")
        .select(
            F.col("doc").alias(id_col), "text_deduped", "spans_kept", "spans_total"
        )
    )


# ---------------------------------------------------------------------------
# sequence packing (concat-and-chunk)
# ---------------------------------------------------------------------------

def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    capacity: int = 512,
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Concat-and-chunk packing: documents are laid out end-to-end in
    `id_col` order and cut every `capacity` tokens — the packing used for
    LLM pretraining batches (GPT-style document packing). Each document
    gets its global token offset and the pack ids it lands in; documents
    longer than the remaining room span multiple packs.

    Distributed: the global running token count comes from the
    value-bucketed two-phase cumulative sum, never a 1-partition window.
    Pass `n_tokens_col` when the caller already counted tokens (e.g. for
    a length filter) so the text is not re-tokenized.

    Zero-token documents occupy no pack: their pack ids are null and
    n_packs_spanned is 0 (a naive floor((cum-1)/capacity) would hand
    them last_pack = first_pack - 1, a nonsense id downstream loaders
    would trip over).
    """
    if n_tokens_col is not None:
        with_n = df.select(
            F.col(id_col), F.col(n_tokens_col).cast("long").alias("n_tokens")
        )
    else:
        with_n = df.select(
            F.col(id_col), F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens")
        )
    cum = stable_cumsum(with_n, [id_col], "n_tokens", out_col="__cum")
    start = F.col("__cum") - F.col("n_tokens")
    empty = F.col("n_tokens") <= 0
    null_id = F.lit(None).cast("long")
    return cum.select(
        F.col(id_col),
        "n_tokens",
        start.alias("start_offset"),
        F.when(empty, null_id)
        .otherwise(F.floor(start / capacity))
        .cast("long")
        .alias("first_pack"),
        F.when(empty, null_id)
        .otherwise(F.floor((F.col("__cum") - 1) / capacity))
        .cast("long")
        .alias("last_pack"),
    ).withColumn(
        "n_packs_spanned",
        F.when(F.col("first_pack").isNull(), F.lit(0))
        .otherwise(F.col("last_pack") - F.col("first_pack") + 1)
        .cast("long"),
    )


# ---------------------------------------------------------------------------
# benchmark decontamination (n-gram overlap)
# ---------------------------------------------------------------------------

def _doc_shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(doc, shingle) pairs, distinct per doc — same construction as
    operators/dedup.py shingling (n consecutive tokens joined by space)."""
    toks = df.select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("__t")
    ).where(F.size("__t") >= n)
    shingles = F.transform(
        F.sequence(F.lit(1), F.size("__t") - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(F.col("__t"), i + j) for j in range(n)]
        ),
    )
    return toks.select("doc", F.explode(F.array_distinct(shingles)).alias("shingle"))


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Flag corpus documents sharing >=1 token n-gram with a benchmark
    set (train/test decontamination, cf. GPT-3 appendix C: 13-gram
    overlap; n is a parameter because the right n scales with doc size).

    Returns (id, n_shingles, n_contaminated, contamination_frac) for
    overlapping docs only. The benchmark shingle set is broadcast — the
    corpus side is never shuffled by the join.
    """
    corpus_sh = _doc_shingles(corpus, id_col, text_col, n)
    bench_sh = _doc_shingles(benchmark, id_col, text_col, n).select("shingle").distinct()
    per_doc = corpus_sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        corpus_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return (
        hits.join(per_doc, "doc")
        .select(
            F.col("doc").alias(id_col),
            "n_shingles",
            "n_contaminated",
            F.round(F.col("n_contaminated") / F.col("n_shingles"), 6).alias(
                "contamination_frac"
            ),
        )
    )


# ---------------------------------------------------------------------------
# data-mixture sampling + vocabulary building
# ---------------------------------------------------------------------------

def weighted_mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    group_col: str = "source",
    salt: str = "mixture-v1",
) -> DataFrame:
    """Deterministic per-source sampling rates — the data-mixture step of
    a pretraining pipeline (e.g. upweight wiki, downweight crawl): keep a
    row iff its md5-derived uniform in [0,1) is below its source's
    weight. Sources absent from `weights` are dropped (weight 0).

    Same md5-bucket membership family as operators/sampling.py, so the
    sample is reproducible run-to-run and composes with split
    assignment; a pure projection + filter, no shuffle, scan-pushdown
    of the source filter."""
    for s, w in weights.items():
        if not (0.0 <= w <= 1.0):
            raise ValueError(f"weight for {s!r} must be in [0,1]: {w}")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(1 << 60))
    )
    w_map = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
    rate = F.coalesce(F.element_at(w_map, F.col(group_col)), F.lit(0.0))
    return df.where(u < rate)


def temperature_mixture_sample(
    df: DataFrame,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    group_col: str = "source",
    salt: str = "mixture-t-v1",
) -> DataFrame:
    """Temperature-based mixture sampling — the multilingual-corpus
    reweighting of mBERT/XLM-R ("Unsupervised Cross-lingual
    Representation Learning at Scale", §3.1): sample sources with
    probability p_i ∝ n_i^alpha, flattening the natural distribution
    (alpha=1 keeps it, alpha→0 approaches uniform). Realized as
    deterministic per-source KEEP RATES scaled so the smallest source
    keeps everything:

        rate_i = (n_min / n_i) ** (1 - alpha)

    and a row survives iff its md5-derived uniform < rate_i — the same
    reproducible membership family as weighted_mixture_sample, but with
    the rates DERIVED FROM THE DATA rather than hand-specified.

    alpha=0.5 compiles to sqrt(n_min/n_i): IEEE sqrt and division are
    correctly rounded, so the kept set is bit-identical across engines
    (the oracle gate pins alpha=0.5); other alphas go through pow(),
    whose last-ulp rounding is implementation-defined — fine for
    training pipelines, not for cross-engine hashing.

    Scale: one tiny groupBy (|sources| rows), rates broadcast back onto
    the corpus — the corpus itself never shuffles."""
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1]: {alpha}")
    counts = df.groupBy(group_col).agg(F.count("*").alias("__n"))
    n_min = counts.agg(F.min("__n").alias("__nmin"))
    ratio = F.col("__nmin") / F.col("__n")
    rate = (
        F.sqrt(ratio) if alpha == 0.5
        else F.lit(1.0) if alpha == 1.0
        else F.pow(ratio, F.lit(1.0 - alpha))
    )
    rates = (
        counts.crossJoin(F.broadcast(n_min))
        .select(F.col(group_col).alias("__grp"), rate.alias("__rate"))
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(1 << 60))
    )
    return (
        df.join(F.broadcast(rates), df[group_col] == F.col("__grp"))
        .where(u < F.col("__rate"))
        .drop("__grp", "__rate")
    )


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    max_size: int | None = None,
) -> DataFrame:
    """Corpus vocabulary with deterministic contiguous ids: tokens
    counted corpus-wide (map-side combined), filtered by `min_count`,
    ranked by (count DESC, token ASC) — the tie-break makes the id
    assignment reproducible — and truncated to `max_size`.

    The ranking is a global row_number, which is exactly the
    operators/batching two-phase problem; vocabularies are count-bounded
    (10^5..10^6 rows), so a declared single-partition rank over the
    aggregate is the honest choice at ANY corpus size — the aggregate,
    not the corpus, bounds the rank input (operators/ranks contract).
    With `max_size` the plan is even tighter: orderBy().limit() compiles
    to TakeOrdered (per-partition top-k + driver merge — no single-
    partition exchange of the full vocabulary) and the rank then sees
    only max_size rows. Returns (token, token_id, count)."""
    from .ranks import bounded_global_rank

    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
        .where(F.col("count") >= min_count)
    )
    order = [F.col("count").desc(), F.col("token")]
    if max_size is not None:
        counts = counts.orderBy(*order).limit(max_size)
    ranked = bounded_global_rank(counts, order, alias="token_id", start=0)
    return ranked.select("token", "token_id", "count")


def bpe_merge_candidates(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 50,
) -> DataFrame:
    """The core BPE-training step (Sennrich et al. 2016): count adjacent
    symbol pairs across the corpus — here the first iteration, where
    symbols are characters, so a pair is a 2-char substring of a word —
    and rank merge candidates by frequency with a deterministic
    (count DESC, pair ASC) tie-break.

    One explode + one groupBy (map-side combined); the top_k selection
    is orderBy().limit() — a TakeOrdered plan (per-partition top-k +
    driver merge), so the full pair vocabulary never moves to a single
    partition — and the rank runs over exactly top_k rows on a declared
    Coalesce(1) (operators/ranks). Returns (pair, count, rank) for the
    top_k candidates."""
    from .ranks import bounded_global_rank

    words = df.select(F.explode(tokens(F.col(text_col))).alias("w")).where(
        F.length("w") >= 2
    )
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    counts = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("count"))
    order = [F.col("count").desc(), F.col("pair")]
    top = counts.orderBy(*order).limit(top_k)
    return bounded_global_rank(top, order, alias="rank").select(
        "pair", "count", "rank"
    )


def apply_bpe_merges(
    df: DataFrame,
    merges: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply learned BPE merge candidates to segment corpus words into
    subword pieces — the inference side of `bpe_merge_candidates`,
    completing the tokenizer loop (train merges -> segment -> score).

    Semantics: the merge-set CLOSURE in one parallel pass. A boundary
    falls between adjacent characters whose pair is NOT in the merge
    set; maximal runs of mergeable pairs become one piece. (Iterated
    BPE differs only in the order ties between overlapping merges
    resolve; the closure is order-free, which is what makes it
    expressible without a sequential loop.)

    Scale: the merge list is bounded by construction (top-k of the
    alphabet-pair vocabulary), so it travels as an array literal in the
    plan — broadcast semantics without a join — and the segmentation is
    entirely built-in higher-order functions (filter/transform/zip_with
    over char positions): JVM-side, no Python, no shuffle beyond the
    explode itself.

    Returns (id, word_pos, piece_pos, piece), positions 0-based."""
    merge_arr = F.array(*[F.lit(m) for m in merges])
    words = df.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("word_pos", "w"),
    ).where(F.length("w") >= 1)
    # boundary after char i when pair (i, i+1) is unmergeable; guard the
    # 1-char case explicitly (F.sequence DESCENDS when end < start)
    bounds = F.when(
        F.length("w") >= 2,
        F.filter(
            F.sequence(F.lit(1), F.length("w") - 1),
            lambda i: ~F.array_contains(merge_arr, F.col("w").substr(i, F.lit(2))),
        ),
    ).otherwise(F.array().cast("array<int>"))
    words = words.withColumn("__b", bounds)
    starts = F.concat(
        F.array(F.lit(1)), F.transform(F.col("__b"), lambda x: x + 1)
    )
    ends = F.concat(F.col("__b"), F.array(F.length("w")))
    pieces = F.zip_with(starts, ends, lambda s, e: F.col("w").substr(s, e - s + 1))
    return words.withColumn("__p", pieces).select(
        F.col(id_col),
        "word_pos",
        F.posexplode("__p").alias("piece_pos", "piece"),
    )


# ---------------------------------------------------------------------------
# unigram LM scoring (CCNet-style quality signal)
# ---------------------------------------------------------------------------

def unigram_logprob_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean negative log2 probability under the corpus's own
    unigram model — the shape of CCNet's LM-perplexity quality filter
    (Wenzek et al. 2020) with the KenLM model replaced by the corpus
    unigram distribution (self-contained, no external model artifact).
    Low score = stereotypical text, high = unusual token mix.

    Two aggregates: global token counts (map-side combined), then a
    broadcast join of the (small) vocabulary back onto the per-doc token
    stream and one mean per doc. The vocabulary of a 100 TB corpus is
    still broadcast-sized (counts, not text); if it ever were not,
    the same plan works as a shuffle join on the token.

    Returns (id, n_tokens, mean_neg_log2p) rounded to 6 decimals."""
    toks = df.select(
        F.col(id_col).alias("doc"), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    totals = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    corpus_n = totals.agg(F.sum("tf").cast("double").alias("N"))
    scored = (
        toks.join(F.broadcast(totals), "tok")
        .crossJoin(F.broadcast(corpus_n))
        .select(
            "doc",
            (-F.log2(F.col("tf").cast("double") / F.col("N"))).alias("__nlp"),
        )
    )
    return scored.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("__nlp"), 6).alias("mean_neg_log2p"),
    ).select(F.col("doc").alias(id_col), "n_tokens", "mean_neg_log2p")


def bigram_logprob_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean negative log2 of the corpus-self BIGRAM model:
    -log2 P(w_i | w_{i-1}) with P = c(w_{i-1} w_i) / c_ctx(w_{i-1}),
    averaged over a doc's bigram positions — one order of context up
    from unigram_logprob_scores, the next rung toward CCNet's KenLM
    filter. The model is trained on the scored corpus itself, so every
    document bigram has a nonzero count (no smoothing needed); docs
    with fewer than 2 tokens score NULL (no bigram positions).

    Context counts come from the bigram table (sum over following
    tokens), NOT a separate unigram pass — so P is a proper conditional
    that sums to 1 over the vocabulary for every context.

    Shapes: one groupBy for bigram counts, a derived context rollup,
    one join back onto the per-doc bigram stream (broadcast while the
    bigram vocabulary fits — counts, not text; shuffle join otherwise),
    one mean per doc. Rounded to 6 decimals like the unigram face."""
    toks = tokens(F.col(text_col))
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.get(toks, i - 1), F.get(toks, i)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    stream = df.select(
        F.col(id_col).alias("doc"), F.explode(bigrams).alias("bg")
    )
    b_counts = stream.groupBy("bg").agg(F.count(F.lit(1)).alias("bc"))
    ctx = (
        b_counts.select(
            F.substring_index(F.col("bg"), " ", 1).alias("ctx"), "bc"
        )
        .groupBy("ctx")
        .agg(F.sum("bc").alias("cc"))
    )
    scored = (
        stream.join(F.broadcast(b_counts), "bg")
        .join(
            F.broadcast(ctx),
            F.substring_index(F.col("bg"), " ", 1) == F.col("ctx"),
        )
        .select(
            "doc",
            (-F.log2(F.col("bc").cast("double") / F.col("cc"))).alias("__nlp"),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc"))
        .join(
            scored.groupBy("doc").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
                F.round(F.avg("__nlp"), 6).alias("mean_neg_log2p"),
            ),
            "doc",
            "left",
        )
        .select(
            F.col("doc").alias(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
            "mean_neg_log2p",
        )
    )


def interpolated_logprob_scores(
    df: DataFrame,
    lam: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Jelinek–Mercer interpolated LM — the smoothing step between the
    corpus-self bigram and unigram models:

        P(w_i | w_{i-1}) = lam * P_bi(w_i | w_{i-1}) + (1-lam) * P_uni(w_i)

    scored as the per-doc mean of -log2 P over bigram positions. With
    both components trained on the scored corpus itself the bigram is
    never zero, but interpolation still matters: it damps the
    overconfidence of rare contexts (a count-1 context gives its only
    continuation P_bi = 1), which is exactly why production KenLM
    filters smooth. Same certification recipe as the other LM faces
    (round 6 on the mean)."""
    if not (0.0 <= lam <= 1.0):
        raise ValueError(f"lam must be in [0, 1]: {lam}")
    toks = tokens(F.col(text_col))
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.get(toks, i - 1), F.get(toks, i)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    stream = df.select(
        F.col(id_col).alias("doc"), F.explode(bigrams).alias("bg")
    ).withColumn("w", F.substring_index(F.col("bg"), " ", -1))
    b_counts = stream.groupBy("bg").agg(F.count(F.lit(1)).alias("bc"))
    ctx = (
        b_counts.select(
            F.substring_index(F.col("bg"), " ", 1).alias("ctx"), "bc"
        )
        .groupBy("ctx")
        .agg(F.sum("bc").alias("cc"))
    )
    uni = df.select(F.explode(tokens(F.col(text_col))).alias("w")).groupBy(
        "w"
    ).agg(F.count(F.lit(1)).alias("tf"))
    n_tok = uni.agg(F.sum("tf").cast("double").alias("N"))
    p_bi = F.col("bc").cast("double") / F.col("cc")
    p_uni = F.col("tf").cast("double") / F.col("N")
    scored = (
        stream.join(F.broadcast(b_counts), "bg")
        .join(
            F.broadcast(ctx),
            F.substring_index(F.col("bg"), " ", 1) == F.col("ctx"),
        )
        .join(F.broadcast(uni), "w")
        .crossJoin(F.broadcast(n_tok))
        .select(
            "doc",
            (-F.log2(F.lit(lam) * p_bi + F.lit(1.0 - lam) * p_uni)).alias(
                "__nlp"
            ),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc"))
        .join(
            scored.groupBy("doc").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
                F.round(F.avg("__nlp"), 6).alias("mean_neg_log2p"),
            ),
            "doc",
            "left",
        )
        .select(
            F.col("doc").alias(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
            "mean_neg_log2p",
        )
    )


# ---------------------------------------------------------------------------
# deterministic global shuffle + training shards
# ---------------------------------------------------------------------------

def assign_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    salt: str = "shard-v1",
) -> DataFrame:
    """Deterministic shard + within-shard shuffle key per row: the
    md5-derived 60-bit projection of (salt, id) gives a uniform,
    engine-portable placement (same family as text.fingerprint_num);
    ordering shards by `shuffle_key` is a reproducible global shuffle —
    what a training run needs so every re-run reads examples in the same
    pseudo-random order without a true (non-deterministic) shuffle."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    return df.select(
        "*",
        F.pmod(h, F.lit(n_shards)).cast("int").alias("shard"),
        h.alias("shuffle_key"),
    )


def write_training_shards(
    df: DataFrame, path: str, id_col: str = "doc_id", n_shards: int = 8
) -> None:
    """Materialize shard-partitioned parquet: one directory per shard,
    rows clustered by shuffle_key inside each file so a sequential read
    IS the shuffled order. repartition on the shard column co-locates
    each shard into one task before the partitioned write."""
    sharded = assign_shards(df, id_col, n_shards)
    # sort key starts with the partition column so the partitioned writer's
    # required ordering is already satisfied and it does NOT re-sort (a
    # writer-side sort on `shard` alone would scramble shuffle_key order)
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shuffle_key")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
