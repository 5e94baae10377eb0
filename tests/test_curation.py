"""Unit tests for operators/curation.py (PII redaction, span dedup,
sequence packing, decontamination, sharding) and batching.stable_cumsum."""

from __future__ import annotations

from pyspark.sql import functions as F

from mbrainz_importer_spark.operators import curation as C
from mbrainz_importer_spark.operators.batching import stable_cumsum


def test_redact_pii_all_categories(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "server at 192.168.0.1 up"),
            (3, "ssn 123-45-6789 leaked"),
            (4, "call 555-867-5309 today"),
            (5, "nothing sensitive here"),
        ],
        "id long, text string",
    )
    out = {r["id"]: r for r in C.with_pii_redaction(df).collect()}
    assert out[1]["text_redacted"] == "mail <EMAIL> now"
    assert out[2]["text_redacted"] == "server at <IP> up"
    assert out[3]["text_redacted"] == "ssn <SSN> leaked"
    assert out[4]["text_redacted"] == "call <PHONE> today"
    assert out[5]["text_redacted"] == "nothing sensitive here"
    assert out[1]["has_email"] and not out[1]["has_ip"]
    assert out[3]["has_ssn"] and not out[3]["has_phone"]
    assert not any(
        out[5][f] for f in ("has_email", "has_ip", "has_ssn", "has_phone")
    )


def test_redact_pii_ssn_not_phone(spark):
    # SSN shape must win over the phone shape (pattern order pinned)
    df = spark.createDataFrame([(1, "id 123-45-6789 and 123-456-7890")], "id long, text string")
    row = C.with_pii_redaction(df).collect()[0]
    assert row["text_redacted"] == "id <SSN> and <PHONE>"


def test_dedup_spans_first_occurrence_wins(spark):
    # span size 2; doc 1 and doc 2 share the span "a b"; doc 2 keeps only
    # its non-duplicate tail, doc 3 is entirely a repeat and drops out.
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b x y"), (3, "a b")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in C.dedup_spans(df, span_tokens=2).collect()}
    assert out[1]["text_deduped"] == "a b c d"
    assert out[1]["spans_kept"] == 2 and out[1]["spans_total"] == 2
    assert out[2]["text_deduped"] == "x y"
    assert out[2]["spans_kept"] == 1 and out[2]["spans_total"] == 2
    assert 3 not in out


def test_dedup_spans_within_doc_repeat(spark):
    # the same span repeated inside one doc keeps only the earliest position
    df = spark.createDataFrame([(7, "p q p q")], "doc_id long, text string")
    row = C.dedup_spans(df, span_tokens=2).collect()[0]
    assert row["text_deduped"] == "p q"
    assert row["spans_kept"] == 1 and row["spans_total"] == 2


def test_stable_cumsum_matches_serial(spark):
    rows = [(i, (i * 7) % 13 + 1) for i in range(1, 501)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(8)
    got = {
        r["k"]: r["c"]
        for r in stable_cumsum(df, ["k"], "v", out_col="c").collect()
    }
    acc = 0
    for k, v in rows:
        acc += v
        assert got[k] == acc


def test_pack_sequences_chunking(spark):
    # 3 docs of 5/3/4 tokens, capacity 6: offsets 0,5,8; doc 1 in pack 0,
    # doc 2 spans packs 0-1 (tokens 5..7), doc 3 packs 1 (8..11).
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "f g h"), (3, "i j k l")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in C.pack_sequences(df, capacity=6).collect()}
    assert (out[1]["start_offset"], out[1]["first_pack"], out[1]["last_pack"]) == (0, 0, 0)
    assert (out[2]["start_offset"], out[2]["first_pack"], out[2]["last_pack"]) == (5, 0, 1)
    assert out[2]["n_packs_spanned"] == 2
    assert (out[3]["start_offset"], out[3]["first_pack"], out[3]["last_pack"]) == (8, 1, 1)


def test_ngram_contamination_overlap(spark):
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "totally novel words here")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox ran")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in C.ngram_contamination(corpus, bench, n=3).collect()}
    # doc 1 shares the trigram "quick brown fox"; doc 2 shares nothing
    assert out[1]["n_contaminated"] == 1
    assert out[1]["n_shingles"] == 3
    assert abs(out[1]["contamination_frac"] - 1 / 3) < 1e-5
    assert 2 not in out


def test_assign_shards_deterministic_and_balanced(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: (r["shard"], r["shuffle_key"]) for r in C.assign_shards(df, n_shards=8).collect()}
    b = {r["doc_id"]: (r["shard"], r["shuffle_key"]) for r in C.assign_shards(df, n_shards=8).collect()}
    assert a == b
    counts = {}
    for shard, _ in a.values():
        counts[shard] = counts.get(shard, 0) + 1
    assert set(counts) == set(range(8))
    assert max(counts.values()) < 2 * min(counts.values())


def test_write_training_shards_layout(spark, tmp_path):
    df = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    path = str(tmp_path / "shards")
    C.write_training_shards(df, path, n_shards=4)
    back = spark.read.parquet(path)
    assert back.count() == 300
    assert back.select("shard").distinct().count() == 4
    # shard dirs exist on disk (partitioned layout a loader can glob)
    one = spark.read.parquet(f"{path}/shard=0")
    assert one.count() > 0
    # within a shard file, rows are clustered by shuffle_key (read order IS
    # the shuffled order)
    keys = [r["shuffle_key"] for r in one.select("shuffle_key").collect()]
    assert keys == sorted(keys)


def test_weighted_mixture_sample_rates(spark):
    rows = [(i, "s_half" if i % 2 == 0 else "s_all") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = C.weighted_mixture_sample(df, {"s_all": 1.0, "s_half": 0.5}).collect()
    by_src = {}
    for r in out:
        by_src[r["source"]] = by_src.get(r["source"], 0) + 1
    assert by_src["s_all"] == 2000           # weight 1.0 keeps everything
    assert 800 <= by_src["s_half"] <= 1200   # ~50% of 2000, md5-uniform
    # deterministic: identical second run
    again = C.weighted_mixture_sample(df, {"s_all": 1.0, "s_half": 0.5}).collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in out}
    # unlisted source -> dropped entirely
    assert C.weighted_mixture_sample(df, {"s_all": 1.0}).where(
        F.col("source") == "s_half"
    ).count() == 0
    import pytest as _pytest
    with _pytest.raises(ValueError, match="must be in"):
        C.weighted_mixture_sample(df, {"s_all": 1.5})


def test_build_vocab_deterministic_ids(spark):
    df = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a c c")], "doc_id long, text string"
    )
    # counts: a=3, b=3, c=3 -> tie-break by token asc: a=0, b=1, c=2
    out = {r["token"]: (r["token_id"], r["count"]) for r in C.build_vocab(df).collect()}
    assert out == {"a": (0, 3), "b": (1, 3), "c": (2, 3)}
    top2 = C.build_vocab(df, max_size=2).collect()
    assert sorted(r["token"] for r in top2) == ["a", "b"]
    assert C.build_vocab(df, min_count=4).count() == 0


def test_apply_bpe_merges_closure(spark):
    # merges {ab, bc}: "abcd" -> runs: ab,bc mergeable, cd not => "abc","d";
    # "xaby" -> xa? no; ab yes; by no => "x","ab","y"; 1-char word intact
    df = spark.createDataFrame([(1, "abcd xaby z")], "doc_id long, text string")
    out = C.apply_bpe_merges(df, ["ab", "bc"]).collect()
    got = {}
    for r in out:
        got.setdefault(r["word_pos"], []).append((r["piece_pos"], r["piece"]))
    assert [p for _, p in sorted(got[0])] == ["abcd"[:3], "d"]
    assert [p for _, p in sorted(got[1])] == ["x", "ab", "y"]
    assert [p for _, p in sorted(got[2])] == ["z"]


def test_apply_bpe_merges_roundtrip_and_lm(spark):
    """Pieces reassemble to the exact words (no char lost/duplicated),
    and the subword stream feeds unigram LM scoring — the tokenizer
    loop the training-data brief implies."""
    df = spark.createDataFrame(
        [(1, "the theme there"), (2, "other anthem")], "doc_id long, text string"
    )
    merges = [r["pair"] for r in C.bpe_merge_candidates(df, top_k=10).collect()]
    seg = C.apply_bpe_merges(df, merges)
    rebuilt = (
        seg.groupBy("doc_id", "word_pos")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("piece_pos", "piece"))
                    ),
                    lambda s: s["piece"],
                ),
            ).alias("w")
        )
    )
    words = {(r["doc_id"], r["word_pos"]): r["w"] for r in rebuilt.collect()}
    expect = {}
    for doc_id, text in [(1, "the theme there"), (2, "other anthem")]:
        for i, w in enumerate(text.split()):
            expect[(doc_id, i)] = w
    assert words == expect

    subword_docs = (
        seg.groupBy("doc_id")
        .agg(F.concat_ws(" ", F.collect_list("piece")).alias("text"))
    )
    scores = C.unigram_logprob_scores(subword_docs, "doc_id", "text").collect()
    assert len(scores) == 2 and all(r["mean_neg_log2p"] > 0 for r in scores)


def test_temperature_mixture_sample(spark):
    """alpha=0.5: rate_i = sqrt(n_min/n_i) — the smallest source keeps
    everything, a 4x-larger source keeps ~half; alpha=1 is the natural
    distribution (all rows); bad alpha raises."""
    rows = [(i, "small" if i < 1000 else "big") for i in range(5000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    out = C.temperature_mixture_sample(df, alpha=0.5).collect()
    by_src = {}
    for r in out:
        by_src[r["source"]] = by_src.get(r["source"], 0) + 1
    assert by_src["small"] == 1000                 # rate 1.0
    assert 1700 <= by_src["big"] <= 2300           # sqrt(1000/4000)=0.5 of 4000

    # determinism: same kept set on a second run
    again = C.temperature_mixture_sample(df, alpha=0.5).collect()
    assert sorted(r["doc_id"] for r in again) == sorted(r["doc_id"] for r in out)

    assert C.temperature_mixture_sample(df, alpha=1.0).count() == 5000

    # generic alpha flattens less than 0.5 (rate between sqrt and 1)
    n_07 = C.temperature_mixture_sample(df, alpha=0.7).count()
    assert len(out) < n_07 < 5000

    import pytest as _pytest
    with _pytest.raises(ValueError, match="alpha"):
        C.temperature_mixture_sample(df, alpha=0.0)


def test_bigram_logprob_scores(spark):
    """Corpus-self bigram model: P(b|a) from bigram/context counts;
    sub-2-token docs score null with 0 bigrams."""
    import math

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c"), (3, "solo")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in C.bigram_logprob_scores(df).collect()}
    # corpus bigrams: doc1 -> (a b), (b a), (a b); doc2 -> (a c)
    # c(a b)=2, c(b a)=1, c(a c)=1; ctx a=3, b=1
    # doc1 mean = (-log2(2/3) - log2(1/1) - log2(2/3)) / 3
    want1 = round((2 * -math.log2(2 / 3)) / 3, 6)
    assert out[1]["n_bigrams"] == 3
    assert abs(out[1]["mean_neg_log2p"] - want1) < 1e-9
    # doc2: single bigram (a c): -log2(1/3)
    assert out[2]["n_bigrams"] == 1
    assert abs(out[2]["mean_neg_log2p"] - round(math.log2(3), 6)) < 1e-9
    # doc3: one token, no bigrams
    assert out[3]["n_bigrams"] == 0 and out[3]["mean_neg_log2p"] is None


def test_interpolated_logprob_scores(spark):
    """JM smoothing: lam=1 equals the pure bigram face; lam must damp a
    count-1 context's P_bi=1 certainty (score > 0 where bigram gives 0)."""
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id long, text string"
    )
    pure = {r["doc_id"]: r["mean_neg_log2p"]
            for r in C.bigram_logprob_scores(df).collect()}
    lam1 = {r["doc_id"]: r["mean_neg_log2p"]
            for r in C.interpolated_logprob_scores(df, lam=1.0).collect()}
    assert lam1 == pure

    # doc with a unique context: bigram alone is overconfident
    df2 = spark.createDataFrame(
        [(1, "x y"), (2, "z w")], "doc_id long, text string"
    )
    bi = {r["doc_id"]: r["mean_neg_log2p"]
          for r in C.bigram_logprob_scores(df2).collect()}
    jm = {r["doc_id"]: r["mean_neg_log2p"]
          for r in C.interpolated_logprob_scores(df2, lam=0.75).collect()}
    assert bi[1] == 0.0          # P_bi(y|x) = 1 -> -log2(1) = 0
    assert jm[1] > 0.0           # smoothing injects unigram mass

    import pytest as _pytest
    with _pytest.raises(ValueError, match="lam"):
        C.interpolated_logprob_scores(df, lam=1.5)
