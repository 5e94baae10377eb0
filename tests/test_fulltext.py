"""Fulltext operator tests — the :db/fulltext true analog
(subsets/entities/schema.edn:37 flags artist/name; Datomic queries it via
(fulltext $ :artist/name ?q) returning entity/value/score tuples)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mbrainz_importer_spark.operators.fulltext import (
    build_fulltext_index,
    fulltext_bm25_topk,
    fulltext_search,
    fulltext_tfidf_topk,
    fulltext_topk,
    query_terms,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "quick quick brown cats"),
        (3, "slow green turtle"),
        (4, "QUICK Brown FOX"),  # case-insensitive match
        (5, ""),  # empty doc indexes nothing
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


@pytest.fixture(scope="module")
def index(corpus):
    return build_fulltext_index(corpus, "doc_id", "text").cache()


def test_index_shape_and_tf(index):
    got = {(r["term"], r["doc"]): r["tf"] for r in index.collect()}
    assert got[("quick", 2)] == 2  # term frequency counted
    assert got[("the", 1)] == 2
    assert ("quick", 4) in got  # lowercased
    assert not any(doc == 5 for (_, doc) in got)  # empty doc absent
    assert not any(term == "" for (term, _) in got)


def test_and_search(index):
    out = {r["doc"]: (r["n_matched"], r["score"])
           for r in fulltext_search(index, "quick brown", mode="all").collect()}
    # docs 1, 2, 4 contain both; doc 3 neither
    assert set(out) == {1, 2, 4}
    assert out[2] == (2, 3)  # quick*2 + brown*1
    assert out[1] == (2, 2)


def test_any_search(index):
    out = {r["doc"] for r in
           fulltext_search(index, "turtle fox", mode="any").collect()}
    assert out == {1, 3, 4}


def test_topk_deterministic_order(index):
    rows = fulltext_topk(index, "quick brown the", k=2, mode="any").collect()
    # doc 2 scores 3; docs 1 (the*2+quick+brown=4)... compute: doc1 terms
    # the(2)+quick(1)+brown(1)=4, doc2 quick(2)+brown(1)=3, doc4=2
    assert [(r["doc"], r["score"]) for r in rows] == [(1, 4), (2, 3)]


def test_tfidf_rare_term_outranks_common(index):
    """N=4 indexed docs; df(turtle)=1, df(fox)=2 -> idf_scaled 4000 vs
    2000, so the single turtle doc outranks the fox docs; equal scores
    tie-break on doc asc."""
    rows = fulltext_tfidf_topk(index, "fox turtle", k=3, mode="any").collect()
    assert [(r["doc"], r["score"]) for r in rows] == [
        (3, 4000), (1, 2000), (4, 2000),
    ]


def test_tfidf_all_mode_and_tf_weighting(index):
    # df(quick)=df(brown)=3 -> idf_scaled = 4000 // 3 = 1333
    rows = fulltext_tfidf_topk(index, "quick brown", k=5, mode="all").collect()
    assert [(r["doc"], r["score"]) for r in rows] == [
        (2, 3 * 1333), (1, 2 * 1333), (4, 2 * 1333),
    ]
    with pytest.raises(ValueError):
        fulltext_tfidf_topk(index, "x", k=1, mode="fuzzy")


def test_bm25_length_normalization_exact(index):
    """Quantized BM25, hand-computed: N=4 docs, total=19 tokens,
    df(quick)=3 -> idf_scaled=1333; den = 20·tf + 6 + (18·dl·N)//total.
    doc2 (tf=2, dl=4): (1333·44·2)//61 = 1923; doc4 (tf=1, dl=3):
    58652//37 = 1585; doc1 (tf=1, dl=9): 58652//60 = 977 — same tf in a
    SHORTER doc scores higher (doc4 > doc1), the BM25 property."""
    rows = fulltext_bm25_topk(index, "quick", k=5, mode="any").collect()
    assert [(r["doc"], r["score"]) for r in rows] == [
        (2, 1923), (4, 1585), (1, 977),
    ]
    with pytest.raises(ValueError):
        fulltext_bm25_topk(index, "x", k=1, mode="fuzzy")


def test_query_terms_normalization():
    assert query_terms("  Brown QUICK brown ") == ["brown", "quick"]
    with pytest.raises(ValueError):
        query_terms("   ")
    with pytest.raises(ValueError):
        fulltext_search(None, "x", mode="fuzzy")


def test_bucketed_postings_prune_and_no_term_exchange(spark, corpus):
    """The 100 TB postings shape: term-bucketed storage bucket-prunes a
    search's scan to the query terms' buckets, and per-term aggregates
    (tf-idf's df counts) need no Exchange."""
    from pyspark.sql import functions as F

    from mbrainz_importer_spark.operators.fulltext import (
        write_fulltext_index_bucketed,
    )
    from mbrainz_importer_spark.sources.bucketed import (
        count_exchanges,
        physical_plan,
    )

    idx = build_fulltext_index(corpus, "doc_id", "text")
    write_fulltext_index_bucketed(idx, "b_postings", n_buckets=8)
    try:
        bucketed = spark.table("b_postings")
        # same search results through the bucketed store
        out = {r["doc"]: r["score"]
               for r in fulltext_search(bucketed, "quick brown", mode="all").collect()}
        assert out == {1: 2, 2: 3, 4: 2}
        # per-term agg (idf's df counts): the bucketed scan kicks in
        # (groupBy(term) consumes the buckets' hashpartitioning), the
        # term filter BUCKET-PRUNES the scan, and no Exchange is planned
        dfreq = (
            bucketed.where(F.col("term").isin(["quick", "brown"]))
            .groupBy("term")
            .agg(F.count_distinct("doc").alias("df"))
        )
        dfreq.count()
        plan = physical_plan(dfreq)
        assert "SelectedBucketsCount" in plan, plan
        assert count_exchanges(dfreq) == 0, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS b_postings")


def test_artist_name_fulltext(spark):
    """Parity shape with the reference's fulltext attributes: search
    artist/name the way (fulltext $ :artist/name "jimi") would."""
    artists = spark.createDataFrame(
        [("g1", "The Jimi Hendrix Experience"),
         ("g2", "Jimi Tenor"),
         ("g3", "Billy Cobham")],
        "gid string, name string",
    )
    idx = build_fulltext_index(artists, "gid", "name")
    hits = fulltext_search(idx, "jimi", mode="all")
    assert sorted(r["doc"] for r in hits.collect()) == ["g1", "g2"]
