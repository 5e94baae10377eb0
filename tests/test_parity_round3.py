"""Tests for round-3 Datomic-parity surfaces: d/index-range, entity
specs (:db/ensure), composite tuples (:db/tupleAttrs), :db/excise."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mbrainz_importer_spark.plans.eav import build_datoms, index_range
from mbrainz_importer_spark.plans.history import as_of, excise, retract_entity
from mbrainz_importer_spark.plans.specs import (
    EntitySpec,
    EntitySpecError,
    ensure_entities,
    spec_violations,
)
from mbrainz_importer_spark.plans.tuples import (
    assert_tuple_unique,
    tuple_duplicates,
    upsert_by_tuple,
    with_composite,
)


def _people(spark):
    return spark.createDataFrame(
        [(1, "ann", 10.0), (2, "bob", -5.0), (3, None, 3.0)],
        "id long, name string, score double",
    )


# -- d/index-range ----------------------------------------------------------

def test_index_range_half_open(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "id long, score double"
    )
    datoms = build_datoms({"t": (df, "id")})
    rows = index_range(datoms, ":t/score", start=3.0, end=7.0, numeric=True).collect()
    assert [r["v_num"] for r in rows] == [3.0, 4.0, 5.0, 6.0]  # end exclusive


def test_index_range_open_ends(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 9.0)], "id long, score double")
    datoms = build_datoms({"t": (df, "id")})
    assert index_range(datoms, ":t/score", numeric=True).count() == 2
    assert index_range(datoms, ":t/score", start=6.0, numeric=True).count() == 1
    assert index_range(datoms, ":t/score", end=6.0, numeric=True).count() == 1


# -- entity specs -----------------------------------------------------------

def _spec():
    return EntitySpec(
        name="person",
        required=("name",),
        preds=(("score-nonneg", F.col("score") >= 0),),
    )


def test_spec_violations_rows(spark):
    out = {
        (r["entity"], r["check"]): r["kind"]
        for r in spec_violations(_people(spark), "id", _spec()).collect()
    }
    assert out == {(3, "name"): "required", (2, "score-nonneg"): "pred"}


def test_ensure_entities_raises_and_passes(spark):
    with pytest.raises(EntitySpecError, match="person"):
        ensure_entities(_people(spark), "id", _spec())
    clean = _people(spark).where(F.col("id") == 1)
    assert ensure_entities(clean, "id", _spec()).count() == 1


def test_spec_requires_checks(spark):
    with pytest.raises(ValueError, match="no checks"):
        spec_violations(_people(spark), "id", EntitySpec(name="empty"))


# -- composite tuples -------------------------------------------------------

def test_composite_null_distinct_from_empty(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", "")], "id long, x string, y string"
    )
    vals = {r["id"]: r["t"] for r in with_composite(df, "t", ["x", "y"]).collect()}
    assert vals[1] != vals[2]


def test_tuple_duplicates_and_assert(spark):
    df = spark.createDataFrame(
        [(1, "a", 1), (2, "a", 1), (3, "a", 2)], "id long, x string, y int"
    )
    dups = tuple_duplicates(df, ["x", "y"]).collect()
    assert len(dups) == 1 and dups[0]["n_rows"] == 2
    with pytest.raises(ValueError, match="not unique"):
        assert_tuple_unique(df, ["x", "y"])
    assert_tuple_unique(df.where(F.col("id") != 2), ["x", "y"])


def test_upsert_by_tuple_merges_on_composite(spark):
    target = spark.createDataFrame(
        [("a", 1, 10.0), ("b", 2, 20.0)], "x string, y int, score double"
    )
    updates = spark.createDataFrame(
        [("a", 1, 99.0), ("c", 3, 30.0)], "x string, y int, score double"
    )
    out = {(r["x"], r["y"]): r["score"] for r in upsert_by_tuple(target, updates, ["x", "y"]).collect()}
    assert out == {("a", 1): 99.0, ("b", 2): 20.0, ("c", 3): 30.0}


# -- excision ---------------------------------------------------------------

def _log(spark):
    return spark.createDataFrame(
        [
            ("u:1", ":a", 1.0, 1, True),
            ("u:1", ":b", 2.0, 2, True),
            ("u:2", ":a", 9.0, 3, True),
        ],
        "e string, a string, v_num double, tx long, added boolean",
    )


def test_excise_erases_history_unlike_retract(spark):
    log = _log(spark)
    # retraction: entity visible as-of BEFORE the retraction tx
    retracted = retract_entity(log, "u:1", tx=10)
    assert as_of(retracted, 5).where(F.col("e") == "u:1").count() == 2
    assert as_of(retracted, 10).where(F.col("e") == "u:1").count() == 0
    # excision: gone at EVERY time (no filter needed — the audit datom
    # lives on a fresh excision entity, never the excised id)
    excised = excise(log, "u:1", tx=10)
    assert as_of(excised, 5).where(F.col("e") == "u:1").count() == 0
    assert as_of(excised, 10).where(F.col("e") == "u:1").count() == 0
    audit = excised.where(F.col("a") == ":db/excise").collect()
    assert len(audit) == 1 and audit[0]["e"] == "db.excise:u:1:10" and audit[0]["tx"] == 10
    # other entities untouched
    assert as_of(excised, 2).where(F.col("e") == "u:2").count() == 0
    assert as_of(excised, 3).where(F.col("e") == "u:2").count() == 1


def test_excise_attr_and_before_scopes(spark):
    """:db.excise/attrs erases only the named attrs; :db.excise/beforeT
    erases only pre-cutoff datoms; both leave the rest of the entity's
    history intact."""
    log = _log(spark)
    # attrs scope: :a gone at every time, :b keeps its history
    by_attr = excise(log, "u:1", tx=10, attrs={":a"})
    assert by_attr.where((F.col("e") == "u:1") & (F.col("a") == ":a")).count() == 0
    assert as_of(by_attr, 5).where(
        (F.col("e") == "u:1") & (F.col("a") == ":b")).count() == 1
    # before scope: only the tx<2 datom erased, the tx=2 one survives
    by_time = excise(log, "u:1", tx=10, before=2)
    assert by_time.where((F.col("e") == "u:1") & (F.col("a") == ":a")).count() == 0
    assert by_time.where((F.col("e") == "u:1") & (F.col("a") == ":b")).count() == 1
    # composed: old values of one attr only
    both = excise(log, "u:1", tx=10, attrs={":b"}, before=2)
    assert both.where(F.col("e") == "u:1").count() == 2  # nothing matched
    # audit datom present in every scope
    for out in (by_attr, by_time, both):
        assert out.where(F.col("a") == ":db/excise").count() == 1


# -- component cascade retraction ------------------------------------------

def test_retract_entity_cascade_components(spark):
    from mbrainz_importer_spark.plans.history import retract_entity_cascade

    log = spark.createDataFrame(
        [
            # release owns medium (component); medium owns track (component);
            # release also REFERENCES artist (plain ref, must survive)
            ("rel:1", ":release/name", "X", 1, True),
            ("rel:1", ":release/media", "med:1", 1, True),
            ("rel:1", ":release/artist", "art:1", 1, True),
            ("med:1", ":medium/format", "CD", 1, True),
            ("med:1", ":medium/tracks", "trk:1", 1, True),
            ("trk:1", ":track/name", "t", 1, True),
            ("art:1", ":artist/name", "A", 1, True),
        ],
        "e string, a string, v string, tx long, added boolean",
    )
    comp = {":release/media", ":medium/tracks"}
    out = retract_entity_cascade(log, "rel:1", tx=9, component_attrs=comp, value_col="v")
    state = as_of(out, 9, value_col="v")
    gone = {"rel:1", "med:1", "trk:1"}
    assert state.where(F.col("e").isin(list(gone))).count() == 0
    # the referenced (non-component) artist survives
    assert state.where(F.col("e") == "art:1").count() == 1
    # pre-cascade history is intact
    assert as_of(out, 1, value_col="v").where(F.col("e") == "trk:1").count() == 1


def test_unigram_lm_scores_basic(spark):
    from mbrainz_importer_spark.operators.curation import unigram_logprob_scores

    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "a a a b")], "doc_id long, text string"
    )
    # corpus: a x7, b x1, N=8 -> p(a)=7/8, p(b)=1/8
    import math
    out = {r["doc_id"]: r for r in unigram_logprob_scores(df).collect()}
    exp_a = -math.log2(7 / 8)
    exp_doc2 = (3 * exp_a + (-math.log2(1 / 8))) / 4
    assert abs(out[1]["mean_neg_log2p"] - round(exp_a, 6)) < 1e-6
    assert abs(out[2]["mean_neg_log2p"] - round(exp_doc2, 6)) < 1e-6
    assert out[2]["n_tokens"] == 4


# -- attribute-partitioned datom store --------------------------------------

def test_materialized_datoms_partition_pruning(spark, tmp_path):
    """The 100 TB storage shape: datoms partitioned by attribute; an
    attribute-constrained scan is partition-pruned (PartitionFilters on
    `a`), and values round-trip exactly — including ':' and '/' in the
    hive-escaped directory names."""
    from mbrainz_importer_spark.plans.eav import materialize_datoms, read_datoms

    df = spark.createDataFrame(
        [(1, "x", 2.5), (2, "y", 7.0)], "id long, name string, score double"
    )
    datoms = build_datoms({"t": (df, "id")})
    path = str(tmp_path / "datom_store")
    materialize_datoms(datoms, path)

    back = read_datoms(spark, path)
    assert back.count() == datoms.count()

    one_attr = back.where(F.col("a") == ":t/score")
    rows = {(r["e"], r["v_num"]) for r in one_attr.collect()}
    assert rows == {("t:1", 2.5), ("t:2", 7.0)}
    plan = one_attr._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and ":t/score" in plan


# -- seek-datoms / bpe / centroids ------------------------------------------

def test_seek_datoms_resumes_not_filters(spark):
    from mbrainz_importer_spark.plans.eav import seek_datoms

    df = spark.createDataFrame(
        [(1, "alpha", 5.0), (2, "echo", 6.0)], "id long, name string, score double"
    )
    datoms = build_datoms({"t": (df, "id")})
    # start mid-way through :t/name: picks up 'echo' (>= 'c') AND every
    # later attribute (:t/score), but NOT earlier ones (:t/id, 'alpha')
    rows = seek_datoms(datoms, "avet", (":t/name", "c")).collect()
    seen = [(r["a"], r["v"]) for r in rows]
    assert (":t/name", "echo") in seen
    assert (":t/name", "alpha") not in seen
    assert (":t/id", "1") not in seen
    assert (":t/score", "5") in seen and (":t/score", "6") in seen
    with pytest.raises(ValueError, match="longer than index"):
        seek_datoms(datoms, "avet", ("a", "b", "c", "d"))


def test_bpe_merge_candidates_counts(spark):
    from mbrainz_importer_spark.operators.curation import bpe_merge_candidates

    df = spark.createDataFrame([(1, "abab ab cd")], "doc_id long, text string")
    # words: abab -> pairs ab, ba, ab ; ab -> ab ; cd -> cd
    out = {r["pair"]: (r["count"], r["rank"]) for r in bpe_merge_candidates(df).collect()}
    assert out["ab"] == (3, 1)
    assert out["ba"][0] == 1 and out["cd"][0] == 1
    # deterministic tie-break: ba before cd alphabetically
    assert out["ba"][1] == 2 and out["cd"][1] == 3


def test_label_centroids_long_form(spark):
    from mbrainz_importer_spark.operators.similarity import label_centroids

    df = spark.createDataFrame(
        [(1, [1.0, 3.0], 7), (2, [3.0, 5.0], 7), (3, [10.0, 0.0], 8)],
        "vec_id long, embedding array<float>, label int",
    )
    out = {(r["label"], r["dim"]): r["centroid_val"] for r in label_centroids(df).collect()}
    assert out == {(7, 0): 2.0, (7, 1): 4.0, (8, 0): 10.0, (8, 1): 0.0}
