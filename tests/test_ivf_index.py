"""Materialized IVF index + incremental maintenance (operators/ann.py:
materialize_ivf_index / merge_ivf_increment / ivf_topk_from_index) —
the inverted-list storage face of the IVF ANN path: probes read only
their cells' partitions; arrivals fold into only the cells they land
in."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from mbrainz_importer_spark.operators.ann import (
    ivf_topk,
    ivf_topk_from_index,
    materialize_ivf_index,
    merge_ivf_increment,
    read_ivf_index,
)

# two tight, well-separated clusters: ids 0-9 near (1,0,0), 10-19 near
# (0,1,0) — centroids at the prototypes make assignment unambiguous
CENTROIDS = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]


def _vec(i: int) -> list[float]:
    if i < 10:
        return [1.0, 0.01 * i, 0.0]
    return [0.01 * (i - 10), 1.0, 0.0]


def _corpus(spark, ids):
    return spark.createDataFrame(
        [(i, _vec(i)) for i in ids], "vec_id long, embedding array<double>"
    )


def _topk_rows(df):
    return sorted(tuple(r) for r in df.select("qid", "nid", "rank").collect())


def test_index_matches_inline_assignment_and_prunes(spark, tmp_path):
    path = str(tmp_path / "ivf")
    corpus = _corpus(spark, range(20))
    materialize_ivf_index(corpus, CENTROIDS, path)
    queries = _corpus(spark, [0, 10])
    got = ivf_topk_from_index(
        spark, path, queries, CENTROIDS, k=3, n_probe=2
    )
    want = ivf_topk(queries, corpus, CENTROIDS, k=3, n_probe=2)
    assert _topk_rows(got) == _topk_rows(want)
    # single-cell probe reads ONLY that cell's partition
    one = ivf_topk_from_index(
        spark, path, _corpus(spark, [0]), CENTROIDS, k=3, n_probe=1
    )
    from mbrainz_importer_spark.sources.bucketed import physical_plan

    plan = physical_plan(one)
    assert "PartitionFilters" in plan
    assert all(int(r.nid) < 10 for r in one.collect()), "probe leaked cells"


def test_merge_folds_arrivals_into_touched_cells_only(spark, tmp_path):
    path = str(tmp_path / "ivf")
    materialize_ivf_index(_corpus(spark, range(15)), CENTROIDS, path)
    cell1 = os.path.join(path, "cell=1")
    before = sorted(
        (f, os.path.getmtime(os.path.join(cell1, f)))
        for f in os.listdir(cell1) if f.endswith(".parquet")
    )
    # arrivals land only in cell 0
    merge_ivf_increment(spark, path, _corpus(spark, [5, 6, 7, 8, 9]), CENTROIDS)
    after = sorted(
        (f, os.path.getmtime(os.path.join(cell1, f)))
        for f in os.listdir(cell1) if f.endswith(".parquet")
    )
    assert after == before, "untouched cell partition rewritten"
    got = read_ivf_index(spark, path)
    assert got.count() == 15  # 5,6,7,8,9 deduped, no duplicates
    # content identical to a from-scratch materialization
    full = str(tmp_path / "ivf_full")
    materialize_ivf_index(_corpus(spark, range(15)), CENTROIDS, full)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, read_ivf_index(spark, full).collect())
    )


def test_merged_index_answers_exactly_like_full_rebuild(spark, tmp_path):
    path = str(tmp_path / "ivf")
    base = _corpus(spark, [i for i in range(20) if i % 3 != 0])
    arrivals = _corpus(spark, [i for i in range(20) if i % 3 == 0])
    materialize_ivf_index(base, CENTROIDS, path)
    merge_ivf_increment(spark, path, arrivals, CENTROIDS)
    merge_ivf_increment(spark, path, arrivals, CENTROIDS)  # redelivery
    queries = _corpus(spark, [1, 11])
    got = ivf_topk_from_index(spark, path, queries, CENTROIDS, k=4, n_probe=2)
    want = ivf_topk(queries, _corpus(spark, range(20)), CENTROIDS, k=4, n_probe=2)
    assert _topk_rows(got) == _topk_rows(want)


def test_arrow_probe_face_matches_expression_face(spark, tmp_path):
    """ivf_topk_from_index_arrow == ivf_topk_from_index, exhaustive and
    partial probes, on the same materialized index."""
    from mbrainz_importer_spark.operators.ann import ivf_topk_from_index_arrow

    path = str(tmp_path / "ivf")
    materialize_ivf_index(_corpus(spark, range(20)), CENTROIDS, path)
    queries = _corpus(spark, [0, 10])
    for n_probe in (2, 1):
        expr = ivf_topk_from_index(
            spark, path, queries, CENTROIDS, k=4, n_probe=n_probe
        )
        arrow = ivf_topk_from_index_arrow(
            spark, path, queries, CENTROIDS, k=4, n_probe=n_probe
        )
        assert sorted(map(tuple, arrow.collect())) == sorted(
            map(tuple, expr.collect())
        ), f"faces diverge at n_probe={n_probe}"


def test_streaming_vector_ingest(spark, tmp_path):
    """Arrival micro-batches stream into the index; the drained index
    equals a full rebuild over base + arrivals."""
    from mbrainz_importer_spark.streaming.vector_ingest import start_ivf_ingest

    path = str(tmp_path / "ivf")
    materialize_ivf_index(_corpus(spark, range(10)), CENTROIDS, path)
    drop = tmp_path / "vecs"
    _corpus(spark, [10, 11, 12]).write.parquet(str(drop / "d1"))
    _corpus(spark, [13, 14]).write.parquet(str(drop / "d2"))
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{drop}/*/")
    )
    q = start_ivf_ingest(stream, path, CENTROIDS, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    full = str(tmp_path / "full")
    materialize_ivf_index(_corpus(spark, range(15)), CENTROIDS, full)
    assert sorted(map(tuple, read_ivf_index(spark, path).collect())) == sorted(
        map(tuple, read_ivf_index(spark, full).collect())
    )


def test_merge_rejects_moved_vector(spark, tmp_path):
    """The arrivals-are-new contract is enforced: an id re-asserted
    with a vector landing in a DIFFERENT cell raises (default
    on_moved='error') instead of silently duplicating across cells."""
    import pytest

    path = str(tmp_path / "ivf")
    materialize_ivf_index(_corpus(spark, range(15)), CENTROIDS, path)
    moved = spark.createDataFrame(
        [(5, [0.0, 1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="other cells"):
        merge_ivf_increment(spark, path, moved, CENTROIDS)
    # the failed merge left the index untouched
    assert read_ivf_index(spark, path).count() == 15
    assert (
        read_ivf_index(spark, path)
        .where(F.col("nid") == 5)
        .collect()[0]["cell"]
        == 0
    )


def test_merge_tombstone_moves_vector_without_duplicate(spark, tmp_path):
    """on_moved='tombstone': the moved id's OLD cell joins the rewrite
    set and its stale row drops — the merged index equals a
    from-scratch materialization of the updated corpus."""
    path = str(tmp_path / "ivf")
    materialize_ivf_index(_corpus(spark, range(15)), CENTROIDS, path)
    moved = spark.createDataFrame(
        [(5, [0.0, 1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    merge_ivf_increment(spark, path, moved, CENTROIDS, on_moved="tombstone")
    got = read_ivf_index(spark, path)
    assert got.count() == 15, "stale cross-cell row survived"
    assert got.where(F.col("nid") == 5).collect()[0]["cell"] == 1
    updated = [(i, _vec(i)) if i != 5 else (5, [0.0, 1.0, 0.0]) for i in range(15)]
    full = str(tmp_path / "full")
    materialize_ivf_index(
        spark.createDataFrame(updated, "vec_id long, embedding array<double>"),
        CENTROIDS,
        full,
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, read_ivf_index(spark, full).collect())
    )


def _drifted(spark):
    # post-drift corpus: cluster P (ids 0-9) alternates x-heavy /
    # y-heavy around [1, ~1, 0] so the STALE axis centroids split it
    # across both cells; cluster Q (ids 10-19) sits near [1, -1, 0]
    rows = []
    for i in range(10):
        v = [1.0, 0.9, 0.01 * i] if i % 2 == 0 else [0.9, 1.0, 0.01 * i]
        rows.append((i, v))
    for i in range(10, 20):
        rows.append((i, [1.0, -1.0, 0.01 * (i - 10)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_retrain_recovers_recall_on_drifted_corpus(spark, tmp_path):
    """The retrain operator measured doing its job: stale axis
    centroids split the drifted cluster P across both cells, so an
    n_probe=1 search misses half its true neighbors; retraining from a
    bounded sample of the index itself re-separates P|Q and the same
    search returns the exact top-k. Index CONTENT (nid, nv) is
    byte-identical across the retrain — only the layout moves."""
    from mbrainz_importer_spark.operators.ann import retrain_ivf_index

    path = str(tmp_path / "ivf")
    materialize_ivf_index(_drifted(spark), CENTROIDS, path)
    before = sorted((r["nid"], tuple(r["nv"])) for r in read_ivf_index(spark, path).collect())
    # symmetric query: exact centroid tie, so n_probe=1 reads ONE of
    # the two cells P straddles while the true top-5 (smallest z wins,
    # x/y-heavy tie on cosine) interleaves both — ids {0,1,2,3,4}
    q = spark.createDataFrame(
        [(100, [1.0, 1.0, 0.0])], "vec_id long, embedding array<double>"
    )

    def ids(df):
        return {r["nid"] for r in df.collect()}

    truth = ids(ivf_topk_from_index(spark, path, q, CENTROIDS, k=5, n_probe=2))
    stale = ids(ivf_topk_from_index(spark, path, q, CENTROIDS, k=5, n_probe=1))
    stale_recall = len(stale & truth) / 5
    cents = retrain_ivf_index(spark, path, n_cells=2)
    after = sorted((r["nid"], tuple(r["nv"])) for r in read_ivf_index(spark, path).collect())
    assert after == before, "retrain changed index content"
    fresh = ids(ivf_topk_from_index(spark, path, q, cents, k=5, n_probe=1))
    fresh_recall = len(fresh & truth) / 5
    assert stale_recall < 1.0, "fixture failed to induce the split"
    assert fresh_recall == 1.0, f"retrain did not recover recall: {fresh_recall}"


def test_centroids_are_index_metadata(spark, tmp_path):
    """The centroid set travels WITH the index: probing or merging with
    a foreign set raises (the silent-wrong-cells bug), stored_centroids
    reads the layout's set back, and retrain rewrites it."""
    import pytest

    from mbrainz_importer_spark.operators.ann import (
        retrain_ivf_index,
        stored_centroids,
    )

    path = str(tmp_path / "ivf")
    materialize_ivf_index(_corpus(spark, range(20)), CENTROIDS, path)
    assert stored_centroids(path) == CENTROIDS
    foreign = [[0.5, 0.5, 0.0], [0.0, 0.0, 1.0]]
    queries = _corpus(spark, [0])
    with pytest.raises(ValueError, match="does not match the index layout"):
        ivf_topk_from_index(spark, path, queries, foreign, k=3, n_probe=1)
    with pytest.raises(ValueError, match="does not match the index layout"):
        merge_ivf_increment(spark, path, _corpus(spark, [30]), foreign)
    cents = retrain_ivf_index(spark, path, n_cells=2)
    assert stored_centroids(path) == cents
    # the consistent set probes fine
    got = ivf_topk_from_index(spark, path, queries, cents, k=3, n_probe=2)
    assert got.count() == 3

# ---------------------------------------------------------------------------
# IVF × PQ (materialize_ivf_pq_index / ivf_pq_topk_from_index[_arrow])
# ---------------------------------------------------------------------------

def _vec4(i: int) -> list[float]:
    if i < 10:
        return [1.0, 0.01 * i, 0.0, 0.02 * i]
    return [0.01 * (i - 10), 1.0, 0.03 * (i - 10), 0.0]


def _corpus4(spark, ids):
    return spark.createDataFrame(
        [(i, _vec4(i)) for i in ids], "vec_id long, embedding array<double>"
    )


CENTROIDS4 = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]


def _pq_setup(spark, tmp_path, k_book=64):
    from mbrainz_importer_spark.operators.ann import materialize_ivf_pq_index
    from mbrainz_importer_spark.operators.quantize import train_pq_codebooks

    corpus = _corpus4(spark, range(20))
    books = train_pq_codebooks(corpus, "vec_id", "embedding", 4, m=2, k=k_book)
    path = str(tmp_path / "ivfpq")
    materialize_ivf_pq_index(corpus, CENTROIDS4, books, 4, path)
    return corpus, books, path


def test_ivf_pq_exact_regime_matches_brute_force(spark, tmp_path):
    """Lossless codebooks (k >= distinct subvectors) + exhaustive probe
    + exact re-rank == brute-force cosine top-k, bit for bit — the
    whole serving path certified in its exact regime."""
    from mbrainz_importer_spark.operators.ann import ivf_pq_topk_from_index
    from mbrainz_importer_spark.operators.similarity import brute_force_topk

    corpus, books, path = _pq_setup(spark, tmp_path)
    queries = _corpus4(spark, [0, 10])
    got = ivf_pq_topk_from_index(
        spark, path, queries, CENTROIDS4, books, 4, k=4, n_probe=2, rerank=5
    )
    want = brute_force_topk(queries, corpus, k=4)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_ivf_pq_faces_agree(spark, tmp_path):
    """Arrow/LUT face == expression face on both metrics and probe
    widths (final scores come from the shared exact re-rank)."""
    from mbrainz_importer_spark.operators.ann import (
        ivf_pq_topk_from_index,
        ivf_pq_topk_from_index_arrow,
    )

    _, books, path = _pq_setup(spark, tmp_path)
    queries = _corpus4(spark, [0, 10])
    for metric in ("cosine", "ip"):
        for n_probe in (2, 1):
            expr = ivf_pq_topk_from_index(
                spark, path, queries, CENTROIDS4, books, 4,
                k=4, n_probe=n_probe, rerank=2, metric=metric,
            )
            arrow = ivf_pq_topk_from_index_arrow(
                spark, path, queries, CENTROIDS4, books, 4,
                k=4, n_probe=n_probe, rerank=2, metric=metric,
            )
            assert sorted(map(tuple, arrow.collect())) == sorted(
                map(tuple, expr.collect())
            ), f"faces diverge at metric={metric} n_probe={n_probe}"


def test_ivf_pq_candidate_scan_prunes_cells_and_columns(spark, tmp_path):
    """The ADC candidate pass is partition-pruned to the probed cells
    AND column-pruned to (nid, codes) — the full vectors transfer only
    for the re-rank survivors."""
    from mbrainz_importer_spark.operators.ann import ivf_pq_topk_from_index
    from mbrainz_importer_spark.sources.bucketed import physical_plan

    _, books, path = _pq_setup(spark, tmp_path)
    one = ivf_pq_topk_from_index(
        spark, path, _corpus4(spark, [0]), CENTROIDS4, books, 4,
        k=3, n_probe=1, rerank=2,
    )
    plan = physical_plan(one)
    assert "PartitionFilters" in plan
    scans = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert any(
        "codes" in ln and "nv" not in ln.split("ReadSchema")[1] for ln in scans
    ), f"no codes-only scan in plan:\n{plan}"
    assert all(int(r.nid) < 10 for r in one.collect()), "probe leaked cells"


def test_ivf_pq_codebooks_are_index_metadata(spark, tmp_path):
    """Probing with codebooks that differ from the set the index was
    encoded with fails loudly (ADC against foreign tables is the
    silent-wrong-scores bug); stored_codebooks reads the right set
    back."""
    import pytest

    from mbrainz_importer_spark.operators.ann import (
        ivf_pq_topk_from_index,
        stored_codebooks,
    )

    _, books, path = _pq_setup(spark, tmp_path)
    assert stored_codebooks(path) == [
        [[float(x) for x in c] for c in b] for b in books
    ]
    foreign = [[[v + 1.0 for v in c] for c in b] for b in books]
    with pytest.raises(ValueError, match="codebooks"):
        ivf_pq_topk_from_index(
            spark, path, _corpus4(spark, [0]), CENTROIDS4, foreign, 4
        )


def test_ivf_pq_serving_recall_floor(spark, tmp_path):
    """Partial probe + lossy-by-contract candidates still recover the
    clustered neighbors: recall@4 vs brute force >= the IVF floor on
    the two-cluster fixture (candidate loss measured zero at rerank=2
    here — all approximation is cell pruning, same as sim_ivf_topk)."""
    from mbrainz_importer_spark.operators.ann import ivf_pq_topk_from_index_arrow
    from mbrainz_importer_spark.operators.similarity import brute_force_topk

    corpus, books, path = _pq_setup(spark, tmp_path, k_book=4)
    queries = _corpus4(spark, [0, 10])
    got = ivf_pq_topk_from_index_arrow(
        spark, path, queries, CENTROIDS4, books, 4, k=4, n_probe=1, rerank=2
    )
    want = brute_force_topk(queries, corpus, k=4)
    g = {(r.qid, r.nid) for r in got.collect()}
    w = {(r.qid, r.nid) for r in want.collect()}
    assert len(g & w) / len(w) >= 0.5, f"recall {len(g & w) / len(w)}"


def test_ivf_pq_arrow_encode_equals_expression_encode(spark, tmp_path):
    """materialize_ivf_pq_index's bulk-build kernel (encode='arrow',
    the default) writes byte-identical content to the pure-expression
    face on a tie-free corpus — cells, codes, and vectors all equal."""
    from mbrainz_importer_spark.operators.ann import materialize_ivf_pq_index
    from mbrainz_importer_spark.operators.quantize import train_pq_codebooks

    corpus = _corpus4(spark, range(20))
    books = train_pq_codebooks(corpus, "vec_id", "embedding", 4, m=2, k=8)
    pa, pe = str(tmp_path / "arrow"), str(tmp_path / "expr")
    materialize_ivf_pq_index(corpus, CENTROIDS4, books, 4, pa, encode="arrow")
    materialize_ivf_pq_index(corpus, CENTROIDS4, books, 4, pe, encode="expr")
    ra = sorted(map(tuple, spark.read.parquet(pa).select("nid", "nv", "codes", "cell").collect()))
    re_ = sorted(map(tuple, spark.read.parquet(pe).select("nid", "nv", "codes", "cell").collect()))
    assert ra == re_


def test_ivf_pq_merge_folds_codes_into_touched_cells_only(spark, tmp_path):
    """merge_ivf_pq_increment: arrivals encode + fold into only their
    cells (untouched cell files untouched); redelivered increments are
    no-ops; the merged index equals a from-scratch build — codes,
    vectors, and cells all."""
    import os as _os

    from mbrainz_importer_spark.operators.ann import (
        materialize_ivf_pq_index,
        merge_ivf_pq_increment,
    )
    from mbrainz_importer_spark.operators.quantize import train_pq_codebooks

    corpus = _corpus4(spark, range(20))
    books = train_pq_codebooks(corpus, "vec_id", "embedding", 4, m=2, k=8)
    path = str(tmp_path / "ivfpq")
    base = _corpus4(spark, [i for i in range(20) if i % 4 != 0])
    arrivals = _corpus4(spark, [i for i in range(20) if i % 4 == 0 and i < 10])
    materialize_ivf_pq_index(base, CENTROIDS4, books, 4, path)
    cell1 = _os.path.join(path, "cell=1")
    before = sorted(
        (f, _os.path.getmtime(_os.path.join(cell1, f)))
        for f in _os.listdir(cell1) if f.endswith(".parquet")
    )
    merge_ivf_pq_increment(spark, path, arrivals, CENTROIDS4, books, 4)
    merge_ivf_pq_increment(spark, path, arrivals, CENTROIDS4, books, 4)  # redelivery
    after = sorted(
        (f, _os.path.getmtime(_os.path.join(cell1, f)))
        for f in _os.listdir(cell1) if f.endswith(".parquet")
    )
    assert after == before, "untouched cell partition rewritten"
    full = str(tmp_path / "ivfpq_full")
    materialize_ivf_pq_index(
        _corpus4(spark, sorted({i for i in range(20) if i % 4 != 0} | {0, 4, 8})),
        CENTROIDS4, books, 4, full,
    )
    cols = ["nid", "nv", "codes", "cell"]
    assert sorted(map(tuple, spark.read.parquet(path).select(*cols).collect())) == \
        sorted(map(tuple, spark.read.parquet(full).select(*cols).collect()))


def test_ivf_pq_merge_rejects_moved_vector_and_foreign_codebooks(spark, tmp_path):
    import pytest

    from mbrainz_importer_spark.operators.ann import (
        materialize_ivf_pq_index,
        merge_ivf_pq_increment,
    )
    from mbrainz_importer_spark.operators.quantize import train_pq_codebooks

    corpus = _corpus4(spark, range(20))
    books = train_pq_codebooks(corpus, "vec_id", "embedding", 4, m=2, k=8)
    path = str(tmp_path / "ivfpq")
    materialize_ivf_pq_index(corpus, CENTROIDS4, books, 4, path)
    # id 0 re-asserted with a vector landing in the OTHER cell
    moved = spark.createDataFrame(
        [(0, [0.0, 1.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="other"):
        merge_ivf_pq_increment(spark, path, moved, CENTROIDS4, books, 4)
    foreign = [[[v + 1.0 for v in c] for c in b] for b in books]
    with pytest.raises(ValueError, match="codebooks"):
        merge_ivf_pq_increment(
            spark, path, _corpus4(spark, [5]), CENTROIDS4, foreign, 4
        )


def test_ivf_pq_retrain_rewrites_layout_and_metadata(spark, tmp_path):
    """retrain_ivf_pq_index: content (nid, nv) survives the rewrite
    byte-identically, codes re-encode under the RETURNED codebooks,
    stored metadata matches the returned pair, and probing with the
    stale codebooks raises."""
    import pytest

    from mbrainz_importer_spark.operators.ann import (
        ivf_pq_topk_from_index,
        materialize_ivf_pq_index,
        retrain_ivf_pq_index,
        stored_centroids,
        stored_codebooks,
    )
    from mbrainz_importer_spark.operators.quantize import train_pq_codebooks

    corpus = _corpus4(spark, range(20))
    old_books = train_pq_codebooks(corpus, "vec_id", "embedding", 4, m=2, k=4)
    path = str(tmp_path / "ivfpq")
    materialize_ivf_pq_index(corpus, CENTROIDS4, old_books, 4, path)
    before = sorted(
        map(tuple, spark.read.parquet(path).select("nid", "nv").collect())
    )
    cents, books = retrain_ivf_pq_index(
        spark, path, 4, n_cells=2, m=2, k=8
    )
    after = sorted(
        map(tuple, spark.read.parquet(path).select("nid", "nv").collect())
    )
    assert after == before, "retrain changed index content"
    assert stored_codebooks(path) == [
        [[float(x) for x in c] for c in b] for b in books
    ]
    assert stored_centroids(path) == [[float(x) for x in c] for c in cents]
    with pytest.raises(ValueError, match="codebooks"):
        ivf_pq_topk_from_index(
            spark, path, _corpus4(spark, [0]), cents, old_books, 4
        )
    # the returned pair probes fine; exhaustive probe + a rerank window
    # covering the whole corpus (rerank*k = 20) must equal brute force
    from mbrainz_importer_spark.operators.similarity import brute_force_topk

    got = ivf_pq_topk_from_index(
        spark, path, _corpus4(spark, [0, 10]), cents, books, 4,
        k=4, n_probe=len(cents), rerank=5,
    )
    want = brute_force_topk(_corpus4(spark, [0, 10]), corpus, k=4)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def _random_corpus(draw):
    """Small random embedding corpora: n vectors of dim 4, float values
    on a coarse grid (ties possible but exact across engines)."""
    n = draw(st.integers(6, 14))
    vals = st.integers(-8, 8).map(lambda x: x / 4.0)
    vecs = draw(
        st.lists(
            st.lists(vals, min_size=4, max_size=4).filter(
                lambda v: any(x != 0 for x in v)
            ),
            min_size=n, max_size=n,
        )
    )
    return vecs


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vecs=_random_corpus())
def test_ivf_pq_exact_regime_property(spark, tmp_path_factory, vecs):
    """For ANY corpus: lossless codebooks (k >= corpus size) +
    exhaustive probe + a rerank window covering the corpus must
    reproduce brute-force cosine top-k exactly — the exact-regime
    certification as a property, not a fixture."""
    from mbrainz_importer_spark.operators.ann import (
        ivf_pq_topk_from_index,
        materialize_ivf_pq_index,
        train_centroids_sample,
    )
    from mbrainz_importer_spark.operators.quantize import train_pq_codebooks
    from mbrainz_importer_spark.operators.similarity import brute_force_topk

    corpus = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    books = train_pq_codebooks(
        corpus, "vec_id", "embedding", 4, m=2, k=len(vecs) + 1
    )
    cents = train_centroids_sample(corpus, n_cells=2, max_iter=4)
    path = str(tmp_path_factory.mktemp("pqprop") / "idx")
    materialize_ivf_pq_index(corpus, cents, books, 4, path)
    queries = corpus.where(F.col("vec_id") < 2)
    k = 3
    got = ivf_pq_topk_from_index(
        spark, path, queries, cents, books, 4,
        k=k, n_probe=len(cents), rerank=(len(vecs) + k - 1) // k,
    )
    want = brute_force_topk(queries, corpus, k=k)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_streaming_pq_ingest(spark, tmp_path):
    """Vector micro-batches stream into the IVF×PQ index; the drained
    index equals a full rebuild over base + arrivals — codes included."""
    from mbrainz_importer_spark.operators.ann import materialize_ivf_pq_index
    from mbrainz_importer_spark.operators.quantize import train_pq_codebooks
    from mbrainz_importer_spark.streaming.vector_ingest import start_ivf_pq_ingest

    corpus = _corpus4(spark, range(15))
    books = train_pq_codebooks(corpus, "vec_id", "embedding", 4, m=2, k=8)
    path = str(tmp_path / "ivfpq")
    materialize_ivf_pq_index(_corpus4(spark, range(10)), CENTROIDS4, books, 4, path)
    drop = tmp_path / "vecs"
    _corpus4(spark, [10, 11, 12]).write.parquet(str(drop / "d1"))
    _corpus4(spark, [13, 14]).write.parquet(str(drop / "d2"))
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{drop}/*/")
    )
    q = start_ivf_pq_ingest(
        stream, path, CENTROIDS4, books, 4, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    full = str(tmp_path / "full")
    materialize_ivf_pq_index(corpus, CENTROIDS4, books, 4, full)
    cols = ["nid", "nv", "codes", "cell"]
    assert sorted(map(tuple, spark.read.parquet(path).select(*cols).collect())) == \
        sorted(map(tuple, spark.read.parquet(full).select(*cols).collect()))


def test_pq_arrow_assign_rejects_zero_norm_vectors(spark, tmp_path):
    """ADVICE r9 (ann.py:_assign_pq_arrow): a zero-norm corpus vector
    yields NaN cosines and numpy's argmax would silently assign cell 0
    (RuntimeWarning only) — diverging from the expression face on the
    same row. The Arrow kernel must refuse loudly instead."""
    import pytest

    from mbrainz_importer_spark.operators.ann import materialize_ivf_pq_index
    from mbrainz_importer_spark.operators.quantize import train_pq_codebooks

    good = _corpus4(spark, range(8))
    books = train_pq_codebooks(good, "vec_id", "embedding", 4, m=2, k=8)
    zero = spark.createDataFrame(
        [(99, [0.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    corpus = good.unionByName(zero)
    with pytest.raises(Exception, match="zero-norm"):
        materialize_ivf_pq_index(
            corpus, CENTROIDS4, books, 4, str(tmp_path / "z"), encode="arrow"
        )


# ---------------------------------------------------------------------------
# IVF × SQ8 (materialize_ivf_sq8_index / ivf_sq8_topk_from_index /
# merge_ivf_sq8_increment / retrain_ivf_sq8_index) — r9 verdict #4
# ---------------------------------------------------------------------------


def _sq8_setup(spark, tmp_path):
    from mbrainz_importer_spark.operators.ann import materialize_ivf_sq8_index
    from mbrainz_importer_spark.operators.quantize import sq8_train_bounds

    corpus = _corpus4(spark, range(20))
    lo, hi = sq8_train_bounds(corpus, "embedding", 4)
    path = str(tmp_path / "sq8idx")
    materialize_ivf_sq8_index(corpus, CENTROIDS4, lo, hi, path)
    return corpus, lo, hi, path


def test_sq8_index_probe_reads_codes_not_vectors(spark, tmp_path):
    """The probe's candidate scan carries codes and never nv — the 4x
    column cut is the point of the in-index code (same assertion
    discipline as the PQ face)."""
    from mbrainz_importer_spark.operators.ann import ivf_sq8_topk_from_index
    from mbrainz_importer_spark.sources.bucketed import physical_plan

    corpus, lo, hi, path = _sq8_setup(spark, tmp_path)
    out = ivf_sq8_topk_from_index(
        spark, path, _corpus4(spark, [0, 1]), CENTROIDS4, lo, hi,
        k=3, n_probe=1,
    )
    # the probe's only file scan is the index (queries are a local
    # relation); the tmp path truncates in the plan string, so match
    # the scan node, not the path
    scans = [
        ln for ln in physical_plan(out).splitlines()
        if "FileScan parquet" in ln
    ]
    assert scans, physical_plan(out)
    for ln in scans:
        assert "codes" in ln and "nv" not in ln.replace("nvl", ""), ln


def test_sq8_merge_equals_full_build(spark, tmp_path):
    """Incremental maintenance through the shared touched-cells core
    must leave the index content byte-identical to a from-scratch
    materialization of the full corpus — codes included."""
    from mbrainz_importer_spark.operators.ann import (
        materialize_ivf_sq8_index,
        merge_ivf_sq8_increment,
    )
    from mbrainz_importer_spark.operators.quantize import sq8_train_bounds

    full = _corpus4(spark, range(24))
    lo, hi = sq8_train_bounds(full, "embedding", 4)
    inc_path = str(tmp_path / "inc")
    materialize_ivf_sq8_index(
        full.where("vec_id % 4 != 0"), CENTROIDS4, lo, hi, inc_path
    )
    merge_ivf_sq8_increment(
        spark, inc_path, full.where("vec_id % 4 = 0"), CENTROIDS4, lo, hi
    )
    ref_path = str(tmp_path / "ref")
    materialize_ivf_sq8_index(full, CENTROIDS4, lo, hi, ref_path)
    got = sorted(map(tuple, spark.read.parquet(inc_path)
                 .select("nid", "nv", "codes", "cell").collect()))
    want = sorted(map(tuple, spark.read.parquet(ref_path)
                  .select("nid", "nv", "codes", "cell").collect()))
    assert got == want
    # redelivery: merging the same arrivals again is a content no-op
    merge_ivf_sq8_increment(
        spark, inc_path, full.where("vec_id % 4 = 0"), CENTROIDS4, lo, hi
    )
    again = sorted(map(tuple, spark.read.parquet(inc_path)
                   .select("nid", "nv", "codes", "cell").collect()))
    assert again == want


def test_sq8_foreign_metadata_raises(spark, tmp_path):
    from mbrainz_importer_spark.operators.ann import (
        ivf_sq8_topk_from_index,
        merge_ivf_sq8_increment,
        stored_sq8_bounds,
    )

    corpus, lo, hi, path = _sq8_setup(spark, tmp_path)
    q = _corpus4(spark, [0])
    bad_hi = [h + 1.0 for h in hi]
    with pytest.raises(ValueError, match="SQ8 bounds"):
        ivf_sq8_topk_from_index(spark, path, q, CENTROIDS4, lo, bad_hi)
    with pytest.raises(ValueError, match="SQ8 bounds"):
        merge_ivf_sq8_increment(spark, path, q, CENTROIDS4, lo, bad_hi)
    with pytest.raises(ValueError, match="centroid"):
        ivf_sq8_topk_from_index(
            spark, path, q, [[0.5, 0.5, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]],
            lo, hi,
        )
    assert stored_sq8_bounds(path) == (lo, hi)


def test_sq8_retrain_preserves_content_and_rotates_grid(spark, tmp_path):
    """retrain_ivf_sq8_index refits centroids + grid from the index
    contents and re-materializes: (nid, nv) survive byte-identical,
    probing with the STALE grid raises, probing with the returned one
    works."""
    from mbrainz_importer_spark.operators.ann import (
        ivf_sq8_topk_from_index,
        retrain_ivf_sq8_index,
    )

    corpus, lo, hi, path = _sq8_setup(spark, tmp_path)
    before = sorted(map(tuple, spark.read.parquet(path)
                    .select("nid", "nv").collect()))
    cents2, lo2, hi2 = retrain_ivf_sq8_index(spark, path, 4, n_cells=2)
    after = sorted(map(tuple, spark.read.parquet(path)
                   .select("nid", "nv").collect()))
    assert before == after
    q = _corpus4(spark, [0, 1])
    if (lo2, hi2) != (lo, hi) or cents2 != CENTROIDS4:
        with pytest.raises(ValueError):
            ivf_sq8_topk_from_index(spark, path, q, CENTROIDS4, lo, hi)
    out = ivf_sq8_topk_from_index(
        spark, path, q, cents2, lo2, hi2, k=3, n_probe=len(cents2)
    )
    assert out.count() == 6


def test_pq_adc_only_mode_ranks_like_rerank_at_lossless(spark, tmp_path):
    """rerank=0 (ADC-only serving, FAISS's no-refine mode): in the
    lossless regime ADC IS the exact score, so the ADC-only ranks must
    equal the reranked face's ranks — and the probe plan must read
    codes and never nv (the end-to-end fetch cut the I/O-pressure A/B
    demonstrates; with rerank on, the exact stage's point-reads pull
    whole nv chunks)."""
    from mbrainz_importer_spark.operators.ann import (
        ivf_pq_topk_from_index_arrow,
        materialize_ivf_pq_index,
    )
    from mbrainz_importer_spark.operators.quantize import train_pq_codebooks
    from mbrainz_importer_spark.sources.bucketed import physical_plan

    corpus = _corpus4(spark, range(20))
    books = train_pq_codebooks(corpus, "vec_id", "embedding", 4, m=2, k=64)
    path = str(tmp_path / "adconly")
    materialize_ivf_pq_index(corpus, CENTROIDS4, books, 4, path)
    queries = _corpus4(spark, [0, 10])
    adc_only = ivf_pq_topk_from_index_arrow(
        spark, path, queries, CENTROIDS4, books, 4, k=4, n_probe=2, rerank=0
    )
    reranked = ivf_pq_topk_from_index_arrow(
        spark, path, queries, CENTROIDS4, books, 4, k=4, n_probe=2, rerank=5
    )
    assert sorted(
        (r["qid"], r["nid"], r["rank"]) for r in adc_only.collect()
    ) == sorted((r["qid"], r["nid"], r["rank"]) for r in reranked.collect())
    assert adc_only.columns == ["qid", "nid", "adc_sim", "rank"]
    scans = [
        ln for ln in physical_plan(adc_only).splitlines()
        if "FileScan parquet" in ln
    ]
    assert scans
    for ln in scans:
        assert "codes" in ln and "nv" not in ln.replace("nvl", ""), ln


def test_sq8_arrow_probe_face_equals_expression_face(spark, tmp_path):
    """ivf_sq8_topk_from_index_arrow == ivf_sq8_topk_from_index on the
    same index, exhaustive and partial probes — integer dots have no
    rounding faces to diverge, and the arrow query encode emulates
    Spark's HALF_UP on the identical double-precision grid arithmetic.
    The arrow face is what the corpus-wide certification gates run
    (the expression face's interpreted 64-element fold per pair
    measured 48.5s on the sf10 exhaustive scan)."""
    from mbrainz_importer_spark.operators.ann import (
        ivf_sq8_topk_from_index,
        ivf_sq8_topk_from_index_arrow,
    )

    corpus, lo, hi, path = _sq8_setup(spark, tmp_path)
    queries = _corpus4(spark, [0, 10, 19])
    for n_probe in (2, 1):
        expr = ivf_sq8_topk_from_index(
            spark, path, queries, CENTROIDS4, lo, hi, k=4, n_probe=n_probe
        )
        arrow = ivf_sq8_topk_from_index_arrow(
            spark, path, queries, CENTROIDS4, lo, hi, k=4, n_probe=n_probe
        )
        assert sorted(map(tuple, arrow.collect())) == sorted(
            map(tuple, expr.collect())
        ), f"faces diverge at n_probe={n_probe}"


def test_sq8_arrow_face_on_real_corpus_batches(spark, tmp_path):
    """The hand corpus above can't catch pair/score misalignment: its
    per-cell rankings are the same for every query, so shuffling scores
    across (query, row) pairs leaves top-k unchanged (a dots.T bug
    shipped past it and was caught at the sf0.01 gate). Real 64-dim
    embeddings with multi-row Arrow batches and query-DEPENDENT
    rankings pin the alignment."""
    from mbrainz_importer_spark.operators.ann import (
        ivf_sq8_topk_from_index,
        ivf_sq8_topk_from_index_arrow,
        materialize_ivf_sq8_index,
        train_centroids_sample,
    )
    from mbrainz_importer_spark.operators.quantize import sq8_train_bounds
    from mbrainz_importer_spark.tables import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    lo, hi = sq8_train_bounds(emb, "embedding", 64)
    cents = train_centroids_sample(emb, n_cells=4)
    path = str(tmp_path / "sq8real")
    materialize_ivf_sq8_index(emb, cents, lo, hi, path)
    queries = emb.where(F.col("vec_id") < 5)
    expr = ivf_sq8_topk_from_index(
        spark, path, queries, cents, lo, hi, k=5, n_probe=len(cents)
    )
    arrow = ivf_sq8_topk_from_index_arrow(
        spark, path, queries, cents, lo, hi, k=5, n_probe=len(cents)
    )
    assert sorted(map(tuple, arrow.collect())) == sorted(
        map(tuple, expr.collect())
    )


# ---------------------------------------------------------------------------
# IVF×PQ + SQ8 refine (materialize_ivf_pq_refine_index /
# ivf_pq_sq8_refine_topk / merge_ivf_pq_refine_increment /
# retrain_ivf_pq_refine_index) — the two-stage quantized serving stack:
# PQ codes generate candidates, SQ8 codes re-score them, `nv` never
# transfers (the fix for the §8 finding that the exact rerank's
# point-reads pull whole nv chunks).
# ---------------------------------------------------------------------------


def _refine_setup(spark, tmp_path, ids=range(20), k_book=64):
    from mbrainz_importer_spark.operators.ann import (
        materialize_ivf_pq_refine_index,
    )
    from mbrainz_importer_spark.operators.quantize import (
        sq8_train_bounds,
        train_pq_codebooks,
    )

    corpus = _corpus4(spark, ids)
    books = train_pq_codebooks(corpus, "vec_id", "embedding", 4, m=2, k=k_book)
    lo, hi = sq8_train_bounds(corpus, "embedding", 4)
    path = str(tmp_path / "refine")
    materialize_ivf_pq_refine_index(corpus, CENTROIDS4, books, lo, hi, 4, path)
    return corpus, books, lo, hi, path


def test_pq_refine_exhaustive_band_equals_flat_sq8(spark, tmp_path):
    """Exhaustive band (n_probe = n_cells, rerank*k >= corpus) == the
    Flat,SQ8 ranking bit for bit — the regime the oracle gate certifies
    corpus-wide."""
    from mbrainz_importer_spark.operators.ann import ivf_pq_sq8_refine_topk
    from mbrainz_importer_spark.operators.quantize import sq8_ip_topk

    corpus, books, lo, hi, path = _refine_setup(spark, tmp_path)
    queries = _corpus4(spark, [0, 10])
    got = ivf_pq_sq8_refine_topk(
        spark, path, queries, CENTROIDS4, books, lo, hi, 4,
        k=4, n_probe=2, rerank=5,  # rerank*k = 20 >= the 20-row corpus
    )
    want = sq8_ip_topk(queries, corpus, lo, hi, k=4)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_pq_refine_selective_band_matches_exhaustive_here(spark, tmp_path):
    """On this fixture (lossless books: ADC == exact dot per subvector
    count) a selective band already contains the SQ8 top-k, so the
    served ranks equal the exhaustive face — approximation enters only
    through the band, never through the refine arithmetic."""
    from mbrainz_importer_spark.operators.ann import ivf_pq_sq8_refine_topk

    corpus, books, lo, hi, path = _refine_setup(spark, tmp_path)
    queries = _corpus4(spark, [0, 10])
    selective = ivf_pq_sq8_refine_topk(
        spark, path, queries, CENTROIDS4, books, lo, hi, 4,
        k=3, n_probe=2, rerank=2,
    )
    exhaustive = ivf_pq_sq8_refine_topk(
        spark, path, queries, CENTROIDS4, books, lo, hi, 4,
        k=3, n_probe=2, rerank=7,
    )
    assert sorted(map(tuple, selective.collect())) == \
        sorted(map(tuple, exhaustive.collect()))


def test_pq_refine_probe_never_reads_nv(spark, tmp_path):
    """BOTH probe scans — the ADC candidate pass (nid, codes, cell) and
    the refine pass (nid, sq8) — leave `nv` on disk. This is the tier's
    whole point: the §8 A/B measured the exact rerank's nv point-reads
    at whole-chunk cost (205 MB at sf100 geometry, parity with plain
    IVF); here no scan carries the vector column at all."""
    from mbrainz_importer_spark.operators.ann import ivf_pq_sq8_refine_topk
    from mbrainz_importer_spark.sources.bucketed import physical_plan

    corpus, books, lo, hi, path = _refine_setup(spark, tmp_path)
    out = ivf_pq_sq8_refine_topk(
        spark, path, _corpus4(spark, [0, 1]), CENTROIDS4, books, lo, hi, 4,
        k=3, n_probe=1, rerank=2,
    )
    scans = [
        ln for ln in physical_plan(out).splitlines()
        if "FileScan parquet" in ln
    ]
    assert len(scans) >= 2, physical_plan(out)
    for ln in scans:
        assert "nv" not in ln.replace("nvl", ""), ln
    assert any("codes" in ln for ln in scans)
    assert any("sq8" in ln for ln in scans)


def test_pq_refine_merge_equals_full_build(spark, tmp_path):
    """Incremental maintenance through the shared touched-cells core
    leaves the refine index content — BOTH code columns included —
    byte-identical to a from-scratch build; redelivery is a no-op."""
    from mbrainz_importer_spark.operators.ann import (
        materialize_ivf_pq_refine_index,
        merge_ivf_pq_refine_increment,
    )
    from mbrainz_importer_spark.operators.quantize import (
        sq8_train_bounds,
        train_pq_codebooks,
    )

    full = _corpus4(spark, range(24))
    books = train_pq_codebooks(full, "vec_id", "embedding", 4, m=2, k=64)
    lo, hi = sq8_train_bounds(full, "embedding", 4)
    inc_path = str(tmp_path / "inc")
    materialize_ivf_pq_refine_index(
        full.where("vec_id % 4 != 0"), CENTROIDS4, books, lo, hi, 4, inc_path
    )
    cols = ["nid", "nv", "codes", "sq8", "cell"]
    for _ in range(2):  # second pass = redelivery
        merge_ivf_pq_refine_increment(
            spark, inc_path, full.where("vec_id % 4 = 0"),
            CENTROIDS4, books, lo, hi, 4,
        )
    ref_path = str(tmp_path / "ref")
    materialize_ivf_pq_refine_index(full, CENTROIDS4, books, lo, hi, 4, ref_path)
    got = sorted(map(tuple, spark.read.parquet(inc_path).select(*cols).collect()))
    want = sorted(map(tuple, spark.read.parquet(ref_path).select(*cols).collect()))
    assert got == want


def test_pq_refine_foreign_metadata_raises(spark, tmp_path):
    """All three artifacts are checked: foreign grid bounds, foreign
    codebooks, and foreign centroids each fail loudly on probe AND
    merge — a mismatch would poison scores silently otherwise."""
    from mbrainz_importer_spark.operators.ann import (
        ivf_pq_sq8_refine_topk,
        merge_ivf_pq_refine_increment,
    )

    corpus, books, lo, hi, path = _refine_setup(spark, tmp_path)
    q = _corpus4(spark, [0])
    bad_hi = [h + 1.0 for h in hi]
    foreign_books = [[[x + 0.5 for x in c] for c in b] for b in books]
    foreign_cents = [[0.5, 0.5, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]]
    with pytest.raises(ValueError, match="SQ8 bounds"):
        ivf_pq_sq8_refine_topk(spark, path, q, CENTROIDS4, books, lo, bad_hi, 4)
    with pytest.raises(ValueError, match="SQ8 bounds"):
        merge_ivf_pq_refine_increment(
            spark, path, q, CENTROIDS4, books, lo, bad_hi, 4
        )
    with pytest.raises(ValueError, match="codebook"):
        ivf_pq_sq8_refine_topk(
            spark, path, q, CENTROIDS4, foreign_books, lo, hi, 4
        )
    with pytest.raises(ValueError, match="centroid"):
        ivf_pq_sq8_refine_topk(
            spark, path, q, foreign_cents, books, lo, hi, 4
        )


def test_pq_refine_retrain_lifecycle(spark, tmp_path):
    """retrain_ivf_pq_refine_index refits all three artifacts from the
    index contents and re-materializes: (nid, nv) survive byte-identical
    and the probe works with the RETURNED sets (stale sets raise via the
    metadata checks when the artifacts rotated)."""
    from mbrainz_importer_spark.operators.ann import (
        ivf_pq_sq8_refine_topk,
        retrain_ivf_pq_refine_index,
    )
    from mbrainz_importer_spark.operators.quantize import sq8_ip_topk

    corpus, books, lo, hi, path = _refine_setup(spark, tmp_path)
    before = sorted(map(tuple, spark.read.parquet(path)
                    .select("nid", "nv").collect()))
    cents2, books2, lo2, hi2 = retrain_ivf_pq_refine_index(
        spark, path, 4, n_cells=2, m=2, k=64
    )
    after = sorted(map(tuple, spark.read.parquet(path)
                   .select("nid", "nv").collect()))
    assert before == after
    queries = _corpus4(spark, [0, 10])
    got = ivf_pq_sq8_refine_topk(
        spark, path, queries, cents2, books2, lo2, hi2, 4,
        k=4, n_probe=2, rerank=5,
    )
    want = sq8_ip_topk(queries, corpus, lo2, hi2, k=4)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_pq_refine_grid_dim_mismatch_raises_at_entry(spark, tmp_path):
    """A grid shorter than dim would TRUNCATE every SQ8 code and
    int_dot's zip_with silently drops the unmatched tail — wrong
    integer dots, not an error. All three refine entry points validate
    at entry."""
    from mbrainz_importer_spark.operators.ann import (
        ivf_pq_sq8_refine_topk,
        materialize_ivf_pq_refine_index,
        merge_ivf_pq_refine_increment,
    )

    corpus, books, lo, hi, path = _refine_setup(spark, tmp_path)
    q = _corpus4(spark, [0])
    short_lo, short_hi = lo[:3], hi[:3]
    with pytest.raises(ValueError, match="grid has 3/3 bounds"):
        materialize_ivf_pq_refine_index(
            corpus, CENTROIDS4, books, short_lo, short_hi, 4,
            str(tmp_path / "bad"),
        )
    with pytest.raises(ValueError, match="grid has 3/3 bounds"):
        ivf_pq_sq8_refine_topk(
            spark, path, q, CENTROIDS4, books, short_lo, short_hi, 4
        )
    with pytest.raises(ValueError, match="grid has 3/3 bounds"):
        merge_ivf_pq_refine_increment(
            spark, path, q, CENTROIDS4, books, short_lo, short_hi, 4
        )


def test_pq_refine_streaming_ingest_equals_rebuild(spark, tmp_path):
    """Drained refine-index ingest stream == from-scratch build, BOTH
    code columns included (the streaming lifecycle face of the refine
    tier, same contract as start_ivf_pq_ingest)."""
    from mbrainz_importer_spark.operators.ann import (
        materialize_ivf_pq_refine_index,
    )
    from mbrainz_importer_spark.operators.quantize import (
        sq8_train_bounds,
        train_pq_codebooks,
    )
    from mbrainz_importer_spark.streaming.vector_ingest import (
        start_ivf_pq_refine_ingest,
    )

    corpus = _corpus4(spark, range(15))
    books = train_pq_codebooks(corpus, "vec_id", "embedding", 4, m=2, k=64)
    lo, hi = sq8_train_bounds(corpus, "embedding", 4)
    path = str(tmp_path / "refidx")
    materialize_ivf_pq_refine_index(
        _corpus4(spark, range(10)), CENTROIDS4, books, lo, hi, 4, path
    )
    drop = tmp_path / "vecs"
    _corpus4(spark, [10, 11, 12]).write.parquet(str(drop / "d1"))
    _corpus4(spark, [13, 14]).write.parquet(str(drop / "d2"))
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{drop}/*/")
    )
    q = start_ivf_pq_refine_ingest(
        stream, path, CENTROIDS4, books, lo, hi, 4, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    full = str(tmp_path / "full")
    materialize_ivf_pq_refine_index(corpus, CENTROIDS4, books, lo, hi, 4, full)
    cols = ["nid", "nv", "codes", "sq8", "cell"]
    assert sorted(map(tuple, spark.read.parquet(path).select(*cols).collect())) == \
        sorted(map(tuple, spark.read.parquet(full).select(*cols).collect()))
