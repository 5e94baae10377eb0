"""Materialized IVF index + incremental maintenance (operators/ann.py:
materialize_ivf_index / merge_ivf_increment / ivf_topk_from_index) —
the inverted-list storage face of the IVF ANN path: probes read only
their cells' partitions; arrivals fold into only the cells they land
in."""

from __future__ import annotations

import os

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
