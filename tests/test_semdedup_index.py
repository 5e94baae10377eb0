"""SemDeDup served from the IVF×PQ index (r9 verdict #2): candidate
generation probes materialized codes instead of re-scoring cells.
Reference parity: the reference's dedup passes rescan the corpus per
run (importer.clj's in-memory done-set has no index analogue); this is
the storage-served face the 100 TB tier needs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mbrainz_importer_spark.operators.similarity import (
    hyperplanes,
    materialize_semdedup_index,
    semdedup,
    semdedup_from_index,
    _semdedup_index_candidates,
)
from mbrainz_importer_spark.operators.quantize import train_pq_codebooks
from mbrainz_importer_spark.tables import load

SF = "/root/testdata/sf0.001"
DIM = 64


@pytest.fixture(scope="module")
def lossless_setup(spark, tmp_path_factory):
    """A duplicated corpus (500 base embeddings + 50 shifted-id copies,
    so the rep fan-out path is exercised) with LOSSLESS codebooks
    (k=512 >= the <=550 distinct subvectors) and its materialized
    index."""
    emb = load(spark, SF, "embeddings").select("vec_id", "embedding")
    dups = emb.where(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(dups)
    books = train_pq_codebooks(
        corpus, "vec_id", "embedding", DIM, m=8, k=512, sample_limit=4096
    )
    cents = hyperplanes(DIM, 8, seed=7)
    path = str(tmp_path_factory.mktemp("sdidx") / "idx")
    materialize_semdedup_index(corpus, cents, books, DIM, path)
    return corpus, cents, books, path


def test_lossless_index_face_equals_plain_semdedup(spark, lossless_setup):
    """In the lossless regime the index-served face must equal plain
    semdedup bit-for-bit: same cells (the index builder uses the same
    rounded-argmax assignment), same keep set (codes are injective, so
    the rep collapse is the collapse_identical argument; the 1e-6
    margin covers float addition order at the round-6 threshold)."""
    corpus, cents, books, path = lossless_setup
    want = sorted(
        map(tuple, semdedup(corpus, cents, threshold=0.3).collect())
    )
    got = sorted(
        map(
            tuple,
            semdedup_from_index(
                spark, path, cents, books, DIM, threshold=0.3
            ).collect(),
        )
    )
    assert got == want
    # the duplicated copies must all be dropped (their min-id original
    # is a cosine-1.0 mate), and at least their originals survive dedup
    kept = {d for d, _, k in got if k}
    assert not any(d >= 10000 for d in kept)


def test_candidate_scan_reads_codes_not_vectors(spark, lossless_setup):
    """THE plan assertion the verdict asked for: the candidate stage's
    index scan carries `codes` and never `nv` in its ReadSchema — m
    ints per vector instead of dim floats is the whole point of
    routing candidates through the PQ index."""
    from mbrainz_importer_spark.sources.bucketed import physical_plan

    corpus, cents, books, path = lossless_setup
    cand = _semdedup_index_candidates(spark, path, books, 0.3, 1e-6)
    scans = [
        ln
        for ln in physical_plan(cand).splitlines()
        if "FileScan parquet" in ln or "Scan parquet" in ln
    ]
    assert scans, physical_plan(cand)
    for ln in scans:
        assert "codes" in ln, ln
        assert "nv" not in ln.replace("nvl", ""), ln


def test_foreign_metadata_and_bad_threshold_raise(spark, lossless_setup):
    corpus, cents, books, path = lossless_setup
    with pytest.raises(ValueError, match="centroids"):
        semdedup_from_index(
            spark, path, hyperplanes(DIM, 8, seed=99), books, DIM
        )
    wrong_books = [[[0.0] * 8] * 4] * 8
    with pytest.raises(ValueError, match="codebooks"):
        semdedup_from_index(spark, path, cents, wrong_books, DIM)
    with pytest.raises(ValueError, match="threshold"):
        semdedup_from_index(spark, path, cents, books, DIM, threshold=1.0)


def test_semdedup_pq_exact_gate_matches_oracle(spark):
    """The registry gate at the driver's sf: the full index-served path
    must hash-equal the PQ-unaware semdedup oracle on the integer-grid
    corpus (same compare the driver runs)."""
    from mbrainz_importer_spark.queries.quantize_queries import (
        ORACLES,
        semdedup_pq_exact,
    )
    from tests.oracle import compare, duckdb_conn

    sf = "/root/testdata/sf0.01"
    con = duckdb_conn(sf)
    compare(semdedup_pq_exact(spark, sf), con, ORACLES["semdedup_pq_exact"])
