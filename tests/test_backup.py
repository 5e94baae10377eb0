"""Store backup/restore (plans/eav.py): roundtrip fidelity, torn-copy
detection, and the refuse-invalid contracts."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from mbrainz_importer_spark.plans.eav import (
    backup_store,
    build_datoms,
    materialize_datoms,
    read_datoms,
    restore_store,
    store_fingerprint,
)
from mbrainz_importer_spark.tables import load


@pytest.fixture()
def store(spark, sf_dir, tmp_path):
    datoms = build_datoms({
        "region": (load(spark, sf_dir, "region"), "r_regionkey"),
    })
    path = str(tmp_path / "src")
    materialize_datoms(datoms, path)
    return path


def test_backup_restore_roundtrip(spark, store, tmp_path):
    bak, dst = str(tmp_path / "bak"), str(tmp_path / "dst")
    manifest = backup_store(spark, store, bak)
    assert os.path.exists(os.path.join(bak, "MANIFEST.json"))
    assert manifest["n_rows"] > 0 and manifest["partitions"]
    restore_store(spark, bak, dst)
    # content-identical: fingerprint and actual rows
    assert store_fingerprint(spark, dst) == store_fingerprint(spark, store)
    src_rows = sorted(map(tuple, read_datoms(spark, store).collect()))
    dst_rows = sorted(map(tuple, read_datoms(spark, dst).collect()))
    assert src_rows == dst_rows


def test_restore_refuses_corrupted_backup(spark, store, tmp_path):
    bak, dst = str(tmp_path / "bak"), str(tmp_path / "dst")
    backup_store(spark, store, bak)
    # bit-rot between backup and restore: drop one partition directory
    data = os.path.join(bak, "data")
    victim = next(
        d for d in os.listdir(data) if os.path.isdir(os.path.join(data, d))
    )
    shutil.rmtree(os.path.join(data, victim))
    with pytest.raises(RuntimeError, match="failed verification"):
        restore_store(spark, bak, dst)
    assert not os.path.exists(dst)


def test_restore_refuses_manifestless_tree(spark, store, tmp_path):
    bak = str(tmp_path / "bak")
    backup_store(spark, store, bak)
    os.remove(os.path.join(bak, "MANIFEST.json"))
    with pytest.raises(RuntimeError, match="not a backup"):
        restore_store(spark, bak, str(tmp_path / "dst"))


def test_fingerprint_is_layout_independent(spark, store, tmp_path):
    # rewriting the same content with a different partition count must
    # not change the fingerprint
    df = spark.read.parquet(store)
    repart = str(tmp_path / "repart")
    df.repartition(7).write.partitionBy("a").parquet(repart)
    assert store_fingerprint(spark, repart) == store_fingerprint(spark, store)


def test_manifest_census_matches_tree(spark, store, tmp_path):
    bak = str(tmp_path / "bak")
    manifest = backup_store(spark, store, bak)
    with open(os.path.join(bak, "MANIFEST.json")) as f:
        assert json.load(f) == manifest
