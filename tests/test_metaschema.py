"""Metaschema entity-table materialization: the relational projection of
metaschema/mbrainz.edn over an imported warehouse, queryable via
spark.sql."""

from __future__ import annotations

import pytest

from mbrainz_importer_spark.pipeline import Importer
from mbrainz_importer_spark.plans.metaschema import (
    build_entity_tables,
    expand_ref,
    register_metaschema,
)

REF = "/root/reference/subsets"


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh"))
    imp = Importer(spark, REF)
    imp.run_import(wh)
    tables = build_entity_tables(spark, wh, imp, f"{wh}/tables")
    return wh, imp, tables


def test_tables_materialized(warehouse):
    _, _, tables = warehouse
    assert set(tables) >= {
        "artist", "label", "abstract_release", "release",
        "release_artists", "arelease_artists",
        "country", "language", "script", "enum",
    }
    assert tables["artist"].count() == 4601
    # 11510 raw release rows contain 67 duplicate gids; unique-identity
    # merge (J2) compacts them to one entity each
    assert tables["release"].count() == 11434
    assert tables["country"].count() == 257


def test_card_many_refs_attached(warehouse):
    _, _, tables = warehouse
    rel = tables["release"]
    import pyspark.sql.functions as F

    total_links = rel.select(F.explode("artist_gids")).count()
    distinct_links = tables["release_artists"].count()
    assert total_links == distinct_links  # set semantics: deduped pairs


def test_sql_over_registered_views(warehouse, spark):
    wh, _, _ = warehouse
    names = register_metaschema(spark, f"{wh}/tables")
    assert "release" in names
    top = spark.sql("""
        SELECT a.name, COUNT(*) AS n_releases
        FROM release r
        JOIN release_artists ra ON r.gid = ra.release_gid
        JOIN artist a ON ra.artist_gid = a.gid
        GROUP BY a.name ORDER BY n_releases DESC, a.name LIMIT 3
    """).collect()
    assert len(top) == 3 and top[0]["n_releases"] >= top[2]["n_releases"]
    # dim join through resolved idents (country stored as ':country/XX')
    by_country = spark.sql("""
        SELECT c.name, COUNT(*) AS n
        FROM artist a JOIN country c ON a.country = c.ident
        GROUP BY c.name ORDER BY n DESC LIMIT 1
    """).collect()
    assert by_country[0]["n"] > 0


def test_expand_ref_helper(warehouse, spark):
    wh, _, _ = warehouse
    joined = expand_ref(spark, f"{wh}/tables", "release", "artists")
    assert joined.where(joined["artist__name"].isNotNull()).count() > 0
    with pytest.raises(KeyError):
        expand_ref(spark, f"{wh}/tables", "artist", "releases")
