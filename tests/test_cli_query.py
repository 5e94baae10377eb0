"""CLI query runner: verbatim Datomic query text against an imported
warehouse's tables (cli.py query mode — the explore_db.clj REPL flow)."""

from __future__ import annotations

import pytest

from mbrainz_importer_spark.cli import main, query_main, warehouse_datoms


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("wh")
    artists = spark.createDataFrame(
        [("g1", "Adamo", ":artist.type/person"),
         ("g2", "Blue Sharks", ":artist.type/group")],
        "gid string, name string, type string",
    )
    labels = spark.createDataFrame(
        [("L1", "Blue Note")], "gid string, name string"
    )
    links = spark.createDataFrame(
        [("r1", "g1")], "release_gid string, artist_gid string"
    )  # no gid column -> skipped by the datoms builder
    artists.write.parquet(str(wh / "tables" / "artist"))
    labels.write.parquet(str(wh / "tables" / "label"))
    links.write.parquet(str(wh / "tables" / "release_artists"))
    return str(wh)


def test_warehouse_query_data_and_schema(spark, warehouse, capsys):
    rc = query_main([
        warehouse,
        """[:find ?name
            :where [?a :artist/type ":artist.type/group"]
                   [?a :artist/name ?name]]""",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "'Blue Sharks'" in out and "'Adamo'" not in out

    # schema introspection works over the same db (schema-as-datoms)
    rc = query_main([
        warehouse,
        "[:find ?attr :where [?e :db/unique] [?e :db/ident ?attr]]",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "':artist/gid'" in out and "':label/gid'" in out


def test_warehouse_query_in_param(spark, warehouse, capsys):
    rc = main([
        "query", warehouse,
        """[:find ?name
            :in $ ?t
            :where [?a :artist/type ?t] [?a :artist/name ?name]]""",
        ":artist.type/person",
    ])
    assert rc == 0
    assert "'Adamo'" in capsys.readouterr().out


def test_query_usage_and_missing_tables(tmp_path, capsys):
    assert main(["query"]) == 2
    with pytest.raises(SystemExit, match="no gid-keyed"):
        query_main([str(tmp_path), "[:find ?x :where [?x :a ?v]]"])


def test_link_tables_skipped(spark, warehouse):
    datoms = warehouse_datoms(spark, warehouse)
    attrs = {r["a"] for r in datoms.select("a").distinct().collect()}
    assert ":artist/name" in attrs and ":label/name" in attrs
    assert not any(a.startswith(":release_artists/") for a in attrs)


def test_cli_curate(spark, tmp_path):
    from mbrainz_importer_spark.cli import curate_main

    docs = spark.createDataFrame(
        [(1, "a sensible document of ordinary varied prose right here"),
         (2, "spam " * 400)],
        "doc_id long, text string",
    )
    src = str(tmp_path / "docs")
    docs.write.parquet(src)
    out = str(tmp_path / "curated")
    assert curate_main([src, out, "-1.0"]) == 0
    kept = spark.read.parquet(f"{out}/kept")
    assert [r["doc_id"] for r in kept.collect()] == [1]  # spam fails the band
    verdicts = spark.read.parquet(f"{out}/verdicts")
    assert verdicts.count() == 2
    assert curate_main(["too-few"]) == 2


def test_cli_explain(spark, warehouse, capsys):
    from mbrainz_importer_spark.cli import explain_main

    rc = explain_main([
        warehouse,
        "[:find ?attr :where [?e :db/unique] [?e :db/ident ?attr]]",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out
    assert "Scan" in out  # a real plan, not a stringified logical tree
    assert explain_main(["only-one-arg"]) == 2
