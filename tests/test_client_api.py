"""Client-API tail (plans/client.py): qseq, entid, ident, squuid,
basis-t, db-stats."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from mbrainz_importer_spark.plans.client import (
    basis_t, db_stats, entid, ident, qseq, squuid,
)
from mbrainz_importer_spark.plans.datalog import DatalogError, q


def _datoms(spark):
    rows = [
        ("artist:1", ":artist/gid", "g-1", None),
        ("artist:1", ":artist/name", "Bowie", None),
        ("artist:2", ":artist/gid", "g-2", None),
        ("artist:2", ":artist/name", "Eno", None),
        ("db.attr:artist/gid", ":db/ident", ":artist/gid", None),
        ("db.attr:artist/gid", ":db/unique", ":db.unique/identity", None),
    ]
    return spark.createDataFrame(rows, "e string, a string, v string, v_num double")


class TestQseq:
    def test_lazy_iterator_matches_q(self, spark):
        d = _datoms(spark)
        query = {"find": ["?e", "?n"], "where": [["?e", ":artist/name", "?n"]]}
        it = qseq(query, d)
        assert not isinstance(it, list)
        got = {(r["e"], r["n"]) for r in it}
        want = {(r["e"], r["n"]) for r in q(query, d).collect()}
        assert got == want == {("artist:1", "Bowie"), ("artist:2", "Eno")}


class TestEntidIdent:
    def test_lookup_ref(self, spark):
        d = _datoms(spark)
        assert entid(d, [":artist/gid", "g-2"]) == "artist:2"
        assert entid(d, [":artist/gid", "nope"]) is None

    def test_ident_keyword_and_passthrough(self, spark):
        d = _datoms(spark)
        assert entid(d, ":artist/gid") == "db.attr:artist/gid"
        assert entid(d, "artist:1") == "artist:1"
        assert ident(d, "db.attr:artist/gid") == ":artist/gid"
        assert ident(d, ":already/ident") == ":already/ident"
        assert ident(d, "artist:1") is None

    def test_ambiguous_lookup_raises(self, spark):
        d = _datoms(spark).union(
            spark.createDataFrame(
                [("artist:9", ":artist/gid", "g-2", None)],
                "e string, a string, v string, v_num double",
            )
        )
        with pytest.raises(DatalogError, match="multiple"):
            entid(d, [":artist/gid", "g-2"])

    def test_bad_ref_shape(self, spark):
        with pytest.raises(DatalogError, match="lookup ref"):
            entid(_datoms(spark), [":artist/gid"])


class TestSquuid:
    def test_time_prefix_sorts_and_is_deterministic(self, spark):
        df = spark.createDataFrame(
            [(1, "2024-01-01 00:00:00"), (2, "2025-06-01 12:00:00")],
            "id bigint, ts string",
        ).select("id", F.col("ts").cast("timestamp").alias("ts"))
        out = df.select(
            "id", squuid(F.col("ts"), F.col("id")).alias("u")
        ).orderBy("id").collect()
        u1, u2 = out[0]["u"], out[1]["u"]
        pat = r"^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-8[0-9a-f]{3}-[0-9a-f]{12}$"
        assert re.match(pat, u1) and re.match(pat, u2)
        assert u1 < u2  # later timestamp sorts later (top-32-bit property)
        again = df.select(squuid(F.col("ts"), F.col("id")).alias("u")).orderBy(
            "u"
        ).collect()
        assert [r["u"] for r in again] == [u1, u2]


class TestStats:
    def test_basis_t_and_db_stats(self, spark):
        log = spark.createDataFrame(
            [("e1", ":a/x", "1", 100, True), ("e1", ":a/x", "2", 105, True)],
            "e string, a string, v string, tx bigint, added boolean",
        )
        assert basis_t(log) == 105
        stats = {r["attr"]: r["datom_count"] for r in db_stats(_datoms(spark)).collect()}
        assert stats["*"] == 6
        assert stats[":artist/name"] == 2


class TestVaetIndex:
    def test_reverse_lookup(self, spark):
        from mbrainz_importer_spark.plans.eav import datoms_index

        rows = [
            ("nation:1", ":nation/n_regionkey", "7", 7.0),
            ("nation:2", ":nation/n_regionkey", "8", 8.0),
            ("supplier:5", ":supplier/s_nationkey", "7", 7.0),
            ("nation:1", ":nation/n_name", "7", None),  # NOT a ref attr
        ]
        d = spark.createDataFrame(rows, "e string, a string, v string, v_num double")
        out = datoms_index(
            d, "vaet", v="7",
            ref_attrs={":nation/n_regionkey", ":supplier/s_nationkey"},
        ).collect()
        assert {(r["e"], r["a"]) for r in out} == {
            ("nation:1", ":nation/n_regionkey"),
            ("supplier:5", ":supplier/s_nationkey"),
        }

    def test_vaet_requires_ref_attrs(self, spark):
        import pytest as _pytest
        from mbrainz_importer_spark.plans.eav import datoms_index

        d = spark.createDataFrame([], "e string, a string, v string, v_num double")
        with _pytest.raises(ValueError, match="ref_attrs"):
            datoms_index(d, "vaet")


class TestAlterIdent:
    def test_rename_rewrites_data_and_schema(self, spark):
        from mbrainz_importer_spark.plans.client import entid
        from mbrainz_importer_spark.plans.eav import alter_ident
        from mbrainz_importer_spark.plans.datalog import q

        rows = [
            ("artist:1", ":artist/name", "Bowie", None),
            ("db.attr:artist/name", ":db/ident", ":artist/name", None),
        ]
        d = spark.createDataFrame(rows, "e string, a string, v string, v_num double")
        renamed = alter_ident(d, ":artist/name", ":artist/title")
        got = q(
            {"find": ["?v"], "where": [["?e", ":artist/title", "?v"]]}, renamed
        ).collect()
        assert [r["v"] for r in got] == ["Bowie"]
        # old name finds nothing; schema ident entity follows the rename
        assert renamed.where(F.col("a") == ":artist/name").count() == 0
        assert entid(renamed, ":artist/title") == "db.attr:artist/name"
        assert entid(renamed, ":artist/name") is None


class TestQueryStats:
    def test_per_clause_rows(self, spark):
        from mbrainz_importer_spark.plans.client import query_stats

        rows = [
            ("artist:1", ":artist/name", "Bowie", None),
            ("artist:2", ":artist/name", "Eno", None),
            ("artist:1", ":artist/year", "1970", 1970.0),
        ]
        d = spark.createDataFrame(rows, "e string, a string, v string, v_num double")
        st = query_stats(
            {
                "find": ["?e"],
                "where": [["?e", ":artist/name", "?n"], ["?e", ":artist/year", "?y"]],
            },
            d,
        )
        assert [s["rows_out"] for s in st] == [2, 1]
        assert st[0]["clause"] == ["?e", ":artist/name", "?n"]


class TestAttribute:
    def test_attribute_record(self, spark):
        from mbrainz_importer_spark.plans.client import attribute
        from mbrainz_importer_spark.plans.eav import schema_datoms

        df = spark.createDataFrame([(1, "x")], "id int, name string")
        sch = schema_datoms(
            spark, {"t": (df, "id")}, fulltext={":t/name"}
        )
        rec = attribute(sch, ":t/name")
        assert rec["ident"] == ":t/name"
        assert rec["value_type"] == ":db.type/string"
        assert rec["cardinality"] == ":db.cardinality/one"
        assert rec["fulltext"] is True
        assert rec["unique"] is None and rec["is_component"] is False

        rec_id = attribute(sch, ":t/id")
        assert rec_id["unique"] == ":db.unique/identity"
        # by entity id too
        assert attribute(sch, "db.attr:t/id")["ident"] == ":t/id"
        # missing -> None
        assert attribute(sch, ":t/nope") is None

    def test_attribute_non_attr_entity(self, spark):
        import pytest as _pytest

        from mbrainz_importer_spark.plans.client import attribute
        from mbrainz_importer_spark.plans.datalog import DatalogError

        datoms = spark.createDataFrame(
            [("e1", ":t/name", "v", None)],
            "e string, a string, v string, v_num double",
        )
        with _pytest.raises(DatalogError, match="not an attribute"):
            attribute(datoms, "e1")


class TestQseqChunked:
    def test_chunk_boundaries_and_laziness(self, spark):
        """Partial consumption across partition boundaries: a 200-row
        relation spread over 8 result partitions, consumed 7 rows at a
        time through a plain generator protocol — islice stops inside a
        chunk, resumes, and the full drain equals the eager q() set.
        Laziness is the toLocalIterator contract (partitions fetched
        on demand); what we certify here is that the iterator is NOT a
        pre-materialized list and survives boundary-straddling reads."""
        import itertools

        from mbrainz_importer_spark.plans.eav import table_datoms

        df = spark.range(200).selectExpr(
            "cast(id as string) as id", "cast(id % 17 as string) as grp"
        )
        d = table_datoms(df, "row", "id")
        query = {
            "find": ["?i", "?g"],
            "where": [["?e", ":row/id", "?i"], ["?e", ":row/grp", "?g"]],
        }
        it = qseq(query, d)
        assert iter(it) is it and not isinstance(it, (list, tuple))
        first = list(itertools.islice(it, 7))          # stop mid-chunk
        second = list(itertools.islice(it, 190))       # straddle many chunks
        rest = list(it)                                # drain
        assert len(first) + len(second) + len(rest) == 200
        got = {(r["i"], r["g"]) for r in first + second + rest}
        want = {(r["i"], r["g"]) for r in q(query, d).collect()}
        assert got == want and len(got) == 200

    def test_qseq_edn_text_face(self, spark):
        from mbrainz_importer_spark.plans.client import qseq_edn

        d = _datoms(spark)
        it = qseq_edn("[:find ?n :where [?e :artist/name ?n]]", d)
        assert sorted(r["n"] for r in it) == ["Bowie", "Eno"]
