"""Entity-resolution (record linkage) gates over the part catalog.

The part table's two-token names ("cold gear" / "old gear") are the
dirty-catalog fixture: blocking on the noun token keeps candidate
generation an equi-join, Levenshtein on the adjective token verifies,
connected components resolve transitive chains ("hot" ~ "old" ~ "cold")
into one canonical form per entity. DuckDB mirrors every step exactly
(`levenshtein` has identical semantics in both engines; closure via
WITH RECURSIVE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import linkage as L
from ..tables import load

def _adj():
    return F.split(F.col("p_name"), " ").getItem(0)


def _noun():
    return F.split(F.col("p_name"), " ").getItem(1)


def er_fuzzy_name_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matcher over DISTINCT part names: block = noun
    token, verify = Levenshtein(adjective) <= 1. The distinct-forms
    fan-in means the pairwise work is bounded by the name vocabulary,
    never the catalog size."""
    names = load(spark, sf_dir, "part").select("p_name").distinct()
    return (
        L.fuzzy_matches(names, "p_name", _noun(), _adj(), max_edit=1)
        .select(
            F.col("key_a").alias("name_a"),
            F.col("key_b").alias("name_b"),
            "edit_dist",
        )
        .orderBy("name_a", "name_b")
    )


def er_resolved_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full resolution: match graph at edit distance <= 2, connected
    components (min-name canonical), every part row mapped onto its
    canonical form, aggregated to (canonical, n_parts, n_variants).
    The corpus touches the resolution machinery through exactly one
    hash join."""
    parts = load(spark, sf_dir, "part")
    names = parts.select("p_name").distinct()
    matches = L.fuzzy_matches(names, "p_name", _noun(), _adj(), max_edit=2)
    resolved = L.resolve_entities(parts.select("p_partkey", "p_name"), matches, "p_name")
    return (
        resolved.groupBy("canonical")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.countDistinct("p_name").alias("n_variants"),
        )
        .orderBy("canonical")
    )


QUERIES = {
    "er_fuzzy_name_matches": er_fuzzy_name_matches,
    "er_resolved_clusters": er_resolved_clusters,
}

_MATCH_SQL = """
    n AS (SELECT DISTINCT p_name FROM part),
    matches AS (
        SELECT a.p_name AS name_a, b.p_name AS name_b,
               CAST(levenshtein(split_part(a.p_name, ' ', 1),
                                split_part(b.p_name, ' ', 1)) AS INTEGER)
                   AS edit_dist
        FROM n a JOIN n b
          ON NULLIF(split_part(a.p_name, ' ', 2), '')
               = NULLIF(split_part(b.p_name, ' ', 2), '')
         AND a.p_name < b.p_name
    )
"""

ORACLES = {
    "er_fuzzy_name_matches": f"""
        WITH {_MATCH_SQL}
        SELECT name_a, name_b, edit_dist FROM matches
        WHERE edit_dist <= 1
        ORDER BY name_a, name_b
    """,
    "er_resolved_clusters": f"""
        WITH RECURSIVE {_MATCH_SQL},
        pairs AS (SELECT name_a, name_b FROM matches WHERE edit_dist <= 2),
        edges AS (
            SELECT name_a AS u, name_b AS v FROM pairs
            UNION SELECT name_b, name_a FROM pairs
        ),
        reach(u, v) AS (
            SELECT u, u FROM edges
            UNION
            SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u
        ),
        comp AS (SELECT u AS name, MIN(v) AS canonical FROM reach GROUP BY u)
        SELECT COALESCE(c.canonical, p.p_name) AS canonical,
               COUNT(*) AS n_parts,
               COUNT(DISTINCT p.p_name) AS n_variants
        FROM part p LEFT JOIN comp c ON p.p_name = c.name
        GROUP BY 1 ORDER BY canonical
    """,
}
