"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``mbrainz_importer_spark``; this module is a thin
adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mbrainz_importer_spark.queries import all_oracles, all_queries
from mbrainz_importer_spark.queries.core import q5_region_revenue

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    q5_region_revenue: 6-table star join (broadcast dims + shuffled fact
    joins + grouped decimal-exact aggregation) — the widest single plan in
    the engine.
    """
    return q5_region_revenue(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (omitted ⇒ rows-only check)."""
    return all_oracles()
