"""Oracle comparison harness mirroring the driver's t2 gate:
row-count + column-name set + order-insensitive canonical value compare
between a Spark DataFrame and DuckDB running the oracle SQL over the same
parquet tables.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from mbrainz_importer_spark.tables import TABLE_NAMES

REL_TOL = 1e-9


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # canonical repr; tiny fp drift tolerated via rounding to 9 sig decimals
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    from decimal import Decimal

    if isinstance(v, Decimal):
        return f"{float(v):.9g}"
    return v


def rows_canonical(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


_DUCK_TO_SPARK = {
    "TINYINT": "tinyint",
    "SMALLINT": "smallint",
    "INTEGER": "int",
    "BIGINT": "bigint",
    "FLOAT": "float",
    "DOUBLE": "double",
    "VARCHAR": "string",
    "BOOLEAN": "boolean",
    "TIMESTAMP": "timestamp_ntz",
    "DATE": "date",
}


def _check_types(spark_df, rel) -> list[str]:
    """Strict-ish dtype alignment; returns list of problems."""
    s_types = dict(spark_df.dtypes)
    problems = []
    for col, dt in zip(rel.columns, rel.types):
        duck = str(dt)
        expect = _DUCK_TO_SPARK.get(duck)
        if expect is None:
            # decimals/lists: compare loosely by family
            fam = duck.split("(")[0].lower()
            if not s_types.get(col, "").startswith(fam.lower()[:4]):
                problems.append(f"{col}: duckdb={duck} spark={s_types.get(col)}")
        elif s_types.get(col) != expect:
            problems.append(f"{col}: duckdb={duck}->{expect} spark={s_types.get(col)}")
    return problems


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = rel.columns
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"columns differ: {s_cols} vs {d_cols}"
    problems = _check_types(spark_df, rel)
    assert not problems, f"dtype mismatches: {problems}"
    assert len(s_rows) == len(d_rows), f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}"

    s_canon = rows_canonical(s_cols, s_rows)
    d_canon = rows_canonical(d_cols, d_rows)
    mismatches = [
        (a, b) for a, b in zip(s_canon, d_canon) if a != b
    ]
    assert not mismatches, (
        f"value mismatch ({len(mismatches)}/{len(s_canon)} rows); first 3: {mismatches[:3]}"
    )
