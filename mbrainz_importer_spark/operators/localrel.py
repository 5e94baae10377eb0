"""Tiny driver-side literal relations WITHOUT the Python-RDD scan.

`spark.createDataFrame(<python list>)` plans the rows as a Python RDD:
every scan task launches (or attaches to) a Python worker just to
unpickle its slice — measured on this engine's serving paths at 32
tasks x ~1.5 s of worker spin-up for a THREE-row term relation
(fulltext_bm25_from_index stage 4: 50.3 s of task time, zero input
bytes). That is the guide §4 JVM<->Python boundary hiding without any
BatchEvalPython node in the plan.

`local_df` renders the same rows as a `SELECT CAST(...) FROM VALUES`
plan instead: a pure-JVM LocalRelation — zero scan tasks, zero Python
workers, constant-folded by Catalyst, and broadcast builds against it
stay driver-local. Literal support is deliberately narrow (str, bool,
int, float, None) with an explicit CAST per column pinning the dtypes
to the caller's DDL schema; anything fancier falls back to
createDataFrame.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame


def _sql_literal(v, sql_type: str) -> str:
    if v is None:
        return f"CAST(NULL AS {sql_type})"
    if isinstance(v, bool):
        return f"CAST({'true' if v else 'false'} AS {sql_type})"
    if isinstance(v, str):
        esc = v.replace("\\", "\\\\").replace("'", "\\'")
        return f"CAST('{esc}' AS {sql_type})"
    if isinstance(v, int):
        return f"CAST({v} AS {sql_type})"
    if isinstance(v, float):
        if not math.isfinite(v):  # inf/nan have no plain SQL literal
            raise TypeError("non-finite float")
        return f"CAST('{v!r}' AS {sql_type})"
    raise TypeError(f"unsupported literal type {type(v).__name__}")


def local_df(spark, rows, schema) -> DataFrame:
    """A DataFrame of literal `rows` under `schema` (a DDL string
    "name type, ..." or a flat StructType) planned as a JVM
    LocalRelation. Row-for-row equivalent to
    spark.createDataFrame(rows, schema) (pinned in test_localrel) but
    with no Python-RDD scan. Falls back to createDataFrame for empty
    input (already a LocalRelation), unsupported literal types, or
    implausibly large row lists (these relations are driver-literal
    by contract)."""
    nullable = True
    if isinstance(schema, str):
        fields = [f.strip().rsplit(None, 1) for f in schema.split(",")]
    else:  # StructType: all-nullable renders with the sentinel row,
        # all-non-nullable renders bare (CAST literals are already
        # non-nullable); a mixed schema keeps the createDataFrame shape
        flags = {f.nullable for f in schema.fields}
        if len(flags) > 1:
            return spark.createDataFrame(rows, schema)
        nullable = flags.pop()
        fields = [(f.name, f.dataType.simpleString()) for f in schema.fields]
    if not rows or len(rows) > 10_000:
        return spark.createDataFrame(rows, schema)
    try:
        rendered = []
        for row in rows:
            vals = (
                row if isinstance(row, (tuple, list)) else (row,)
            )
            if len(vals) != len(fields):
                raise TypeError("row width != schema width")
            rendered.append(
                [_sql_literal(v, t) for v, (_n, t) in zip(vals, fields)]
            )
    except TypeError:
        return spark.createDataFrame(rows, schema)
    cols = ", ".join(
        f"c{i} AS `{n}`" for i, (n, _t) in enumerate(fields)
    )
    if not nullable:
        names = ", ".join(f"c{i}" for i in range(len(fields)))
        values = ", ".join(f"({', '.join(r)})" for r in rendered)
        return spark.sql(
            f"SELECT {cols} FROM (VALUES {values}) AS t({names})"
        )
    # a sentinel all-NULL row (filtered back out by its marker) keeps
    # every output column NULLABLE — exactly the schema
    # createDataFrame reports — where pure CAST literals would come
    # out non-nullable and change downstream schemas
    rendered.append([f"CAST(NULL AS {t})" for _n, t in fields])
    marker = f"c{len(fields)}"
    values = ", ".join(
        f"({', '.join(r)}, {'1' if i == len(rendered) - 1 else 'NULL'})"
        for i, r in enumerate(rendered)
    )
    names = ", ".join(f"c{i}" for i in range(len(fields) + 1))
    return spark.sql(
        f"SELECT {cols} FROM (VALUES {values}) AS t({names}) "
        f"WHERE {marker} IS NULL"
    )
