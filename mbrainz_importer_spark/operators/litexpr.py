"""Cheap construction of large literal array expressions.

`F.array(*[F.lit(x) for x in xs])` (and `F.lit(list)`) cross the py4j
bridge once per ELEMENT — ~1.3 s of driver-side chatter for a
2080-element array, paid at every query-construction call (measured in
the r13 optimization round: `embedding_covariance_q8` spent ~3 s of its
11 s sf0.1 wall building two such maps; guide §1.2 "per-task work"
applies to the driver too). Building the same literal through ONE
`F.expr("array(...)")` string hands the whole array to the JVM parser
in a single call (~20 ms), and the parsed plan node is the identical
CreateArray-of-Literal tree — same analysis, same codegen, same result.

Exactness: doubles format via repr() with the SQL `D` suffix — repr of
a finite float round-trips bit-exactly, and the `D` suffix parses as
DOUBLE (a bare decimal literal would parse as DECIMAL). Non-finite
values (nan/inf) have no SQL literal form, so those arrays fall back to
the element-wise builder — correctness never depends on the fast path.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _fmt_double(x: float) -> str:
    return repr(float(x)) + "D"


def lit_doubles(values) -> Column:
    """array<double> literal in one py4j call (fallback: element-wise)."""
    vals = [float(x) for x in values]
    if not vals:
        return F.array().cast("array<double>")
    if all(math.isfinite(x) for x in vals):
        return F.expr("array(" + ",".join(_fmt_double(x) for x in vals) + ")")
    return F.array(*[F.lit(x) for x in vals])


def lit_ints(values) -> Column:
    """array<int> literal in one py4j call."""
    vals = [int(x) for x in values]
    if not vals:
        return F.array().cast("array<int>")
    return F.expr("array(" + ",".join(str(x) for x in vals) + ")")


def lit_double_matrix(rows) -> Column:
    """array<array<double>> literal in one py4j call (fallback:
    element-wise when any cell is non-finite)."""
    mat = [[float(x) for x in r] for r in rows]
    if all(math.isfinite(x) for r in mat for x in r):
        return F.expr(
            "array("
            + ",".join(
                "array(" + ",".join(_fmt_double(x) for x in r) + ")"
                for r in mat
            )
            + ")"
        )
    return F.array(*[F.array(*[F.lit(x) for x in r]) for r in mat])
