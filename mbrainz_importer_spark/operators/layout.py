"""Z-order (Morton-curve) data layout — the multi-dimensional
clustering technique lakehouse engines expose as OPTIMIZE ... ZORDER BY:
interleaving the bits of several columns yields a single sort key whose
ranges are simultaneously local in EVERY dimension, so per-file min/max
statistics prune scans filtered on ANY of the z-ordered columns (a
plain sort only helps its leading column).

The z-value is pure integer bit arithmetic —

    z = sum over bit b, column c of   ((x_c >> b) & 1) << (b*N + c)

— unrolled into shift/mask/multiply expressions (whole-stage codegen,
no UDF) and exactly reproducible in any engine, so the key itself is
oracle-certifiable even though file layout is not SQL-visible.

At 100 TB: `zorder_write` range-partitions on the z-key and sorts
within partitions, which is exactly one shuffle to produce a layout
that cuts every future multi-predicate scan; the locality test in
tests/test_layout.py demonstrates the pruning effect by measuring how
few files a 2-D box touches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low `bits` bits of each (non-negative integral)
    column into one Morton key. Column i contributes bit b to output
    position b*len(cols) + i. Inputs are masked to `bits` bits first
    (callers bucket/rank wider domains down — layout needs locality,
    not injectivity). len(cols) * bits must fit in 63 bits."""
    n = len(cols)
    if n < 2:
        raise ValueError("zvalue needs at least two columns to interleave")
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed 64-bit key")
    mask = (1 << bits) - 1
    z = F.lit(0).cast("bigint")
    for i, c in enumerate(cols):
        x = c.cast("bigint").bitwiseAND(F.lit(mask))
        for b in range(bits):
            bit = F.shiftright(x, b).bitwiseAND(F.lit(1))
            z = z + bit * F.lit(1 << (b * n + i))
    return z


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Write parquet clustered on the Morton key: range-partition into
    `n_files` z-ranges (one shuffle) and sort within each, so every
    file covers a compact z-range => a compact box in every z-ordered
    dimension => per-file min/max stats prune multi-predicate scans."""
    keyed = df.withColumn("__z", zvalue([F.col(c) for c in cols], bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
