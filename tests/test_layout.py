"""Z-order layout (operators/layout.py): Morton key math and the
multi-dimensional locality it buys (fewer files touched per 2-D box
than a linear sort)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mbrainz_importer_spark.operators.layout import zorder_write, zvalue


def test_zvalue_bit_interleave(spark):
    df = spark.createDataFrame([(3, 5)], "x long, y long")
    z = df.select(zvalue([F.col("x"), F.col("y")], bits=4).alias("z")).collect()[0]["z"]
    # x=0b0011 into even positions, y=0b0101 into odd:
    # bits: y2 x1 y1 x0 y0 -> 0b100111 = 39
    assert z == 0b100111 == 39

    with pytest.raises(ValueError, match="at least two"):
        zvalue([F.col("x")])
    with pytest.raises(ValueError, match="64-bit"):
        zvalue([F.col("x"), F.col("y")], bits=32)


def test_zorder_layout_locality(spark, tmp_path):
    """A 2-D box query touches FEWER files under z-order than under a
    linear x-sort — the pruning effect the layout exists for."""
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long")
    zpath, lpath = str(tmp_path / "zorder"), str(tmp_path / "linear")

    zorder_write(df, ["x", "y"], zpath, n_files=16, bits=6)
    (df.repartitionByRange(16, "x").sortWithinPartitions("x")
       .write.mode("overwrite").parquet(lpath))

    def files_touched(path):
        return (
            spark.read.parquet(path)
            .where((F.col("x") >= 8) & (F.col("x") < 16)
                   & (F.col("y") >= 8) & (F.col("y") < 16))
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    z_files, l_files = files_touched(zpath), files_touched(lpath)
    # the 8x8 box is one-ish z-range => few files; the linear layout
    # spreads every y for the x-range across its files
    assert z_files <= 2, z_files
    assert z_files < l_files, (z_files, l_files)

    # round-trip completeness: clustering rearranges, never drops
    assert spark.read.parquet(zpath).count() == 64 * 64
