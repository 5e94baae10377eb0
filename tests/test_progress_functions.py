"""P10 progress instrumentation (observe API) and the functions/ engine
surface module."""

from __future__ import annotations

import pyspark.sql.functions as F

from mbrainz_importer_spark import functions as EF
from mbrainz_importer_spark.operators.progress import observed, observed_counter
from mbrainz_importer_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_observed_metrics_piggyback_on_action(spark):
    df = load(spark, SF, "orders")
    df2, obs = observed(
        df, "orders_scan",
        rows=F.count(F.lit(1)),
        total=F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"),
    )
    n = df2.count()  # the metric rides along with this action
    got = obs.get
    assert got["rows"] == n == 1500
    assert got["total"] > 0


def test_observed_counter_rides_write_action(spark):
    df = load(spark, SF, "lineitem").repartition(4)
    df2, obs = observed_counter(df)
    df2.write.format("noop").mode("overwrite").save()
    assert obs.get["rows"] == 6000


def test_tempid_matches_reference_shape(spark):
    df = spark.createDataFrame([(7, 2)], "id long, tracknum long")
    out = df.select(EF.tempid("track", "id", "tracknum").alias("t")).collect()[0]["t"]
    assert out == "track-7-2"  # create-tempid, importer.clj:161-164


def test_scalar_surface_exports():
    for name in ("concat_ws", "regexp_replace", "date_trunc", "from_json",
                 "explode", "least", "greatest", "fingerprint", "tempid"):
        assert callable(getattr(EF, name)), name
