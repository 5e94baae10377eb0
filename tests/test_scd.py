"""SCD2 merge + as-of reads (operators/scd.py)."""

from __future__ import annotations

from datetime import date

import pytest

from mbrainz_importer_spark.operators.scd import as_of_dim, scd2_apply

DIM_SCHEMA = "k long, seg string, effective_from date, effective_to date"
CH_SCHEMA = "k long, seg string, effective_from date"


def test_scd2_chain_noop_and_history_passthrough(spark):
    dim = spark.createDataFrame(
        [
            (1, "OLD", date(2023, 1, 1), date(2024, 1, 1)),  # closed history
            (1, "A", date(2024, 1, 1), None),
            (2, "B", date(2024, 1, 1), None),
        ],
        DIM_SCHEMA,
    )
    changes = spark.createDataFrame(
        [
            (1, "X", date(2024, 2, 1)),   # real change
            (1, "Y", date(2024, 3, 1)),   # chained second change
            (2, "B", date(2024, 2, 1)),   # no-op: same tracked value
            (3, "NEW", date(2024, 2, 1)), # brand-new key
        ],
        CH_SCHEMA,
    )
    out = scd2_apply(dim, changes, "k", ["seg"])
    rows = sorted(
        (r["k"], r["seg"], str(r["effective_from"]), r["effective_to"] and str(r["effective_to"]))
        for r in out.collect()
    )
    assert rows == [
        (1, "A", "2024-01-01", "2024-02-01"),
        (1, "OLD", "2023-01-01", "2024-01-01"),   # untouched history
        (1, "X", "2024-02-01", "2024-03-01"),
        (1, "Y", "2024-03-01", None),
        (2, "B", "2024-01-01", None),             # no-op left current open
        (3, "NEW", "2024-02-01", None),
    ]

    # as-of reads: one row per key at any instant
    feb = {(r["k"], r["seg"]) for r in as_of_dim(out, date(2024, 2, 15)).collect()}
    assert feb == {(1, "X"), (2, "B"), (3, "NEW")}
    jan = {(r["k"], r["seg"]) for r in as_of_dim(out, date(2024, 1, 15)).collect()}
    assert jan == {(1, "A"), (2, "B")}

    with pytest.raises(ValueError, match="tracked"):
        scd2_apply(dim, changes, "k", [])
