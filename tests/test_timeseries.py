"""Gap fill + forward fill (operators/timeseries.py)."""

from __future__ import annotations

import datetime as dt

from mbrainz_importer_spark.operators.timeseries import gapfill_daily


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, ts timestamp_ntz, value double"
    )


def test_gapfill_synthesizes_missing_days_and_ffills(spark):
    d = dt.datetime
    ev = _ev(
        spark,
        [
            (1, d(2024, 1, 1, 9), 10.0),
            (1, d(2024, 1, 1, 17), 5.0),
            (1, d(2024, 1, 4, 12), 7.0),  # 3-day gap: Jan 2, Jan 3 missing
        ],
    )
    out = {r.day_idx: r for r in gapfill_daily(ev, "user_id", "ts", "value").collect()}
    base = (dt.date(2024, 1, 1) - dt.date(1970, 1, 1)).days
    assert sorted(out) == [base, base + 1, base + 2, base + 3]
    assert out[base].n_events == 2 and out[base].day_value == 15.0
    assert not out[base].is_gap
    for i in (1, 2):
        g = out[base + i]
        assert g.is_gap and g.n_events == 0 and g.day_value == 0.0
        assert g.ffill_value == 15.0  # carried across the gap
    assert out[base + 3].ffill_value == 7.0


def test_gapfill_spans_are_per_key(spark):
    d = dt.datetime
    ev = _ev(
        spark,
        [
            (1, d(2024, 1, 1), 1.0),
            (1, d(2024, 1, 3), 1.0),
            (2, d(2024, 2, 10), 2.0),  # disjoint span; no cross-key fill
        ],
    )
    rows = gapfill_daily(ev, "user_id", "ts", "value").collect()
    per_key = {}
    for r in rows:
        per_key.setdefault(r.user_id, []).append(r.day_idx)
    assert len(per_key[1]) == 3  # Jan 1..3
    assert len(per_key[2]) == 1  # single observed day, no spine growth
