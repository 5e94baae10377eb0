"""Sessionization + funnel operators (operators/sessions.py)."""

from __future__ import annotations

from datetime import datetime

import pytest

from mbrainz_importer_spark.operators.sessions import funnel_counts, sessionize


def _ev(uid, t, typ="view", eid=0):
    return (eid, datetime(2024, 1, 1, *t), uid, typ)


SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def test_sessionize_gap_boundaries(spark):
    rows = [
        _ev(1, (9, 0)), _ev(1, (9, 10)), _ev(1, (9, 41)),   # 31min gap -> new
        _ev(1, (12, 0)),
        _ev(2, (9, 0)),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = sorted(
        (r["user"], r["session_id"], r["n_events"])
        for r in sessionize(df, gap_minutes=30).collect()
    )
    # user1: [9:00, 9:10] | [9:41] | [12:00]; user2: [9:00]
    assert out == [(1, 0, 2), (1, 1, 1), (1, 2, 1), (2, 0, 1)]

    # exactly-at-gap does NOT split (strictly greater)
    df2 = spark.createDataFrame([_ev(1, (9, 0)), _ev(1, (9, 30))], SCHEMA)
    assert sessionize(df2, gap_minutes=30).count() == 1


def test_funnel_strict_order(spark):
    rows = [
        # u1 completes in order
        _ev(1, (9, 0), "signup"), _ev(1, (10, 0), "view"), _ev(1, (11, 0), "purchase"),
        # u2 views BEFORE signup -> stops at step 1
        _ev(2, (8, 0), "view"), _ev(2, (9, 0), "signup"),
        # u3 signup+view, no purchase
        _ev(3, (9, 0), "signup"), _ev(3, (9, 30), "view"),
        # u4 never signs up
        _ev(4, (9, 0), "purchase"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {r["step_name"]: r["n_users"]
           for r in funnel_counts(df, ["signup", "view", "purchase"]).collect()}
    assert out == {"signup": 3, "view": 2, "purchase": 1}

    with pytest.raises(ValueError, match="at least one"):
        funnel_counts(df, [])
