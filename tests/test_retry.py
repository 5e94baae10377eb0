"""Retry/backoff semantics vs the reference's busy loop
(batch.clj:62-101): transient classification, escalating capped delays,
conflict-swallow, immediate raise on real errors."""

from __future__ import annotations

import pytest

from mbrainz_importer_spark.operators.retry import (
    CONFLICT_SWALLOWED,
    ConflictError,
    SinkError,
    create_backoff,
    is_busy,
    retrying,
)


class FlakySink:
    """Injectable sink: raises the scripted errors, then succeeds."""

    def __init__(self, script):
        self.script = list(script)
        self.calls = 0

    def __call__(self):
        self.calls += 1
        if self.script:
            raise self.script.pop(0)
        return {"tx_data": ["datom"]}


def test_backoff_escalates_and_caps():
    b = create_backoff(start_ms=100, end_ms=400, factor=2.0)
    assert [b() for _ in range(5)] == [100, 200, 400, 400, 400]


def test_busy_classification():
    assert is_busy(SinkError("x", category="busy"))
    assert is_busy(SinkError("x", category="unavailable"))
    assert is_busy(SinkError("x", category="interrupted"))
    assert is_busy(SinkError("x", http_status=429))
    assert is_busy(SinkError("x", http_status=503))
    assert not is_busy(SinkError("x", category="incorrect"))
    assert not is_busy(SinkError("x", http_status=500))


def test_retries_busy_with_recorded_sleeps():
    sink = FlakySink([SinkError("throttled", http_status=503),
                      SinkError("busy", category="busy")])
    slept: list[float] = []
    out = retrying(sink, create_backoff(100, 10_000, 2.0), sleep=slept.append)
    assert out == {"tx_data": ["datom"]}
    assert sink.calls == 3
    assert slept == [0.1, 0.2]  # escalating, in seconds


def test_conflict_swallowed_as_already_applied():
    sink = FlakySink([ConflictError()])
    out = retrying(sink, sleep=lambda s: None)
    assert out is CONFLICT_SWALLOWED
    assert sink.calls == 1  # no retry — it IS applied
    with pytest.raises(ConflictError):
        retrying(FlakySink([ConflictError()]), swallow_conflict=False,
                 sleep=lambda s: None)


def test_non_busy_raises_immediately():
    sink = FlakySink([SinkError("schema violation", category="incorrect")])
    with pytest.raises(SinkError, match="schema violation"):
        retrying(sink, sleep=lambda s: None)
    assert sink.calls == 1


def test_max_tries_exhaustion_reraises():
    sink = FlakySink([SinkError("x", http_status=429)] * 10)
    with pytest.raises(SinkError):
        retrying(sink, max_tries=3, sleep=lambda s: None)
    assert sink.calls == 3


def test_backoff_none_gives_up():
    def give_up_immediately():
        return None

    sink = FlakySink([SinkError("x", http_status=503)] * 2)
    with pytest.raises(SinkError):
        retrying(sink, give_up_immediately, sleep=lambda s: None)
    assert sink.calls == 1
