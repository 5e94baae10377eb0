"""Retry/backoff for remote (non-committer) sinks — the reference's
busy-retry loop re-expressed (cognitect/xform/batch.clj:62-101).

The parquet path needs none of this: Spark's output committer + task
retries give atomic batch commits (see operators/idempotency.py module
docstring). But a JDBC/REST/transactor sink commits per call, so the
driver-side `foreachBatch` body must bring back the reference's
semantics:

  - busy / unavailable / interrupted anomalies and HTTP 429/503 are
    TRANSIENT: retry with escalating backoff
    (busy?, batch.clj:70-75; create-backoff, batch.clj:62-68);
  - a CONFLICT means the batch was already applied by a concurrent
    loader: swallow it as success (transact-batch*, batch.clj:93-101 —
    prints "C" and returns {:tx-data nil});
  - anything else is a real error: raise immediately.

This module is pure driver-side control flow (no Spark imports) — at
scale it wraps the per-micro-batch sink call inside foreachBatch, which
runs on the driver once per batch, so the loop adds no executor-side
cost.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import Any

BUSY_CATEGORIES = frozenset({"busy", "unavailable", "interrupted"})
BUSY_HTTP_STATUSES = frozenset({429, 503})

#: sentinel returned when a conflict was swallowed as already-applied
#: (the reference returns {:tx-data nil})
CONFLICT_SWALLOWED = {"tx_data": None}


class SinkError(Exception):
    """Error from a remote sink, carrying the reference's anomaly
    classification: a category keyword and/or an HTTP status."""

    def __init__(self, msg: str, category: str | None = None,
                 http_status: int | None = None):
        super().__init__(msg)
        self.category = category
        self.http_status = http_status


class ConflictError(SinkError):
    """Concurrent duplicate transaction (::anom/conflict)."""

    def __init__(self, msg: str = "conflict"):
        super().__init__(msg, category="conflict")


def is_busy(err: SinkError) -> bool:
    """busy? (batch.clj:70-75): transient, worth retrying."""
    return (
        err.category in BUSY_CATEGORIES
        or err.http_status in BUSY_HTTP_STATUSES
    )


def create_backoff(
    start_ms: float = 100, end_ms: float = 10_000, factor: float = 2.0
) -> Callable[[], float]:
    """Escalating capped backoff (create-backoff, batch.clj:62-68):
    successive calls return start, start*factor, ... capped at end."""
    state = {"ms": start_ms / factor}

    def backoff() -> float:
        state["ms"] = min(state["ms"] * factor, end_ms)
        return state["ms"]

    return backoff


def retrying(
    f: Callable[[], Any],
    backoff: Callable[[], float | None] | None = None,
    *,
    max_tries: int | None = None,
    swallow_conflict: bool = True,
    sleep: Callable[[float], None] = time.sleep,
) -> Any:
    """Call `f` until it succeeds, retrying busy errors with backoff
    (retrying, batch.clj:77-91). `backoff` returns the next delay in ms,
    or None to give up (re-raising the last busy error); `max_tries`
    bounds total attempts. Conflicts are swallowed as already-applied
    (returning CONFLICT_SWALLOWED) unless swallow_conflict=False.
    `sleep` is injectable for tests."""
    backoff = backoff or create_backoff()
    tries = 0
    while True:
        tries += 1
        try:
            return f()
        except ConflictError:
            if swallow_conflict:
                return CONFLICT_SWALLOWED
            raise
        except SinkError as err:
            if not is_busy(err):
                raise
            if max_tries is not None and tries >= max_tries:
                raise
            ms = backoff()
            if ms is None:
                raise
            sleep(ms / 1000.0)
