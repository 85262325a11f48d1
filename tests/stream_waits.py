"""Shared streaming-query wait helpers for the test suite.

Two termination regimes, one module (r14 — the r13 driver run showed
the suite stalling in the streaming region because each test file
carried its own copy of the discipline, or none):

* :func:`await_terminated` — for availableNow queries WITHOUT timer
  state: they self-terminate once the planned offsets are consumed,
  so waiting must ASSERT termination (a bare ``awaitTermination(n)``
  returns False silently on timeout, the test then reads a
  half-written sink, and the still-running query starves every later
  streaming test in the shared session — the r13 cascade).
* :func:`drain_and_stop` — for availableNow queries WITH
  ``ProcessingTimeTimeout`` state (the TTL paths):
  ``FlatMapGroupsWithStateExec.shouldRunAnotherBatch`` stays true
  while timers are registered, so the query spins "no new data but
  cleaning up state" batches until the TTL horizon and NEVER
  self-terminates; ``processAllAvailable()`` blocks forever for the
  same reason. Poll progress for the drained signal instead, then
  stop the query.
"""

from __future__ import annotations

import time


def await_terminated(q, timeout: int = 300) -> None:
    """Wait for a self-terminating availableNow query, loudly and
    leak-free: assert termination, and stop the query if it is still
    running so it cannot starve later tests in the shared session."""
    try:
        assert q.awaitTermination(timeout), f"streaming query still running after {timeout}s"
    finally:
        if q.isActive:
            q.stop()


def drain_and_stop(q, timeout: int = 60) -> None:
    """Drain an availableNow query that BY DESIGN never terminates
    (ProcessingTimeTimeout state keeps the batch loop alive until the
    TTL horizon), then stop it.

    Drained signal: a COMPLETED zero-input batch after at least one
    data batch — with availableNow that means the planned offsets are
    fully consumed and committed, and every later batch is pure timer
    upkeep. Timer-upkeep batches run every ~3 s, so the signal
    normally appears seconds after the last data batch.

    Budget discipline (r13 verdict item 1): the old 240 s-per-site
    ceiling summed to ~16 min of legal stall across the four TTL
    tests under load — enough to push the whole suite past the
    driver's window. Now the budget is ``timeout`` (default 60 s)
    and, on expiry, a query that HAS committed at least one data
    batch is stopped rather than failed: the test's own sink
    assertions adjudicate whether the data actually drained (they
    fail loudly on a partial sink; a spurious helper timeout under
    co-tenant load no longer fails a correct run). Only a query that
    never committed any data batch within the budget asserts here.
    """
    deadline = time.time() + timeout
    saw_data = False
    drained = False
    try:
        while time.time() < deadline:
            if not q.isActive:
                # a query that stopped by itself has, by definition,
                # consumed its availableNow offsets (observed: the
                # watermarked dedup variant self-terminates, the
                # watermark-free TTL upsert spins)
                drained = True
                break
            prog = q.recentProgress
            saw_data = saw_data or any(p["numInputRows"] > 0 for p in prog)
            if saw_data and prog and prog[-1]["numInputRows"] == 0:
                drained = True
                break
            time.sleep(0.5)
        assert drained or saw_data, (
            f"streaming query committed no data batch within {timeout}s"
        )
    finally:
        if q.isActive:
            q.stop()
        q.awaitTermination(60)
