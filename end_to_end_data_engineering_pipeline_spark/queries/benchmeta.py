"""Fixture/operator timing split for mutation-style bench queries.

Some registry queries must STAGE state before the operator under test
can run: p6 writes a deliberately fragmented table before compacting
it, p9 commits three snapshot versions before time-traveling them,
e15 seeds a CDC state table before merging a change batch. Timed
end-to-end, the bench number conflates fixture construction with the
operator (r6 verdict nit #2) — a compaction "regression" could be the
fragmenting writes getting slower.

Queries mark their staging work with ``fixture_phase()``. Outside the
bench the context manager is free (accumulator is None). bench.py
activates the accumulator per timed sample and reports, per query,
wall MINUS fixture as the operator time, plus one aggregate
``fixture_sec`` field so the staging cost stays visible instead of
silently vanishing. Correctness surfaces (driver gate, pytest parity)
never activate it, so results are untouched.
"""

from __future__ import annotations

import contextlib
import time
from collections.abc import Iterator

_ACC: list[float] | None = None


@contextlib.contextmanager
def fixture_phase() -> Iterator[None]:
    """Wrap state-staging work whose cost is NOT the operator under
    test. Nestable; inner spans are absorbed by the outer one (only
    the outermost records, so time is never double-counted)."""
    global _ACC
    acc = _ACC
    if acc is None:
        yield
        return
    _ACC = None  # suppress nested spans
    t0 = time.perf_counter()
    try:
        yield
    finally:
        acc.append(time.perf_counter() - t0)
        _ACC = acc


@contextlib.contextmanager
def measure_fixtures(out: list[float]) -> Iterator[None]:
    """bench.py: activate fixture accounting; spans append to ``out``."""
    global _ACC
    prev, _ACC = _ACC, out
    try:
        yield
    finally:
        _ACC = prev
