"""fixture_phase/measure_fixtures accounting (queries/benchmeta.py):
the bench's operator-vs-staging split must not double-count nested
spans, and must be a strict no-op outside the bench. Pure Python — no
Spark session."""

from __future__ import annotations

import time

from end_to_end_data_engineering_pipeline_spark.queries.benchmeta import (
    fixture_phase,
    measure_fixtures,
)


def test_noop_without_accumulator():
    # outside measure_fixtures the context manager records nothing and
    # adds no machinery (correctness surfaces never see it)
    with fixture_phase():
        pass  # must simply run


def test_spans_recorded_and_nested_spans_absorbed():
    spans: list[float] = []
    with measure_fixtures(spans):
        with fixture_phase():
            time.sleep(0.02)
            with fixture_phase():  # nested: absorbed by the outer span
                time.sleep(0.02)
        with fixture_phase():
            time.sleep(0.01)
    assert len(spans) == 2  # two OUTER spans, inner absorbed
    assert spans[0] >= 0.04 and spans[1] >= 0.01


def test_accumulator_restored_after_exit():
    spans: list[float] = []
    with measure_fixtures(spans):
        with fixture_phase():
            pass
    # after exit, fixture_phase is inert again
    with fixture_phase():
        time.sleep(0.01)
    assert len(spans) == 1


def test_exception_inside_phase_still_records_and_restores():
    spans: list[float] = []
    try:
        with measure_fixtures(spans):
            with fixture_phase():
                raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert len(spans) == 1
    with fixture_phase():  # restored to inert
        pass
