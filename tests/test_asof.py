"""Edge semantics of the union-tag-window as-of join
(operators/asof.py) — the contracts e8's corpus oracle exercises only
in aggregate: inclusive equal-timestamp matches, null before any
right row, per-key isolation, and right-side tie resolution."""

from __future__ import annotations

from end_to_end_data_engineering_pipeline_spark.operators.asof import asof_join


def _run(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, "k string, lts long, ev string")
    right = spark.createDataFrame(right_rows, "k string, rts long, px double")
    out = asof_join(
        left, right, key="k", left_ts="lts", right_ts="rts",
        payload_cols=["px"],
    )
    return {(r.k, r.lts): r.asof_px for r in out.collect()}


def test_asof_inclusive_equal_ts_and_null_before_first(spark):
    got = _run(
        spark,
        [("a", 5, "e1"), ("a", 10, "e2"), ("a", 1, "e0")],
        [("a", 5, 100.0), ("a", 8, 200.0)],
    )
    # equal timestamps match (right sorts before left at the same ts)
    assert got[("a", 5)] == 100.0
    # latest at-or-before
    assert got[("a", 10)] == 200.0
    # no prior right row -> null, row still emitted
    assert got[("a", 1)] is None


def test_asof_keys_are_isolated(spark):
    got = _run(
        spark,
        [("a", 10, "e"), ("b", 10, "e")],
        [("a", 5, 1.0)],
    )
    assert got[("a", 10)] == 1.0
    assert got[("b", 10)] is None  # b never sees a's quotes


def test_asof_right_ties_resolve_to_later_sorted_row(spark):
    """Documented contract: identical right timestamps resolve to the
    later-sorted row (callers add a tiebreaker for more); with two
    right rows at ts=5 the carried value is deterministic only up to
    that rule — pin that SOME value from ts=5 is carried and that a
    later right row supersedes both."""
    got = _run(
        spark,
        [("a", 6, "e"), ("a", 9, "e")],
        [("a", 5, 1.0), ("a", 5, 2.0), ("a", 8, 3.0)],
    )
    assert got[("a", 6)] in (1.0, 2.0)
    assert got[("a", 9)] == 3.0


def test_asof_left_columns_survive_untouched(spark):
    left = spark.createDataFrame(
        [("a", 5, "keepme")], "k string, lts long, ev string"
    )
    right = spark.createDataFrame([("a", 4, 7.0)], "k string, rts long, px double")
    out = asof_join(
        left, right, key="k", left_ts="lts", right_ts="rts",
        payload_cols=["px"],
    ).collect()
    assert len(out) == 1
    assert out[0].ev == "keepme" and out[0].asof_px == 7.0
    assert set(out[0].asDict()) == {"k", "lts", "ev", "asof_px"}
