"""Property-based tests (hypothesis) for the engine's custom operators:
merge-upsert and keep-first dedup must match their dictionary-semantics
models on arbitrary keyed inputs.

Examples are kept small and few — each example is a Spark job — but
hypothesis explores the edge shapes (empty updates, all-duplicate keys,
single row) that fixed fixtures miss.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from end_to_end_data_engineering_pipeline_spark.operators import (
    dedup_keep_first,
    merge_upsert,
)

KEYS = st.integers(min_value=0, max_value=5)
VALS = st.text(alphabet="abc", min_size=1, max_size=3)

rows_strategy = st.lists(st.tuples(KEYS, VALS), min_size=0, max_size=12)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(base=rows_strategy, upd=rows_strategy)
def test_merge_upsert_matches_dict_model(spark, tmp_path_factory, base, upd):
    path = str(tmp_path_factory.mktemp("merge") / "t")
    # model: dict update, updates win; within one batch the LAST row per
    # key in the dedup order wins — pre-dedup both sides deterministically
    # (merge_upsert's contract requires key-unique inputs)
    base_d = {}
    for k, v in base:
        base_d.setdefault(k, v)
    upd_d = {}
    for k, v in upd:
        upd_d.setdefault(k, v)

    def df_of(d):
        return spark.createDataFrame(
            [(k, v) for k, v in d.items()] or [], "k int, v string"
        )

    if base_d:
        merge_upsert(spark, path, df_of(base_d), ["k"])
    if upd_d:
        merge_upsert(spark, path, df_of(upd_d), ["k"])
    expect = {**base_d, **upd_d}
    if not expect:
        return
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == expect


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(st.tuples(KEYS, st.integers(0, 50)), min_size=1, max_size=15))
def test_dedup_keep_first_matches_min_model(spark, rows):
    df = spark.createDataFrame(rows, "k int, ord int")
    out = {(r.k): r.ord for r in dedup_keep_first(df, ["k"], ["ord"]).collect()}
    model = {}
    for k, o in rows:
        model[k] = min(model.get(k, o), o)
    assert out == model
