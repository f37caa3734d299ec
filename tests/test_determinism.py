"""Layout-independence: the engine's oracle-hash claims rest on results
being BIT-IDENTICAL regardless of partitioning (different reduction
orders are where double sums, window ties, and keep-first dedup go
wrong). Pin it directly: representative queries run under two very
different shuffle layouts in the same session and must collect to
identical sorted rows — the single-machine stand-in for "same answer
on 8 executors and on 1000"."""

from __future__ import annotations

import pytest

from end_to_end_data_engineering_pipeline_spark.queries import all_queries

QUERIES = all_queries()

# one per determinism-sensitive family: decimal aggregation, exact
# moments, sessionization windows, keep-first dedup, integer-hash
# sampling, scaled-int cosine ANN, drift shares, HLL registers
CASES = [
    "q1_pricing_summary",
    "q65_exact_moments",
    "e3_sessionization",
    "t3_exact_dedup",
    "t25_train_val_test_split",
    "sim4_cosine_topk_ivf",
    "e25_drift_table",
    "e23_hll_distinct_users",
]


@pytest.mark.parametrize("name", CASES)
def test_result_identical_across_shuffle_layouts(spark, sf_dir, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")

    def run():
        df = QUERIES[name](spark, sf_dir)
        return sorted(tuple(r) for r in df.collect())

    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = run()
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b and a
