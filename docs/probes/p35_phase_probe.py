"""Per-phase wall attribution for the p35 lifecycle (r16 guide §1).

Mirrors p35_eq_partitioned_lifecycle exactly, with perf_counter spans
around each phase: land (fixture), delete_eq, append, merge_mor,
compact, probes-collect. Run on a quiet host; 3 reps, per-phase min.

Run: python docs/probes/p35_phase_probe.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from pyspark.sql import functions as F

from end_to_end_data_engineering_pipeline_spark.catalog import load, pin_result
from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
    snapshot_compact,
    snapshot_delete_eq,
    snapshot_merge_mor,
    snapshot_read_partitioned,
    snapshot_write_partitioned,
)
from end_to_end_data_engineering_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "3"))


def run_once(spark, spans: dict) -> None:
    def mark(name, t0):
        t1 = time.perf_counter()
        spans.setdefault(name, []).append(t1 - t0)
        return t1

    base = load(spark, SF_DIR, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    tmp = tempfile.mkdtemp(prefix="p35probe_")
    store = tmp + "/customer"

    def _agg(df, probe):
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("c_nationkey").cast("long").alias("n_nations"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(27,4)")), 4)
            .cast("double")
            .alias("total_bal"),
        ).select(F.lit(probe).alias("probe"), "*")

    try:
        t = time.perf_counter()
        v0 = snapshot_write_partitioned(
            spark, store, base.repartition(F.col("c_nationkey")), "c_nationkey"
        )
        t = mark("land(fixture)", t)
        dels = base.where(F.col("c_custkey") % 7 == 0).select("c_custkey")
        v1 = snapshot_delete_eq(spark, store, dels, ["c_custkey"])
        t = mark("delete_eq", t)
        v2 = snapshot_write_partitioned(
            spark, store, base.where(F.col("c_custkey") % 14 == 0),
            "c_nationkey", mode="append",
        )
        t = mark("append", t)
        mupd = base.where(
            (F.col("c_custkey") % 31 == 2)
            & ((F.col("c_custkey") % 7 != 0) | (F.col("c_custkey") % 14 == 0))
        ).select(
            "c_custkey", "c_nationkey",
            (F.col("c_acctbal") + 1000).alias("c_acctbal"),
        )
        v3 = snapshot_merge_mor(spark, store, mupd, ["c_nationkey", "c_custkey"])
        t = mark("merge_mor", t)
        snapshot_compact(spark, store)
        t = mark("compact", t)
        out = (
            _agg(snapshot_read_partitioned(spark, store, version=v1), "after_delete")
            .unionByName(_agg(snapshot_read_partitioned(spark, store, version=v2), "after_reinsert"))
            .unionByName(_agg(snapshot_read_partitioned(spark, store, version=v3), "after_merge"))
            .unionByName(_agg(snapshot_read_partitioned(spark, store, values=[7], version=v3), "pruned_nation"))
            .unionByName(_agg(snapshot_read_partitioned(spark, store, version=v0), "time_travel"))
            .unionByName(_agg(snapshot_read_partitioned(spark, store), "purged"))
        )
        t = mark("build_union_plan", t)
        out = pin_result(out)
        t = mark("pin_collect", t)
        out.count()
        mark("final_count", t)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    spark = get_spark(app_name="p35_phase_probe")
    # JVM/codegen warm pass at the smallest sf, like bench.py
    global SF_DIR
    real = SF_DIR
    warm = os.path.join(os.path.dirname(real.rstrip("/")), "sf0.001")
    if os.path.isdir(warm):
        SF_DIR = warm
        run_once(spark, {})
        SF_DIR = real
    spans: dict[str, list[float]] = {}
    for _ in range(REPS):
        run_once(spark, spans)
    print(f"{'phase':20} {'min':>7} {'med':>7}")
    tot = 0.0
    for k, v in spans.items():
        sv = sorted(v)
        print(f"{k:20} {sv[0]:7.3f} {sv[len(sv)//2]:7.3f}")
        tot += sv[0]
    print(f"{'TOTAL(min)':20} {tot:7.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
