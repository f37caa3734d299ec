"""Decompose p25_cdf_downstream_sync's commit constant (r11 verdict
ask #5): time each public milestone of the p25 pipeline at sf0.1,
then break ONE representative CoW commit into its internal stages by
running them manually (same code path as operators/snapshots.py
_cow_commit). Prints a JSON dict; numbers land in docs/SCALE.md.

Run: python scripts/profile_p25.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import shutil
import tempfile

from pyspark.sql import functions as F

from end_to_end_data_engineering_pipeline_spark.operators import snapshots as S
from end_to_end_data_engineering_pipeline_spark.queries.pipeline_queries import (
    _cdf_orders_history,
)
from end_to_end_data_engineering_pipeline_spark.session import get_spark


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="profile_p25")
    o, upd, dele = _cdf_orders_history(spark, sf)
    # JVM/codegen warm pass (the bench warms at sf0.001 first)
    o.count(); upd.count(); dele.count()

    t: dict[str, float] = {}

    def clock(name):
        class _C:
            def __enter__(self):
                self.t0 = time.perf_counter()
            def __exit__(self, *a):
                t[name] = round(time.perf_counter() - self.t0, 3)
        return _C()

    tmp = tempfile.mkdtemp(prefix="prof_p25_")
    src, dst = tmp + "/src", tmp + "/dst"
    try:
        with clock("seed_src_plus_dst"):   # p25's fixture phase
            S.snapshot_write(spark, src, o)
            S.snapshot_write(spark, dst, o)
        with clock("src_merge_commit"):
            S.snapshot_merge(spark, src, upd, keys=["o_orderkey"])
        with clock("src_delete_commit"):
            S.snapshot_delete(spark, src, dele, keys=["o_orderkey"])
        with clock("feed_materialize"):    # snapshot_sync's first half
            feed = S.snapshot_changes(
                spark, src, ["o_orderkey"], 0, None if False else S.list_versions(src)[-1]
            ).localCheckpoint(eager=True)
            feed.limit(1).count()
        with clock("dst_apply_commit"):    # sync's single CoW apply
            match = feed.select("o_orderkey")
            ups = feed.where(
                F.col("_change_type").isin("insert", "update_postimage")
            ).drop("_change_type")
            S._cow_commit(spark, dst, match, ["o_orderkey"], True, ups, "sync")
        with clock("final_agg_pin"):
            (
                S.snapshot_read(spark, dst)
                .groupBy("o_orderstatus")
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n"),
                    F.round(F.sum("price"), 4).cast("double").alias("tp"),
                )
                .collect()
            )

        # --- decompose ONE representative commit (a fresh src merge)
        # into _cow_commit's internal stages, run manually over the
        # same data shapes ---
        m = S._manifest(src, S.list_versions(src)[-1])
        base_files = list(m["files"])
        with clock("stage_tag_scan"):
            live = S._read_live(spark, src, m)
            mk = F.broadcast(upd.select("o_orderkey"))
            touched = {
                r["__file"]
                for r in live.join(mk, ["o_orderkey"], "left_semi")
                .select("__file").distinct().collect()
            }
        with clock("stage_rewrite_write"):
            survivors = (
                live.where(F.col("__file").isin(sorted(touched)))
                .drop("__file")
                .join(mk, ["o_orderkey"], "left_anti")
            )
            rewrite = survivors.unionByName(upd, allowMissingColumns=True)
            new_names = S._stage_files(spark, src, rewrite)
        with clock("stage_schema_probe"):
            sch = spark.read.parquet(
                os.path.join(S._data_dir(src), base_files[0])
            ).schema
        with clock("stage_manifest_claim"):
            untouched = [f for f in base_files if f not in touched]
            manifest = {
                "version": S.list_versions(src)[-1] + 1,
                "mode": "merge",
                "committed_at": time.time(),
                "files": untouched + new_names,
                "schema": sch.jsonValue(),
            }
            S._claim(src, manifest["version"], manifest, "merge")
        t["stage_sum"] = round(
            t["stage_tag_scan"] + t["stage_rewrite_write"]
            + t["stage_schema_probe"] + t["stage_manifest_claim"], 3
        )
        t["n_touched_files"] = len(touched)
        t["n_base_files"] = len(base_files)
        print(json.dumps(t))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
