"""Partitioned-snapshot read probe: plan cost vs partition count.

The round-9 rewrite of snapshot_read_partitioned / the CoW tagging
read replaced "one parquet relation + union PER partition value" with
ONE scan plus a broadcast (file basename -> value) join. The claim in
operators/snapshots.py:_attach_partition_col is that the plan is the
same shape at 30 partitions or 30k — this probe measures it: commit a
table at increasing partition fan-outs, then time (a) building +
executing a full read and (b) a 3-value manifest-pruned read. Under
the old union shape, (a) grew with a P-way union's analysis cost;
under the broadcast shape both should grow only with data/file count.

Run:  python docs/probes/partition_fanout.py  [ROWS]
Results transcribed into docs/SCALE.md §Maintenance.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/docs/", 1)[0])

from pyspark.sql import functions as F

from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
    snapshot_read_partitioned,
    snapshot_write_partitioned,
)
from end_to_end_data_engineering_pipeline_spark.session import get_spark


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(app_name="partition_fanout_probe")
    for n_parts in (32, 256, 2048):
        tmp = tempfile.mkdtemp(prefix=f"pfan_{n_parts}_")
        store = tmp + "/t"
        try:
            df = spark.range(rows).select(
                F.col("id").alias("k"),
                (F.col("id") % n_parts).cast("int").alias("p"),
                (F.col("id") * 7 % 1000).alias("v"),
            )
            t0 = time.perf_counter()
            snapshot_write_partitioned(spark, store, df, "p")
            t_write = time.perf_counter() - t0

            t0 = time.perf_counter()
            n = snapshot_read_partitioned(spark, store).count()
            t_full = time.perf_counter() - t0
            assert n == rows

            t0 = time.perf_counter()
            m = snapshot_read_partitioned(
                spark, store, values=[0, 1, 2]
            ).count()
            t_pruned = time.perf_counter() - t0
            assert m == sum(
                1 for i in range(rows) if i % n_parts in (0, 1, 2)
            )
            print(
                f"parts={n_parts:5d} write={t_write:6.2f}s "
                f"full_read={t_full:6.2f}s pruned_read={t_pruned:6.2f}s"
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
