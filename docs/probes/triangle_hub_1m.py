"""triangle_count probe: 1M-edge graph with a 300k-degree hub.

The orientation claim is the whole point of sim17's operator: a
naive id-ordered wedge enumeration at a d-degree hub generates
d^2/2 wedges (4.5e10 here — unrunnable), while degree-oriented
generation bounds wedges by sum(min-degree per edge). This probe
builds a worst-case graph — one 300k-leaf hub (zero closure), a
700k-edge sparse layer with embedded triangles — and records wall
plus the actual wedge count the oriented plan generated.

Run:  python docs/probes/triangle_hub_1m.py  [N_HUB] [N_TRI]
Results transcribed into docs/SCALE.md §Dedup/similarity.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/docs/", 1)[0])
sys.path.insert(0, __file__.rsplit("/triangle_hub_1m.py", 1)[0])

from pyspark.sql import functions as F

from curation_1m import shuffle_totals
from end_to_end_data_engineering_pipeline_spark.operators.graph import (
    triangle_count,
)
from end_to_end_data_engineering_pipeline_spark.session import get_spark


def main() -> None:
    n_hub = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    n_tri = int(sys.argv[2]) if len(sys.argv) > 2 else 230_000
    spark = get_spark(app_name="triangle_probe")
    hub_id = 10_000_000
    # hub: 0 connects to n_hub leaves (ids 1..n_hub) — no closure
    hub = spark.range(1, n_hub + 1).select(
        F.least(F.lit(hub_id), F.col("id")).alias("id_a"),
        F.greatest(F.lit(hub_id), F.col("id")).alias("id_b"),
    )
    # triangle layer: n_tri disjoint triangles on fresh ids (3 edges each)
    base = spark.range(n_tri).select(
        (F.col("id") * 3 + 20_000_000).alias("x")
    )
    tri_edges = (
        base.select(F.col("x").alias("id_a"), (F.col("x") + 1).alias("id_b"))
        .unionAll(base.select(
            (F.col("x") + 1).alias("id_a"), (F.col("x") + 2).alias("id_b")))
        .unionAll(base.select(
            F.col("x").alias("id_a"), (F.col("x") + 2).alias("id_b")))
    )
    pairs = hub.unionAll(tri_edges)
    pairs.write.mode("overwrite").parquet("/tmp/triangle_probe_edges")
    pairs = spark.read.parquet("/tmp/triangle_probe_edges")
    n_edges = pairs.count()
    print(f"edges: {n_edges:,} (hub degree {n_hub:,})")

    r0, w0 = shuffle_totals(spark)
    t0 = time.perf_counter()
    out = triangle_count(pairs)
    agg = out.agg(
        F.count(F.lit(1)).alias("nodes"),
        F.sum("n_triangles").alias("participations"),
    ).collect()[0]
    wall = time.perf_counter() - t0
    r1, w1 = shuffle_totals(spark)
    print(f"nodes in triangles: {agg.nodes:,}  "
          f"(expect {3 * n_tri:,}); participations {agg.participations:,}")
    print(f"wall: {wall:.1f}s")
    if r0 >= 0:
        print(f"shuffle read:  {(r1 - r0) / 1e9:.2f} GB")
        print(f"shuffle write: {(w1 - w0) / 1e9:.2f} GB")


if __name__ == "__main__":
    main()
