"""A/B timing harness for optimization experiments (r16, guide §1).

Times named registry keys with bench.py's own methodology (sf0.001 JVM
warm pass, page-cache prime, round-robin reps, median, fixture spans
excluded) under an optional set of extra Spark confs, so a config or
code change can be measured in isolation before touching bench.py or
session.py.

Run:  python scripts/ab_bench.py p35 q94 --reps=5 \
          --conf=spark.sql.adaptive.coalescePartitions.parallelismFirst=false
Prints one JSON line {"confs": {...}, "queries": {key: median_sec}}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from end_to_end_data_engineering_pipeline_spark.queries import all_queries
from end_to_end_data_engineering_pipeline_spark.queries.benchmeta import (
    measure_fixtures,
)
from end_to_end_data_engineering_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 5
    confs: dict[str, str] = {}
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif a.startswith("--conf="):
            k, v = a[len("--conf="):].split("=", 1)
            confs[k] = v
    qs = all_queries()
    full = {n.split("_", 1)[0]: n for n in qs}
    names = [full.get(n, n) for n in names]

    spark = get_spark(app_name="ab_bench", extra_conf=confs or None)
    warm_dir = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = SF_DIR
    for name in names:
        qs[name](spark, warm_dir).count()
    spark.catalog.clearCache()
    import bench as _b  # repo root is on sys.path; reuse the cache prime

    _b._prime_page_cache(SF_DIR)

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _rep in range(reps):
        for name in names:
            spans: list[float] = []
            t0 = time.perf_counter()
            with measure_fixtures(spans):
                df = qs[name](spark, SF_DIR)
                df.count()
            wall = time.perf_counter() - t0
            samples[name].append(wall - sum(spans))
            spark.catalog.clearCache()
    out = {
        name.split("_", 1)[0]: round(statistics.median(s), 3)
        for name, s in samples.items()
    }
    print(json.dumps({"confs": confs, "reps": reps, "queries": out,
                      "total": round(sum(out.values()), 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
