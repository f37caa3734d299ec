"""Alternating-session A/B harness (r16): ambient hypervisor steal on
this sandbox drifts 10-20% over minutes, swamping a sequential A-then-B
comparison. This harness alternates full sessions A,B,A,B,... so drift
hits both arms equally, and reports per-key MIN per arm (min is the
contention-robust statistic: noise only ever adds time) plus per-round
paired deltas.

Run: python scripts/ab_alternate.py --rounds=3 --reps=2 \
         --conf=spark.sql.adaptive.coalescePartitions.parallelismFirst=false \
         p35 q94 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from end_to_end_data_engineering_pipeline_spark.queries import all_queries
from end_to_end_data_engineering_pipeline_spark.queries.benchmeta import (
    measure_fixtures,
)
from end_to_end_data_engineering_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_arm(names, qs, confs, reps):
    spark = get_spark(app_name="ab_arm", extra_conf=confs or None)
    warm_dir = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = SF_DIR
    for name in names:
        qs[name](spark, warm_dir).count()
    spark.catalog.clearCache()
    best: dict[str, float] = {}
    for _ in range(reps):
        for name in names:
            spans: list[float] = []
            t0 = time.perf_counter()
            with measure_fixtures(spans):
                qs[name](spark, SF_DIR).count()
            w = time.perf_counter() - t0 - sum(spans)
            k = name.split("_", 1)[0]
            best[k] = min(best.get(k, 1e9), w)
            spark.catalog.clearCache()
    spark.stop()
    return best


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    rounds, reps = 3, 2
    confs: dict[str, str] = {}
    for a in sys.argv[1:]:
        if a.startswith("--rounds="):
            rounds = int(a.split("=", 1)[1])
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif a.startswith("--conf="):
            k, v = a[len("--conf="):].split("=", 1)
            confs[k] = v
    qs = all_queries()
    full = {n.split("_", 1)[0]: n for n in qs}
    names = [full.get(n, n) for n in names]

    mins: dict[str, dict[str, float]] = {"A": {}, "B": {}}
    for r in range(rounds):
        for arm, cf in (("A", {}), ("B", confs)):
            res = run_arm(names, qs, cf, reps)
            m = mins[arm]
            for k, v in res.items():
                m[k] = min(m.get(k, 1e9), v)
            print(f"round {r} arm {arm}: "
                  f"{round(sum(res.values()), 2)}s", file=sys.stderr)
    out = {
        k: {"A": round(mins["A"][k], 3), "B": round(mins["B"][k], 3),
            "delta": round(mins["B"][k] - mins["A"][k], 3)}
        for k in mins["A"]
    }
    print(json.dumps({
        "confs": confs,
        "keys": out,
        "totalA": round(sum(v["A"] for v in out.values()), 2),
        "totalB": round(sum(v["B"] for v in out.values()), 2),
    }, indent=1))


if __name__ == "__main__":
    main()
