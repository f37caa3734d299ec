"""Per-key job-level profiler (r16 guide §1: measure first).

Runs named registry keys at $SPARK_GRAFT_SF_DIR with Spark event
logging on, labels every key's jobs via setJobDescription, then
parses the event log into per-key job counts + job wall spans. The
gap between a key's wall time and the sum of its job spans is
driver-side work (planning, manifest I/O, py4j round trips) — the
part the Spark UI never shows.

Run: python scripts/profile_keys.py p35 p37 q94 ...  [--reps 2]
Prints one JSON dict per key; also a compact summary table.
"""

from __future__ import annotations

import glob
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
EVT_DIR = "/tmp/sparkevt"


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 2
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1])
    qs = all_queries()
    full = {n.split("_", 1)[0]: n for n in qs}
    names = [full.get(n, n) for n in names]
    import shutil

    shutil.rmtree(EVT_DIR, ignore_errors=True)
    os.makedirs(EVT_DIR, exist_ok=True)
    spark = get_spark(
        app_name="profile_keys",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVT_DIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    warm_dir = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")
    for name in names:
        qs[name](spark, warm_dir).count()
    spark.catalog.clearCache()

    walls: dict[str, list[tuple[float, float, float]]] = {}
    for rep in range(reps):
        for name in names:
            key = name.split("_", 1)[0]
            spark.sparkContext.setJobDescription(f"PROF:{key}:{rep}")
            spans: list[float] = []
            t0 = time.perf_counter()
            with measure_fixtures(spans):
                df = qs[name](spark, SF_DIR)
                df.count()
            wall = time.perf_counter() - t0
            walls.setdefault(key, []).append((wall, sum(spans), t0))
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()
    spark.stop()

    # parse event log: per description, job spans + stage task counts
    # (Spark 4 may write a rolling eventlog_v2_* DIRECTORY of events_*)
    cand = glob.glob(EVT_DIR + "/*")
    if os.path.isdir(cand[0]):
        evts = sorted(glob.glob(cand[0] + "/events_*"))
    else:
        evts = cand
    jobs: dict[str, list[dict]] = {}
    job_desc: dict[int, str] = {}
    stage_job: dict[int, int] = {}
    import itertools

    def _lines():
        for ef in evts:
            with open(ef) as fh:
                yield from fh

    if True:
        for line in _lines():
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                d = e.get("Properties", {}).get(
                    "spark.job.description", ""
                )
                jid = e["Job ID"]
                job_desc[jid] = d
                for sid in e.get("Stage IDs", []):
                    stage_job[sid] = jid
                if d.startswith("PROF:"):
                    jobs.setdefault(d, []).append(
                        {
                            "jid": jid,
                            "t0": e["Submission Time"] / 1000.0,
                            "stages": len(e.get("Stage IDs", [])),
                        }
                    )
            elif ev == "SparkListenerJobEnd":
                jid = e["Job ID"]
                d = job_desc.get(jid, "")
                if d.startswith("PROF:"):
                    for j in jobs.get(d, []):
                        if j["jid"] == jid:
                            j["t1"] = e["Completion Time"] / 1000.0
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                jid = stage_job.get(si["Stage ID"])
                d = job_desc.get(jid, "") if jid is not None else ""
                if d.startswith("PROF:"):
                    for j in jobs.get(d, []):
                        if j["jid"] == jid:
                            j.setdefault("tasks", 0)
                            j["tasks"] += si.get("Number of Tasks", 0)
                            j.setdefault("names", []).append(
                                si.get("Stage Name", "")[:140]
                            )

    print(f"{'key':8} {'wall':>7} {'fix':>6} {'njobs':>5} "
          f"{'jobsec':>7} {'driver':>7} {'tasks':>6}")
    out = {}
    for key, ws in walls.items():
        per_rep = []
        for rep in range(reps):
            d = f"PROF:{key}:{rep}"
            js = jobs.get(d, [])
            jsec = sum(j.get("t1", j["t0"]) - j["t0"] for j in js)
            ntasks = sum(j.get("tasks", 0) for j in js)
            wall, fix, _ = ws[rep]
            per_rep.append(
                {
                    "wall": round(wall, 3),
                    "fix": round(fix, 3),
                    "njobs": len(js),
                    "job_sec": round(jsec, 3),
                    "driver_sec": round(wall - jsec, 3),
                    "tasks": ntasks,
                }
            )
        best = min(per_rep, key=lambda r: r["wall"])
        brep = per_rep.index(best)
        bjobs = sorted(
            jobs.get(f"PROF:{key}:{brep}", []),
            key=lambda j: j["t0"] - j.get("t1", j["t0"]),
        )
        best["top_jobs"] = [
            {
                "sec": round(j.get("t1", j["t0"]) - j["t0"], 3),
                "tasks": j.get("tasks", 0),
                "stage0": (j.get("names") or [""])[-1],
            }
            for j in bjobs[:10]
        ]
        out[key] = {"reps": per_rep, "best": best}
        print(
            f"{key:8} {best['wall']:7.2f} {best['fix']:6.2f} "
            f"{best['njobs']:5d} {best['job_sec']:7.2f} "
            f"{best['driver_sec']:7.2f} {best['tasks']:6d}"
        )
    with open("/tmp/profile_keys.json", "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
