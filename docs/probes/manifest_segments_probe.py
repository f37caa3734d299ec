"""Manifest write-amplification probe (r13 verdict gap #3 / ask #6).

Pure Python, no Spark: synthesizes a 100k-file table's commit history
and measures the metadata cost per commit under (a) the legacy inline
manifest (full file list re-serialized every version) and (b) segment
manifests (operators/snapshots.py:_serialize_manifest — immutable
content-addressed segments carried by reference across commits).

Workload: initial 100k-file commit, then 50 appends of 200 files each
(a streaming micro-batch cadence), then 5 CoW-style deletes removing
120 files each (scattered — touches ~12 segments of 10k entries).

Run:  python docs/probes/manifest_segments_probe.py
Numbers are recorded in docs/SCALE.md ("segment manifests").
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from end_to_end_data_engineering_pipeline_spark.operators import snapshots as sn


def synth_manifest(version: int, files: list[str]) -> dict:
    return {
        "version": version,
        "mode": "append",
        "committed_at": 0.0,
        "files": list(files),
        "part_col": "day",
        "part_type": "string",
        # per-file metadata is STABLE per file name (as in the real
        # engine — a committed file's partition value never changes)
        "partitions": {f: f"2024-{int(f[1:8]) % 365:03d}" for f in files},
    }


def tree_bytes(d: str) -> int:
    total = 0
    for root, _, names in os.walk(d):
        for n in names:
            total += os.path.getsize(os.path.join(root, n))
    return total


def run(segmented: bool) -> dict:
    tmp = tempfile.mkdtemp(prefix="seg_probe_")
    path = os.path.join(tmp, "t")
    os.makedirs(sn._vers_dir(path), exist_ok=True)
    sn._SEG_CACHE.clear()
    files = [f"f{i:07d}.parquet" for i in range(100_000)]
    nxt = 100_000

    def commit(version: int, fl: list[str]) -> tuple[float, int]:
        m = synth_manifest(version, fl)
        before = tree_bytes(sn._vers_dir(path))
        t0 = time.perf_counter()
        ser = sn._serialize_manifest(path, m) if segmented else m
        with open(
            os.path.join(sn._vers_dir(path), f"v{version}.json"), "w"
        ) as fh:
            json.dump(ser, fh)
        dt = time.perf_counter() - t0
        return dt, tree_bytes(sn._vers_dir(path)) - before

    out: dict = {}
    out["initial"] = commit(0, files)
    app_t, app_b = [], []
    v = 0
    for _ in range(50):
        v += 1
        new = [f"f{nxt + i:07d}.parquet" for i in range(200)]
        nxt += 200
        files = files + new
        t, b = commit(v, files)
        app_t.append(t)
        app_b.append(b)
    out["append_avg"] = (sum(app_t) / len(app_t), sum(app_b) // len(app_b))
    del_t, del_b = [], []
    for k in range(5):
        v += 1
        doomed = set(files[k * 9000 : k * 9000 + 120 * 75 : 75])
        files = [f for f in files if f not in doomed]
        t, b = commit(v, files)
        del_t.append(t)
        del_b.append(b)
    out["delete_avg"] = (sum(del_t) / len(del_t), sum(del_b) // len(del_b))
    out["total_meta_bytes"] = tree_bytes(sn._vers_dir(path))
    shutil.rmtree(tmp, ignore_errors=True)
    return out


def fmt(r: dict) -> None:
    for k in ("initial", "append_avg", "delete_avg"):
        t, b = r[k]
        print(f"  {k:12s}: {t*1000:8.1f} ms  {b/1e6:8.2f} MB written")
    print(f"  {'total disk':12s}: {r['total_meta_bytes']/1e6:19.2f} MB (56 versions)")


if __name__ == "__main__":
    print("legacy inline manifests (100k files, 56 commits):")
    fmt(run(segmented=False))
    print("segment manifests:")
    fmt(run(segmented=True))
