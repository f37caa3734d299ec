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
        # engine — a committed file's partition value never changes).
        # Values are DAY-CLUSTERED in file order (~300 files/day, days
        # sequential) — the layout every commit-ordered ingest
        # produces, and what makes segment pruning headers sharp: a
        # 10k-entry segment spans ~34 days, under
        # SEG_SUMMARY_MAX_VALUES, so its pv header is recorded.
        "partitions": {
            f: f"2024-{int(f[1:8]) // 300 % 365:03d}" for f in files
        },
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
    if segmented:
        # read side (r14 verdict ask #1): resolve the final version
        # (a) in full and (b) pruned to one partition day, cold cache
        raw = sn._raw_manifest(path, v)
        n_segs = len(raw["files_segments"])
        sn._SEG_CACHE.clear()
        t0 = time.perf_counter()
        full = sn._manifest(path, v)
        t_full = time.perf_counter() - t0
        sn._SEG_CACHE.clear()
        t0 = time.perf_counter()
        pruned, total = sn._resolve_pruned(path, v, wanted={"2024-100"})
        t_pruned = time.perf_counter() - t0
        assert total == len(full["files"])
        want = {
            f for f in full["files"]
            if full["partitions"][f] == "2024-100"
        }
        assert want <= set(pruned["files"])
        out["read_full"] = (t_full, len(full["files"]))
        out["read_pruned"] = (
            t_pruned,
            len(pruned["files"]),
            n_segs,
        )
    shutil.rmtree(tmp, ignore_errors=True)
    return out


def fmt(r: dict) -> None:
    for k in ("initial", "append_avg", "delete_avg"):
        t, b = r[k]
        print(f"  {k:12s}: {t*1000:8.1f} ms  {b/1e6:8.2f} MB written")
    print(f"  {'total disk':12s}: {r['total_meta_bytes']/1e6:19.2f} MB (56 versions)")
    if "read_full" in r:
        t, n = r["read_full"]
        print(f"  {'read full':12s}: {t*1000:8.1f} ms  {n} file entries")
        t, n, segs = r["read_pruned"]
        print(
            f"  {'read 1-day':12s}: {t*1000:8.1f} ms  {n} file entries "
            f"materialized (of {segs} segments, cold cache)"
        )


def run_evolved() -> None:
    """Evolved-spec + wide-fanout read rows (r15 verdict ask #1):
    100k files where the first 60k landed under spec 0 (day-clustered,
    ~34 days per 10k-entry segment → exact per-spec ``pvs`` headers)
    and the next 40k under an evolved spec 1 (region, clustered at
    100 files/region → a segment spans ~100 regions >
    SEG_SUMMARY_MAX_VALUES, the fan-out that pre-r16 dropped value
    headers entirely — now the bounded partition bloom ``pb``).
    Measures a cold-cache full resolve vs a day-targeted and a
    region-targeted pruned resolve; either targeted read still
    materializes the OTHER spec's segments in full (their files are
    file-level-admitted by construction), so the win is bounded by
    the targeted spec's share."""
    tmp = tempfile.mkdtemp(prefix="seg_probe_ev_")
    path = os.path.join(tmp, "t")
    os.makedirs(sn._vers_dir(path), exist_ok=True)
    sn._SEG_CACHE.clear()
    old = [f"f{i:07d}.parquet" for i in range(60_000)]
    new = [f"g{i:07d}.parquet" for i in range(40_000)]
    m = {
        "version": 0,
        "mode": "append",
        "committed_at": 0.0,
        "files": old + new,
        "specs": [
            {"col": "day", "type": "string"},
            {"col": "region", "type": "string"},
        ],
        "default_spec": 1,
        "file_specs": {**{f: 0 for f in old}, **{f: 1 for f in new}},
        "partitions": {
            **{f: f"2024-{int(f[1:8]) // 300 % 365:03d}" for f in old},
            **{f: f"r{int(f[1:8]) // 100 % 400:03d}" for f in new},
        },
    }
    t0 = time.perf_counter()
    ser = sn._serialize_manifest(path, m)
    with open(
        os.path.join(sn._vers_dir(path), "v0.json"), "w"
    ) as fh:
        json.dump(ser, fh)
    t_ser = time.perf_counter() - t0
    meta = ser["seg_meta"]
    n_pvs = sum(1 for h in meta.values() if "pvs" in h)
    n_pb = sum(1 for h in meta.values() if "pb" in h)
    print(
        f"  {'serialize':12s}: {t_ser*1000:8.1f} ms  "
        f"{len(ser['files_segments'])} segments "
        f"({n_pvs} pvs headers, {n_pb} pb headers)"
    )
    sn._SEG_CACHE.clear()
    t0 = time.perf_counter()
    full = sn._manifest(path, 0)
    t_full = time.perf_counter() - t0
    print(
        f"  {'read full':12s}: {t_full*1000:8.1f} ms  "
        f"{len(full['files'])} file entries"
    )
    for col, val in (("day", "2024-100"), ("region", "r017")):
        sn._SEG_CACHE.clear()
        t0 = time.perf_counter()
        pruned, total = sn._resolve_pruned(
            path, 0, wanted={val}, part_col=col
        )
        dt = time.perf_counter() - t0
        want = {
            f
            for f in full["files"]
            if full["partitions"][f] == val
            and full["specs"][full["file_specs"][f]]["col"] == col
        }
        assert want <= set(pruned["files"]) and total == 100_000
        print(
            f"  {'1-' + col:12s}: {dt*1000:8.1f} ms  "
            f"{len(pruned['files'])} file entries materialized "
            f"(cold cache)"
        )
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    print("legacy inline manifests (100k files, 56 commits):")
    fmt(run(segmented=False))
    print("segment manifests:")
    fmt(run(segmented=True))
    print(
        "evolved-spec manifest (60k day-clustered spec 0 + 40k "
        "region-clustered spec 1, 100 regions/segment > cap):"
    )
    run_evolved()
