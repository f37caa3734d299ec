"""Round-13 probe for the m1/m7 in-sequence offset (r12 verdict ask
#8): the r12 bisect eliminated warm-pass state, page-cache eviction,
ambient timing, and python-worker bloat, leaving JVM-side residue
(broadcast / shuffle-file / memory-manager accumulation from the
Q3-class churn) as the suspect class. This probe measures that class
directly in one JVM:

  1. warm + time m1/m7 (baseline, fresh session)
  2. run the Q3 churn block (HEADLINE[45:85] at sf0.1)
  3. time m1/m7 again (expect the in-sequence offset)
  4. sample JVM residue at each stage: shuffle files on disk under
     the session's blockmgr dirs, driver heap in use, registered
     broadcast blocks
  5. targeted cleanups between re-timings, one mechanism at a time:
     clearCache -> System.gc x2 -> time -> (optional) nothing else
  If the offset survives GC+clearCache while shuffle-file counts
  stay high, the residue is shuffle-file / disk-store bookkeeping;
  if GC recovers it, it is heap/memory-manager pressure; if nothing
  recovers it inside the JVM, the offset is scheduler/OS-level and
  environmental for our purposes.

Run on a QUIET host (check scripts/hostcheck.py anchors first);
results recorded in docs/SCALE.md §round-13.
"""

from __future__ import annotations

import glob
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import importlib.util

_spec = importlib.util.spec_from_file_location(
    "bench_mod",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "bench.py"),
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)

from end_to_end_data_engineering_pipeline_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 5
MEDIA = ["m1_multimodal_features", "m7_wav_decode_features"]


def jvm_residue(spark) -> dict:
    """Shuffle files on disk, driver heap, broadcast/block counts."""
    sc = spark.sparkContext
    local_dirs = set()
    # Spark's DiskBlockManager roots: blockmgr-* under spark.local.dir
    # (java.io.tmpdir by default in local mode)
    for root in ("/tmp", os.environ.get("SPARK_LOCAL_DIRS", "")):
        if root:
            local_dirs.update(glob.glob(os.path.join(root, "blockmgr-*")))
    n_files = 0
    n_bytes = 0
    for d in local_dirs:
        for dirpath, _dirs, files in os.walk(d):
            for f in files:
                n_files += 1
                try:
                    n_bytes += os.path.getsize(os.path.join(dirpath, f))
                except OSError:
                    pass
    rt = sc._jvm.java.lang.Runtime.getRuntime()
    heap_used = (rt.totalMemory() - rt.freeMemory()) / 1e6
    status = sc._jsc.sc().getExecutorMemoryStatus().size()
    return {
        "shuffle_files": n_files,
        "shuffle_mb": round(n_bytes / 1e6, 1),
        "driver_heap_mb": round(heap_used, 1),
        "executors": status,
    }


def time_keys(spark, qs, names) -> dict:
    out = {}
    for n in names:
        qs[n](spark, SF).count()  # warm
        samples = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            qs[n](spark, SF).count()
            samples.append(time.perf_counter() - t0)
        out[n.split("_")[0]] = round(statistics.median(samples), 3)
    return out


def main() -> None:
    steal, anchor = bench._host_probe()
    print(f"host: steal={steal}% anchor={anchor}")
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    qs = entry.queries()

    print("stage0 residue:", jvm_residue(spark))
    print("baseline:", time_keys(spark, qs, MEDIA))
    print("stage1 residue:", jvm_residue(spark))

    churn = bench.HEADLINE[45:85]
    t0 = time.perf_counter()
    for n in churn:
        try:
            qs[n](spark, SF).count()
        except Exception as ex:  # keep churning; the block is the load
            print("churn err", n, str(ex)[:80])
    print(f"churn block: {len(churn)} keys in "
          f"{time.perf_counter() - t0:.0f}s")
    print("stage2 residue:", jvm_residue(spark))
    print("post-churn:", time_keys(spark, qs, MEDIA))

    spark.catalog.clearCache()
    print("post-clearCache:", time_keys(spark, qs, MEDIA))
    print("stage3 residue:", jvm_residue(spark))

    jvm = spark.sparkContext._jvm
    jvm.System.gc()
    time.sleep(2)
    jvm.System.gc()
    time.sleep(2)
    print("stage4 residue (post-GC):", jvm_residue(spark))
    print("post-GC:", time_keys(spark, qs, MEDIA))

    steal, anchor = bench._host_probe()
    print(f"host end: steal={steal}% anchor={anchor}")
    spark.stop()


if __name__ == "__main__":
    main()
