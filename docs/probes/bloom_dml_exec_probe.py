"""Executor-side bloom DML pruning probe (r14 verdict ask #4).

Question: past BLOOM_DML_MAX_KEYS (256) the driver-side bitmap test
is declined and a MoR delete falls back to the full position scan.
Would a METADATA-DATAFRAME bitmap-test job (bitmaps as rows, key
positions broadcast, numpy-vectorized per-file test in mapInPandas)
make 10k+-key pruning affordable — and does it beat the declined
full scan by >=2x?

Two measurements:

1. metadata-job scaling, 100k synthetic 1-KB bitmaps x 10k keys
   (pure metadata — no data files): driver-side big-int loop
   (today's algorithm, uncapped; subsampled over files and scaled
   linearly) vs the executor-side vectorized job.

2. end-to-end MoR delete at a real sandbox layout (320 files x
   6,250 rows, range-clustered so a 10k-key contiguous delete set
   lives in ~2 files): stock engine (declines pruning, full
   position-scan semi-join) vs the same delete with the
   executor-side prune patched in.

Run:  python docs/probes/bloom_dml_exec_probe.py
Numbers recorded in docs/SCALE.md ("executor-side bloom DML").
"""

import base64
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from end_to_end_data_engineering_pipeline_spark.session import get_spark  # noqa: E402
from end_to_end_data_engineering_pipeline_spark.operators import snapshots as sn  # noqa: E402

M_BITS = 8192
K = 3


def synth_bitmaps(n_files: int, vals_per_file: int, rng) -> list[str]:
    encs = []
    nbytes = M_BITS // 8
    for _ in range(n_files):
        bits = np.zeros(nbytes, dtype=np.uint8)
        pos = rng.integers(0, M_BITS, size=vals_per_file * K)
        np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        encs.append(base64.b64encode(bits.tobytes()).decode("ascii"))
    return encs


def driver_side(encs: list[str], masks: list[int]) -> tuple[float, int]:
    t0 = time.perf_counter()
    admitted = 0
    for enc in encs:
        bm = int.from_bytes(base64.b64decode(enc), "little")
        if any(bm & mk == mk for mk in masks):
            admitted += 1
    return time.perf_counter() - t0, admitted


def exec_side(spark, encs: list[str], pos: np.ndarray) -> tuple[float, int]:
    """The candidate implementation: bitmaps as a DataFrame, key
    positions broadcast via closure, per-file test = one vectorized
    numpy gather over (n_keys, k) byte indices."""
    import pandas as pd

    byte_idx = (pos >> 3).astype(np.int64)
    bit_mask = (1 << (pos & 7)).astype(np.uint8)

    def op(batches):
        for pdf in batches:
            out = []
            for f, enc in zip(pdf["f"], pdf["enc"]):
                if enc is None:
                    out.append(f)
                    continue
                bits = np.frombuffer(
                    base64.b64decode(enc), dtype=np.uint8
                )
                hit = (
                    (bits[byte_idx] & bit_mask) == bit_mask
                ).all(axis=1).any()
                if hit:
                    out.append(f)
            yield pd.DataFrame({"f": out})

    t0 = time.perf_counter()
    df = spark.createDataFrame(
        [(f"f{i:06d}", e) for i, e in enumerate(encs)], "f string, enc string"
    ).repartition(32)
    got = df.mapInPandas(op, schema="f string").count()
    return time.perf_counter() - t0, got


def part1(spark) -> None:
    rng = np.random.default_rng(7)
    for vals, label in ((400, "15% fill (400 vals/file)"), (50, "1.8% fill (50 vals/file)")):
        print(f"== part 1: metadata job, 100k files x 10k keys, {label} ==")
        encs = synth_bitmaps(100_000, vals_per_file=vals, rng=rng)
        pos = rng.integers(0, M_BITS, size=(10_000, K))
        masks = []
        for row in pos:
            v = 0
            for p in row:
                v |= 1 << int(p)
            masks.append(v)
        sub = 2_000  # driver loop subsample; linear in files
        t_sub, adm_sub = driver_side(encs[:sub], masks)
        t_drv = t_sub * (len(encs) / sub)
        print(
            f"  driver-side  : {t_sub:6.1f}s for {sub} files "
            f"-> ~{t_drv:6.1f}s at 100k (admitted {adm_sub}/{sub})"
        )
        t_exec, adm = exec_side(spark, encs, pos)
        print(f"  executor-side: {t_exec:6.1f}s at 100k (admitted {adm}/100000)")
        print(f"  speedup      : {t_drv / t_exec:5.1f}x")


def part2(spark) -> None:
    print("== part 2: end-to-end MoR delete, 320 files x 6250 rows ==")
    from pyspark.sql import functions as F

    tmp = tempfile.mkdtemp(prefix="bloom_dml_")

    def build(tag: str) -> str:
        path = os.path.join(tmp, tag)
        df = (
            spark.range(0, 2_000_000)
            .select(F.col("id").alias("k"), (F.col("id") % 97).alias("v"))
            .repartitionByRange(320, "k")
        )
        sn.snapshot_write_bloom(spark, path, df, "k")
        return path

    keys = spark.range(1_000_000, 1_010_000).select(
        F.col("id").alias("k")
    )

    # stock: 10k keys > BLOOM_DML_MAX_KEYS -> prune declines, full scan
    p_stock = build("stock")
    t0 = time.perf_counter()
    sn.snapshot_delete_mor(spark, p_stock, keys, ["k"])
    t_stock = time.perf_counter() - t0

    # exec-pruned: patch _bloom_dml_prune with the vectorized job
    p_exec = build("exec")
    real = sn._bloom_dml_prune

    def exec_prune(spark_, m, match, keys_, cand):
        b = m.get("bloom")
        if not b or b["col"] not in keys_ or not cand:
            return cand
        if match.schema[b["col"]].dataType.simpleString() != b["type"]:
            return cand
        rows = (
            match.select(F.col(b["col"]).alias("__v"))
            .where(F.col("__v").isNotNull())
            .distinct()
            .select(
                *[
                    F.pmod(
                        F.xxhash64(F.col("__v"), F.lit(s)), F.lit(b["m"])
                    ).alias(f"p{s}")
                    for s in range(b["k"])
                ]
            )
            .collect()
        )
        pos = np.array(
            [[r[f"p{s}"] for s in range(b["k"])] for r in rows],
            dtype=np.int64,
        )
        encs = [b["files"].get(f) for f in cand]
        import pandas as pd

        byte_idx = pos >> 3
        bit_mask = (1 << (pos & 7)).astype(np.uint8)

        def op(batches):
            for pdf in batches:
                out = []
                for f, enc in zip(pdf["f"], pdf["enc"]):
                    if enc is None:
                        out.append(f)
                        continue
                    bits = np.frombuffer(
                        base64.b64decode(enc), dtype=np.uint8
                    )
                    if ((bits[byte_idx] & bit_mask) == bit_mask).all(
                        axis=1
                    ).any():
                        out.append(f)
                yield pd.DataFrame({"f": out})

        df = spark_.createDataFrame(
            list(zip(cand, encs)), "f string, enc string"
        ).repartition(32)
        admitted = {r.f for r in df.mapInPandas(op, schema="f string").collect()}
        return [f for f in cand if f in admitted]

    sn._bloom_dml_prune = exec_prune
    try:
        t0 = time.perf_counter()
        sn.snapshot_delete_mor(spark, p_exec, keys, ["k"])
        t_exec = time.perf_counter() - t0
    finally:
        sn._bloom_dml_prune = real

    a = sn.snapshot_read(spark, p_stock).count()
    b_ = sn.snapshot_read(spark, p_exec).count()
    assert a == b_ == 1_990_000, (a, b_)
    print(f"  stock (declined prune, full scan): {t_stock:6.1f}s")
    print(f"  executor-side prune              : {t_exec:6.1f}s")
    print(f"  speedup                          : {t_stock / t_exec:5.2f}x")


if __name__ == "__main__":
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    part1(spark)
    part2(spark)
