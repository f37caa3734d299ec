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


def exec_side_chunked(
    spark, encs: list[str], pos: np.ndarray, chunk: int = 8192
) -> tuple[float, int]:
    """Early-exit variant: probe keys in blocks — a file that admits
    (the saturated case) exits on its first matching block instead of
    gathering all n_keys x k positions; only REJECTED files pay the
    full key count."""
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
                for i in range(0, len(byte_idx), chunk):
                    bi = byte_idx[i : i + chunk]
                    bmk = bit_mask[i : i + chunk]
                    if ((bits[bi] & bmk) == bmk).all(axis=1).any():
                        out.append(f)
                        break
            yield pd.DataFrame({"f": out})

    t0 = time.perf_counter()
    df = spark.createDataFrame(
        [(f"f{i:06d}",) for i in range(len(encs))], "f string"
    ).repartition(32)
    bc = spark.sparkContext.broadcast(
        {f"f{i:06d}": e for i, e in enumerate(encs)}
    )

    def op2(batches):
        enc_of = bc.value
        for pdf in batches:
            pdf = pdf.assign(enc=[enc_of.get(f) for f in pdf["f"]])
            yield from op([pdf])

    got = df.mapInPandas(op2, schema="f string").count()
    dt = time.perf_counter() - t0
    bc.unpersist()
    return dt, got


def part3(spark) -> None:
    """r15 verdict ask #4: the >100k-key regime at the 100k-file
    layout. What gates a million-key prune: (a) fetching 1M key
    probe positions to the driver, (b) the per-file test cost, and
    (c) union-FPR saturation — at m=8192/k=3, per-key FPR=fill^3 and
    P[file admits] ~ 1-(1-fill^3)^n_keys, so 1M keys saturate any
    file past ~13 values (fill 0.5%): the math, not the engine,
    decides when decline-to-scan is the only correct plan."""
    from pyspark.sql import functions as F

    rng = np.random.default_rng(11)
    n_keys = 1_000_000
    print(f"== part 3: million-key regime (100k files x {n_keys} keys) ==")

    # (a) positions fetch: row-collect vs Arrow toPandas
    keys_df = spark.range(0, n_keys).select(F.col("id").alias("__v"))
    sel = keys_df.select(
        *[
            F.pmod(F.xxhash64(F.col("__v"), F.lit(s)), F.lit(M_BITS)).alias(
                f"p{s}"
            )
            for s in range(K)
        ]
    )
    t0 = time.perf_counter()
    pdf = sel.toPandas()
    t_pandas = time.perf_counter() - t0
    t0 = time.perf_counter()
    rows = sel.limit(200_000).collect()  # row-collect subsample
    t_collect = (time.perf_counter() - t0) * (n_keys / 200_000)
    print(
        f"  positions fetch: toPandas {t_pandas:5.1f}s (Arrow, 1M keys) "
        f"vs row-collect ~{t_collect:5.1f}s (extrapolated from 200k)"
    )
    pos = pdf.to_numpy(dtype=np.int64)

    # (b) selective layout: 13 vals/file (fill 0.48% -> per-key FPR
    # 1.1e-7, expected ~1.1% false admission at 1M keys) — the ONLY
    # per-file density where million-key pruning can still be
    # selective at m=8192
    encs = synth_bitmaps(100_000, vals_per_file=13, rng=rng)
    t_sel, adm = exec_side_chunked(spark, encs, pos)
    print(
        f"  selective (13 vals/file): {t_sel:6.1f}s, admitted "
        f"{adm}/100000 ({100 * adm / 100_000:.1f}%)"
    )

    # (c) saturated layout: 400 vals/file — early-exit means the job
    # is CHEAP exactly when it prunes nothing
    encs = synth_bitmaps(100_000, vals_per_file=400, rng=rng)
    t_sat, adm = exec_side_chunked(spark, encs, pos)
    print(
        f"  saturated (400 vals/file): {t_sat:6.1f}s, admitted "
        f"{adm}/100000 (early-exit on first matching block)"
    )

    # (d) the analytic union-FPR curve at m=8192/k=3, 1M keys
    print("  analytic P[admit] at 1M keys:", end="")
    for vals in (5, 13, 25, 50):
        fill = 1 - np.exp(-vals * K / M_BITS)
        p = 1 - (1 - fill**K) ** n_keys
        print(f"  {vals}v/f={p:.3f}", end="")
    print()


if __name__ == "__main__":
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    if "--part3" in sys.argv:
        part3(spark)
    else:
        part1(spark)
        part2(spark)
        part3(spark)
