"""Deterministic sampling operators (operators/sampling.py)."""

from pyspark.sql import functions as F

from end_to_end_data_engineering_pipeline_spark.operators.sampling import (
    bernoulli_sample,
    sample_key,
    stratified_exact_k,
)

SF = "/root/testdata/sf0.001"


def test_bernoulli_nested_and_layout_independent(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    s10 = bernoulli_sample(o, 0.10, "o_orderkey")
    s05 = bernoulli_sample(o, 0.05, "o_orderkey")
    keys10 = {r[0] for r in s10.select("o_orderkey").collect()}
    keys05 = {r[0] for r in s05.select("o_orderkey").collect()}
    # nested: the 5% sample is a subset of the 10% sample
    assert keys05 <= keys10
    # rate lands near nominal (hash uniformity)
    n = o.count()
    assert 0.06 <= len(keys10) / n <= 0.14
    # layout-independent: same sample after an arbitrary repartition
    keys10b = {
        r[0]
        for r in bernoulli_sample(o.repartition(7), 0.10, "o_orderkey")
        .select("o_orderkey")
        .collect()
    }
    assert keys10b == keys10


def test_stratified_exact_k_counts_and_two_phase(spark):
    c = spark.read.parquet(f"{SF}/customer.parquet")
    k = 7
    samp = stratified_exact_k(c, ["c_mktsegment"], k, "c_custkey")
    counts = {
        r["c_mktsegment"]: r["n"]
        for r in samp.groupBy("c_mktsegment").agg(F.count("*").alias("n")).collect()
    }
    per_seg = {
        r["c_mktsegment"]: r["n"]
        for r in c.groupBy("c_mktsegment").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {seg: min(k, n) for seg, n in per_seg.items()}

    # deterministic across layouts
    again = stratified_exact_k(c.repartition(5), ["c_mktsegment"], k, "c_custkey")
    assert {tuple(r) for r in samp.collect()} == {tuple(r) for r in again.collect()}


def test_two_phase_requires_low_buckets(spark):
    """The two-phase shortcut is only exact when the pre-filter keeps
    the k lowest-hash rows of every stratum — i.e. the direct sample
    must itself survive the pre-filter. Verify the exactness on the
    fixture where it holds."""
    from end_to_end_data_engineering_pipeline_spark.operators.sampling import (
        SAMPLE_BUCKETS,
    )

    c = spark.read.parquet(f"{SF}/customer.parquet")
    k = 7
    direct = stratified_exact_k(c, ["c_mktsegment"], k, "c_custkey")
    max_bucket = (
        direct.select((sample_key("c_custkey") % SAMPLE_BUCKETS).alias("b"))
        .agg(F.max("b"))
        .first()[0]
    )
    rate = 0.5
    if max_bucket < rate * SAMPLE_BUCKETS:
        pre = bernoulli_sample(c, rate, "c_custkey")
        twophase = stratified_exact_k(pre, ["c_mktsegment"], k, "c_custkey")
        assert {tuple(r) for r in direct.collect()} == {
            tuple(r) for r in twophase.collect()
        }


def test_pps_sample_weights_by_size(spark):
    """PPS contract: a document holding most of the corpus mass is
    kept with probability ~1 (its k*share exceeds 1), the sample is
    deterministic across reruns, and every kept row satisfies the
    integer inequality (replayed in python)."""
    import hashlib

    from pyspark.sql import functions as F

    from end_to_end_data_engineering_pipeline_spark.operators.sampling import (
        pps_sample,
    )

    rows = [(0, 500_000)] + [(i, 50) for i in range(1, 401)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out1 = sorted(
        r.doc_id
        for r in pps_sample(df, 10, "n_chars", F.col("doc_id")).collect()
    )
    out2 = sorted(
        r.doc_id
        for r in pps_sample(df, 10, "n_chars", F.col("doc_id")).collect()
    )
    assert out1 == out2  # deterministic
    assert 0 in out1  # the dominant doc's p = min(1, 10*0.96...) = 1
    total = sum(s for _, s in rows)
    sizes = dict(rows)
    for d in out1:
        h = int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16)
        assert h * total < 10 * sizes[d] * (1 << 32)


def test_pps_sample_overflow_bounds_raise(spark):
    """ADVICE r6: the int64 bounds (total_size < 2^31, expected_k*size
    < 2^31) were documented but unenforced — past them the non-ANSI
    multiply wraps silently and the sample is wrong with no error.
    Both violations must now raise at execution time."""
    import pytest
    from pyspark.errors import SparkRuntimeException
    from end_to_end_data_engineering_pipeline_spark.operators.sampling import (
        pps_sample,
    )

    big_total = spark.createDataFrame(
        [(i, 1 << 30) for i in range(4)], "id int, sz long"
    )
    with pytest.raises(SparkRuntimeException, match="total_size"):
        pps_sample(big_total, 2, "sz", "id").collect()

    big_product = spark.createDataFrame(
        [(1, (1 << 31) // 100), (2, 10)], "id int, sz long"
    )
    with pytest.raises(SparkRuntimeException, match="expected_k"):
        pps_sample(big_product, 200, "sz", "id").collect()

    # sane inputs still sample (guard adds no false trips)
    ok = spark.createDataFrame(
        [(i, 100 + i) for i in range(1000)], "id int, sz long"
    )
    n = pps_sample(ok, 100, "sz", "id").count()
    assert 50 <= n <= 160


def test_temperature_mixture_shares_and_determinism(spark):
    """alpha=1/2 mixture: expected kept size per group tracks the
    sqrt-share target*w_g/S (up-weighting small groups), the sample is
    layout-independent, and it nests as target grows."""
    from end_to_end_data_engineering_pipeline_spark.operators.sampling import (
        isqrt_long,
        temperature_mixture,
    )

    # two groups, 9:1 natural size ratio -> sqrt share 3:1
    rows = [(i, "big" if i % 10 else "small", 100) for i in range(20000)]
    df = spark.createDataFrame(rows, "id long, g string, sz long")
    target = 400_000  # of 2M total size units
    samp = temperature_mixture(df, "g", target, "sz", "id")
    got = {
        r["g"]: r["kept"]
        for r in samp.groupBy("g").agg(
            F.sum("sz").alias("kept")
        ).collect()
    }
    import math

    n_big, n_small = 18000 * 100, 2000 * 100
    s = math.isqrt(n_big) + math.isqrt(n_small)
    want_big = target * math.isqrt(n_big) / s
    want_small = min(n_small, target * math.isqrt(n_small) / s)
    assert abs(got["big"] - want_big) / want_big < 0.08
    assert abs(got["small"] - want_small) / want_small < 0.08
    # the small group's share rose vs its natural 10%
    assert got["small"] / (got["small"] + got["big"]) > 0.2

    # layout-independent and nested under target growth
    ids = {r["id"] for r in samp.select("id").collect()}
    ids_re = {
        r["id"]
        for r in temperature_mixture(
            df.repartition(13), "g", target, "sz", "id"
        ).select("id").collect()
    }
    assert ids_re == ids
    ids_bigger = {
        r["id"]
        for r in temperature_mixture(df, "g", 2 * target, "sz", "id")
        .select("id").collect()
    }
    assert ids <= ids_bigger

    # isqrt correctness at perfect-square boundaries
    vals = spark.createDataFrame(
        [(0,), (1,), (3,), (4,), (15,), (16,), (17,), ((1 << 40) - 1,)],
        "x long",
    ).select(isqrt_long(F.col("x")).alias("s"), "x").collect()
    import math as m

    for r in vals:
        assert r["s"] == m.isqrt(r["x"]), (r["x"], r["s"])
