"""Table-maintenance operators: small-file compaction + clustered
writes (operators/maintenance.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from end_to_end_data_engineering_pipeline_spark.operators.maintenance import (
    clustered_write,
    compact_partitions,
    plan_compaction,
)


def _files(d):
    return sorted(
        f
        for f in os.listdir(d)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )


def test_compaction_shrinks_fragmented_partitions_only(spark, tmp_path):
    """A partition fragmented by many tiny appends is rewritten to the
    byte-justified file count; an already-compact partition keeps its
    exact files (identity pinned by mtime+name)."""
    path = str(tmp_path / "t")
    # partition a: 12 tiny files (3 appends x 4 tasks); partition b: 1 file
    df = spark.range(0, 3000).select(
        F.lit("a").alias("p"), F.col("id").alias("v")
    )
    for i in range(3):
        df.where((F.col("v") % 3) == i).repartition(4).write.mode(
            "append"
        ).partitionBy("p").parquet(path)
    spark.range(0, 1000).select(
        F.lit("b").alias("p"), F.col("id").alias("v")
    ).coalesce(1).write.mode("append").partitionBy("p").parquet(path)

    a_dir, b_dir = str(tmp_path / "t" / "p=a"), str(tmp_path / "t" / "p=b")
    assert len(_files(a_dir)) == 12
    rows_before = sorted(map(tuple, spark.read.parquet(path).collect()))
    sum_before = sorted(
        map(
            tuple,
            spark.read.parquet(path)
            .groupBy("p")
            .agg(F.sum("v").alias("s"))
            .collect(),
        )
    )
    b_files_before = {
        f: os.path.getmtime(os.path.join(b_dir, f)) for f in _files(b_dir)
    }

    plan = compact_partitions(spark, path, target_file_bytes=1 << 30)
    assert set(plan) == {a_dir} and plan[a_dir][0] == 12
    assert len(_files(a_dir)) == plan[a_dir][1] == 1
    # untouched partition: same files, same mtimes
    assert {
        f: os.path.getmtime(os.path.join(b_dir, f)) for f in _files(b_dir)
    } == b_files_before
    # contents identical
    after = spark.read.parquet(path)
    assert sorted(map(tuple, after.collect())) == rows_before
    assert (
        sorted(
            map(
                tuple,
                after.groupBy("p").agg(F.sum("v").alias("s")).collect(),
            )
        )
        == sum_before
    )
    # second run is a no-op
    assert compact_partitions(spark, path, target_file_bytes=1 << 30) == {}


def test_compaction_unpartitioned_table(spark, tmp_path):
    path = str(tmp_path / "flat")
    spark.range(0, 2000).repartition(10).write.parquet(path)
    assert len(_files(path)) == 10
    rows_before = sorted(r.id for r in spark.read.parquet(path).collect())
    plan = compact_partitions(spark, path, target_file_bytes=1 << 30)
    assert plan and len(_files(path)) == 1
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == rows_before


def test_plan_compaction_respects_target_bytes(spark, tmp_path):
    """With a tiny byte target the partition is already 'compact
    enough' at its current count -> empty plan (no rewrite storms)."""
    path = str(tmp_path / "t2")
    spark.range(0, 1000).repartition(4).write.parquet(path)
    # each file is ~KBs; a 1-byte target wants >= current count files
    assert plan_compaction(path, target_file_bytes=1) == {}


def test_clustered_write_gives_disjoint_file_ranges(spark, tmp_path):
    """Range-partitioned sorted write: per-file footer min/max on the
    sort key must be (near-)disjoint so a point predicate prunes to
    ~1 file; a hash-shuffled write scatters every range across every
    file. Footer stats read via pyarrow."""
    import pyarrow.parquet as pq

    path = str(tmp_path / "clustered")
    df = spark.range(0, 100_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    # adversarial input order: round-robin shuffle first
    clustered_write(df.repartition(8), path, sort_cols=["k"], n_files=8)

    ranges = []
    for f in _files(path):
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(0).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) == 8
    # consecutive file ranges must not overlap (sorted, range-cut)
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, (hi1, lo2)
    # and the data round-trips
    got = spark.read.parquet(path)
    assert got.count() == 100_000
    assert got.agg(F.sum("k")).collect()[0][0] == sum(range(100_000))


def test_compaction_recurses_multilevel_partitions(spark, tmp_path):
    path = str(tmp_path / "ml")
    df = spark.range(0, 400).select(
        (F.col("id") % 2).cast("string").alias("a"),
        (F.col("id") % 3).cast("string").alias("b"),
        F.col("id").alias("v"),
    )
    for _ in range(3):
        df.repartition(2).write.mode("append").partitionBy("a", "b").parquet(
            path
        )
    leaf = str(tmp_path / "ml" / "a=0" / "b=0")
    assert len(_files(leaf)) == 6
    rows_before = sorted(r.v for r in spark.read.parquet(path).collect())
    plan = compact_partitions(spark, path, target_file_bytes=1 << 30)
    assert leaf in plan and len(plan) == 6  # every leaf was fragmented
    assert len(_files(leaf)) == 1
    assert sorted(r.v for r in spark.read.parquet(path).collect()) == rows_before


def test_zorder_write_bounds_both_dimensions(spark, tmp_path):
    """Z-order: every file's bounding box in (x, y) space is compact,
    so predicates on EITHER column prune by footer min-max. Contrast:
    a 1-D clustered write bounds x tightly but leaves y spanning the
    whole domain in every file."""
    import pyarrow.parquet as pq

    from end_to_end_data_engineering_pipeline_spark.operators.maintenance import (
        zorder_write,
    )

    n, dom, files = 160_000, 400, 16
    df = spark.range(0, n).select(
        (F.col("id") % dom).alias("x"),
        ((F.col("id") * 7919 + 13) % dom).alias("y"),
    )
    zpath = str(tmp_path / "z")
    zorder_write(df, zpath, cols=["x", "y"], n_files=files)

    def bboxes(path):
        out = []
        for f in _files(path):
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            stats = {}
            for ci in range(md.row_group(0).num_columns):
                name = md.row_group(0).column(ci).path_in_schema
                mins, maxs = [], []
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ci).statistics
                    mins.append(st.min)
                    maxs.append(st.max)
                stats[name] = (min(mins), max(maxs))
            out.append(stats)
        return out

    zb = bboxes(zpath)
    assert len(zb) == files
    # average normalized bbox area << 1 (ideal 1/16; allow 4x slack)
    areas = [
        ((s["x"][1] - s["x"][0] + 1) / dom) * ((s["y"][1] - s["y"][0] + 1) / dom)
        for s in zb
    ]
    assert sum(areas) / len(areas) <= 4 / files, areas

    # contrast: 1-D clustering on x leaves y unbounded per file
    cpath = str(tmp_path / "c")
    clustered_write(df, cpath, sort_cols=["x"], n_files=files)
    cb = bboxes(cpath)
    y_spans = [(s["y"][1] - s["y"][0] + 1) / dom for s in cb]
    assert min(y_spans) > 0.8  # every file spans ~the whole y domain

    # data preserved
    got = spark.read.parquet(zpath)
    assert got.count() == n
    assert got.agg(F.sum("x")).collect()[0][0] == \
        df.agg(F.sum("x")).collect()[0][0]


def test_staging_dirs_invisible_to_concurrent_reader(spark, tmp_path):
    """Mid-compaction state (stage dir fully written, swap not yet
    done) must be invisible: a reader of the table sees the original
    rows exactly once — no duplicates from the staged copy. Stage and
    old dirs are dot-prefixed with no '=' in the basename, so neither
    partition discovery nor the scan path filter picks them up."""
    path = str(tmp_path / "t")
    df = spark.range(0, 2000).select(
        (F.col("id") % 2).cast("string").alias("p"), F.col("id").alias("v")
    )
    df.repartition(4).write.partitionBy("p").parquet(path)
    before = spark.read.parquet(path).count()

    # simulate a compaction frozen right before the swap: a fully
    # written stage copy of partition p=0 under the table root
    part = os.path.join(path, "p=0")
    stage = os.path.join(path, ".__compact_stage_deadbeef")
    spark.read.parquet(part).write.parquet(stage)
    # ...and a pre-swap copy from an older, already-swapped partition
    old = os.path.join(path, ".__compact_old_deadbeef")
    spark.read.parquet(part).write.parquet(old)

    assert spark.read.parquet(path).count() == before
    got = {
        str(r["p"]): r["count"]
        for r in spark.read.parquet(path).groupBy("p").count().collect()
    }
    assert got == {"0": 1000, "1": 1000}


def test_crashed_compaction_leaves_no_resurrectable_dirs(spark, tmp_path):
    """Orphaned stage/old dirs from a crashed run (swap COMPLETED or
    never started — the partition dir exists) are swept by the next
    plan_compaction, and a compaction run over the crashed state
    produces exactly the original rows (old data never resurrects)."""
    from end_to_end_data_engineering_pipeline_spark.operators.maintenance import (
        _stage_dir_pair,
        _sweep_stage_dirs,
    )

    path = str(tmp_path / "t")
    df = spark.range(0, 3000).select(
        F.lit("a").alias("p"), F.col("id").alias("v")
    )
    for i in range(3):
        df.where((F.col("v") % 3) == i).repartition(4).write.mode(
            "append"
        ).partitionBy("p").parquet(path)
    rows_before = sorted(
        r.v for r in spark.read.parquet(path).select("v").collect()
    )

    # crash leftovers with real (parseable) staging names: stage + old
    # for partition p=a (which still exists -> swap completed, both are
    # garbage), plus an unpartitioned-table sibling-form stage dir
    part = os.path.join(path, "p=a")
    stage, old = _stage_dir_pair(path, part, "c0ffee")
    sib_stage, _ = _stage_dir_pair(path, path, "c0ffee")
    for leftover in (stage, old, sib_stage):
        spark.read.parquet(part).limit(100).write.parquet(leftover)

    executed = compact_partitions(
        spark, path, target_file_bytes=1 << 30, sweep_min_age_seconds=0.0
    )
    assert part in executed

    # leftovers swept, nothing hidden remains anywhere
    assert _sweep_stage_dirs(path, min_age_seconds=0.0) == []
    for root in (path, str(tmp_path)):
        assert not [
            d for d in os.listdir(root) if ".__compact_" in d
        ], os.listdir(root)

    rows_after = sorted(
        r.v for r in spark.read.parquet(path).select("v").collect()
    )
    assert rows_after == rows_before


def test_crash_inside_swap_window_is_restored_not_swept(spark, tmp_path):
    """The killer crash window: rename(partition -> old) done, rename
    (stage -> partition) NOT done. The partition dir is missing and the
    only committed copy lives in the old staging dir. The sweep must
    RESTORE it (completing the interrupted swap backward), not delete
    it — and the table then reads back every original row."""
    from end_to_end_data_engineering_pipeline_spark.operators.maintenance import (
        _stage_dir_pair,
        _sweep_stage_dirs,
    )

    path = str(tmp_path / "t")
    df = spark.range(0, 2000).select(
        (F.col("id") % 2).cast("string").alias("p"), F.col("id").alias("v")
    )
    df.repartition(4).write.partitionBy("p").parquet(path)
    rows_before = sorted(
        r.v for r in spark.read.parquet(path).select("v").collect()
    )

    # simulate the crash: stage fully written, partition renamed away
    part = os.path.join(path, "p=0")
    stage, old = _stage_dir_pair(path, part, "deadbeef")
    spark.read.parquet(part).coalesce(1).write.parquet(stage)
    os.rename(part, old)
    assert not os.path.isdir(part)

    # restore happens regardless of age (committed data, zero grace)
    acted = _sweep_stage_dirs(path)
    assert old in acted and os.path.isdir(part)
    # the uncommitted stage dir survives the aged sweep (could be a
    # live run's) but falls to a forced one
    assert os.path.isdir(stage)
    _sweep_stage_dirs(path, min_age_seconds=0.0)
    assert not os.path.isdir(stage)

    rows_after = sorted(
        r.v for r in spark.read.parquet(path).select("v").collect()
    )
    assert rows_after == rows_before


def test_crash_inside_swap_window_unpartitioned_table(spark, tmp_path):
    """Same crash window for an unpartitioned table: the whole table
    dir is renamed to the hidden sibling; plan_compaction must restore
    it (and then plan normally) rather than sweeping the only copy."""
    path = str(tmp_path / "flat")
    spark.range(0, 1000).repartition(5).write.parquet(path)
    rows_before = sorted(r.id for r in spark.read.parquet(path).collect())

    from end_to_end_data_engineering_pipeline_spark.operators.maintenance import (
        _stage_dir_pair,
    )

    _, old = _stage_dir_pair(path, path, "deadbeef")
    os.rename(path, old)
    assert not os.path.isdir(path)

    plan = plan_compaction(path, target_file_bytes=1 << 30)
    assert os.path.isdir(path) and plan  # restored, then planned
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == rows_before


def test_sweep_leaves_young_and_unattributable_dirs(spark, tmp_path):
    """Concurrency guard: a fresh stage dir (live run) is never swept
    by an aged sweep; a dir whose name cannot be parsed back to a
    partition is never deleted at any age."""
    from end_to_end_data_engineering_pipeline_spark.operators.maintenance import (
        _stage_dir_pair,
        _sweep_stage_dirs,
    )

    path = str(tmp_path / "t")
    spark.range(0, 100).select(
        F.lit("a").alias("p"), F.col("id").alias("v")
    ).write.partitionBy("p").parquet(path)
    part = os.path.join(path, "p=a")
    stage, _ = _stage_dir_pair(path, part, "beef01")
    unparseable = os.path.join(path, ".__compact_stage_legacyname")
    os.makedirs(stage)
    os.makedirs(unparseable)

    assert _sweep_stage_dirs(path) == []  # young stage: left alone
    assert os.path.isdir(stage)
    _sweep_stage_dirs(path, min_age_seconds=0.0)
    assert not os.path.isdir(stage)
    assert os.path.isdir(unparseable)  # unattributable: never deleted


def test_expire_partitions_escaped_values_and_idempotence(spark, tmp_path):
    """Retention must compare the UNESCAPED partition value: values
    Spark hive-escapes on disk (here ':' -> %3A) still sort and expire
    correctly; staging dirs are ignored; a repeat sweep is a no-op."""
    from end_to_end_data_engineering_pipeline_spark.operators.maintenance import (
        expire_partitions,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "2024-01-01T00:00"), (2, "2024-01-05T00:00"), (3, "2024-02-01T00:00")],
        "id int, d string",
    )
    df.write.mode("overwrite").partitionBy("d").parquet(path)
    # a dot-prefixed staging dir must never be listed as a partition
    (tmp_path / "t" / ".__compact_stage_x").mkdir()

    removed = expire_partitions(path, "d", "2024-01-31")
    assert removed == ["2024-01-01T00:00", "2024-01-05T00:00"]
    kept = {r.id for r in spark.read.parquet(path).collect()}
    assert kept == {3}
    assert expire_partitions(path, "d", "2024-01-31") == []
