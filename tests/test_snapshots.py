"""Snapshot-versioned parquet table (operators/snapshots.py): commit
atomicity, time travel, overwrite-as-metadata, vacuum reclamation, and
crash-orphan invisibility."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
    current_version,
    list_versions,
    snapshot_history,
    snapshot_read,
    snapshot_write,
    vacuum,
)


def _rows(spark, pairs):
    return spark.createDataFrame(pairs, "k long, v string")


def _collect(spark, path, version=None):
    return sorted(
        (r.k, r.v) for r in snapshot_read(spark, path, version).collect()
    )


def test_append_overwrite_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "t")
    assert snapshot_write(spark, t, _rows(spark, [(1, "a"), (2, "b")])) == 0
    assert snapshot_write(spark, t, _rows(spark, [(3, "c")])) == 1
    assert (
        snapshot_write(
            spark, t, _rows(spark, [(9, "z")]), mode="overwrite"
        )
        == 2
    )
    # every historical version returns exactly its committed state
    assert _collect(spark, t, 0) == [(1, "a"), (2, "b")]
    assert _collect(spark, t, 1) == [(1, "a"), (2, "b"), (3, "c")]
    assert _collect(spark, t, 2) == [(9, "z")]
    assert _collect(spark, t) == [(9, "z")]  # default = latest
    assert current_version(t) == 2
    assert [h["mode"] for h in snapshot_history(t)] == [
        "append",
        "append",
        "overwrite",
    ]


def test_orphan_files_invisible_until_vacuum(spark, tmp_path):
    """Files in data/ that no manifest references (a crashed commit
    that died between file-move and manifest-link) must be invisible
    to every reader and reclaimed by vacuum."""
    t = str(tmp_path / "t")
    snapshot_write(spark, t, _rows(spark, [(1, "a")]))
    orphan = os.path.join(t, "data", "deadbeef-00000.parquet")
    # a real parquet orphan: copy the committed file
    committed = next(
        f for f in os.listdir(os.path.join(t, "data")) if f != "deadbeef"
    )
    with open(os.path.join(t, "data", committed), "rb") as src:
        body = src.read()
    with open(orphan, "wb") as dst:
        dst.write(body)
    os.makedirs(os.path.join(t, ".__snap_stage_dead"), exist_ok=True)
    assert _collect(spark, t) == [(1, "a")]  # orphan not read
    deleted = vacuum(t, keep_last=1, retention_seconds=0.0)
    assert "deadbeef-00000.parquet" in deleted
    assert not os.path.exists(os.path.join(t, ".__snap_stage_dead"))
    assert _collect(spark, t) == [(1, "a")]  # committed data intact


def test_vacuum_drops_old_versions_keeps_retained(spark, tmp_path):
    t = str(tmp_path / "t")
    snapshot_write(spark, t, _rows(spark, [(1, "a")]))
    snapshot_write(spark, t, _rows(spark, [(2, "b")]))
    snapshot_write(spark, t, _rows(spark, [(3, "c")]), mode="overwrite")
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        _manifest,
    )

    dead = set(_manifest(t, 1)["files"])  # v1 ⊇ v0; v2 overwrote both
    deleted = vacuum(t, keep_last=1, retention_seconds=0.0)
    # v0/v1's files are dead (v2 overwrote); their manifests are gone
    assert set(deleted) == dead and dead
    assert list_versions(t) == [2]
    assert _collect(spark, t, 2) == [(3, "c")]
    with pytest.raises(FileNotFoundError):
        snapshot_read(spark, t, version=0)


def test_append_after_vacuum_and_shared_files(spark, tmp_path):
    """Appends share ancestor files across versions; vacuum keeps a
    file as long as ANY retained manifest references it."""
    t = str(tmp_path / "t")
    snapshot_write(spark, t, _rows(spark, [(1, "a")]))
    snapshot_write(spark, t, _rows(spark, [(2, "b")]))
    deleted = vacuum(t, keep_last=1, retention_seconds=0.0)  # v1 references v0's files too
    assert deleted == []
    assert _collect(spark, t) == [(1, "a"), (2, "b")]
    snapshot_write(spark, t, _rows(spark, [(3, "c")]))
    assert _collect(spark, t) == [(1, "a"), (2, "b"), (3, "c")]


def test_version_claim_is_exclusive(spark, tmp_path):
    """If another writer already committed version N, a concurrent
    commit must NOT clobber it — it retries on top (optimistic
    concurrency). Simulated by pre-planting the next manifest."""
    t = str(tmp_path / "t")
    snapshot_write(spark, t, _rows(spark, [(1, "a")]))
    # simulate a racing writer claiming v1 with an empty overwrite
    rival = {"version": 1, "mode": "overwrite", "files": []}
    with open(os.path.join(t, "_versions", "v1.json"), "w") as fh:
        json.dump(rival, fh)
    v = snapshot_write(spark, t, _rows(spark, [(2, "b")]))
    assert v == 2  # lost the race for 1, committed as 2
    # the rival's v1 overwrite is intact and our append chained onto it
    assert json.load(open(os.path.join(t, "_versions", "v1.json"))) == rival
    assert _collect(spark, t, 2) == [(2, "b")]


def test_empty_version_read_raises(spark, tmp_path):
    t = str(tmp_path / "t")
    snapshot_write(spark, t, _rows(spark, [(1, "a")]))
    with open(os.path.join(t, "_versions", "v1.json"), "w") as fh:
        json.dump({"version": 1, "mode": "overwrite", "files": []}, fh)
    with pytest.raises(ValueError):
        snapshot_read(spark, t, version=1)
    with pytest.raises(FileNotFoundError):
        snapshot_read(spark, str(tmp_path / "missing"))


def test_merge_copy_on_write_file_granularity(spark, tmp_path):
    """CoW MERGE contract: only files containing a matched key are
    rewritten; untouched files enter the new manifest BY REFERENCE
    (same name — so at scale merge cost tracks touched files, not
    table size), and the pre-merge version stays time-travelable."""
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        _manifest,
        snapshot_merge,
    )

    t = str(tmp_path / "t")
    # two files with disjoint key ranges via repartitionByRange
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (101, "x"), (102, "y")], "k long, v string"
    ).repartitionByRange(2, "k")
    snapshot_write(spark, t, base)
    m0 = set(_manifest(t, 0)["files"])
    assert len(m0) == 2

    upd = spark.createDataFrame([(1, "A"), (200, "new")], "k long, v string")
    v = snapshot_merge(spark, t, upd, keys=["k"])
    assert v == 1
    assert _collect(spark, t, 1) == [
        (1, "A"),
        (2, "b"),
        (101, "x"),
        (102, "y"),
        (200, "new"),
    ]
    # the low-range file (containing k=1) was rewritten; the high-range
    # file survives by reference in the new manifest
    m1 = set(_manifest(t, 1)["files"])
    shared = m0 & m1
    assert len(shared) == 1
    # pre-merge state intact
    assert _collect(spark, t, 0) == [(1, "a"), (2, "b"), (101, "x"), (102, "y")]


def test_merge_insert_only_rewrites_nothing(spark, tmp_path):
    """A merge whose keys match no existing row must carry EVERY base
    file by reference and only add the new rows' files."""
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        _manifest,
        snapshot_merge,
    )

    t = str(tmp_path / "t")
    snapshot_write(
        spark,
        t,
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"),
    )
    m0 = set(_manifest(t, 0)["files"])
    snapshot_merge(
        spark,
        t,
        spark.createDataFrame([(9, "z")], "k long, v string"),
        keys=["k"],
    )
    m1 = set(_manifest(t, 1)["files"])
    assert m0 <= m1  # all base files referenced unchanged
    assert _collect(spark, t) == [(1, "a"), (2, "b"), (9, "z")]


def test_merge_conflict_raises(spark, tmp_path, monkeypatch):
    """A concurrent commit landing BETWEEN the merge's read and its
    manifest claim must surface as SnapshotConflict, never clobber.
    The race is injected by planting the rival manifest inside the
    merge's staging step (after it resolved its base version)."""
    from end_to_end_data_engineering_pipeline_spark.operators import snapshots

    t = str(tmp_path / "t")
    snapshot_write(
        spark, t, spark.createDataFrame([(1, "a")], "k long, v string")
    )
    rival = {"version": 1, "mode": "overwrite", "files": []}
    real_stage = snapshots._stage_files

    def stage_and_race(sp, path, df):
        names = real_stage(sp, path, df)
        with open(os.path.join(t, "_versions", "v1.json"), "w") as fh:
            json.dump(rival, fh)
        return names

    monkeypatch.setattr(snapshots, "_stage_files", stage_and_race)
    with pytest.raises(snapshots.SnapshotConflict):
        snapshots.snapshot_merge(
            spark,
            t,
            spark.createDataFrame([(1, "A")], "k long, v string"),
            keys=["k"],
        )
    # rival manifest untouched
    assert json.load(open(os.path.join(t, "_versions", "v1.json"))) == rival


def test_compact_combines_smalls_keeps_bigs_by_reference(spark, tmp_path):
    """OPTIMIZE-as-commit contract: small files combine into a new
    version whose content equals the old one byte-for-row; files above
    the small threshold carry by reference; prior versions still read
    the uncompacted layout until vacuumed; an already-compact table is
    a no-op returning the current version."""
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        _manifest,
        snapshot_compact,
    )

    t = str(tmp_path / "t")
    # 4 append versions -> many tiny files
    for i in range(4):
        snapshot_write(
            spark,
            t,
            spark.createDataFrame(
                [(i * 10 + j, f"v{i}_{j}") for j in range(5)],
                "k long, v string",
            ),
        )
    before = set(_manifest(t, 3)["files"])
    assert len(before) >= 4
    rows_before = _collect(spark, t)

    v = snapshot_compact(spark, t, small_file_bytes=1 << 20)
    assert v == 4
    after = _manifest(t, 4)["files"]
    assert len(after) == 1  # everything was small -> one output file
    assert _collect(spark, t) == rows_before  # content identical
    assert _collect(spark, t, 3) == rows_before  # history intact
    # idempotence: nothing left to combine
    assert snapshot_compact(spark, t, small_file_bytes=1 << 20) == 4

    # big-file carve-out: with the threshold at 0 every file is "big"
    t2 = str(tmp_path / "t2")
    snapshot_write(
        spark, t2, spark.createDataFrame([(1, "a")], "k long, v string")
    )
    assert snapshot_compact(spark, t2, small_file_bytes=0) == 0


def test_compact_mid_stream_appends_continue(spark, tmp_path):
    """Interplay of the streaming sink and OPTIMIZE: appends accrete
    versions, a compaction commits between them, and later appends
    chain onto the compacted manifest — content is always the union
    of everything appended, and the compacted version's files carry
    forward by reference."""
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        _manifest,
        snapshot_compact,
    )

    t = str(tmp_path / "t")
    snapshot_write(spark, t, _rows(spark, [(1, "a")]))
    snapshot_write(spark, t, _rows(spark, [(2, "b")]))
    v = snapshot_compact(spark, t, small_file_bytes=1 << 20)
    assert v == 2
    snapshot_write(spark, t, _rows(spark, [(3, "c")]))
    assert _collect(spark, t) == [(1, "a"), (2, "b"), (3, "c")]
    # the append chained onto the compacted file set
    assert set(_manifest(t, 2)["files"]) <= set(_manifest(t, 3)["files"])
    assert len(_manifest(t, 2)["files"]) == 1


def test_merge_then_compact_then_diff_composition(spark, tmp_path):
    """Lifecycle composition: CoW merge -> OPTIMIZE -> diff. The diff
    across the compaction boundary must be EMPTY (compaction is
    layout-only), and the diff from pre-merge to post-compaction must
    equal the diff to pre-compaction (same logical content)."""
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        snapshot_compact,
        snapshot_diff,
        snapshot_merge,
    )

    t = str(tmp_path / "t")
    snapshot_write(spark, t, _rows(spark, [(1, "a"), (2, "b")]))
    snapshot_merge(
        spark,
        t,
        spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string"),
        keys=["k"],
    )  # v1
    v = snapshot_compact(spark, t, small_file_bytes=1 << 20)  # v2
    assert v == 2
    # layout-only commit: logically nothing changed
    assert snapshot_diff(spark, t, ["k"], 1, 2).collect() == []
    d02 = sorted(
        (r.k, r.change)
        for r in snapshot_diff(spark, t, ["k"], 0, 2).collect()
    )
    d01 = sorted(
        (r.k, r.change)
        for r in snapshot_diff(spark, t, ["k"], 0, 1).collect()
    )
    assert d02 == d01 == [(2, "changed"), (3, "added")]


def test_merge_after_vacuum_of_ancestors(spark, tmp_path):
    """Vacuuming history must not disturb the live version's merge
    path: after dropping ancestors, a CoW merge still reads the
    current manifest's files and commits the next version."""
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        snapshot_merge,
    )

    t = str(tmp_path / "t")
    snapshot_write(spark, t, _rows(spark, [(1, "a")]))
    snapshot_write(spark, t, _rows(spark, [(2, "b")]), mode="overwrite")
    vacuum(t, keep_last=1, retention_seconds=0.0)
    assert list_versions(t) == [1]
    v = snapshot_merge(
        spark,
        t,
        spark.createDataFrame([(2, "B")], "k long, v string"),
        keys=["k"],
    )
    assert v == 2
    assert _collect(spark, t) == [(2, "B")]


def test_vacuum_retention_window_protects_inflight_commit(spark, tmp_path):
    """ADVICE r6 (medium): a concurrent snapshot_write moves files into
    data/ and writes its temp manifest BEFORE the manifest link, so a
    racing vacuum with no age threshold would delete them and corrupt
    the commit. The retention window (default 24h) must skip anything
    fresh: unreferenced-but-new data files, stage dirs, temp manifests
    all survive; old-version manifests still drop (metadata only)."""
    t = str(tmp_path / "t")
    snapshot_write(spark, t, _rows(spark, [(1, "a")]))
    # simulate an in-flight commit mid-protocol: moved data file + temp
    # manifest + stage dir, all with fresh mtimes
    inflight = os.path.join(t, "data", "cafef00d-00000.parquet")
    committed = sorted(os.listdir(os.path.join(t, "data")))[0]
    with open(os.path.join(t, "data", committed), "rb") as src:
        body = src.read()
    with open(inflight, "wb") as dst:
        dst.write(body)
    os.makedirs(os.path.join(t, ".__snap_stage_cafe"), exist_ok=True)
    tmp_manifest = os.path.join(t, "_versions", ".v1.json.cafe")
    with open(tmp_manifest, "w") as fh:
        fh.write("{}")
    deleted = vacuum(t, keep_last=1)  # default retention
    assert deleted == []
    assert os.path.exists(inflight)
    assert os.path.exists(os.path.join(t, ".__snap_stage_cafe"))
    assert os.path.exists(tmp_manifest)
    # with retention waived (exclusive access), everything is reclaimed
    deleted = vacuum(t, keep_last=1, retention_seconds=0.0)
    assert deleted == ["cafef00d-00000.parquet"]
    assert not os.path.exists(os.path.join(t, ".__snap_stage_cafe"))
    assert not os.path.exists(tmp_manifest)
    assert _collect(spark, t) == [(1, "a")]


class TestPartitionedSnapshots:
    """snapshot_write_partitioned / snapshot_read_partitioned:
    Iceberg-style manifest-level partition pruning, version-pinned."""

    def _write(self, spark, path, rows, mode="overwrite", extra=None):
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_write_partitioned,
        )

        df = spark.createDataFrame(rows, "id long, cell int, val string")
        return snapshot_write_partitioned(
            spark, path, df, "cell", mode=mode, extra=extra
        )

    def test_roundtrip_and_manifest_pruning(self, spark, tmp_path):
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_manifest,
            snapshot_read_partitioned,
        )

        path = str(tmp_path / "t")
        rows = [(i, i % 3, f"v{i}") for i in range(30)]
        v = self._write(spark, path, rows, extra={"k": 3})
        assert v == 0
        m = snapshot_manifest(path)
        assert m["part_col"] == "cell" and m["extra"] == {"k": 3}
        assert set(m["partitions"].values()) == {"0", "1", "2"}

        full = snapshot_read_partitioned(spark, path)
        assert sorted(
            (r.id, r.cell, r.val) for r in full.collect()
        ) == sorted(rows)
        # pruning is by FILE: a 1-of-3-cell read opens only that
        # cell's files, and the part col is re-attached correctly
        one = snapshot_read_partitioned(spark, path, values=[1])
        assert set(one.inputFiles()) < set(full.inputFiles())
        got = sorted((r.id, r.cell, r.val) for r in one.collect())
        assert got == sorted(r for r in rows if r[1] == 1)
        assert dict(one.dtypes)["cell"] == "int"

    def test_append_merges_partition_map_and_pin_survives(
        self, spark, tmp_path
    ):
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_read_partitioned,
        )

        path = str(tmp_path / "t")
        self._write(spark, path, [(1, 0, "a"), (2, 1, "b")])
        self._write(spark, path, [(3, 1, "c"), (4, 2, "d")], mode="append")
        latest = snapshot_read_partitioned(spark, path, values=[1])
        assert sorted(r.id for r in latest.collect()) == [2, 3]
        # v0 pinned: the append cannot change what a pinned read sees
        v0 = snapshot_read_partitioned(spark, path, values=[1], version=0)
        assert [r.id for r in v0.collect()] == [2]

    def test_rejects_null_partition_and_unpartitioned_version(
        self, spark, tmp_path
    ):
        import pytest

        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_read_partitioned,
            snapshot_write,
            snapshot_write_partitioned,
        )

        path = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(1, None, "a")], "id long, cell int, val string"
        )
        with pytest.raises(ValueError, match="round-trip"):
            snapshot_write_partitioned(spark, path, df, "cell")
        path2 = str(tmp_path / "plain")
        snapshot_write(
            spark,
            path2,
            spark.createDataFrame([(1,)], "id long"),
        )
        with pytest.raises(ValueError, match="not committed"):
            snapshot_read_partitioned(spark, path2)

    def test_missing_values_return_empty_with_schema(self, spark, tmp_path):
        """Probing values no file carries is a legitimate empty result
        (e.g. an IVF cell no vector landed in) — committed schema,
        zero rows, like snapshot_read_range's empty window."""
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_read_partitioned,
        )

        path = str(tmp_path / "t")
        self._write(spark, path, [(1, 0, "a")])
        out = snapshot_read_partitioned(spark, path, values=[7])
        assert out.count() == 0
        assert sorted(c for c, _ in out.dtypes) == ["cell", "id", "val"]

    def test_merge_preserves_partition_map_and_carries_untouched(
        self, spark, tmp_path
    ):
        """Partitioned CoW MERGE (r7 verdict #2): the rewrite restages
        through partitionBy so the new manifest keeps a complete
        partition map, untouched partitions' files carry BY REFERENCE
        (same names), and pruned reads still work on the new
        version."""
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            _manifest,
            snapshot_merge,
            snapshot_read_partitioned,
        )

        path = str(tmp_path / "t")
        self._write(spark, path, [(1, 0, "a"), (2, 1, "b"), (3, 2, "c")])
        m0 = _manifest(path, 0)
        upd = spark.createDataFrame(
            [(1, 0, "z"), (9, 1, "new")], "id long, cell int, val string"
        )
        v = snapshot_merge(spark, path, upd, ["id"])
        m1 = _manifest(path, v)
        # full partition map, one value per file
        assert set(m1["partitions"]) == set(m1["files"])
        assert set(m1["partitions"].values()) == {"0", "1", "2"}
        # cell=2 had no matched key: its file carries by reference
        cell2_v0 = {f for f, c in m0["partitions"].items() if c == "2"}
        cell2_v1 = {f for f, c in m1["partitions"].items() if c == "2"}
        assert cell2_v0 == cell2_v1
        # pruned read of the merged partition sees the upsert
        out = snapshot_read_partitioned(spark, path, values=[0], version=v)
        assert [(r.id, r.val) for r in out.collect()] == [(1, "z")]
        got = {
            (r.id, r.cell, r.val)
            for r in snapshot_read_partitioned(spark, path).collect()
        }
        assert got == {(1, 0, "z"), (2, 1, "b"), (3, 2, "c"), (9, 1, "new")}

    def test_merge_requires_part_col_in_updates(self, spark, tmp_path):
        import pytest

        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_merge,
        )

        path = str(tmp_path / "t")
        self._write(spark, path, [(1, 0, "a")])
        upd = spark.createDataFrame([(1, "z")], "id long, val string")
        with pytest.raises(ValueError, match="partition column"):
            snapshot_merge(spark, path, upd, ["id"])

    def test_part_keyed_delete_prunes_candidate_files(
        self, spark, tmp_path
    ):
        """A delete keyed ON the partition column manifests-prunes its
        candidate files: only the keyed partitions' files are
        rewritten (dropped here), every other partition's files carry
        by reference — the day-keyed retention sweep at 100 TB."""
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            _manifest,
            snapshot_delete,
            snapshot_read_partitioned,
        )

        path = str(tmp_path / "t")
        self._write(
            spark, path, [(1, 0, "a"), (2, 1, "b"), (3, 2, "c")]
        )
        m0 = _manifest(path, 0)
        v = snapshot_delete(
            spark,
            path,
            spark.createDataFrame([(1,)], "cell int"),
            ["cell"],
        )
        m1 = _manifest(path, v)
        keep_v0 = {
            f for f, c in m0["partitions"].items() if c in ("0", "2")
        }
        assert keep_v0 <= set(m1["files"])  # carried by reference
        assert "1" not in set(m1["partitions"].values())
        got = {
            (r.id, r.cell)
            for r in snapshot_read_partitioned(spark, path).collect()
        }
        assert got == {(1, 0), (3, 2)}

    def test_partitioned_compact_merges_within_value_only(
        self, spark, tmp_path
    ):
        """OPTIMIZE on a partitioned table compacts small files WITHIN
        each partition value (one-value-per-file is what pruning
        prunes on) and keeps the map complete."""
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            _manifest,
            snapshot_compact,
            snapshot_read_partitioned,
            snapshot_write_partitioned,
        )

        path = str(tmp_path / "t")
        # two appends -> 2 small files per cell
        for batch in ([(1, 0, "a"), (2, 1, "b")], [(3, 0, "c"), (4, 1, "d")]):
            df = spark.createDataFrame(
                batch, "id long, cell int, val string"
            ).repartition(1)
            snapshot_write_partitioned(spark, path, df, "cell", mode="append")
        m0 = _manifest(path, 1)
        assert len(m0["files"]) == 4
        v = snapshot_compact(spark, path, small_file_bytes=1 << 30)
        m1 = _manifest(path, v)
        assert len(m1["files"]) == 2  # one per cell
        assert set(m1["partitions"].values()) == {"0", "1"}
        assert set(m1["partitions"]) == set(m1["files"])
        got = {
            (r.id, r.cell)
            for r in snapshot_read_partitioned(spark, path).collect()
        }
        assert got == {(1, 0), (2, 1), (3, 0), (4, 1)}
        # pruned read post-compaction opens exactly one file
        one = snapshot_read_partitioned(spark, path, values=[0])
        assert len(one.inputFiles()) == 1


class TestSortedSnapshots:
    """snapshot_write_sorted / snapshot_read_range: per-file min/max
    stats in the versioned manifest (Iceberg file skipping)."""

    def _write(self, spark, path, lo, hi, n_files=4, mode="overwrite"):
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_write_sorted,
        )

        df = spark.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        return snapshot_write_sorted(
            spark, path, df, "k", n_files=n_files, mode=mode
        )

    def test_range_read_prunes_files_and_matches_filter(
        self, spark, tmp_path
    ):
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_manifest,
            snapshot_read_range,
        )

        path = str(tmp_path / "t")
        self._write(spark, path, 0, 1000, n_files=8)
        m = snapshot_manifest(path)
        assert m["stats_col"] == "k" and len(m["files"]) == 8
        # clustered write -> disjoint file ranges: total span coverage
        spans = sorted(m["stats"].values())
        for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
            assert a_hi < b_lo  # strictly disjoint

        full = snapshot_read_range(spark, path, 0, 999)
        narrow = snapshot_read_range(spark, path, 100, 149)
        assert len(narrow.inputFiles()) < len(full.inputFiles())
        assert sorted(r.k for r in narrow.collect()) == list(range(100, 150))

    def test_empty_window_returns_schema_no_rows(self, spark, tmp_path):
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_read_range,
        )

        path = str(tmp_path / "t")
        self._write(spark, path, 0, 100)
        out = snapshot_read_range(spark, path, 5000, 6000)
        assert out.count() == 0
        assert [f[0] for f in out.dtypes] == ["k", "v"]

    def test_append_merges_stats_and_pin_survives(self, spark, tmp_path):
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_read_range,
        )

        path = str(tmp_path / "t")
        self._write(spark, path, 0, 100, n_files=2)
        self._write(spark, path, 100, 200, n_files=2, mode="append")
        latest = snapshot_read_range(spark, path, 50, 150)
        assert sorted(r.k for r in latest.collect()) == list(range(50, 151))
        v0 = snapshot_read_range(spark, path, 50, 150, version=0)
        assert sorted(r.k for r in v0.collect()) == list(range(50, 100))

    def test_timestamp_stats_roundtrip(self, spark, tmp_path):
        import datetime

        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_read_range,
            snapshot_write_sorted,
        )

        path = str(tmp_path / "t")
        base = datetime.datetime(2024, 1, 1)
        rows = [
            (i, base + datetime.timedelta(hours=i)) for i in range(96)
        ]
        df = spark.createDataFrame(rows, "id long, ts timestamp")
        snapshot_write_sorted(spark, path, df, "ts", n_files=4)
        day2 = snapshot_read_range(
            spark,
            path,
            datetime.datetime(2024, 1, 2),
            datetime.datetime(2024, 1, 2, 23, 59, 59),
        )
        assert sorted(r.id for r in day2.collect()) == list(range(24, 48))
        assert len(day2.inputFiles()) < 4

    def test_string_stats_column_degrades_to_no_pruning(
        self, spark, tmp_path
    ):
        """A string-typed stats column has no supported ordering key:
        the write must still commit (null stats = conservatively
        never pruned), and range bounds on it fail loudly."""
        import pytest

        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_manifest,
            snapshot_read_range,
            snapshot_write_sorted,
        )

        path = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(i, f"k{i:03d}") for i in range(20)], "id long, name string"
        )
        snapshot_write_sorted(spark, path, df, "name", n_files=2)
        m = snapshot_manifest(path)
        assert all(v is None for v in m["stats"].values())
        with pytest.raises(TypeError, match="unsupported stats value"):
            snapshot_read_range(spark, path, "a", "z")

    def test_delete_and_merge_keep_range_pruning(self, spark, tmp_path):
        """ADVICE r7 (medium): CoW on a range-clustered table used to
        publish a manifest WITHOUT stats_col/stats, killing
        snapshot_read_range on the new current version. Now rewritten
        files get footer-recomputed stats, untouched stats carry, and
        range reads keep pruning."""
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_delete,
            snapshot_manifest,
            snapshot_merge,
            snapshot_read_range,
        )

        path = str(tmp_path / "t")
        self._write(spark, path, 0, 1000, n_files=8)
        m0 = snapshot_manifest(path)
        # delete keys living in one file's range
        v1 = snapshot_delete(
            spark,
            path,
            spark.range(100, 110).select(F.col("id").alias("k")),
            ["k"],
        )
        m1 = snapshot_manifest(path, v1)
        assert m1["stats_col"] == "k"
        assert set(m1["stats"]) == set(m1["files"])
        assert all(v is not None for v in m1["stats"].values())
        # untouched files carry by reference with their old stats
        carried = set(m0["files"]) & set(m1["files"])
        assert carried and all(
            m1["stats"][f] == m0["stats"][f] for f in carried
        )
        # range read on the NEW current version: correct and pruned
        got = sorted(
            r.k for r in snapshot_read_range(spark, path, 95, 120).collect()
        )
        assert got == [95, 96, 97, 98, 99] + list(range(110, 121))
        narrow = snapshot_read_range(spark, path, 900, 949)
        full = snapshot_read_range(spark, path, 0, 999)
        assert len(narrow.inputFiles()) < len(full.inputFiles())
        # merge keeps the flavor too
        upd = spark.range(500, 505).select(
            F.col("id").alias("k"), (F.col("id") * 7).alias("v")
        )
        v2 = snapshot_merge(spark, path, upd, ["k"])
        m2 = snapshot_manifest(path, v2)
        assert m2["stats_col"] == "k" and set(m2["stats"]) == set(m2["files"])
        assert [
            (r.k, r.v)
            for r in snapshot_read_range(spark, path, 500, 504)
            .orderBy("k")
            .collect()
        ] == [(k, k * 7) for k in range(500, 505)]

    def test_sorted_compact_keeps_disjoint_stats(self, spark, tmp_path):
        """Compaction on a range-clustered table re-sorts the small
        files (repartitionByRange) so outputs stay mutually disjoint
        and footer stats stay selective."""
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_compact,
            snapshot_manifest,
            snapshot_read_range,
        )

        path = str(tmp_path / "t")
        self._write(spark, path, 0, 500, n_files=8)
        v = snapshot_compact(
            spark, path, small_file_bytes=1 << 30, target_file_bytes=1 << 30
        )
        m = snapshot_manifest(path, v)
        assert m["stats_col"] == "k"
        assert set(m["stats"]) == set(m["files"])
        assert (
            sorted(r.k for r in snapshot_read_range(spark, path, 0, 499).collect())
            == list(range(500))
        )

    def test_non_utc_session_refused_for_ts_stats(self, spark, tmp_path):
        """ADVICE r7 (low): footer stats normalize to naive UTC while
        the read residual literal is session-local — a non-UTC session
        would silently prune matching rows. Both ends now refuse."""
        import datetime as dt

        import pytest

        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_read_range,
            snapshot_write_sorted,
        )

        path = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(i, dt.datetime(2024, 1, 1, i)) for i in range(10)],
            "id long, ts timestamp",
        )
        prev = spark.conf.get("spark.sql.session.timeZone")
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        try:
            with pytest.raises(ValueError, match="timeZone"):
                snapshot_write_sorted(spark, path, df, "ts", n_files=2)
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            snapshot_write_sorted(spark, path, df, "ts", n_files=2)
            spark.conf.set("spark.sql.session.timeZone", "America/New_York")
            with pytest.raises(ValueError, match="timeZone"):
                snapshot_read_range(
                    spark,
                    path,
                    dt.datetime(2024, 1, 1, 2),
                    dt.datetime(2024, 1, 1, 5),
                )
        finally:
            spark.conf.set("spark.sql.session.timeZone", prev)


class TestSnapshotDelete:
    """snapshot_delete: CoW right-to-be-forgotten, erasure proven by
    scanning the surviving bytes."""

    def _seed(self, spark, path):
        base = spark.createDataFrame(
            [(1, "a"), (2, "b"), (101, "x"), (102, "y")], "k long, v string"
        ).repartitionByRange(2, "k")
        snapshot_write(spark, path, base)

    def test_cow_delete_file_granularity_and_time_travel(
        self, spark, tmp_path
    ):
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            _manifest,
            snapshot_delete,
        )

        t = str(tmp_path / "t")
        self._seed(spark, t)
        m0 = set(_manifest(t, 0)["files"])
        keys = spark.createDataFrame([(1,)], "k long")
        assert snapshot_delete(spark, t, keys, ["k"]) == 1
        assert _collect(spark, t, 1) == [(2, "b"), (101, "x"), (102, "y")]
        # high-range file untouched, carried by reference
        m1 = set(_manifest(t, 1)["files"])
        assert len(m0 & m1) == 1
        # pre-delete version still fully readable (retention contract)
        assert _collect(spark, t, 0) == [
            (1, "a"), (2, "b"), (101, "x"), (102, "y"),
        ]

    def test_vacuum_after_delete_erases_bytes(self, spark, tmp_path):
        """The compliance contract: delete + vacuum => the key's rows
        exist in NO remaining data file (scanned directly, not via a
        manifest)."""
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_delete,
        )

        t = str(tmp_path / "t")
        self._seed(spark, t)
        snapshot_delete(
            spark, t, spark.createDataFrame([(1,)], "k long"), ["k"]
        )
        vacuum(t, keep_last=1, retention_seconds=0.0)
        data_dir = os.path.join(t, "data")
        every_file = [
            os.path.join(data_dir, f)
            for f in os.listdir(data_dir)
            if f.endswith(".parquet")
        ]
        raw = spark.read.parquet(*every_file)
        assert raw.where(F.col("k") == 1).count() == 0
        assert sorted(r.k for r in raw.collect()) == [2, 101, 102]

    def test_no_match_delete_rewrites_nothing(self, spark, tmp_path):
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            _manifest,
            snapshot_delete,
        )

        t = str(tmp_path / "t")
        self._seed(spark, t)
        m0 = set(_manifest(t, 0)["files"])
        snapshot_delete(
            spark, t, spark.createDataFrame([(999,)], "k long"), ["k"]
        )
        assert set(_manifest(t, 1)["files"]) == m0
        assert _manifest(t, 1)["mode"] == "delete"

    def test_partitioned_delete_keeps_map_and_pruned_reads(
        self, spark, tmp_path
    ):
        """Row-keyed delete on a partitioned table (sim19's shape):
        only files CONTAINING a matched key are rewritten, the new
        files keep their partition values, and pruned reads work on
        the post-delete version."""
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            _manifest,
            snapshot_delete,
            snapshot_read_partitioned,
            snapshot_write_partitioned,
        )

        t = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(1, 0, "a"), (2, 0, "b"), (3, 1, "c")],
            "id long, cell int, val string",
        )
        snapshot_write_partitioned(spark, t, df, "cell")
        m0 = _manifest(t, 0)
        v = snapshot_delete(
            spark, t, spark.createDataFrame([(1,)], "id long"), ["id"]
        )
        m1 = _manifest(t, v)
        assert set(m1["partitions"]) == set(m1["files"])
        # cell=1 untouched: carried by reference
        c1_v0 = {f for f, c in m0["partitions"].items() if c == "1"}
        assert c1_v0 <= set(m1["files"])
        out = snapshot_read_partitioned(spark, t, values=[0], version=v)
        assert sorted(r.id for r in out.collect()) == [2]


class TestSnapshotRestore:
    def test_restore_is_metadata_only_and_auditable(self, spark, tmp_path):
        """Restore commits the OLD file list as a NEW version: data
        readable at the restored state, the bad version still in
        history, vacuum keeps shared files, and restoring a
        partitioned/extra manifest keeps its map and extra."""
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            _manifest,
            snapshot_delete,
            snapshot_restore,
        )

        t = str(tmp_path / "t")
        snapshot_write(spark, t, _rows(spark, [(1, "a"), (2, "b")]))
        snapshot_delete(  # the "oops" commit
            spark, t, spark.createDataFrame([(1,)], "k long"), ["k"]
        )
        assert _collect(spark, t) == [(2, "b")]
        v = snapshot_restore(t, 0)
        assert v == 2
        assert _collect(spark, t) == [(1, "a"), (2, "b")]
        m = _manifest(t, 2)
        assert m["mode"] == "restore" and m["restored_from"] == 0
        # the bad delete version survives for the post-mortem
        assert _collect(spark, t, 1) == [(2, "b")]
        # vacuum to latest keeps the restored files alive
        vacuum(t, keep_last=1, retention_seconds=0.0)
        assert _collect(spark, t) == [(1, "a"), (2, "b")]

    def test_restore_carries_partition_map_and_extra(self, spark, tmp_path):
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_read_partitioned,
            snapshot_restore,
            snapshot_write_partitioned,
        )

        t = str(tmp_path / "t")
        df0 = spark.createDataFrame(
            [(1, 0, "a"), (2, 1, "b")], "id long, cell int, val string"
        )
        snapshot_write_partitioned(spark, t, df0, "cell", extra={"gen": 0})
        df1 = spark.createDataFrame(
            [(3, 2, "c")], "id long, cell int, val string"
        )
        snapshot_write_partitioned(spark, t, df1, "cell", extra={"gen": 1})
        v = snapshot_restore(t, 0)
        out = snapshot_read_partitioned(spark, t, values=[0], version=v)
        assert [r.id for r in out.collect()] == [1]
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_manifest,
        )

        assert snapshot_manifest(t, v)["extra"] == {"gen": 0}

    def test_restore_unknown_version_raises(self, spark, tmp_path):
        import pytest

        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_restore,
        )

        t = str(tmp_path / "t")
        snapshot_write(spark, t, _rows(spark, [(1, "a")]))
        with pytest.raises(FileNotFoundError):
            snapshot_restore(t, 7)


def test_plain_append_refuses_pruned_table_flavors(spark, tmp_path):
    """snapshot_write(mode='append') onto a partitioned or
    range-clustered table would publish a manifest without the
    partition map / file stats, silently downgrading pruned reads —
    it must refuse (overwrite, which replaces the flavor wholesale,
    stays legal)."""
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        snapshot_write_partitioned,
        snapshot_write_sorted,
    )

    part = str(tmp_path / "part")
    snapshot_write_partitioned(
        spark,
        part,
        spark.createDataFrame([(1, 0, "a")], "id long, cell int, v string"),
        "cell",
    )
    extra = spark.createDataFrame([(2, 1, "b")], "id long, cell int, v string")
    with pytest.raises(ValueError, match="downgrade"):
        snapshot_write(spark, part, extra, mode="append")
    v = snapshot_write(spark, part, extra, mode="overwrite")
    assert v == 1  # explicit flavor replacement is allowed

    srt = str(tmp_path / "sorted")
    snapshot_write_sorted(
        spark,
        srt,
        spark.createDataFrame([(1, 5)], "id long, k long"),
        "k",
        n_files=1,
    )
    with pytest.raises(ValueError, match="downgrade"):
        snapshot_write(
            spark,
            srt,
            spark.createDataFrame([(2, 6)], "id long, k long"),
            mode="append",
        )

def test_partitioned_append_claim_race(spark, tmp_path):
    """Concurrent partitioned appends serialize by optimistic retry:
    when a rival claims the next version first, the loser re-resolves
    and commits on top WITH the rival's partition map merged — the
    partitioned twin of test_version_claim_is_exclusive."""
    import json
    import os

    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        snapshot_manifest,
        snapshot_read_partitioned,
        snapshot_write_partitioned,
    )

    t = str(tmp_path / "t")
    df0 = spark.createDataFrame([(1, 0, "a")], "id long, cell int, v string")
    snapshot_write_partitioned(spark, t, df0, "cell")
    # rival claims v1: an (empty-file) partitioned overwrite manifest
    rival = {
        "version": 1, "mode": "overwrite", "files": [],
        "part_col": "cell", "part_type": "int", "partitions": {},
        "extra": {},
    }
    with open(os.path.join(t, "_versions", "v1.json"), "w") as fh:
        json.dump(rival, fh)
    df2 = spark.createDataFrame([(2, 1, "b")], "id long, cell int, v string")
    v = snapshot_write_partitioned(spark, t, df2, "cell", mode="append")
    assert v == 2  # lost the race for 1, retried on top of the rival
    m = snapshot_manifest(t, 2)
    # append chained onto the RIVAL's (empty) live set, not v0's
    assert set(m["partitions"].values()) == {"1"}
    out = snapshot_read_partitioned(spark, t, version=2)
    assert [(r.id, r.cell) for r in out.collect()] == [(2, 1)]


def test_full_table_delete_stays_readable_as_empty(spark, tmp_path):
    """A delete matching EVERY row commits a files=[] manifest with
    the table schema recorded, so the current version reads as an
    empty table (plain and partitioned flavors) instead of refusing —
    and the pre-delete version still time-travels."""
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        snapshot_delete,
        snapshot_read_partitioned,
        snapshot_write_partitioned,
    )

    # plain flavor
    t = str(tmp_path / "plain")
    snapshot_write(spark, t, _rows(spark, [(1, "a"), (2, "b")]))
    keys = spark.createDataFrame([(1,), (2,)], "k long")
    v1 = snapshot_delete(spark, t, keys, ["k"])
    got = snapshot_read(spark, t, v1)
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["k", "v"]
    assert _collect(spark, t, 0) == [(1, "a"), (2, "b")]

    # partitioned flavor (schema keeps the partition column)
    p = str(tmp_path / "part")
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k long, v string, day int"
    )
    snapshot_write_partitioned(spark, p, df, "day")
    v1 = snapshot_delete(spark, p, keys, ["k"])
    got = snapshot_read_partitioned(spark, p, version=v1)
    assert got.count() == 0
    assert set(got.columns) == {"k", "v", "day"}

    # range-clustered flavor: the range read serves the schema too
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        snapshot_read_range,
        snapshot_write_sorted,
    )

    s = str(tmp_path / "sorted")
    snapshot_write_sorted(
        spark,
        s,
        spark.createDataFrame([(1, 10), (2, 20)], "k long, t long"),
        "t",
    )
    v1 = snapshot_delete(spark, s, keys, ["k"])
    got = snapshot_read_range(spark, s, 0, 100, version=v1)
    assert got.count() == 0 and set(got.columns) == {"k", "t"}


def test_boolean_partition_keyed_delete_matches_hive_dirs(spark, tmp_path):
    """Partition-keyed candidate pruning must compare Hive-format
    strings: a boolean partition column writes 'true'/'false'
    directories, so a delete keyed on it must actually touch the
    matching files (str(True)='True' would silently match nothing)."""
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        snapshot_delete,
        snapshot_read_partitioned,
        snapshot_write_partitioned,
    )

    p = str(tmp_path / "boolpart")
    df = spark.createDataFrame(
        [(1, True), (2, True), (3, False)], "k long, flag boolean"
    )
    snapshot_write_partitioned(spark, p, df, "flag")
    dels = spark.createDataFrame([(1, True)], "k long, flag boolean")
    v1 = snapshot_delete(spark, p, dels, ["flag", "k"])
    got = sorted(
        (r.k, r.flag)
        for r in snapshot_read_partitioned(spark, p, version=v1).collect()
    )
    assert got == [(2, True), (3, False)]
    # and value-pruned reads resolve booleans the same way
    only_false = snapshot_read_partitioned(spark, p, values=[False])
    assert [r.k for r in only_false.collect()] == [3]


def test_null_delete_key_never_drops_literal_none_partition(
    spark, tmp_path
):
    """Regression (r14 advice): a NULL delete key must match NOTHING
    under equi-join semantics, but str(None) == 'None' would put the
    string 'None' into the partition-prune value set — and on the
    partition-aligned METADATA-DELETE fast path that value set is
    file-destructive with zero scan: a file whose string partition
    value is literally 'None' would be metadata-dropped wholesale.
    Covers both the single-spec fast path (_cow_commit) and the
    per-spec-group fast path on a partition-evolved manifest
    (_cow_commit_mixed_spec._match_vals)."""
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        snapshot_delete,
        snapshot_read_partitioned,
        snapshot_write_partitioned,
    )

    # single-spec: partition values 'None' (the trap) and 'x'
    p = str(tmp_path / "nonepart")
    df = spark.createDataFrame(
        [(1, "None"), (2, "None"), (3, "x")], "k long, tag string"
    )
    snapshot_write_partitioned(spark, p, df, "tag")
    dels = spark.createDataFrame([(None,), ("x",)], "tag string")
    v1 = snapshot_delete(spark, p, dels, ["tag"])
    got = sorted(
        (r.k, r.tag)
        for r in snapshot_read_partitioned(spark, p, version=v1).collect()
    )
    assert got == [(1, "None"), (2, "None")]

    # mixed-spec: evolve cell->tag, then delete keyed on tag with a
    # NULL in the delete set — the old-spec group scans (tag not its
    # partition col) while the new-spec group takes the per-group
    # metadata fast path, which must not admit the 'None' file
    e = str(tmp_path / "evolved")
    a = spark.createDataFrame(
        [(1, 0, "None"), (2, 1, "x")], "id long, cell int, tag string"
    ).repartition(1)
    snapshot_write_partitioned(spark, e, a, "cell")
    b = spark.createDataFrame(
        [(3, 0, "None"), (4, 1, "y")], "id long, cell int, tag string"
    ).repartition(1)
    snapshot_write_partitioned(
        spark, e, b, "tag", mode="append", evolve=True
    )
    dels2 = spark.createDataFrame([(None,), ("y",)], "tag string")
    v2 = snapshot_delete(spark, e, dels2, ["tag"])
    got2 = sorted(
        (r.id, r.tag)
        for r in snapshot_read_partitioned(spark, e, version=v2).collect()
    )
    assert got2 == [(1, "None"), (2, "x"), (3, "None")]


def test_cow_carries_extra_on_plain_manifests(spark, tmp_path):
    """``extra`` metadata rides through copy-on-write commits on
    PLAIN manifests too (partitioned/stats flavors already carry it):
    a CoW delete must never silently drop committed metadata."""
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        snapshot_delete,
        snapshot_manifest,
    )

    t = str(tmp_path / "t")
    snapshot_write(spark, t, _rows(spark, [(1, "a"), (2, "b")]))
    # annotate the committed manifest (plain snapshot_write has no
    # extra= hook; a writer/tool may still attach metadata)
    mp = os.path.join(t, "_versions", "v0.json")
    m = json.load(open(mp))
    m["extra"] = {"note": "pinned"}
    with open(mp, "w") as fh:
        json.dump(m, fh)

    snapshot_delete(
        spark, t, spark.createDataFrame([(1,)], "k long"), ["k"]
    )
    assert snapshot_manifest(t, 1)["extra"] == {"note": "pinned"}
    assert _collect(spark, t, 1) == [(2, "b")]


def test_snapshot_tags_publish_resolve_delete(spark, tmp_path):
    """Tag CRUD + WAP semantics: readers of a tag never see commits
    made after the last publication; retargeting is explicit; bad
    names are rejected; partitioned tables dispatch with their
    flavor."""
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        snapshot_delete_tag,
        snapshot_read_tag,
        snapshot_resolve_tag,
        snapshot_tag,
        snapshot_tags,
        snapshot_write_partitioned,
    )

    t = str(tmp_path / "t")
    snapshot_write(spark, t, _rows(spark, [(1, "a")]))
    assert snapshot_tag(t, "published") == 0  # defaults to current
    snapshot_write(spark, t, _rows(spark, [(2, "b")]), mode="overwrite")
    # unpublished commit invisible through the tag
    assert _collect(spark, t, 0) == [(1, "a")]
    got = sorted((r.k, r.v) for r in snapshot_read_tag(spark, t, "published").collect())
    assert got == [(1, "a")]
    snapshot_tag(t, "published", 1)
    got = sorted((r.k, r.v) for r in snapshot_read_tag(spark, t, "published").collect())
    assert got == [(2, "b")]
    assert snapshot_tags(t) == {"published": 1}
    snapshot_delete_tag(t, "published")
    assert snapshot_tags(t) == {}
    with pytest.raises(FileNotFoundError):
        snapshot_resolve_tag(t, "published")
    with pytest.raises(ValueError):
        snapshot_tag(t, "bad/name")
    with pytest.raises(FileNotFoundError):
        snapshot_tag(t, "x", version=99)

    # partitioned flavor dispatch
    p = str(tmp_path / "p")
    df = spark.createDataFrame([(1, 10), (2, 20)], "k long, day int")
    snapshot_write_partitioned(spark, p, df, "day")
    snapshot_tag(p, "published")
    got = sorted(
        (r.k, r.day) for r in snapshot_read_tag(spark, p, "published").collect()
    )
    assert got == [(1, 10), (2, 20)]


def test_vacuum_protects_tagged_versions(spark, tmp_path):
    """A tagged version survives vacuum regardless of keep_last (the
    WAP 'published' pointer, or a reproducibility pin on an index
    build); deleting the tag releases it to the next vacuum."""
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        snapshot_delete_tag,
        snapshot_tag,
    )

    t = str(tmp_path / "t")
    snapshot_write(spark, t, _rows(spark, [(1, "a")]))
    snapshot_tag(t, "published", 0)
    snapshot_write(spark, t, _rows(spark, [(2, "b")]), mode="overwrite")
    snapshot_write(spark, t, _rows(spark, [(3, "c")]), mode="overwrite")

    vacuum(t, keep_last=1, retention_seconds=0.0)
    # v0 (tagged) and v2 (newest) retained; v1 gone
    assert list_versions(t) == [0, 2]
    assert _collect(spark, t, 0) == [(1, "a")]
    assert _collect(spark, t, 2) == [(3, "c")]
    with pytest.raises(FileNotFoundError):
        snapshot_read(spark, t, version=1)

    snapshot_delete_tag(t, "published")
    vacuum(t, keep_last=1, retention_seconds=0.0)
    assert list_versions(t) == [2]


def test_snapshot_version_asof_timestamps(spark, tmp_path):
    """TIMESTAMP AS OF: each commit records its claim time; the
    resolver returns the newest version at-or-before the asked
    instant, raises before the first commit, and a restore counts as
    committing NOW (so asof just before the restore still resolves
    the pre-restore state)."""
    import time as _time

    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        snapshot_restore,
        snapshot_version_asof,
    )

    t = str(tmp_path / "t")
    before_any = _time.time()
    snapshot_write(spark, t, _rows(spark, [(1, "a")]))
    after_v0 = _time.time()
    _time.sleep(0.01)
    snapshot_write(spark, t, _rows(spark, [(2, "b")]), mode="overwrite")
    after_v1 = _time.time()

    with pytest.raises(FileNotFoundError):
        snapshot_version_asof(t, before_any)
    assert snapshot_version_asof(t, after_v0) == 0
    assert snapshot_version_asof(t, after_v1) == 1
    assert _collect(spark, t, snapshot_version_asof(t, after_v0)) == [(1, "a")]

    _time.sleep(0.01)
    v2 = snapshot_restore(t, 0)
    assert snapshot_version_asof(t, after_v1) == 1  # restore is later
    assert snapshot_version_asof(t, _time.time()) == v2
    hist = snapshot_history(t)
    assert all(h["committed_at"] is not None for h in hist)
    assert [h["committed_at"] for h in hist] == sorted(
        h["committed_at"] for h in hist
    )


def test_cow_merge_add_column_schema_evolution(spark, tmp_path):
    """ADD-column evolution through snapshot MERGE (Delta mergeSchema):
    an update batch carrying a NEW column merges; untouched files keep
    their old bytes but reads null-fill the new column (the manifest
    records the evolved schema and the read paths apply it); a
    follow-up merge WITHOUT the column null-fills its own rows; the
    partitioned flavor evolves the same way."""
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        _manifest,
        snapshot_merge,
        snapshot_read_partitioned,
        snapshot_write_partitioned,
    )

    t = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (101, "x")], "k long, v string"
    ).repartitionByRange(2, "k")
    snapshot_write(spark, t, base)

    upd = spark.createDataFrame([(1, "A", 9.5)], "k long, v string, score double")
    v1 = snapshot_merge(spark, t, upd, ["k"])
    got = {
        r.k: (r.v, r.score)
        for r in snapshot_read(spark, t, v1).collect()
    }
    assert got == {1: ("A", 9.5), 2: ("b", None), 101: ("x", None)}
    # untouched high-range file carried by reference despite evolution
    assert set(_manifest(t, 0)["files"]) & set(_manifest(t, v1)["files"])

    # a later batch WITHOUT the evolved column must not narrow the table
    upd2 = spark.createDataFrame([(2, "B")], "k long, v string")
    v2 = snapshot_merge(spark, t, upd2, ["k"])
    got = {
        r.k: (r.v, r.score) for r in snapshot_read(spark, t, v2).collect()
    }
    assert got == {1: ("A", 9.5), 2: ("B", None), 101: ("x", None)}

    # partitioned flavor
    p = str(tmp_path / "p")
    pdf = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k long, v string, day int"
    )
    snapshot_write_partitioned(spark, p, pdf, "day")
    pupd = spark.createDataFrame(
        [(1, "A", 10, "extra")], "k long, v string, day int, note string"
    )
    pv = snapshot_merge(spark, p, pupd, ["k"])
    got = {
        r.k: (r.v, r.day, r.note)
        for r in snapshot_read_partitioned(spark, p, version=pv).collect()
    }
    assert got == {1: ("A", 10, "extra"), 2: ("b", 20, None)}
    # pruned read on the untouched partition serves the evolved schema
    only20 = snapshot_read_partitioned(spark, p, values=[20])
    assert [(r.k, r.note) for r in only20.collect()] == [(2, None)]


def test_cow_merge_rejects_type_change(spark, tmp_path):
    """Evolution is ADD-column only: an update batch whose existing
    column coerces to a different type is refused loudly (mixed
    physical types across files have no single read schema) and the
    table's current version remains the pre-merge state."""
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        snapshot_merge,
    )

    t = str(tmp_path / "t")
    snapshot_write(
        spark,
        t,
        spark.createDataFrame([(1, 10), (2, 20)], "k long, v int"),
    )
    bad = spark.createDataFrame([(1, 99)], "k long, v long")
    with pytest.raises(ValueError, match="ADD-column only"):
        snapshot_merge(spark, t, bad, ["k"])
    assert list_versions(t) == [0]
    got = sorted((r.k, r.v) for r in snapshot_read(spark, t).collect())
    assert got == [(1, 10), (2, 20)]


class TestSnapshotChanges:
    """snapshot_changes: change-data-feed from the manifest file diff
    (reads only files that entered/left the manifest — O(changed
    data), the Delta CDF analog)."""

    def _seed(self, spark, t):
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_write,
        )

        # many small files so CoW rewrites touch a strict subset
        df = spark.range(0, 40).select(
            F.col("id").alias("k"),
            (F.col("id") % 4).cast("string").alias("v"),
        ).repartition(8, "k")
        snapshot_write(spark, t, df)

    def test_net_changes_across_merge_and_delete(self, spark, tmp_path):
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_changes,
            snapshot_delete,
            snapshot_merge,
        )

        t = str(tmp_path / "t")
        self._seed(spark, t)
        upd = spark.createDataFrame(
            [(3, "UPD"), (100, "NEW")], "k long, v string"
        )
        snapshot_merge(spark, t, upd, ["k"])
        v2 = snapshot_delete(
            spark, t, spark.createDataFrame([(7,)], "k long"), ["k"]
        )
        feed = snapshot_changes(spark, t, ["k"], 0, v2)
        assert feed.columns == ["k", "v", "_change_type"]
        got = sorted((r.k, r.v, r._change_type) for r in feed.collect())
        assert got == [
            (3, "3", "update_preimage"),
            (3, "UPD", "update_postimage"),
            (7, "3", "delete"),
            (100, "NEW", "insert"),
        ]

    def test_compaction_emits_nothing(self, spark, tmp_path):
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_changes,
            snapshot_compact,
        )

        t = str(tmp_path / "t")
        self._seed(spark, t)
        v1 = snapshot_compact(spark, t)
        assert v1 == 1  # 8 small files actually compacted
        feed = snapshot_changes(spark, t, ["k"], 0, v1)
        # every row was rewritten into new files, none changed value
        assert feed.count() == 0

    def test_same_version_span_is_empty_with_schema(self, spark, tmp_path):
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_changes,
        )

        t = str(tmp_path / "t")
        self._seed(spark, t)
        feed = snapshot_changes(spark, t, ["k"], 0, 0)
        assert feed.columns == ["k", "v", "_change_type"]
        assert feed.count() == 0

    def test_partitioned_feed_reports_partition_column(
        self, spark, tmp_path
    ):
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_changes,
            snapshot_merge,
            snapshot_write_partitioned,
        )

        t = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(1, "a", "x"), (2, "a", "y"), (3, "b", "z")],
            "k long, d string, v string",
        )
        snapshot_write_partitioned(spark, t, df, "d")
        upd = spark.createDataFrame(
            [(2, "a", "Y2"), (9, "b", "new")], "k long, d string, v string"
        )
        v1 = snapshot_merge(spark, t, upd, ["k"])
        feed = snapshot_changes(spark, t, ["k"], 0, v1)
        got = sorted(
            (r.k, r.d, r.v, r._change_type) for r in feed.collect()
        )
        assert (2, "a", "y", "update_preimage") in got
        assert (2, "a", "Y2", "update_postimage") in got
        assert (9, "b", "new", "insert") in got
        # partition-b rows other than the insert were untouched
        assert (3, "b", "z", "update_preimage") not in got

    def test_schema_evolution_span_nullfills_before_side(
        self, spark, tmp_path
    ):
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_changes,
            snapshot_merge,
        )

        t = str(tmp_path / "t")
        self._seed(spark, t)
        upd = spark.createDataFrame(
            [(5, "5mod", "flagged")], "k long, v string, note string"
        )
        v1 = snapshot_merge(spark, t, upd, ["k"])
        feed = snapshot_changes(spark, t, ["k"], 0, v1)
        assert feed.columns == ["k", "v", "note", "_change_type"]
        got = {
            (r.k, r.v, r.note, r._change_type) for r in feed.collect()
        }
        # before-image read with the evolved schema: note null-fills
        assert (5, "1", None, "update_preimage") in got
        assert (5, "5mod", "flagged", "update_postimage") in got


class TestSnapshotSync:
    """snapshot_sync: the CDF consumer — a replica follows the source
    by applying the file-diff feed; re-applying a span is idempotent
    (the crash-between-apply-and-bookmark contract)."""

    def test_sync_lands_on_source_state_and_is_idempotent(
        self, spark, tmp_path
    ):
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            current_version,
            snapshot_delete,
            snapshot_merge,
            snapshot_read,
            snapshot_sync,
            snapshot_write,
        )

        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        base = spark.range(0, 30).select(
            F.col("id").alias("k"), (F.col("id") % 3).cast("string").alias("v")
        ).repartition(6, "k")
        snapshot_write(spark, src, base)
        snapshot_write(spark, dst, base)
        snapshot_merge(
            spark,
            src,
            spark.createDataFrame([(4, "UPD"), (99, "NEW")], "k long, v string"),
            ["k"],
        )
        snapshot_delete(
            spark, src, spark.createDataFrame([(7,), (8,)], "k long"), ["k"]
        )
        bookmark = snapshot_sync(spark, src, dst, ["k"], from_version=0)
        assert bookmark == current_version(src)

        def state(path):
            return sorted(
                (r.k, r.v) for r in snapshot_read(spark, path).collect()
            )

        assert state(dst) == state(src)
        # replay the SAME span (crash before bookmark persisted)
        snapshot_sync(spark, src, dst, ["k"], from_version=0)
        assert state(dst) == state(src)

    def test_empty_span_commits_nothing(self, spark, tmp_path):
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            current_version,
            snapshot_sync,
            snapshot_write,
        )

        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        df = spark.createDataFrame([(1, "a")], "k long, v string")
        snapshot_write(spark, src, df)
        snapshot_write(spark, dst, df)
        v = snapshot_sync(spark, src, dst, ["k"], from_version=0)
        assert v == 0
        assert current_version(dst) == 0  # no empty commits

    def test_first_sync_bootstraps_fresh_destination(self, spark, tmp_path):
        """A never-written replica (no manifest at dst) must bootstrap
        by materializing src@from_version instead of raising
        IndexError in _cow_commit's list_versions(dst)[-1], then apply
        the span incrementally — so after the first sync the replica
        equals the source exactly, deletes included."""
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            current_version,
            snapshot_delete,
            snapshot_merge,
            snapshot_read,
            snapshot_sync,
            snapshot_write,
        )

        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        base = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
        )
        snapshot_write(spark, src, base)
        snapshot_merge(
            spark,
            src,
            spark.createDataFrame([(2, "B2"), (4, "d")], "k long, v string"),
            ["k"],
        )
        snapshot_delete(
            spark, src, spark.createDataFrame([(3,)], "k long"), ["k"]
        )
        # dst has NO versions at all — from_version=0 covers the whole
        # history, so the feed's post-images equal src's live state
        bookmark = snapshot_sync(spark, src, dst, ["k"], from_version=0)
        assert bookmark == current_version(src)

        def state(path):
            return sorted(
                (r.k, r.v) for r in snapshot_read(spark, path).collect()
            )

        assert state(dst) == state(src)
        # the next cycle goes through the normal CoW path
        snapshot_merge(
            spark,
            src,
            spark.createDataFrame([(5, "e")], "k long, v string"),
            ["k"],
        )
        snapshot_sync(spark, src, dst, ["k"], from_version=bookmark)
        assert state(dst) == state(src)


def test_snapshot_changes_on_range_clustered_manifest(spark, tmp_path):
    """CDF works on the stats_col flavor too: the rewrite restages
    sorted files, the feed still reports only net row changes."""
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        snapshot_changes,
        snapshot_merge,
        snapshot_write_sorted,
    )

    t = str(tmp_path / "t")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    snapshot_write_sorted(spark, t, df, "k")
    upd = spark.createDataFrame([(5, 999), (200, 1)], "k long, v long")
    v1 = snapshot_merge(spark, t, upd, ["k"])
    got = sorted(
        (r.k, r.v, r._change_type)
        for r in snapshot_changes(spark, t, ["k"], 0, v1).collect()
    )
    assert got == [
        (5, 10, "update_preimage"),
        (5, 999, "update_postimage"),
        (200, 1, "insert"),
    ]


def test_snapshot_sync_refuses_backwards_span(spark, tmp_path):
    """A bookmark ahead of the requested to_version must raise, not
    silently apply the inverse diff and regress the replica."""
    import pytest as _pytest

    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        snapshot_merge,
        snapshot_sync,
        snapshot_write,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    snapshot_write(spark, src, df)
    snapshot_write(spark, dst, df)
    snapshot_merge(
        spark, src, spark.createDataFrame([(2, "b")], "k long, v string"), ["k"]
    )
    with _pytest.raises(ValueError, match="backwards"):
        snapshot_sync(spark, src, dst, ["k"], from_version=1, to_version=0)


def test_snapshot_changes_agrees_with_snapshot_diff(spark, tmp_path):
    """Cross-operator consistency: over ANY commit history, the net
    file-diff feed (snapshot_changes) must describe exactly the same
    row set as the full-version outer-join diff (snapshot_diff) —
    insert<->added, delete<->removed, update pre/post <-> changed."""
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        current_version,
        snapshot_changes,
        snapshot_compact,
        snapshot_delete,
        snapshot_diff,
        snapshot_merge,
        snapshot_write,
    )

    t = str(tmp_path / "t")
    base = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") % 5).cast("string").alias("v")
    ).repartition(10, "k")
    snapshot_write(spark, t, base)
    # a scripted but irregular history: merge, compact, delete, merge
    snapshot_merge(
        spark,
        t,
        spark.createDataFrame(
            [(3, "x3"), (17, "x17"), (100, "n100")], "k long, v string"
        ),
        ["k"],
    )
    snapshot_compact(spark, t, small_file_bytes=1 << 30)
    snapshot_delete(
        spark, t, spark.createDataFrame([(8,), (100,)], "k long"), ["k"]
    )
    snapshot_merge(
        spark, t, spark.createDataFrame([(3, "y3")], "k long, v string"), ["k"]
    )
    vN = current_version(t)

    feed = snapshot_changes(spark, t, ["k"], 0, vN)
    got_feed = {
        (r.k, r.v, r._change_type) for r in feed.collect()
    }
    diff = snapshot_diff(spark, t, ["k"], 0, vN)
    expect = set()
    for r in diff.collect():
        if r.change == "added":
            expect.add((r.k, r.v_to, "insert"))
        elif r.change == "removed":
            expect.add((r.k, r.v_from, "delete"))
        else:
            expect.add((r.k, r.v_from, "update_preimage"))
            expect.add((r.k, r.v_to, "update_postimage"))
    assert got_feed == expect
    # and the compaction between commits added no phantom changes:
    # key 100 (inserted then deleted) must be absent entirely
    assert not any(k == 100 for k, _, _ in got_feed)


class TestPartitionScopedMerge:
    """snapshot_merge(partition_scope=True): Delta's
    merge-with-partition-predicate idiom — the tag scan and rewrite
    prune to the update batch's partitions on the caller's assertion."""

    def _seed(self, spark, tmp_path):
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_write_partitioned,
        )

        t = str(tmp_path / "t")
        base = spark.createDataFrame(
            [(k, "d1" if k < 10 else "d2", float(k)) for k in range(20)],
            "k long, d string, v double",
        ).repartition(4)
        snapshot_write_partitioned(spark, t, base, "d")
        return t

    def test_scoped_merge_matches_unscoped_result(self, spark, tmp_path):
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            _manifest,
            current_version,
            snapshot_merge,
            snapshot_read_partitioned,
        )

        t = self._seed(spark, tmp_path)
        upd = spark.createDataFrame(
            [(3, "d1", -1.0), (7, "d1", -2.0)], "k long, d string, v double"
        )
        snapshot_merge(spark, t, upd, ["k"], partition_scope=True)
        got = sorted(
            (r.k, r.d, r.v)
            for r in snapshot_read_partitioned(spark, t).collect()
        )
        want = sorted(
            (k, "d1" if k < 10 else "d2",
             -1.0 if k == 3 else -2.0 if k == 7 else float(k))
            for k in range(20)
        )
        assert got == want
        # the untouched partition's files carried BY REFERENCE
        m0 = _manifest(t, 0)
        m1 = _manifest(t, current_version(t))
        d2_before = {f for f, p in m0["partitions"].items() if p == "d2"}
        d2_after = {f for f, p in m1["partitions"].items() if p == "d2"}
        assert d2_before == d2_after

    def test_scoped_merge_skips_out_of_partition_keys(self, spark, tmp_path):
        """The contract, pinned: a matching key living OUTSIDE the
        update row's partition is not touched under partition_scope
        (and IS touched without it)."""
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_merge,
            snapshot_read_partitioned,
        )

        t = self._seed(spark, tmp_path)
        # key 15 lives in d2; the update claims d1
        upd = spark.createDataFrame(
            [(15, "d1", -9.0)], "k long, d string, v double"
        )
        snapshot_merge(spark, t, upd, ["k"], partition_scope=True)
        # the d2 row survived untouched; the update row was INSERTED
        # into d1 (merge semantics: unmatched-within-scope = insert)
        d2_rows = [
            (r.k, r.d, r.v)
            for r in snapshot_read_partitioned(spark, t).collect()
            if r.k == 15
        ]
        assert sorted(d2_rows) == [(15, "d1", -9.0), (15, "d2", 15.0)]

    def test_unscoped_merge_does_update_across_partitions(
        self, spark, tmp_path
    ):
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_merge,
            snapshot_read_partitioned,
        )

        t = self._seed(spark, tmp_path)
        upd = spark.createDataFrame(
            [(15, "d1", -9.0)], "k long, d string, v double"
        )
        snapshot_merge(spark, t, upd, ["k"])  # no scope: full tag scan
        d15 = [
            (r.k, r.d, r.v)
            for r in snapshot_read_partitioned(spark, t).collect()
            if r.k == 15
        ]
        assert d15 == [(15, "d1", -9.0)]


class TestBloomDataSkipping:
    """Per-file bloom bitmaps in the manifest: point lookups open only
    admitted files; false negatives impossible (same Spark hash
    expression builds and probes); CoW carries/recomputes bitmaps."""

    def test_point_lookup_prunes_and_matches_full_scan(self, spark, tmp_path):
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            bloom_prune_files,
            snapshot_read,
            snapshot_read_point,
            snapshot_write_bloom,
        )

        t = str(tmp_path / "t")
        df = spark.range(0, 4000).select(
            F.col("id").alias("k"), (F.col("id") % 17).alias("v")
        ).repartition(8)  # 8 files, ~500 distinct keys each
        snapshot_write_bloom(spark, t, df, "k", m_bits=8192, k=3)
        full = snapshot_read(spark, t)
        pruned_any = False
        for probe in (7, 1234, 3999, 99999):  # last one absent
            got = sorted(
                (r.k, r.v) for r in snapshot_read_point(spark, t, probe).collect()
            )
            want = sorted(
                (r.k, r.v)
                for r in full.where(F.col("k") == probe).collect()
            )
            assert got == want  # no false negatives, exact filter applied
            _, admitted, total = bloom_prune_files(spark, t, probe)
            assert total == 8
            if len(admitted) < total:
                pruned_any = True
        # with 500 distinct keys per file against m=8192/k=3, the
        # per-file false-positive rate is ~0.4% — at least one of the
        # four probes must skip files (probability of no pruning at
        # all is astronomically small; a hash-parity bug shows as
        # admitted == total for every probe)
        assert pruned_any

    def test_mor_delete_position_scan_bloom_pruned(
        self, spark, tmp_path, monkeypatch
    ):
        """r13 verdict ask #5: a MoR delete keyed on the bloom column
        probes the per-file bitmaps FIRST, so the position scan opens
        only admitted files — pinned by spying the pruned candidate
        list delete_mor actually scans — and the result stays exact
        (bitmaps admit false positives only; the semi-join keeps
        correctness)."""
        from end_to_end_data_engineering_pipeline_spark.operators import (
            snapshots,
        )
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            bloom_prune_files,
            snapshot_read,
            snapshot_write_bloom,
        )

        t = str(tmp_path / "t")
        df = spark.range(0, 4000).select(
            F.col("id").alias("k"), (F.col("id") % 17).alias("v")
        ).repartition(8)
        snapshot_write_bloom(spark, t, df, "k", m_bits=8192, k=3)

        captured: dict = {}
        orig = snapshots._bloom_dml_prune

        def spy(spark_, m_, match_, keys_, cand_):
            out = orig(spark_, m_, match_, keys_, cand_)
            captured["n_in"] = len(cand_)
            captured["n_scanned"] = len(out)
            captured["files"] = list(out)
            return out

        monkeypatch.setattr(snapshots, "_bloom_dml_prune", spy)
        dels = spark.createDataFrame([(7,), (1234,)], "k long")
        v = snapshots.snapshot_delete_mor(spark, t, dels, ["k"])
        # the scan shrank: with ~500 distinct keys/file at m=8192/k=3
        # each key admits its own file plus ~0.4%-fpr extras, so two
        # keys scan far fewer than the 8 candidates
        assert captured["n_in"] == 8
        assert captured["n_scanned"] < captured["n_in"]
        # the scanned set is exactly the bitmaps' union of admissions
        want = set()
        for probe in (7, 1234):
            _, adm, _ = bloom_prune_files(spark, t, probe, version=0)
            want |= set(adm)
        assert set(captured["files"]) == want
        # and the delete is content-exact despite the pruning
        got = {r.k for r in snapshot_read(spark, t, version=v).collect()}
        assert got == set(range(4000)) - {7, 1234}

    def test_mor_delete_bloom_prune_skips_on_budget_or_type(
        self, spark, tmp_path
    ):
        """The pruning degrades to the full scan — never to a wrong
        answer — when the key set exceeds the probe budget or the key
        column's type differs from the built type (hash parity)."""
        from end_to_end_data_engineering_pipeline_spark.operators import (
            snapshots,
        )

        t = str(tmp_path / "t")
        df = spark.range(0, 400).select(
            F.col("id").alias("k"), F.lit("x").alias("v")
        ).repartition(2)
        snapshots.snapshot_write_bloom(spark, t, df, "k")
        m = snapshots.snapshot_manifest(t)
        # type mismatch: int keys against a long-built bloom -> no prune
        ints = spark.createDataFrame([(7,)], "k int")
        assert snapshots._bloom_dml_prune(
            spark, m, ints, ["k"], list(m["files"])
        ) == list(m["files"])
        # over budget: budget+1 distinct keys -> no prune
        big = spark.range(0, snapshots.BLOOM_DML_MAX_KEYS + 1).select(
            F.col("id").alias("k")
        )
        assert snapshots._bloom_dml_prune(
            spark, m, big, ["k"], list(m["files"])
        ) == list(m["files"])
        # in budget + right type -> prunes to the bitmaps' admissions
        small = spark.createDataFrame([(7,)], "k long")
        pruned = snapshots._bloom_dml_prune(
            spark, m, small, ["k"], list(m["files"])
        )
        _, adm, _ = snapshots.bloom_prune_files(spark, t, 7)
        assert pruned == [f for f in m["files"] if f in set(adm)]

    def test_append_carries_blooms_and_guards_family(self, spark, tmp_path):
        import pytest as _pytest

        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            bloom_prune_files,
            snapshot_read_point,
            snapshot_write,
            snapshot_write_bloom,
        )

        t = str(tmp_path / "t")
        a = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
        b = spark.createDataFrame([(3, "c")], "k long, v string")
        snapshot_write_bloom(spark, t, a, "k")
        snapshot_write_bloom(spark, t, b, "k")  # append carries v0 blooms
        assert [r.v for r in snapshot_read_point(spark, t, 3).collect()] == ["c"]
        _, admitted, total = bloom_prune_files(spark, t, 3)
        assert len(admitted) < total  # old files skipped for the new key
        with _pytest.raises(ValueError, match="family mismatch"):
            snapshot_write_bloom(spark, t, b, "k", m_bits=1024)
        with _pytest.raises(ValueError, match="bloom"):
            snapshot_write(spark, t, b)  # plain append refused

    def test_cow_merge_recomputes_rewritten_blooms(self, spark, tmp_path):
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            _manifest,
            current_version,
            snapshot_merge,
            snapshot_read_point,
            snapshot_write_bloom,
        )

        t = str(tmp_path / "t")
        df = spark.range(0, 1000).select(
            F.col("id").alias("k"), F.lit("old").alias("v")
        ).repartition(4)
        snapshot_write_bloom(spark, t, df, "k")
        upd = spark.createDataFrame([(5, "new"), (2000, "ins")], "k long, v string")
        snapshot_merge(spark, t, upd, ["k"])
        m = _manifest(t, current_version(t))
        assert set(m["bloom"]["files"]) == set(m["files"])  # no gaps
        assert [r.v for r in snapshot_read_point(spark, t, 5).collect()] == ["new"]
        assert [r.v for r in snapshot_read_point(spark, t, 2000).collect()] == ["ins"]
        # a value that never existed still returns empty through the index
        assert snapshot_read_point(spark, t, 777777).count() == 0

    def test_compact_and_restore_preserve_bloom(self, spark, tmp_path):
        """OPTIMIZE rebuilds the manifest — the point-lookup index
        must survive it (fresh bitmaps for compacted outputs), and a
        RESTORE carries the whole manifest verbatim."""
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            _manifest,
            current_version,
            snapshot_compact,
            snapshot_read_point,
            snapshot_restore,
            snapshot_write_bloom,
        )

        t = str(tmp_path / "t")
        df = spark.range(0, 500).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        ).repartition(6)
        v0 = snapshot_write_bloom(spark, t, df, "k")
        v1 = snapshot_compact(spark, t, small_file_bytes=1 << 30)
        assert v1 == v0 + 1
        m = _manifest(t, v1)
        assert set(m["bloom"]["files"]) == set(m["files"])
        assert [r.v for r in snapshot_read_point(spark, t, 123).collect()] == [369]
        snapshot_restore(t, v0)
        m2 = _manifest(t, current_version(t))
        assert set(m2["bloom"]["files"]) == set(m2["files"])
        assert [r.v for r in snapshot_read_point(spark, t, 123).collect()] == [369]


def test_snapshot_sync_backwards_span_fresh_replica_no_baseline(
    spark, tmp_path
):
    """An invalid (backwards) span against a FRESH replica must raise
    BEFORE the first-sync bootstrap commits anything: the failed call
    leaves zero committed versions behind (r11 advice #1 — the old
    ordering bootstrapped src@from_version into dst, then raised)."""
    import pytest as _pytest

    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        list_versions,
        snapshot_merge,
        snapshot_sync,
        snapshot_write,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    snapshot_write(
        spark, src, spark.createDataFrame([(1, "a")], "k long, v string")
    )
    snapshot_merge(
        spark, src,
        spark.createDataFrame([(2, "b")], "k long, v string"), ["k"],
    )
    with _pytest.raises(ValueError, match="backwards"):
        snapshot_sync(spark, src, dst, ["k"], from_version=1, to_version=0)
    assert list_versions(dst) == []


def test_bloom_probe_uncastable_type_raises(spark, tmp_path):
    """A probe literal that cannot cast to the indexed column's type
    must fail loudly (r11 advice #2): under Spark's lenient cast it
    becomes NULL, xxhash64 hashes null, and the bloom silently admits
    an arbitrary file set — correctness survives via the exact filter
    but the index stops pruning without anyone noticing."""
    import pytest as _pytest

    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        bloom_prune_files,
        snapshot_write_bloom,
    )

    t = str(tmp_path / "t")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    snapshot_write_bloom(spark, t, df, "k")
    with _pytest.raises(TypeError, match="cast"):
        bloom_prune_files(spark, t, "not-a-number")
    # a castable probe still works
    _, admitted, total = bloom_prune_files(spark, t, 7)
    assert 1 <= len(admitted) <= total


class TestPartitionEvolution:
    """snapshot_write_partitioned(evolve=True): Iceberg-style
    partition-spec evolution — new commits partition by a different
    column WITHOUT rewriting old files; reads union the spec groups
    and prune per spec; CoW merge/delete rewrite touched files under
    the DEFAULT spec (lazy per-touch migration, Iceberg's rule for
    row-level ops on an evolved table) and snapshot_compact migrates
    everything to the default spec in one sweep."""

    def _seed(self, spark, path):
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_write_partitioned,
        )

        # spec A = cell (int); both batches carry both candidate
        # partition columns as ordinary data
        a = spark.createDataFrame(
            [(1, 0, "x", 10), (2, 1, "y", 20), (3, 0, "y", 30)],
            "id long, cell int, tag string, v long",
        ).repartition(1)
        v0 = snapshot_write_partitioned(spark, path, a, "cell")
        b = spark.createDataFrame(
            [(4, 0, "x", 40), (5, 1, "z", 50)],
            "id long, cell int, tag string, v long",
        ).repartition(1)
        v1 = snapshot_write_partitioned(
            spark, path, b, "tag", mode="append", evolve=True
        )
        return v0, v1

    def test_evolve_requires_flag_and_keeps_old_files(self, spark, tmp_path):
        import pytest as _pytest

        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            _manifest,
            snapshot_write_partitioned,
        )

        path = str(tmp_path / "t")
        a = spark.createDataFrame(
            [(1, 0, "x", 10)], "id long, cell int, tag string, v long"
        )
        snapshot_write_partitioned(spark, path, a, "cell")
        m0 = _manifest(path, 0)
        with _pytest.raises(ValueError, match="evolve=True"):
            snapshot_write_partitioned(
                spark, path, a, "tag", mode="append"
            )
        snapshot_write_partitioned(
            spark, path, a, "tag", mode="append", evolve=True
        )
        m1 = _manifest(path, 1)
        # metadata-only evolution: every v0 file carries BY REFERENCE
        assert set(m0["files"]) <= set(m1["files"])
        assert [s["col"] for s in m1["specs"]] == ["cell", "tag"]
        assert m1["default_spec"] == 1
        assert all(
            m1["file_specs"][f] == 0 for f in m0["files"]
        )

    def test_union_read_is_content_neutral(self, spark, tmp_path):
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_read_partitioned,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path)
        got = {
            (r.id, r.cell, r.tag, r.v)
            for r in snapshot_read_partitioned(spark, path).collect()
        }
        assert got == {
            (1, 0, "x", 10),
            (2, 1, "y", 20),
            (3, 0, "y", 30),
            (4, 0, "x", 40),
            (5, 1, "z", 50),
        }

    def test_both_prune_paths_engage(self, spark, tmp_path):
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            _manifest,
            snapshot_read_partitioned,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path)
        m = _manifest(path, 1)
        a_files = {f for f, s in m["file_specs"].items() if s == 0}
        b_files = {f for f, s in m["file_specs"].items() if s == 1}
        assert a_files and b_files

        # filter on spec A (cell=0): A-group prunes by manifest —
        # cell=1 A-files never open; B-files admitted (residual)
        byA = snapshot_read_partitioned(spark, path, values=[0], col="cell")
        opened = {f.rsplit("/", 1)[-1] for f in byA.inputFiles()}
        assert opened == {
            f for f in a_files if m["partitions"][f] == "0"
        } | b_files
        assert {(r.id, r.cell) for r in byA.collect()} == {
            (1, 0), (3, 0), (4, 0)
        }

        # filter on spec B (tag='x'): B-group prunes by manifest;
        # A-files admitted + residual-filtered exactly
        byB = snapshot_read_partitioned(
            spark, path, values=["x"], col="tag"
        )
        opened = {f.rsplit("/", 1)[-1] for f in byB.inputFiles()}
        assert opened == a_files | {
            f for f in b_files if m["partitions"][f] == "x"
        }
        assert {(r.id, r.tag) for r in byB.collect()} == {
            (1, "x"), (4, "x")
        }

    def test_values_require_col_and_col_must_be_a_spec(self, spark, tmp_path):
        import pytest as _pytest

        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_read_partitioned,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path)
        with _pytest.raises(ValueError, match="pass col="):
            snapshot_read_partitioned(spark, path, values=[0])
        with _pytest.raises(ValueError, match="not a partition spec"):
            snapshot_read_partitioned(
                spark, path, values=[10], col="v"
            )

    def test_plain_read_refuses_loudly(self, spark, tmp_path):
        import pytest as _pytest

        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_read,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path)
        with _pytest.raises(ValueError, match="snapshot_read_partitioned"):
            snapshot_read(spark, path)

    def test_cow_merge_migrates_touched_files_to_default_spec(
        self, spark, tmp_path
    ):
        """Iceberg's row-level-op rule on an evolved table: the merge
        rewrites ONLY the touched old-spec file, stages the rewrite
        under the DEFAULT spec (lazy migration), carries every
        untouched file by reference under its own spec, and the prior
        version stays time-travelable."""
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            _manifest,
            snapshot_merge,
            snapshot_read_partitioned,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path)
        m1 = _manifest(path, 1)
        # id=1 lives in the spec-0 file cell=0 (with id=3)
        upd = spark.createDataFrame(
            [(1, 0, "x", 99)], "id long, cell int, tag string, v long"
        )
        v2 = snapshot_merge(spark, path, upd, ["id"])
        m2 = _manifest(path, v2)
        # content-exact: id=1 updated, id=3 (same file) survives
        got = {
            (r.id, r.cell, r.tag, r.v)
            for r in snapshot_read_partitioned(
                spark, path, version=v2
            ).collect()
        }
        assert got == {
            (1, 0, "x", 99),
            (2, 1, "y", 20),
            (3, 0, "y", 30),
            (4, 0, "x", 40),
            (5, 1, "z", 50),
        }
        # the touched cell=0 file is gone; cell=1 and both tag files
        # carry by reference; new files all land under the default
        # spec with their partition values mapped
        touched = {
            f
            for f in m1["files"]
            if m1["file_specs"][f] == 0 and m1["partitions"][f] == "0"
        }
        carried = set(m1["files"]) - touched
        assert carried <= set(m2["files"])
        assert touched.isdisjoint(m2["files"])
        new_files = set(m2["files"]) - carried
        assert new_files
        assert all(m2["file_specs"][f] == m2["default_spec"] for f in new_files)
        # rewritten rows (id=1 tag=x, id=3 tag=y) are prunable on tag
        assert {m2["partitions"][f] for f in new_files} == {"x", "y"}
        # prior version still serves the pre-merge content
        old = {
            (r.id, r.v)
            for r in snapshot_read_partitioned(
                spark, path, version=1
            ).collect()
        }
        assert (1, 10) in old

    def test_cow_delete_metadata_fast_path_per_spec_group(
        self, spark, tmp_path
    ):
        """A delete keyed exactly on one spec's column drops that
        group's matching files by manifest alone, while other-spec
        files (where the key is an ordinary data column) pay the
        semi-join and rewrite their survivors under the default
        spec."""
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            _manifest,
            snapshot_delete,
            snapshot_read_partitioned,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path)
        m1 = _manifest(path, 1)
        dels = spark.createDataFrame([(0,)], "cell int")
        v2 = snapshot_delete(spark, path, dels, ["cell"])
        m2 = _manifest(path, v2)
        got = {
            (r.id, r.cell, r.tag, r.v)
            for r in snapshot_read_partitioned(
                spark, path, version=v2
            ).collect()
        }
        # cell=0 rows gone from BOTH specs (ids 1, 3 via metadata
        # drop; id 4 via the spec-1 scan)
        assert got == {(2, 1, "y", 20), (5, 1, "z", 50)}
        # spec-0's cell=0 file dropped by manifest; cell=1 carries
        kept0 = {f for f in m2["files"] if m2.get("file_specs", {}).get(f) == 0}
        assert kept0 == {
            f
            for f in m1["files"]
            if m1["file_specs"][f] == 0 and m1["partitions"][f] == "1"
        }
        # the tag=x file (contained only cell=0's id=4) rewrote to
        # nothing; tag=z carries by reference
        zfile = {
            f
            for f in m1["files"]
            if m1["file_specs"][f] == 1 and m1["partitions"][f] == "z"
        }
        assert zfile <= set(m2["files"])

    def test_cow_delete_emptying_old_specs_collapses_to_single_spec(
        self, spark, tmp_path
    ):
        """When the commit leaves no live file under any old spec the
        manifest collapses back to single-spec — the same end state
        as snapshot_compact's migration — and later DML takes the
        cheaper single-spec paths."""
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            _manifest,
            snapshot_delete,
            snapshot_merge,
            snapshot_read_partitioned,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path)
        dels = spark.createDataFrame([(1,), (2,), (3,)], "id long")
        v2 = snapshot_delete(spark, path, dels, ["id"])
        m2 = _manifest(path, v2)
        assert "specs" not in m2 and m2["part_col"] == "tag"
        got = {
            (r.id, r.tag, r.v)
            for r in snapshot_read_partitioned(
                spark, path, version=v2
            ).collect()
        }
        assert got == {(4, "x", 40), (5, "z", 50)}
        # single-spec DML works immediately on the collapsed table
        upd = spark.createDataFrame(
            [(4, 0, "x", 41)], "id long, cell int, tag string, v long"
        )
        v3 = snapshot_merge(spark, path, upd, ["id"])
        got = {
            (r.id, r.v)
            for r in snapshot_read_partitioned(
                spark, path, version=v3
            ).collect()
        }
        assert got == {(4, 41), (5, 50)}

    def test_cow_merge_partition_scope_prunes_each_spec_group(
        self, spark, tmp_path, monkeypatch
    ):
        """partition_scope on a mixed-spec manifest: the caller's
        Delta-style assertion prunes EACH spec group on its own
        column when the match set carries it — and, per the contract,
        a matching key living OUTSIDE the asserted partitions is NOT
        updated."""
        from end_to_end_data_engineering_pipeline_spark.operators import (
            snapshots,
        )
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_merge,
            snapshot_read_partitioned,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path)
        # id=3 lives in cell=0 / tag='y'; assert (wrongly, on purpose
        # for the contract check) that it lives in cell=1 AND tag='z'
        upd = spark.createDataFrame(
            [(3, 1, "z", 99)], "id long, cell int, tag string, v long"
        )
        captured: dict = {}
        orig = snapshots._read_evolved_files

        def spy(spark_, path_, m_, files_, **kw):
            captured.setdefault("scans", []).append(list(files_))
            return orig(spark_, path_, m_, files_, **kw)

        monkeypatch.setattr(snapshots, "_read_evolved_files", spy)
        snapshot_merge(spark, path, upd, ["id"], partition_scope=True)
        # the DML scan pruned BOTH groups: only cell=1 and tag='z'
        # files were candidates (1 + 1 of the 4 files)
        m1 = snapshots._manifest(path, 1)
        want = {
            f
            for f in m1["files"]
            if (m1["file_specs"][f] == 0 and m1["partitions"][f] == "1")
            or (m1["file_specs"][f] == 1 and m1["partitions"][f] == "z")
        }
        assert set(captured["scans"][0]) == want
        # contract: id=3's real row (cell=0/tag='y') was out of scope
        # and is NOT updated; the update row still lands (insert)
        got = {
            (r.id, r.v)
            for r in snapshot_read_partitioned(spark, path).collect()
        }
        assert (3, 30) in got and (3, 99) in got

    def test_cow_merge_null_default_spec_value_refuses(
        self, spark, tmp_path
    ):
        """Pre-evolution rows that genuinely lack the default-spec
        column cannot land under it (null partition values don't
        round-trip) — the merge refuses loudly with the compact-first
        recipe instead of committing an unprunable file."""
        import pytest as _pytest

        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_merge,
            snapshot_write_partitioned,
        )

        path = str(tmp_path / "t")
        a = spark.createDataFrame(
            [(1, 0, 10), (2, 0, 20)], "id long, cell int, v long"
        ).repartition(1)
        snapshot_write_partitioned(spark, path, a, "cell")
        b = spark.createDataFrame(
            [(3, 1, "x", 30)], "id long, cell int, tag string, v long"
        ).repartition(1)
        snapshot_write_partitioned(
            spark, path, b, "tag", mode="append", evolve=True
        )
        upd = spark.createDataFrame(
            [(1, 0, "x", 99)], "id long, cell int, tag string, v long"
        )
        # id=1's file survivor (id=2) has tag=null -> refuse loudly
        with _pytest.raises(ValueError, match="snapshot_compact"):
            snapshot_merge(spark, path, upd, ["id"])

    def test_compact_migrates_to_default_spec_then_merge_works(
        self, spark, tmp_path
    ):
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            _manifest,
            snapshot_compact,
            snapshot_merge,
            snapshot_read_partitioned,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path)
        v = snapshot_compact(spark, path)
        m = _manifest(path, v)
        # single-spec again, under the default (latest) spec
        assert "specs" not in m and m["part_col"] == "tag"
        assert set(m["partitions"].values()) == {"x", "y", "z"}
        got = {
            (r.id, r.cell, r.tag, r.v)
            for r in snapshot_read_partitioned(spark, path).collect()
        }
        assert (1, 0, "x", 10) in got and len(got) == 5
        # CoW works again post-migration
        upd = spark.createDataFrame(
            [(1, 0, "x", 99)], "id long, cell int, tag string, v long"
        )
        v2 = snapshot_merge(spark, path, upd, ["id"])
        got = {
            (r.id, r.v)
            for r in snapshot_read_partitioned(
                spark, path, version=v2
            ).collect()
        }
        assert (1, 99) in got and len(got) == 5

    def test_evolve_back_to_existing_spec_reuses_id(self, spark, tmp_path):
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            _manifest,
            snapshot_read_partitioned,
            snapshot_write_partitioned,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path)
        c = spark.createDataFrame(
            [(6, 1, "w", 60)], "id long, cell int, tag string, v long"
        )
        # appending under spec A again needs NO flag: the spec exists
        snapshot_write_partitioned(spark, path, c, "cell", mode="append")
        m = _manifest(path, 2)
        assert [s["col"] for s in m["specs"]] == ["cell", "tag"]
        assert m["default_spec"] == 0
        assert snapshot_read_partitioned(spark, path).count() == 6

    def test_changes_feed_spans_evolution(self, spark, tmp_path):
        from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
            snapshot_changes,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path)
        feed = snapshot_changes(spark, path, ["id"], 0, 1)
        got = {
            (r.id, r._change_type) for r in feed.collect()
        }
        assert got == {(4, "insert"), (5, "insert")}


def test_evolution_survives_vacuum_and_restore(spark, tmp_path):
    """Maintenance over an evolution history: vacuum retains every
    file any kept manifest references (mixed-spec manifests list
    files exactly like single-spec ones), and RESTORE back to the
    pre-evolution version serves the original single-spec read while
    the evolved version stays in history."""
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        _manifest,
        snapshot_read_partitioned,
        snapshot_restore,
        snapshot_write_partitioned,
        vacuum,
    )

    path = str(tmp_path / "t")
    a = spark.createDataFrame(
        [(1, 0, "x", 10), (2, 1, "y", 20)],
        "id long, cell int, tag string, v long",
    ).repartition(1)
    snapshot_write_partitioned(spark, path, a, "cell")
    b = spark.createDataFrame(
        [(3, 0, "z", 30)], "id long, cell int, tag string, v long"
    ).repartition(1)
    snapshot_write_partitioned(
        spark, path, b, "tag", mode="append", evolve=True
    )
    # vacuum keeping both versions: every referenced file (both spec
    # groups) must survive; the evolved read stays content-exact
    deleted = vacuum(path, keep_last=2, retention_seconds=0.0)
    assert deleted == []
    got = {
        (r.id, r.cell, r.tag, r.v)
        for r in snapshot_read_partitioned(spark, path).collect()
    }
    assert got == {(1, 0, "x", 10), (2, 1, "y", 20), (3, 0, "z", 30)}
    # restore to the pre-evolution version: single-spec manifest again
    v = snapshot_restore(path, 0)
    m = _manifest(path, v)
    assert "specs" not in m and m["part_col"] == "cell"
    assert snapshot_read_partitioned(spark, path).count() == 2
    # the evolved version remains time-travelable until vacuumed...
    assert (
        snapshot_read_partitioned(spark, path, version=1).count() == 3
    )
    # ...and a head-only vacuum retires exactly the evolution commit's
    # now-unreferenced spec-B file, never the restored head's files
    evolved_only = set(_manifest(path, 1)["files"]) - set(m["files"])
    deleted = vacuum(path, keep_last=1, retention_seconds=0.0)
    assert set(deleted) == evolved_only and evolved_only
    assert snapshot_read_partitioned(spark, path).count() == 2


def test_mor_delete_masks_without_rewriting_files(spark, tmp_path):
    """Merge-on-read delete: vectors commit, data files carry by
    reference, reads mask positions, prior versions stay intact, and
    re-deleting an already-deleted key records no new positions."""
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        _dv_frame,
        _manifest,
        snapshot_delete_mor,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(20)],
        "k long, v string",
    ).repartition(3)
    v0 = snapshot_write(spark, path, df)
    m0 = _manifest(path, v0)

    dk = spark.createDataFrame([(2,), (5,)], "k long")
    v1 = snapshot_delete_mor(spark, path, dk, ["k"])
    m1 = _manifest(path, v1)
    assert m1["files"] == m0["files"]  # zero data files rewritten
    assert m1["deletes"]
    got = {r.k for r in snapshot_read(spark, path).collect()}
    assert got == set(range(20)) - {2, 5}
    # time travel: the pre-delete version is untouched
    assert snapshot_read(spark, path, version=v0).count() == 20

    # second delete accumulates; the repeated key adds no positions
    v2 = snapshot_delete_mor(
        spark, path, spark.createDataFrame([(2,), (7,)], "k long"), ["k"]
    )
    assert snapshot_read(spark, path).count() == 17
    dv = _dv_frame(spark, path, _manifest(path, v2))
    assert dv.count() == dv.distinct().count() == 3


def test_mor_delete_is_position_based_on_duplicate_rows(spark, tmp_path):
    """Vectors record positions, not values: rows identical on every
    column each occupy their own position and all delete."""
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        snapshot_delete_mor,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (1, "x"), (2, "y")], "k long, v string"
    ).repartition(2)
    snapshot_write(spark, path, df)
    snapshot_delete_mor(
        spark, path, spark.createDataFrame([(1,)], "k long"), ["k"]
    )
    assert [(r.k, r.v) for r in snapshot_read(spark, path).collect()] == [
        (2, "y")
    ]


def test_mor_vector_broadcast_is_size_gated(spark, tmp_path, monkeypatch):
    """The delete-vector anti-join's broadcast hint is priced off the
    vector files' on-disk size: under DV_BROADCAST_MAX_BYTES the
    logical plan carries the forced hint; past it (simulated by
    dropping the threshold to zero) the hint vanishes — a mass delete
    degrades to a shuffle join instead of an unbounded broadcast —
    and the masked result is unchanged (r12 advice #3)."""
    from end_to_end_data_engineering_pipeline_spark.operators import (
        snapshots as S,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, str(i)) for i in range(100)], "k long, v string"
    ).repartition(2)
    snapshot_write(spark, path, df)
    S.snapshot_delete_mor(
        spark,
        path,
        spark.createDataFrame([(i,) for i in range(50)], "k long"),
        ["k"],
    )

    def hinted(frame):
        # the optimizer embeds ResolvedHint into the Join node as
        # rightHint=(strategy=broadcast) — string-visible either way
        return (
            "broadcast"
            in frame._jdf.queryExecution().optimizedPlan().toString().lower()
        )

    small = S.snapshot_read(spark, path)
    assert hinted(small) and small.count() == 50

    monkeypatch.setattr(S, "DV_BROADCAST_MAX_BYTES", 0)
    big = S.snapshot_read(spark, path)
    assert not hinted(big)
    assert {r.k for r in big.collect()} == set(range(50, 100))

    # the commit-side prior-vector anti-join takes the same gate: a
    # re-delete under the zero threshold still records no duplicate
    # positions and still reads correctly
    S.snapshot_delete_mor(
        spark,
        path,
        spark.createDataFrame([(50,), (60,)], "k long"),
        ["k"],
    )
    dv = S._dv_frame(spark, path, S._manifest(path, None or S.current_version(path)))
    assert dv.count() == dv.distinct().count() == 52
    assert S.snapshot_read(spark, path).count() == 48


def test_mor_partitioned_mask_broadcast_is_size_gated(
    spark, tmp_path, monkeypatch
):
    """Same gate through the partitioned read path (_mask_positions):
    zero threshold removes the hint, masked rows stay masked."""
    from end_to_end_data_engineering_pipeline_spark.operators import (
        snapshots as S,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, "d%d" % (i % 3)) for i in range(30)], "k long, day string"
    )
    S.snapshot_write_partitioned(spark, path, df, "day")
    S.snapshot_delete_mor(
        spark,
        path,
        spark.createDataFrame([(i,) for i in range(0, 30, 2)], "k long"),
        ["k"],
    )
    monkeypatch.setattr(S, "DV_BROADCAST_MAX_BYTES", 0)
    got = S.snapshot_read_partitioned(spark, path)
    plan = got._jdf.queryExecution().optimizedPlan().toString()
    # the file->partition-value mapping join stays broadcast (one row
    # per data file — metadata scale); the VECTOR anti-join must not
    anti = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
    assert anti and all("broadcast" not in ln.lower() for ln in anti)
    assert {r.k for r in got.collect()} == set(range(1, 30, 2))


def test_mor_compact_of_emptied_table_stays_readable(spark, tmp_path):
    """A MoR delete covering EVERY row followed by compaction commits
    a files=[] manifest — which must record the table schema (probed
    from an affected file's footer, mirroring _cow_commit's
    empty-rewrite handling) so the head reads as an empty table
    instead of raising 'no schema to serve' (r12 advice #1)."""
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        _manifest,
        current_version,
        snapshot_compact,
        snapshot_delete_mor,
        snapshot_read,
        snapshot_read_partitioned,
        snapshot_write_partitioned,
    )

    # plain manifest (fresh snapshot_write records no 'schema' key);
    # repartition(1) so the write stages exactly one data file — no
    # zero-row straggler parts for compaction's keep list to retain
    path = str(tmp_path / "plain")
    df = spark.createDataFrame(
        [(i, str(i)) for i in range(6)], "k long, v string"
    ).repartition(1)
    snapshot_write(spark, path, df)
    snapshot_delete_mor(
        spark, path,
        spark.createDataFrame([(i,) for i in range(6)], "k long"), ["k"],
    )
    v = snapshot_compact(spark, path)
    m = _manifest(path, v)
    assert m["files"] == [] and "deletes" not in m
    got = snapshot_read(spark, path)
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["k", "v"]

    # partitioned manifest: the recorded schema must include part_col
    path2 = str(tmp_path / "part")
    df2 = spark.createDataFrame(
        [(i, "d%d" % (i % 2)) for i in range(6)], "k long, day string"
    )
    snapshot_write_partitioned(spark, path2, df2, "day")
    snapshot_delete_mor(
        spark, path2,
        spark.createDataFrame([(i,) for i in range(6)], "k long"), ["k"],
    )
    snapshot_compact(spark, path2)
    got2 = snapshot_read_partitioned(spark, path2)
    assert got2.count() == 0
    assert set(f.name for f in got2.schema.fields) == {"k", "day"}
    assert current_version(path2) is not None


def test_mor_changes_feed_cow_refusal_and_compact_materialize(
    spark, tmp_path
):
    """The CDF over a vector-only span reports exactly the deleted
    rows; CoW ops refuse until compaction materializes; compaction
    rewrites ONLY vector-affected files and drops the list."""
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        _manifest,
        snapshot_changes,
        snapshot_compact,
        snapshot_delete,
        snapshot_delete_mor,
        snapshot_merge,
    )

    path = str(tmp_path / "t")
    # two distinct files: deletes land in one, the other must carry
    a = spark.createDataFrame(
        [(i, "left") for i in range(10)], "k long, v string"
    ).repartition(1)
    b = spark.createDataFrame(
        [(i, "right") for i in range(100, 110)], "k long, v string"
    ).repartition(1)
    v0 = snapshot_write(spark, path, a)
    v1 = snapshot_write(spark, path, b, mode="append")
    dk = spark.createDataFrame([(3,), (4,)], "k long")
    v2 = snapshot_delete_mor(spark, path, dk, ["k"])

    feed = snapshot_changes(spark, path, ["k"], v1, v2)
    assert sorted(
        (r.k, r.v, r._change_type) for r in feed.collect()
    ) == [(3, "left", "delete"), (4, "left", "delete")]

    with pytest.raises(ValueError, match="merge-on-read"):
        snapshot_delete(spark, path, dk, ["k"])
    with pytest.raises(ValueError, match="merge-on-read"):
        snapshot_merge(
            spark,
            path,
            spark.createDataFrame([(1, "z")], "k long, v string"),
            ["k"],
        )

    m2 = _manifest(path, v2)
    before = set(m2["files"])
    v3 = snapshot_compact(spark, path)
    m3 = _manifest(path, v3)
    assert "deletes" not in m3
    # the untouched (right) file carried by reference: exactly one
    # original file survives, exactly the affected one was rewritten
    assert len(before & set(m3["files"])) == 1
    got = {r.k for r in snapshot_read(spark, path).collect()}
    assert got == (set(range(10)) - {3, 4}) | set(range(100, 110))
    # CoW works again post-materialization
    snapshot_delete(
        spark, path, spark.createDataFrame([(100,)], "k long"), ["k"]
    )
    assert snapshot_read(spark, path).count() == 17
    # the materializing compact never resurrects a deleted position
    assert {
        r.k for r in snapshot_read(spark, path, version=v3).collect()
    } == got


def test_mor_vacuum_retains_then_reclaims_vector_files(spark, tmp_path):
    """Vector files are manifest-referenced data: vacuum keeps them
    while any retained version lists them, reclaims them once only
    vector-free versions remain."""
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        _manifest,
        snapshot_compact,
        snapshot_delete_mor,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, str(i)) for i in range(12)], "k long, v string"
    ).repartition(2)
    snapshot_write(spark, path, df)
    v1 = snapshot_delete_mor(
        spark, path, spark.createDataFrame([(0,), (11,)], "k long"), ["k"]
    )
    dv_files = set(_manifest(path, v1)["deletes"])
    assert dv_files
    # keep the vectored head: its vector files must survive the sweep
    deleted = vacuum(path, keep_last=1, retention_seconds=0.0)
    assert not (set(deleted) & dv_files)
    assert snapshot_read(spark, path).count() == 10
    # materialize, then sweep to the vector-free head: vectors retire
    snapshot_compact(spark, path)
    deleted = vacuum(path, keep_last=1, retention_seconds=0.0)
    assert dv_files <= set(deleted)
    assert snapshot_read(spark, path).count() == 10


def test_mor_plain_appends_carry_and_bloomless_upgrade_refuses(
    spark, tmp_path
):
    """Plain appends onto a vectored table carry the vectors in
    force, and upgrading a bloom-less vectored table via bloom append
    still refuses (old files would be unprobeable)."""
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        snapshot_delete_mor,
        snapshot_write_bloom,
    )

    path = str(tmp_path / "t")
    snapshot_write(
        spark,
        path,
        spark.createDataFrame(
            [(i, "v") for i in range(8)], "k long, v string"
        ).repartition(1),
    )
    snapshot_delete_mor(
        spark, path, spark.createDataFrame([(1,)], "k long"), ["k"]
    )
    snapshot_write(
        spark,
        path,
        spark.createDataFrame([(50, "new")], "k long, v string"),
        mode="append",
    )
    got = {r.k for r in snapshot_read(spark, path).collect()}
    assert got == (set(range(8)) - {1}) | {50}
    with pytest.raises(ValueError, match="bloom-less"):
        snapshot_write_bloom(
            spark,
            path,
            spark.createDataFrame([(60, "b")], "k long, v string"),
            "k",
            mode="append",
        )


def test_mor_delete_on_range_clustered_manifest(spark, tmp_path):
    """MoR position deletes on a RANGE-CLUSTERED manifest (r12
    verdict ask #5, replacing correct-by-refusal): vectors leave the
    files untouched so per-file [min, max] carries verbatim and stays
    conservative-correct, pruned range reads mask exactly the files
    they admit, sorted appends carry the vectors, and compaction
    re-sorts the purged rewrite and recomputes its footer stats."""
    from end_to_end_data_engineering_pipeline_spark.operators import (
        snapshots as S,
    )

    t = str(tmp_path / "sorted")
    df = spark.createDataFrame(
        [(i, i) for i in range(100)], "k long, s long"
    )
    v0 = S.snapshot_write_sorted(spark, t, df, "s", n_files=4)
    m0 = S._manifest(t, v0)
    assert len(m0["files"]) == 4

    v1 = S.snapshot_delete_mor(
        spark,
        t,
        spark.createDataFrame([(i,) for i in range(10, 20)], "k long"),
        ["k"],
    )
    m1 = S._manifest(t, v1)
    assert m1["files"] == m0["files"]          # zero rewrites
    assert m1["stats"] == m0["stats"]          # stats carry verbatim
    assert m1["stats_col"] == "s" and m1["deletes"]

    got = S.snapshot_read_range(spark, t, 5, 30)
    assert {r.k for r in got.collect()} == set(range(5, 10)) | set(
        range(20, 31)
    )
    # range pruning still live: the masked read opens a strict subset
    # of the data files
    opened = {f.split("/")[-1] for f in got.inputFiles()}
    assert len(opened & set(m1["files"])) < len(m1["files"])

    # sorted append carries the vectors in force
    v2 = S.snapshot_write_sorted(
        spark,
        t,
        spark.createDataFrame([(200, 200)], "k long, s long"),
        "s",
        mode="append",
    )
    assert S._manifest(t, v2)["deletes"] == m1["deletes"]
    assert 15 not in {r.k for r in S.snapshot_read(spark, t).collect()}

    # compaction materializes: vectors drop, every file has recomputed
    # stats, range reads unchanged
    v3 = S.snapshot_compact(spark, t)
    m3 = S._manifest(t, v3)
    assert "deletes" not in m3
    assert set(m3["stats"]) == set(m3["files"])
    assert {
        r.k for r in S.snapshot_read_range(spark, t, 5, 30).collect()
    } == set(range(5, 10)) | set(range(20, 31))


def test_mor_delete_on_mixed_spec_manifest(spark, tmp_path):
    """MoR position deletes compose with PARTITION-SPEC EVOLUTION
    (the last refusal cell): vectors commit layout-blind on a
    mixed-spec manifest with all spec metadata carried verbatim,
    each spec group prunes the position scan on ITS OWN column when
    that column is a delete key (old-spec files admitted in full —
    Iceberg's evolved-spec semantics), spec-pruned reads mask the
    vectors of exactly the admitted files, the CDF nets the masked
    rows, and compaction's spec migration doubles as MoR
    materialization. Equality tombstones compose too: the sequence
    map is file-keyed and spec-agnostic, so the re-insert rule spans
    the evolution commit."""
    from end_to_end_data_engineering_pipeline_spark.operators import (
        snapshots as S,
    )

    path = str(tmp_path / "t")
    # spec A: day-partitioned
    a = spark.createDataFrame(
        [(i, "d%d" % (i % 2), "r%d" % (i % 3), 10 + i) for i in range(8)],
        "k long, day string, region string, amt long",
    )
    S.snapshot_write_partitioned(spark, path, a, "day")
    # evolve: spec B partitions new files by region
    b = spark.createDataFrame(
        [(i, "d%d" % (i % 2), "r%d" % (i % 3), 10 + i)
         for i in range(100, 108)],
        a.schema,
    )
    S.snapshot_write_partitioned(
        spark, path, b, "region", mode="append", evolve=True
    )

    # user-keyed MoR delete scatters across both specs
    v2 = S.snapshot_delete_mor(
        spark, path,
        spark.createDataFrame([(1,), (102,)], "k long"), ["k"],
    )
    m2 = S._manifest(path, v2)
    assert "specs" in m2 and m2["deletes"]
    assert m2["file_specs"] and m2["default_spec"] == 1
    got = {r.k for r in S.snapshot_read_partitioned(spark, path).collect()}
    assert got == (set(range(8)) | set(range(100, 108))) - {1, 102}

    # spec-B-keyed delete: candidates prune to region files; spec-A
    # files (can't prune on region) admit in full — so vectors may
    # name either, but the REGION-pruned read masks correctly
    v3 = S.snapshot_delete_mor(
        spark, path, spark.createDataFrame([("r1",)], "region string"),
        ["region"],
    )
    got = {r.k for r in S.snapshot_read_partitioned(spark, path).collect()}
    # region=r1 rows: k%3==1 for spec-A rows (region physical) and
    # k%3==1 in 100..107 for spec-B rows (region manifest-attached)
    expect = {
        k for k in (set(range(8)) | set(range(100, 108)))
        if k not in (1, 102) and k % 3 != 1
    }
    assert got == expect
    # spec-pruned read of an unaffected region value stays masked
    pruned = S.snapshot_read_partitioned(
        spark, path, values=["r0"], col="region"
    )
    assert {r.k for r in pruned.collect()} == {
        k for k in expect if k % 3 == 0
    }

    # CDF across the delete span nets exactly the masked rows
    ch = S.snapshot_changes(spark, path, ["k"], v2, v3)
    assert {(r.k, r._change_type) for r in ch.collect()} == {
        (k, "delete")
        for k in (set(range(8)) | set(range(100, 108)))
        if k not in (1, 102) and k % 3 == 1
    }

    # compaction migrates to single-spec AND materializes the vectors
    v4 = S.snapshot_compact(spark, path)
    m4 = S._manifest(path, v4)
    assert "specs" not in m4 and "deletes" not in m4
    assert m4["part_col"] == "region"
    assert {
        r.k for r in S.snapshot_read_partitioned(spark, path).collect()
    } == expect

    # equality tombstones compose with evolution too: the sequence
    # map is keyed by file name, spec-agnostic. Tombstone before the
    # evolution masks old rows; the evolve-append's files land at the
    # append's sequence so a re-inserted key SURVIVES; the evolved
    # read applies both rules; migration materializes.
    path2 = str(tmp_path / "t2")
    S.snapshot_write_partitioned(spark, path2, a, "day")
    S.snapshot_delete_eq(
        spark, path2, spark.createDataFrame([(3,), (103,)], "k long"),
        ["k"],
    )
    v2b = S.snapshot_write_partitioned(
        spark, path2, b, "region", mode="append", evolve=True
    )
    m2b = S._manifest(path2, v2b)
    assert m2b["eq_deletes"] and "specs" in m2b
    new_files = [f for f, s in m2b["file_specs"].items() if s == 1]
    assert all(m2b["file_seq"][f] == v2b for f in new_files)
    got2 = {r.k for r in S.snapshot_read_partitioned(spark, path2).collect()}
    # k=3 predates the tombstone (masked); k=103 arrived AFTER it in
    # spec-B files (survives — re-insert rule across the evolution)
    assert got2 == (set(range(8)) - {3}) | set(range(100, 108))
    # eq delete ON the evolved table masks across both specs
    S.snapshot_delete_eq(
        spark, path2, spark.createDataFrame([(5,), (105,)], "k long"),
        ["k"],
    )
    got2 = {r.k for r in S.snapshot_read_partitioned(spark, path2).collect()}
    assert got2 == (set(range(8)) - {3, 5}) | (
        set(range(100, 108)) - {105}
    )
    # migration materializes tombstones and vectors alike
    v4b = S.snapshot_compact(spark, path2)
    m4b = S._manifest(path2, v4b)
    assert "specs" not in m4b and "eq_deletes" not in m4b
    assert {
        r.k for r in S.snapshot_read_partitioned(spark, path2).collect()
    } == got2


def test_spec_staging_writers_on_mixed_spec_manifest(spark, tmp_path):
    """upsert_eq and merge_mor on a MIXED-SPEC manifest: update rows
    stage under the DEFAULT spec (Iceberg: new data lands under the
    current spec), file_specs/partitions extend, the merge's position
    scan unions the spec groups (pruning each on its own column when
    it is a merge key), masked reads serve the new images, and spec
    migration materializes everything."""
    from end_to_end_data_engineering_pipeline_spark.operators import (
        snapshots as S,
    )

    path = str(tmp_path / "t")
    a = spark.createDataFrame(
        [(i, "d%d" % (i % 2), "r%d" % (i % 3), 10 + i) for i in range(8)],
        "k long, day string, region string, amt long",
    )
    S.snapshot_write_partitioned(spark, path, a, "day")
    b = spark.createDataFrame(
        [(i, "d%d" % (i % 2), "r%d" % (i % 3), 10 + i)
         for i in range(100, 108)],
        a.schema,
    )
    S.snapshot_write_partitioned(
        spark, path, b, "region", mode="append", evolve=True
    )

    # zero-read upsert: k=2 re-images (its old spec-A row masks by
    # the sequence rule), k=200 inserts; both land under region spec
    ups = spark.createDataFrame(
        [(2, "d0", "r2", 999), (200, "d0", "r2", 555)], a.schema
    )
    v2 = S.snapshot_upsert_eq(spark, path, ups, ["k"])
    m2 = S._manifest(path, v2)
    new_files = sorted(set(m2["files"]) - set(S._manifest(path, 1)["files"]))
    data_new = [f for f in new_files if m2["file_specs"].get(f) is not None]
    assert data_new and all(
        m2["file_specs"][f] == m2["default_spec"] for f in data_new
    )
    assert all(m2["partitions"][f] == "r2" for f in data_new)
    got = {(r.k, r.amt) for r in
           S.snapshot_read_partitioned(spark, path).collect()}
    assert (2, 999) in got and (200, 555) in got and (2, 12) not in got
    assert len(got) == 17

    # MoR merge keyed on (region, k): spec-B files prune to r1, the
    # spec-A group (day spec — cannot prune on region) admits fully;
    # vectors mask the old images, updates land under region spec
    upd = spark.createDataFrame([(4, "d0", "r1", 777)], a.schema)
    v3 = S.snapshot_merge_mor(spark, path, upd, ["region", "k"])
    m3 = S._manifest(path, v3)
    dv = S._dv_frame(spark, path, m3)
    hit_files = {r["__dv_file"] for r in dv.collect()}
    # every masked position lives in a file that is either spec-A or
    # a spec-B r1 file (the pruned candidate set)
    for f in hit_files:
        sid = int(m3["file_specs"][f])
        assert sid == 0 or m3["partitions"][f] == "r1"
    got = {(r.k, r.amt) for r in
           S.snapshot_read_partitioned(spark, path).collect()}
    assert (4, 777) in got and (4, 14) not in got and len(got) == 17

    # CDF across the DML span nets the three changes
    ch = S.snapshot_changes(spark, path, ["k"], 1, v3)
    by = {}
    for r in ch.collect():
        by.setdefault(r._change_type, set()).add(r.k)
    assert by["insert"] == {200}
    assert by["update_preimage"] == {2, 4}
    assert by["update_postimage"] == {2, 4}

    # migration: single-spec, no delete metadata, content stable
    v4 = S.snapshot_compact(spark, path)
    m4 = S._manifest(path, v4)
    assert "specs" not in m4 and "deletes" not in m4
    assert "eq_deletes" not in m4
    assert {
        (r.k, r.amt)
        for r in S.snapshot_read_partitioned(spark, path).collect()
    } == got


def test_eq_dml_on_range_clustered_manifest(spark, tmp_path):
    """Equality deletes / zero-read upserts / MoR merge on a
    RANGE-CLUSTERED manifest: tombstones commit layout-blind with the
    stats carried verbatim, masked range reads stay pruned, a sorted
    append re-inserts tombstoned keys (sequence rule), the
    stats-keyed MoR merge prunes its position scan to the update
    keys' [min, max] envelope, appended files get footer stats, and
    compaction materializes everything with a re-sorted rewrite."""
    from end_to_end_data_engineering_pipeline_spark.operators import (
        snapshots as S,
    )

    t = str(tmp_path / "sorted")
    df = spark.createDataFrame(
        [(i, i, "v%d" % i) for i in range(100)], "k long, s long, v string"
    )
    S.snapshot_write_sorted(spark, t, df, "s", n_files=4)
    m0 = S._manifest(t, 0)

    # zero-read eq delete; stats carry verbatim
    v1 = S.snapshot_delete_eq(
        spark, t, spark.createDataFrame([(7,), (55,)], "k long"), ["k"]
    )
    m1 = S._manifest(t, v1)
    assert m1["stats"] == m0["stats"] and m1["files"] == m0["files"]
    got = S.snapshot_read_range(spark, t, 0, 60)
    assert {r.k for r in got.collect()} == set(range(61)) - {7, 55}
    opened = {f.split("/")[-1] for f in got.inputFiles()}
    assert len(opened & set(m1["files"])) < len(m1["files"])  # pruned

    # sorted append re-inserting a tombstoned key survives
    S.snapshot_write_sorted(
        spark, t,
        spark.createDataFrame([(7, 7, "reborn")], df.schema), "s",
        mode="append",
    )
    got = {(r.k, r.v) for r in S.snapshot_read(spark, t).collect()}
    assert (7, "reborn") in got and (7, "v7") not in got

    # zero-read upsert: appended file gets footer stats
    v3 = S.snapshot_upsert_eq(
        spark, t,
        spark.createDataFrame([(20, 20, "upd")], df.schema), ["k"],
    )
    m3 = S._manifest(t, v3)
    assert set(m3["stats"]) == set(m3["files"])
    assert (20, "upd") in {
        (r.k, r.v) for r in S.snapshot_read_range(spark, t, 15, 25).collect()
    }

    # stats-keyed MoR merge: position scan pruned by the key envelope
    upd = spark.createDataFrame([(30, 30, "merged")], df.schema)
    v4 = S.snapshot_merge_mor(spark, t, upd, ["s"])
    m4 = S._manifest(t, v4)
    dv = S._dv_frame(spark, t, m4)
    stats = m4["stats"]
    for r in dv.collect():
        fr = stats[r["__dv_file"]]
        assert fr is None or (fr[0] <= 30 <= fr[1])  # envelope files only
    got = {(r.k, r.v) for r in S.snapshot_read(spark, t).collect()}
    assert ("merged" in {v for _, v in got}) and (30, "v30") not in got

    # compaction: all delete metadata drops, stats full-covered,
    # content stable
    v5 = S.snapshot_compact(spark, t)
    m5 = S._manifest(t, v5)
    assert "eq_deletes" not in m5 and "deletes" not in m5
    assert set(m5["stats"]) == set(m5["files"])
    assert {(r.k, r.v) for r in S.snapshot_read(spark, t).collect()} == got


def test_eq_dml_on_bloom_indexed_manifest(spark, tmp_path):
    """Equality deletes / upserts on a BLOOM-INDEXED manifest: point
    lookups mask tombstoned keys, upsert-appended files get fresh
    bitmaps so new keys stay probeable, bloom appends carry the
    tombstones with the re-insert sequence rule, and compaction
    materializes."""
    from end_to_end_data_engineering_pipeline_spark.operators import (
        snapshots as S,
    )

    t = str(tmp_path / "bloom")
    df = spark.createDataFrame(
        [(i, "v%d" % i) for i in range(40)], "k long, v string"
    ).repartition(4)
    S.snapshot_write_bloom(spark, t, df, "k")
    m0 = S._manifest(t, 0)

    v1 = S.snapshot_delete_eq(
        spark, t, spark.createDataFrame([(5,)], "k long"), ["k"]
    )
    assert S._manifest(t, v1)["bloom"] == m0["bloom"]
    assert S.snapshot_read_point(spark, t, 5).count() == 0
    assert S.snapshot_read_point(spark, t, 6).count() == 1

    # zero-read upsert: the re-inserted key and a brand-new key both
    # serve through the point index (fresh bitmap for the new file)
    v2 = S.snapshot_upsert_eq(
        spark, t,
        spark.createDataFrame(
            [(5, "reborn"), (500, "new")], "k long, v string"
        ),
        ["k"],
    )
    m2 = S._manifest(t, v2)
    assert set(m2["bloom"]["files"]) == set(m2["files"])
    assert [r.v for r in S.snapshot_read_point(spark, t, 5).collect()] == [
        "reborn"
    ]
    assert [r.v for r in S.snapshot_read_point(spark, t, 500).collect()] == [
        "new"
    ]

    # bloom append carries tombstones; a second tombstone then masks
    # the appended row too (sequence rule both ways)
    S.snapshot_delete_eq(
        spark, t, spark.createDataFrame([(6,)], "k long"), ["k"]
    )
    v4 = S.snapshot_write_bloom(
        spark, t,
        spark.createDataFrame([(6, "back")], "k long, v string"), "k",
        mode="append",
    )
    m4 = S._manifest(t, v4)
    assert m4["eq_deletes"] and m4["file_seq"]
    assert [r.v for r in S.snapshot_read_point(spark, t, 6).collect()] == [
        "back"
    ]

    v5 = S.snapshot_compact(spark, t)
    m5 = S._manifest(t, v5)
    assert "eq_deletes" not in m5
    assert set(m5["bloom"]["files"]) == set(m5["files"])
    assert S.snapshot_read_point(spark, t, 5).count() == 1
    assert S.snapshot_read_point(spark, t, 6).count() == 1


def test_mor_delete_on_bloom_indexed_manifest(spark, tmp_path):
    """MoR position deletes on a BLOOM-INDEXED manifest (r12 verdict
    ask #5): bitmaps stay valid for surviving rows (a deleted key's
    bits at worst admit files the exact filter empties), point reads
    mask the vectors of exactly the admitted files, bloom appends
    carry the vectors, and compaction rebuilds rewritten files'
    bitmaps so the index tightens back."""
    from end_to_end_data_engineering_pipeline_spark.operators import (
        snapshots as S,
    )

    t = str(tmp_path / "bloom")
    df = spark.createDataFrame(
        [(i, "v%d" % i) for i in range(40)], "k long, v string"
    ).repartition(4)
    v0 = S.snapshot_write_bloom(spark, t, df, "k")
    m0 = S._manifest(t, v0)

    v1 = S.snapshot_delete_mor(
        spark, t, spark.createDataFrame([(3,), (17,)], "k long"), ["k"]
    )
    m1 = S._manifest(t, v1)
    assert m1["files"] == m0["files"]
    assert m1["bloom"] == m0["bloom"]          # bitmaps carry verbatim
    assert S.snapshot_read_point(spark, t, 3).count() == 0
    assert [
        r.v for r in S.snapshot_read_point(spark, t, 4).collect()
    ] == ["v4"]
    # pruning still live for a present key
    _, admitted, total = S.bloom_prune_files(spark, t, 4)
    assert len(admitted) < total

    # bloom append onto the vectored table carries the vectors
    v2 = S.snapshot_write_bloom(
        spark,
        t,
        spark.createDataFrame([(100, "new")], "k long, v string"),
        "k",
        mode="append",
    )
    assert S._manifest(t, v2)["deletes"] == m1["deletes"]
    assert S.snapshot_read_point(spark, t, 3).count() == 0
    assert S.snapshot_read_point(spark, t, 100).count() == 1

    # compaction: vectors drop, every file keeps a bitmap, lookups
    # unchanged
    v3 = S.snapshot_compact(spark, t)
    m3 = S._manifest(t, v3)
    assert "deletes" not in m3
    assert set(m3["bloom"]["files"]) == set(m3["files"])
    assert S.snapshot_read_point(spark, t, 3).count() == 0
    assert S.snapshot_read_point(spark, t, 4).count() == 1
    assert S.snapshot_read_point(spark, t, 100).count() == 1


def test_mor_merge_upserts_without_rewriting_files(spark, tmp_path):
    """Merge-on-read MERGE: one commit = vectors masking matched
    rows' old positions + appended files carrying the update rows;
    existing files carry by reference, the CDF reports exact images,
    and a row matched inside an APPENDED file masks correctly on the
    next merge."""
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        _manifest,
        snapshot_changes,
        snapshot_merge_mor,
    )

    path = str(tmp_path / "t")
    v0 = snapshot_write(
        spark,
        path,
        spark.createDataFrame(
            [(i, "old") for i in range(10)], "k long, v string"
        ).repartition(3),
    )
    m0 = _manifest(path, v0)
    ups = spark.createDataFrame(
        [(2, "new2"), (3, "new3"), (100, "ins")], "k long, v string"
    )
    v1 = snapshot_merge_mor(spark, path, ups, ["k"])
    m1 = _manifest(path, v1)
    assert set(m0["files"]) <= set(m1["files"])  # carried by reference
    got = {(r.k, r.v) for r in snapshot_read(spark, path).collect()}
    assert got == {(i, "old") for i in range(10) if i not in (2, 3)} | {
        (2, "new2"),
        (3, "new3"),
        (100, "ins"),
    }
    feed = snapshot_changes(spark, path, ["k"], v0, v1)
    agg = sorted(
        (r.k, r._change_type) for r in feed.collect()
    )
    assert agg == [
        (2, "update_postimage"),
        (2, "update_preimage"),
        (3, "update_postimage"),
        (3, "update_preimage"),
        (100, "insert"),
    ]
    # matched row living in an appended file: masked, re-landed
    snapshot_merge_mor(
        spark,
        path,
        spark.createDataFrame([(100, "ins2")], "k long, v string"),
        ["k"],
    )
    got = {(r.k, r.v) for r in snapshot_read(spark, path).collect()}
    assert (100, "ins2") in got and (100, "ins") not in got


def test_mor_merge_schema_evolution_and_compact(spark, tmp_path):
    """ADD-column evolution through MoR merge (old files null-fill;
    type change refuses), then compaction materializes vectors with
    the evolved schema intact."""
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        _manifest,
        snapshot_compact,
        snapshot_delete_mor,
        snapshot_merge_mor,
    )

    path = str(tmp_path / "t")
    snapshot_write(
        spark,
        path,
        spark.createDataFrame(
            [(i, "old") for i in range(6)], "k long, v string"
        ).repartition(2),
    )
    snapshot_delete_mor(
        spark, path, spark.createDataFrame([(5,)], "k long"), ["k"]
    )
    # a deleted key re-inserts through merge (old position stays masked)
    snapshot_merge_mor(
        spark,
        path,
        spark.createDataFrame([(5, "back", 1.5)], "k long, v string, w double"),
        ["k"],
    )
    rows = snapshot_read(spark, path).collect()
    five = [r for r in rows if r.k == 5]
    assert len(five) == 1 and five[0].v == "back" and five[0].w == 1.5
    assert all(r.w is None for r in rows if r.k != 5)  # null-filled
    with pytest.raises(ValueError, match="ADD-column"):
        snapshot_merge_mor(
            spark,
            path,
            spark.createDataFrame([(1, 2)], "k long, v int"),
            ["k"],
        )
    before = {(r.k, r.v, r.w) for r in snapshot_read(spark, path).collect()}
    v = snapshot_compact(spark, path)
    assert "deletes" not in _manifest(path, v)
    assert {
        (r.k, r.v, r.w) for r in snapshot_read(spark, path).collect()
    } == before


def test_eq_delete_sequence_rule_and_reinsert(spark, tmp_path):
    """Equality deletes commit WITHOUT reading the table and obey the
    Iceberg sequence rule: a tombstone masks only rows whose data
    file predates it, so later appends / MoR merges of the same key
    survive, and a newer tombstone re-masks them."""
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        _manifest,
        snapshot_delete_eq,
        snapshot_merge_mor,
    )

    path = str(tmp_path / "t")
    v0 = snapshot_write(
        spark,
        path,
        spark.createDataFrame(
            [(i, "old") for i in range(10)], "k long, v string"
        ).repartition(3),
    )
    v1 = snapshot_delete_eq(
        spark, path, spark.createDataFrame([(2,), (5,)], "k long"), ["k"]
    )
    m1 = _manifest(path, v1)
    assert m1["files"] == _manifest(path, v0)["files"]
    assert m1["eq_deletes"] and m1["file_seq"]
    assert {r.k for r in snapshot_read(spark, path).collect()} == set(
        range(10)
    ) - {2, 5}
    assert snapshot_read(spark, path, version=v0).count() == 10
    # re-insert AFTER the tombstone survives (file_seq = commit > seq-1)
    snapshot_write(
        spark,
        path,
        spark.createDataFrame([(2, "reborn")], "k long, v string"),
        mode="append",
    )
    got = {(r.k, r.v) for r in snapshot_read(spark, path).collect()}
    assert (2, "reborn") in got and (2, "old") not in got
    # a NEWER tombstone masks the re-insert
    snapshot_delete_eq(
        spark, path, spark.createDataFrame([(2,)], "k long"), ["k"]
    )
    assert {r.k for r in snapshot_read(spark, path).collect()} == set(
        range(10)
    ) - {2, 5}
    # MoR merge re-inserting a tombstoned key survives too
    snapshot_merge_mor(
        spark,
        path,
        spark.createDataFrame([(5, "five2")], "k long, v string"),
        ["k"],
    )
    got = {(r.k, r.v) for r in snapshot_read(spark, path).collect()}
    assert (5, "five2") in got


def test_eq_delete_partitioned_sequence_rule_and_pruning(spark, tmp_path):
    """Equality deletes on a PARTITIONED manifest (r12 verdict ask
    #4): the tombstone commits partition-blind with per-file sequence
    numbers, pruned reads apply the sequence rule over only the files
    they open, a partitioned append re-inserts tombstoned keys (new
    files get the append's sequence), and compaction materializes
    per-partition and drops the tombstones."""
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_pipeline_spark.operators import (
        snapshots as S,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, "d%d" % (i % 3), "v%d" % i) for i in range(12)],
        "k long, day string, v string",
    )
    v0 = S.snapshot_write_partitioned(spark, path, df, "day")
    m0 = S._manifest(path, v0)

    v1 = S.snapshot_delete_eq(
        spark, path, spark.createDataFrame([(3,), (4,)], "k long"), ["k"]
    )
    m1 = S._manifest(path, v1)
    assert m1["files"] == m0["files"]  # zero data IO at commit
    assert m1["partitions"] == m0["partitions"]
    assert m1["eq_deletes"] and m1["file_seq"]
    got = S.snapshot_read_partitioned(spark, path)
    assert {r.k for r in got.collect()} == set(range(12)) - {3, 4}
    # pruned read: only d1's files open, d1's tombstoned key masked
    pruned = S.snapshot_read_partitioned(spark, path, values=["d1"])
    assert {r.k for r in pruned.collect()} == {1, 7, 10}
    opened = {f.split("/")[-1] for f in pruned.inputFiles()}
    d1_files = {f for f, p in m1["partitions"].items() if p == "d1"}
    assert opened & set(m1["files"]) <= d1_files
    # time travel: pre-delete version unaffected
    assert S.snapshot_read_partitioned(spark, path, version=v0).count() == 12

    # partitioned append re-inserts a tombstoned key: the new file's
    # sequence postdates the tombstone, so the row survives
    v2 = S.snapshot_write_partitioned(
        spark,
        path,
        spark.createDataFrame([(3, "d0", "reborn")], df.schema),
        "day",
        mode="append",
    )
    m2 = S._manifest(path, v2)
    new_files = set(m2["files"]) - set(m1["files"])
    assert all(m2["file_seq"][f] == v2 for f in new_files)
    got = {(r.k, r.v) for r in
           S.snapshot_read_partitioned(spark, path).collect()}
    assert (3, "reborn") in got and (3, "v3") not in got and (4, "v4") not in got

    # compaction materializes: tombstones drop, per-partition files,
    # content identical
    v3 = S.snapshot_compact(spark, path)
    m3 = S._manifest(path, v3)
    assert "eq_deletes" not in m3 and "file_seq" not in m3
    assert set(m3["partitions"].values()) <= {"d0", "d1", "d2"}
    got2 = {(r.k, r.v) for r in
            S.snapshot_read_partitioned(spark, path).collect()}
    assert got2 == got


def test_upsert_eq_and_merge_mor_partitioned(spark, tmp_path):
    """snapshot_upsert_eq and snapshot_merge_mor on partitioned
    manifests: updates land partition-staged (one value per file),
    old images mask, the position scan of a part_col-keyed MoR merge
    is manifest-pruned, and pruned reads stay correct throughout."""
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_pipeline_spark.operators import (
        snapshots as S,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, "d%d" % (i % 2), 100 + i) for i in range(8)],
        "k long, day string, amt long",
    )
    S.snapshot_write_partitioned(spark, path, df, "day")

    # zero-read upsert: k=2 updates in place (same partition), k=50 inserts
    ups = spark.createDataFrame(
        [(2, "d0", 999), (50, "d0", 555)], "k long, day string, amt long"
    )
    v1 = S.snapshot_upsert_eq(spark, path, ups, ["k"])
    m1 = S._manifest(path, v1)
    appended = [f for f in m1["files"] if m1["file_seq"].get(f) == v1]
    assert appended and all(
        m1["partitions"][f] == "d0" for f in appended
    )
    got = {(r.k, r.amt) for r in
           S.snapshot_read_partitioned(spark, path).collect()}
    assert (2, 999) in got and (50, 555) in got and (2, 102) not in got
    assert len(got) == 9

    # updates missing the partition column refuse loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="partition column"):
        S.snapshot_upsert_eq(
            spark, path, spark.createDataFrame([(9, 1)], "k long, amt long"),
            ["k"],
        )

    # MoR merge keyed on (day, k): the position scan prunes to d1's
    # files by manifest, so the new vectors name only d1 files
    upd2 = spark.createDataFrame(
        [(3, "d1", 777), (60, "d1", 666)], "k long, day string, amt long"
    )
    v2 = S.snapshot_merge_mor(spark, path, upd2, ["day", "k"])
    m2 = S._manifest(path, v2)
    dv = S._dv_frame(spark, path, m2)
    d1_files = {f for f, p in m2["partitions"].items() if p == "d1"}
    assert {r["__dv_file"] for r in dv.collect()} <= d1_files
    got = {(r.k, r.amt) for r in
           S.snapshot_read_partitioned(spark, path).collect()}
    assert (3, 777) in got and (60, 666) in got and (3, 103) not in got
    assert len(got) == 10

    # pruned read of the untouched partition sees no merge traffic
    assert {
        (r.k, r.amt)
        for r in S.snapshot_read_partitioned(
            spark, path, values=["d0"]
        ).collect()
    } == {(0, 100), (2, 999), (4, 104), (6, 106), (50, 555)}

    # CDF across the whole DML span nets exactly the four changes
    ch = S.snapshot_changes(spark, path, ["k"], 0, v2)
    by_type = {}
    for r in ch.collect():
        by_type.setdefault(r._change_type, set()).add(r.k)
    assert by_type["insert"] == {50, 60}
    assert by_type["update_preimage"] == {2, 3}
    assert by_type["update_postimage"] == {2, 3}

    # compaction materializes BOTH flavors per-partition
    v3 = S.snapshot_compact(spark, path)
    m3 = S._manifest(path, v3)
    assert "eq_deletes" not in m3 and "deletes" not in m3
    got2 = {(r.k, r.amt) for r in
            S.snapshot_read_partitioned(spark, path).collect()}
    assert got2 == got


def test_eq_delete_cdf_is_symmetric_and_key_narrowed(spark, tmp_path):
    """Two r12-flagged gaps in the eq-delete CDF close together:

    (a) SYMMETRY (r12 advice #2): a span where tombstones DISAPPEAR
    without a file rewrite — snapshot_restore back to a pre-delete
    version — must report the resurrected rows as inserts; only
    added-seq spans were handled before.

    (b) EXACT SPANS (r12 verdict ask #3): an added-tombstone span over
    a multi-key shared file semi-joins the served rows against the
    recorded tombstone keys, so the value join sees candidate rows
    only, and reports exactly the tombstoned keys."""
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        snapshot_changes,
        snapshot_delete_eq,
        snapshot_restore,
    )

    path = str(tmp_path / "t")
    v0 = snapshot_write(
        spark,
        path,
        spark.createDataFrame(
            [(i, "v%d" % i) for i in range(10)], "k long, v string"
        ).repartition(1),
    )
    v1 = snapshot_delete_eq(
        spark, path, spark.createDataFrame([(3,), (7,)], "k long"), ["k"]
    )

    # (b) the delete span reports exactly the tombstoned keys...
    span = snapshot_changes(spark, path, ["k"], v0, v1)
    assert {(r.k, r._change_type) for r in span.collect()} == {
        (3, "delete"),
        (7, "delete"),
    }
    # ...and the plan carries the tombstone-key semi-join (the
    # narrowing itself, not just its result)
    plan = span._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftSemi" in plan

    # (a) restore to the pre-delete version: same files, tombstones
    # gone — the span must net the two resurrected rows as inserts
    v2 = snapshot_restore(path, v0)
    back = snapshot_changes(spark, path, ["k"], v1, v2)
    assert {(r.k, r.v, r._change_type) for r in back.collect()} == {
        (3, "v3", "insert"),
        (7, "v7", "insert"),
    }
    # and the full round trip (delete then restore) nets to nothing
    assert snapshot_changes(spark, path, ["k"], v0, v2).count() == 0


def test_eq_upsert_single_commit_and_mixed_flavors_compact(spark, tmp_path):
    """snapshot_upsert_eq lands rows + tombstone at one sequence in
    ONE commit; position and equality deletes coexist; the CDF nets
    the span; compaction materializes all flavors at once."""
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        _manifest,
        snapshot_changes,
        snapshot_compact,
        snapshot_delete,
        snapshot_delete_eq,
        snapshot_delete_mor,
        snapshot_upsert_eq,
    )

    path = str(tmp_path / "t")
    v0 = snapshot_write(
        spark,
        path,
        spark.createDataFrame(
            [(i, "old") for i in range(8)], "k long, v string"
        ).repartition(2),
    )
    # one-commit upsert: update k=1, insert k=50 — zero table reads
    v1 = snapshot_upsert_eq(
        spark,
        path,
        spark.createDataFrame(
            [(1, "new1"), (50, "ins")], "k long, v string"
        ),
        ["k"],
    )
    assert v1 == v0 + 1  # exactly one version
    got = {(r.k, r.v) for r in snapshot_read(spark, path).collect()}
    assert (1, "new1") in got and (1, "old") not in got and (50, "ins") in got
    # mix in a position delete and an equality delete
    snapshot_delete_mor(
        spark, path, spark.createDataFrame([(3,)], "k long"), ["k"]
    )
    v3 = snapshot_delete_eq(
        spark, path, spark.createDataFrame([(50,)], "k long"), ["k"]
    )
    got = {r.k for r in snapshot_read(spark, path).collect()}
    assert got == {0, 1, 2, 4, 5, 6, 7}
    feed = snapshot_changes(spark, path, ["k"], v0, v3)
    types = sorted((r.k, r._change_type) for r in feed.collect())
    assert types == [
        (1, "update_postimage"),
        (1, "update_preimage"),
        (3, "delete"),
    ]
    with pytest.raises(ValueError, match="merge-on-read"):
        snapshot_delete(
            spark, path, spark.createDataFrame([(0,)], "k long"), ["k"]
        )
    before = {(r.k, r.v) for r in snapshot_read(spark, path).collect()}
    v = snapshot_compact(spark, path)
    m = _manifest(path, v)
    assert "deletes" not in m and "eq_deletes" not in m
    assert "file_seq" not in m
    assert {(r.k, r.v) for r in snapshot_read(spark, path).collect()} == before
    # vector and tombstone files retire once only clean versions remain
    vacuum(path, keep_last=1, retention_seconds=0.0)
    assert {(r.k, r.v) for r in snapshot_read(spark, path).collect()} == before


def test_mor_partitioned_delete_prunes_and_carries_map(spark, tmp_path):
    """Position deletes on a hive-partitioned manifest: the vector
    commit manifest-prunes its position scan when keyed on the
    partition column (every recorded position lives in that
    partition's files), the partition map carries untouched, pruned
    reads open only their partition's data files plus the vectors,
    and compaction materializes per-partition (map stays prunable)."""
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        _dv_frame,
        _manifest,
        snapshot_changes,
        snapshot_compact,
        snapshot_delete_mor,
        snapshot_read_partitioned,
        snapshot_write_partitioned,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(30)],
        "k long, cell int, v string",
    ).repartition(2)
    v0 = snapshot_write_partitioned(spark, path, df, "cell")
    m0 = _manifest(path, v0)

    # partition-keyed delete: vectors must reference ONLY cell=1 files
    v1 = snapshot_delete_mor(
        spark, path, spark.createDataFrame([(1,)], "cell int"), ["cell"]
    )
    m1 = _manifest(path, v1)
    assert m1["files"] == m0["files"]
    assert m1["partitions"] == m0["partitions"]
    cell1_files = {f for f, p in m1["partitions"].items() if p == "1"}
    dv = _dv_frame(spark, path, m1)
    assert {
        r["__dv_file"] for r in dv.select("__dv_file").distinct().collect()
    } <= cell1_files
    assert snapshot_read_partitioned(spark, path).count() == 20
    assert (
        snapshot_read_partitioned(spark, path, values=[1]).count() == 0
    )

    # a pruned read of an untouched partition opens no other
    # partition's DATA files (vector files may ride along)
    r2 = snapshot_read_partitioned(spark, path, values=[2])
    opened = {fp.rsplit("/", 1)[-1] for fp in r2.inputFiles()}
    other_data = {
        f for f, p in m1["partitions"].items() if p not in ("2",)
    }
    assert not (opened & other_data)
    assert r2.count() == 10

    # row-keyed delete over all partitions composes
    v2 = snapshot_delete_mor(
        spark, path, spark.createDataFrame([(0,), (5,)], "k long"), ["k"]
    )
    assert snapshot_read_partitioned(spark, path).count() == 18
    assert snapshot_read_partitioned(spark, path, version=v0).count() == 30

    # the feed over the span reports exactly the deleted rows
    feed = snapshot_changes(spark, path, ["k"], v0, v2)
    got = {(r.k, r._change_type) for r in feed.collect()}
    assert got == {(k, "delete") for k in range(30) if k % 3 == 1} | {
        (0, "delete"),
        (5, "delete"),
    }

    # append carries vectors; compact materializes per-partition
    snapshot_write_partitioned(
        spark,
        path,
        spark.createDataFrame([(100, 1, "new")], "k long, cell int, v string"),
        "cell",
        mode="append",
    )
    before = {
        (r.k, r.cell, r.v)
        for r in snapshot_read_partitioned(spark, path).collect()
    }
    assert (100, 1, "new") in before and len(before) == 19
    v4 = snapshot_compact(spark, path)
    m4 = _manifest(path, v4)
    assert "deletes" not in m4 and m4["part_col"] == "cell"
    assert {
        (r.k, r.cell, r.v)
        for r in snapshot_read_partitioned(spark, path).collect()
    } == before
    # vacuum retires the vector files once only clean versions remain
    dv_files = set(_manifest(path, v2)["deletes"])
    deleted = vacuum(path, keep_last=1, retention_seconds=0.0)
    assert dv_files <= set(deleted)


class TestSegmentManifests:
    """Segment manifests (r13 verdict gap #3): above SEGMENT_MIN_FILES
    the per-file metadata moves into immutable content-addressed
    segment files and commits carry unchanged segments BY REFERENCE —
    commit metadata cost O(added + touched segments), never O(table
    files). The layer is transparent: resolved manifests are
    bit-identical dicts, every consumer unchanged. Thresholds are
    monkeypatched low so sandbox-sized tables exercise the path."""

    def _lower(self, monkeypatch):
        from end_to_end_data_engineering_pipeline_spark.operators import (
            snapshots,
        )

        monkeypatch.setattr(snapshots, "SEGMENT_MIN_FILES", 4)
        monkeypatch.setattr(snapshots, "SEGMENT_TARGET", 3)
        return snapshots

    def test_roundtrip_append_reuses_segments(
        self, spark, tmp_path, monkeypatch
    ):
        sn = self._lower(monkeypatch)
        path = str(tmp_path / "t")
        df = spark.range(0, 60).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v")
        ).repartition(6)
        sn.snapshot_write(spark, path, df)
        raw0 = sn._raw_manifest(path, 0)
        assert "files_segments" in raw0 and "files" not in raw0
        m0 = sn._manifest(path, 0)
        assert len(m0["files"]) == 6
        got = {(r.k, r.v) for r in sn.snapshot_read(spark, path).collect()}
        assert got == {(i, i % 7) for i in range(60)}
        # append: every v0 segment carries by reference, only the new
        # files' segment(s) are written
        sn.snapshot_write(
            spark,
            path,
            spark.range(60, 70).select(
                F.col("id").alias("k"), (F.col("id") % 7).alias("v")
            ).repartition(2),
            mode="append",
        )
        raw1 = sn._raw_manifest(path, 1)
        assert set(raw0["files_segments"]) <= set(raw1["files_segments"])
        assert sn.snapshot_read(spark, path).count() == 70
        # resolved manifest preserves the full file list + order prefix
        m1 = sn._manifest(path, 1)
        assert m1["files"][: len(m0["files"])] == m0["files"]

    def test_partitioned_and_bloom_maps_roundtrip(
        self, spark, tmp_path, monkeypatch
    ):
        sn = self._lower(monkeypatch)
        # partitioned: the partition map lives in segments now
        p1 = str(tmp_path / "p")
        df = spark.createDataFrame(
            [(i, i % 6, i * 10) for i in range(36)],
            "k long, cell int, v long",
        )
        sn.snapshot_write_partitioned(spark, p1, df, "cell")
        raw = sn._raw_manifest(p1, 0)
        assert "files_segments" in raw and "partitions" not in raw
        m = sn._manifest(p1, 0)
        assert set(m["partitions"].values()) == {str(i) for i in range(6)}
        pruned = sn.snapshot_read_partitioned(spark, p1, values=[2])
        assert {r.k % 6 for r in pruned.collect()} == {2}
        # bloom: bitmaps live in segments; the point lookup still
        # prunes and matches
        p2 = str(tmp_path / "b")
        dfb = spark.range(0, 600).select(
            F.col("id").alias("k"), (F.col("id") % 11).alias("v")
        ).repartition(6)
        sn.snapshot_write_bloom(spark, p2, dfb, "k")
        rawb = sn._raw_manifest(p2, 0)
        assert "files_segments" in rawb
        assert "files" not in rawb["bloom"]
        _, admitted, total = sn.bloom_prune_files(spark, p2, 7)
        assert total == 6 and admitted
        assert [r.v for r in sn.snapshot_read_point(spark, p2, 7).collect()] == [7]

    def test_cow_delete_touches_only_affected_segments(
        self, spark, tmp_path, monkeypatch
    ):
        sn = self._lower(monkeypatch)
        path = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(i, i % 6) for i in range(60)], "k long, cell int"
        ).repartition(F.col("cell"))
        sn.snapshot_write_partitioned(spark, path, df, "cell")
        raw0 = sn._raw_manifest(path, 0)
        # partition-keyed metadata delete: drops cell=3's file(s)
        dels = spark.createDataFrame([(3,)], "cell int")
        sn.snapshot_delete(spark, path, dels, ["cell"])
        raw1 = sn._raw_manifest(path, 1)
        # at least one v0 segment carries by reference; the rewritten
        # ones differ (content-addressed: same name iff same content)
        assert set(raw0["files_segments"]) & set(raw1["files_segments"])
        got = {r.cell for r in sn.snapshot_read_partitioned(spark, path).collect()}
        assert got == {0, 1, 2, 4, 5}

    def test_vacuum_reclaims_unreferenced_segments(
        self, spark, tmp_path, monkeypatch
    ):
        import os as _os

        sn = self._lower(monkeypatch)
        path = str(tmp_path / "t")
        a = spark.range(0, 40).select(F.col("id").alias("k")).repartition(5)
        sn.snapshot_write(spark, path, a)
        segs0 = set(sn._raw_manifest(path, 0)["files_segments"])
        b = spark.range(100, 140).select(F.col("id").alias("k")).repartition(5)
        sn.snapshot_write(spark, path, b, mode="overwrite")
        segs1 = set(sn._raw_manifest(path, 1)["files_segments"])
        assert segs0.isdisjoint(segs1)  # disjoint content
        sn.vacuum(path, keep_last=1, retention_seconds=0.0)
        left = set(_os.listdir(sn._segments_dir(path)))
        assert left == segs1  # v0's segments reclaimed, v1's live
        assert sn.snapshot_read(spark, path).count() == 40

    def test_plain_manifests_below_threshold(self, spark, tmp_path):
        from end_to_end_data_engineering_pipeline_spark.operators import (
            snapshots as sn,
        )

        path = str(tmp_path / "t")
        df = spark.range(0, 10).select(F.col("id").alias("k")).repartition(2)
        sn.snapshot_write(spark, path, df)
        raw = sn._raw_manifest(path, 0)
        assert "files" in raw and "files_segments" not in raw


class TestSegmentPruningHeaders:
    """Read-side segment pruning (r14 verdict ask #1): serialized
    manifests carry per-segment headers (file count, distinct
    partition values, stat [lo,hi] envelope, union bloom bitmap) and
    point/range/partition-pruned reads load only admitted segments —
    never the full O(table-files) map. Each test instruments
    _load_segment and asserts the pruned read opened a STRICT subset
    of the version's segment files with results identical to the
    unpruned answer."""

    def _lower(self, monkeypatch):
        from end_to_end_data_engineering_pipeline_spark.operators import (
            snapshots,
        )

        monkeypatch.setattr(snapshots, "SEGMENT_MIN_FILES", 4)
        monkeypatch.setattr(snapshots, "SEGMENT_TARGET", 2)
        return snapshots

    def _trace_loads(self, monkeypatch, sn):
        loaded: list[str] = []
        real = sn._load_segment

        def spy(path, name):
            loaded.append(name)
            return real(path, name)

        monkeypatch.setattr(sn, "_load_segment", spy)
        return loaded

    def test_partition_value_read_opens_segment_subset(
        self, spark, tmp_path, monkeypatch
    ):
        sn = self._lower(monkeypatch)
        path = str(tmp_path / "p")
        df = spark.createDataFrame(
            [(i, i % 8) for i in range(64)], "k long, cell int"
        ).repartition(F.col("cell"))
        sn.snapshot_write_partitioned(spark, path, df, "cell")
        segs = sn._raw_manifest(path, 0)["files_segments"]
        meta = sn._raw_manifest(path, 0)["seg_meta"]
        assert len(segs) >= 3 and set(meta) == set(segs)
        assert all("pv" in meta[s] and "c" in meta[s] for s in segs)
        sn._SEG_CACHE.clear()
        loaded = self._trace_loads(monkeypatch, sn)
        got = {
            (r.k, r.cell)
            for r in sn.snapshot_read_partitioned(
                spark, path, values=[3]
            ).collect()
        }
        assert got == {(i, 3) for i in range(64) if i % 8 == 3}
        assert set(loaded) and set(loaded) < set(segs), (loaded, segs)

    def test_range_read_opens_segment_subset(
        self, spark, tmp_path, monkeypatch
    ):
        sn = self._lower(monkeypatch)
        path = str(tmp_path / "s")
        df = spark.range(0, 64).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("t")
        )
        sn.snapshot_write_sorted(spark, path, df, "t", n_files=8)
        raw = sn._raw_manifest(path, 0)
        segs = raw["files_segments"]
        assert len(segs) >= 3
        assert all(
            "lo" in raw["seg_meta"][s] and "hi" in raw["seg_meta"][s]
            for s in segs
        )
        sn._SEG_CACHE.clear()
        loaded = self._trace_loads(monkeypatch, sn)
        got = sorted(
            r.t for r in sn.snapshot_read_range(spark, path, 100, 150).collect()
        )
        assert got == [100, 110, 120, 130, 140, 150]
        assert set(loaded) and set(loaded) < set(segs), (loaded, segs)

    def test_point_read_opens_segment_subset(
        self, spark, tmp_path, monkeypatch
    ):
        sn = self._lower(monkeypatch)
        path = str(tmp_path / "b")
        # cluster values by file so segment union bitmaps are sparse
        df = spark.range(0, 64).select(
            F.col("id").alias("k"), (F.col("id") % 13).alias("v")
        ).repartitionByRange(8, "k")
        sn.snapshot_write_bloom(spark, path, df, "k")
        raw = sn._raw_manifest(path, 0)
        segs = raw["files_segments"]
        assert len(segs) >= 3
        assert all("bb" in raw["seg_meta"][s] for s in segs)
        sn._SEG_CACHE.clear()
        loaded = self._trace_loads(monkeypatch, sn)
        got = [r.v for r in sn.snapshot_read_point(spark, path, 37).collect()]
        assert got == [37 % 13]
        assert set(loaded) and set(loaded) < set(segs), (loaded, segs)

    def test_unpruned_read_still_resolves_everything(
        self, spark, tmp_path, monkeypatch
    ):
        """values=None takes the full resolve — headers must never
        shrink an unpruned read."""
        sn = self._lower(monkeypatch)
        path = str(tmp_path / "p")
        df = spark.createDataFrame(
            [(i, i % 8) for i in range(64)], "k long, cell int"
        ).repartition(F.col("cell"))
        sn.snapshot_write_partitioned(spark, path, df, "cell")
        got = {
            (r.k, r.cell)
            for r in sn.snapshot_read_partitioned(spark, path).collect()
        }
        assert got == {(i, i % 8) for i in range(64)}

    def test_nothing_admitted_serves_schema_probe(
        self, spark, tmp_path, monkeypatch
    ):
        """A probe no segment can match still serves the committed
        schema with zero rows (the full-resolve contract), via the
        probe-segment guarantee."""
        sn = self._lower(monkeypatch)
        path = str(tmp_path / "p")
        df = spark.createDataFrame(
            [(i, i % 8) for i in range(64)], "k long, cell int"
        ).repartition(F.col("cell"))
        sn.snapshot_write_partitioned(spark, path, df, "cell")
        out = sn.snapshot_read_partitioned(spark, path, values=[99])
        assert out.count() == 0
        assert set(out.columns) == {"k", "cell"}


class TestSegmentCrashAndRetention:
    """r14 verdict ask #6: segment files under crash injection and
    long-history retention — a segment written by a commit that died
    before its manifest link landed is invisible and reclaimed only
    past the retention window; tag-retained and restored versions pin
    their segments through vacuum."""

    def _lower(self, monkeypatch):
        from end_to_end_data_engineering_pipeline_spark.operators import (
            snapshots,
        )

        monkeypatch.setattr(snapshots, "SEGMENT_MIN_FILES", 4)
        monkeypatch.setattr(snapshots, "SEGMENT_TARGET", 3)
        return snapshots

    def test_crashed_commit_segment_invisible_then_reclaimed(
        self, spark, tmp_path, monkeypatch
    ):
        """Crash injection: a segment lands in _versions/segments/
        but the manifest that would reference it never does (the
        commit died between _write_segment and the v{N}.json link).
        Readers never see it; a vacuum INSIDE the retention window
        must keep it (the commit could still be in flight); a vacuum
        past the window reclaims exactly it."""
        import os as _os

        sn = self._lower(monkeypatch)
        path = str(tmp_path / "t")
        df = spark.range(0, 60).select(F.col("id").alias("k")).repartition(6)
        sn.snapshot_write(spark, path, df)
        live_segs = set(sn._raw_manifest(path, 0)["files_segments"])
        # the crashed commit's segment: written directly, never linked
        orphan = sn._write_segment(
            path, [["zz-crashed-00000.parquet", {}]]
        )
        assert orphan not in live_segs
        assert sn.snapshot_read(spark, path).count() == 60
        # within the retention window: kept (commit may be in flight)
        sn.vacuum(path, keep_last=1, retention_seconds=86400.0)
        assert _os.path.exists(
            _os.path.join(sn._segments_dir(path), orphan)
        )
        # past the window: reclaimed, live segments untouched
        sn.vacuum(path, keep_last=1, retention_seconds=0.0)
        left = set(_os.listdir(sn._segments_dir(path)))
        assert orphan not in left
        assert left == live_segs
        assert sn.snapshot_read(spark, path).count() == 60

    def test_tagged_version_pins_segments_until_tag_deleted(
        self, spark, tmp_path, monkeypatch
    ):
        import os as _os

        sn = self._lower(monkeypatch)
        path = str(tmp_path / "t")
        a = spark.range(0, 40).select(F.col("id").alias("k")).repartition(5)
        sn.snapshot_write(spark, path, a)
        segs0 = set(sn._raw_manifest(path, 0)["files_segments"])
        sn.snapshot_tag(path, "release", 0)
        b = spark.range(100, 140).select(F.col("id").alias("k")).repartition(5)
        sn.snapshot_write(spark, path, b, mode="overwrite")
        segs1 = set(sn._raw_manifest(path, 1)["files_segments"])
        # keep_last=1 would drop v0, but the tag pins it — and its
        # segments must survive with it
        sn.vacuum(path, keep_last=1, retention_seconds=0.0)
        left = set(_os.listdir(sn._segments_dir(path)))
        assert segs0 <= left and segs1 <= left
        assert sn.snapshot_read_tag(spark, path, "release").count() == 40
        # releasing the tag releases the segments on the next sweep
        sn.snapshot_delete_tag(path, "release")
        sn.vacuum(path, keep_last=1, retention_seconds=0.0)
        left = set(_os.listdir(sn._segments_dir(path)))
        assert left == segs1
        assert sn.snapshot_read(spark, path).count() == 40

    def test_restore_pins_restored_segments_through_vacuum(
        self, spark, tmp_path, monkeypatch
    ):
        import os as _os

        sn = self._lower(monkeypatch)
        path = str(tmp_path / "t")
        a = spark.range(0, 40).select(F.col("id").alias("k")).repartition(5)
        sn.snapshot_write(spark, path, a)
        b = spark.range(100, 140).select(F.col("id").alias("k")).repartition(5)
        sn.snapshot_write(spark, path, b, mode="overwrite")
        v2 = sn.snapshot_restore(path, 0)
        # the restored manifest references v0's files; vacuum keeping
        # only the restore must keep those segments/files alive
        sn.vacuum(path, keep_last=1, retention_seconds=0.0)
        assert sn.list_versions(path) == [v2]
        assert {r.k for r in sn.snapshot_read(spark, path).collect()} == set(
            range(0, 40)
        )
        # v1's exclusive segments are gone
        live_segs = set(sn._raw_manifest(path, v2)["files_segments"])
        left = set(_os.listdir(sn._segments_dir(path)))
        assert left == live_segs


class TestBloomDmlExecTier:
    """r14 verdict ask #4 (measured in
    docs/probes/bloom_dml_exec_probe.py): past BLOOM_DML_MAX_KEYS the
    bitmap test runs executor-side instead of declining — vectorized
    per-file gathers over a broadcast position table — gated by a
    saturation sample so a key set that would admit everything falls
    straight through to the scan."""

    def _selective_table(self, spark, tmp_path):
        from end_to_end_data_engineering_pipeline_spark.operators import (
            snapshots as sn,
        )

        path = str(tmp_path / "t")
        df = (
            spark.range(0, 4000)
            .selectExpr("id AS k", "id % 7 AS v")
            .repartitionByRange(40, "k")
        )
        sn.snapshot_write_bloom(spark, path, df, "k")
        return sn, path

    def test_exec_tier_prunes_and_delete_stays_exact(
        self, spark, tmp_path
    ):
        sn, path = self._selective_table(spark, tmp_path)
        m = sn._manifest(path, 0)
        # 300 distinct keys: past the 256 driver budget, well under
        # the exec budget, clustered in ~3 of 40 files
        keys = spark.range(1000, 1300).selectExpr("id AS k")
        pruned = sn._bloom_dml_prune(
            spark, m, keys, ["k"], list(m["files"])
        )
        truly = {
            f
            for f in m["files"]
            if int(m["stats"][f][0]) <= 1299 and int(m["stats"][f][1]) >= 1000
        } if "stats" in m else None
        assert set(pruned) < set(m["files"]), "exec tier did not prune"
        if truly is not None:
            assert truly <= set(pruned)
        # end-to-end: the MoR delete through the exec tier is exact
        v1 = sn.snapshot_delete_mor(spark, path, keys, ["k"])
        got = {r.k for r in sn.snapshot_read(spark, path, v1).collect()}
        assert got == set(range(0, 1000)) | set(range(1300, 4000))

    def test_saturated_index_declines(self, spark, tmp_path, monkeypatch):
        """When the sampled admission rate exceeds the saturation
        threshold the prune returns cand unchanged — no job runs."""
        import base64 as _b64

        from end_to_end_data_engineering_pipeline_spark.operators import (
            snapshots as sn,
        )

        full = _b64.b64encode(b"\xff" * 1024).decode("ascii")
        m = {
            "bloom": {
                "col": "k",
                "type": "bigint",
                "m": 8192,
                "k": 3,
                "files": {f"f{i}": full for i in range(40)},
            }
        }
        keys = spark.range(0, 300).selectExpr("id AS k")
        called = []
        real = sn.SparkSession  # anchor to assert no createDataFrame job

        def no_job(*a, **kw):  # pragma: no cover - would fail the test
            called.append(1)
            raise AssertionError("prune job ran on a saturated index")

        monkeypatch.setattr(
            spark, "createDataFrame", no_job
        )
        cand = [f"f{i}" for i in range(40)]
        try:
            out = sn._bloom_dml_prune(spark, m, keys, ["k"], cand)
        finally:
            monkeypatch.undo()
        assert out == cand and not called
        _ = real


class TestSnapshotBranches:
    """r15: Iceberg-style branches — an isolated commit line under
    _versions/branches/<name>/ sharing the table's data/, invisible
    to main readers by construction, published only by fast-forward
    (which refuses a diverged base)."""

    def _sn(self):
        from end_to_end_data_engineering_pipeline_spark.operators import (
            snapshots as sn,
        )

        return sn

    def test_branch_lifecycle_and_main_isolation(self, spark, tmp_path):
        sn = self._sn()
        t = str(tmp_path / "t")
        sn.snapshot_write(
            spark, t, spark.createDataFrame([(1, "a")], "k long, v string")
        )
        base = sn.snapshot_branch(t, "audit")
        assert base == 0
        # no commits yet: branch head == base
        assert {(r.k, r.v) for r in sn.snapshot_read_branch(spark, t, "audit").collect()} == {(1, "a")}
        b0 = sn.snapshot_write_branch(
            spark, t, "audit",
            spark.createDataFrame([(2, "b")], "k long, v string"),
        )
        b1 = sn.snapshot_write_branch(
            spark, t, "audit",
            spark.createDataFrame([(3, "c")], "k long, v string"),
        )
        assert (b0, b1) == (0, 1)
        # branch sees base + both commits; MAIN is untouched
        got = {(r.k, r.v) for r in sn.snapshot_read_branch(spark, t, "audit").collect()}
        assert got == {(1, "a"), (2, "b"), (3, "c")}
        assert sn.current_version(t) == 0
        assert {(r.k, r.v) for r in sn.snapshot_read(spark, t).collect()} == {(1, "a")}
        # branch-local time travel
        at0 = {(r.k, r.v) for r in sn.snapshot_read_branch(spark, t, "audit", version=0).collect()}
        assert at0 == {(1, "a"), (2, "b")}
        assert sn.snapshot_branches(t) == {
            "audit": {"base": 0, "head": 1, "commits": 2}
        }
        # fast-forward publishes the head as main v1 (metadata-only)
        v1 = sn.snapshot_fast_forward(t, "audit")
        assert v1 == 1 and sn.current_version(t) == 1
        assert {(r.k, r.v) for r in sn.snapshot_read(spark, t).collect()} == got

    def test_fast_forward_refuses_diverged_base(self, spark, tmp_path):
        import pytest as _pytest

        sn = self._sn()
        t = str(tmp_path / "t")
        sn.snapshot_write(
            spark, t, spark.createDataFrame([(1, "a")], "k long, v string")
        )
        sn.snapshot_branch(t, "audit")
        sn.snapshot_write_branch(
            spark, t, "audit",
            spark.createDataFrame([(2, "b")], "k long, v string"),
        )
        # main advances past the base: fast-forward must refuse
        sn.snapshot_write(
            spark, t, spark.createDataFrame([(9, "z")], "k long, v string")
        )
        with _pytest.raises(sn.SnapshotConflict, match="forked at"):
            sn.snapshot_fast_forward(t, "audit")
        # main's content is exactly its own line
        assert {r.k for r in sn.snapshot_read(spark, t).collect()} == {1, 9}

    def test_branch_delete_releases_files_and_base_is_pinned(
        self, spark, tmp_path
    ):
        sn = self._sn()
        t = str(tmp_path / "t")
        sn.snapshot_write(
            spark, t, spark.createDataFrame([(1, "a")], "k long, v string")
        )
        sn.snapshot_branch(t, "audit")
        sn.snapshot_write_branch(
            spark, t, "audit",
            spark.createDataFrame([(2, "b")], "k long, v string"),
        )
        branch_files = set(
            sn._branch_head_manifest(t, "audit")["files"]
        ) - set(sn._manifest(t, 0)["files"])
        # main advances twice; keep_last=1 would drop v0, but v0 is a
        # branch BASE — pinned like a tag, and the branch's own files
        # survive the sweep
        sn.snapshot_write(
            spark, t, spark.createDataFrame([(9, "z")], "k long, v string"),
            mode="overwrite",
        )
        deleted = sn.vacuum(t, keep_last=1, retention_seconds=0.0)
        assert sn.list_versions(t)[0] == 0  # base retained
        assert not (branch_files & set(deleted))
        assert {r.k for r in sn.snapshot_read_branch(spark, t, "audit").collect()} == {1, 2}
        # deleting the branch releases base + branch files on the
        # next sweep
        sn.snapshot_branch_delete(t, "audit")
        deleted2 = sn.vacuum(t, keep_last=1, retention_seconds=0.0)
        assert branch_files <= set(deleted2)
        assert sn.list_versions(t) == [1]
        with _raises_filenotfound():
            sn.snapshot_read_branch(spark, t, "audit")

    def test_branch_carries_mor_vectors(self, spark, tmp_path):
        """Branching a table with live MoR delete vectors must keep
        the tombstones in force on the branch — an append that
        dropped the vector list would resurrect deleted rows."""
        sn = self._sn()
        t = str(tmp_path / "t")
        sn.snapshot_write(
            spark, t,
            spark.createDataFrame(
                [(i, f"v{i}") for i in range(6)], "k long, v string"
            ),
        )
        keys = spark.createDataFrame([(2,), (4,)], "k long")
        sn.snapshot_delete_mor(spark, t, keys, ["k"])
        sn.snapshot_branch(t, "audit")
        sn.snapshot_write_branch(
            spark, t, "audit",
            spark.createDataFrame([(10, "x")], "k long, v string"),
        )
        got = {r.k for r in sn.snapshot_read_branch(spark, t, "audit").collect()}
        assert got == {0, 1, 3, 5, 10}

    def test_branch_refuses_indexed_flavors(self, spark, tmp_path):
        """r16: single-spec partitioned heads commit (see
        TestPartitionedBranches); range-clustered and bloom-indexed
        heads still refuse."""
        import pytest as _pytest

        sn = self._sn()
        t = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(1, 0), (2, 1)], "k long, cell int"
        ).repartitionByRange(2, "k")
        sn.snapshot_write_sorted(spark, t, df, "k", n_files=2)
        sn.snapshot_branch(t, "audit")
        with _pytest.raises(ValueError, match="partitioned manifests only"):
            sn.snapshot_write_branch(
                spark, t, "audit",
                spark.createDataFrame([(3, 2)], "k long, cell int"),
            )
        t2 = str(tmp_path / "b")
        sn.snapshot_write_bloom(spark, t2, df, "k")
        sn.snapshot_branch(t2, "audit")
        with _pytest.raises(ValueError, match="partitioned manifests only"):
            sn.snapshot_write_branch(
                spark, t2, "audit",
                spark.createDataFrame([(3, 2)], "k long, cell int"),
            )


def _raises_filenotfound():
    import pytest as _pytest

    return _pytest.raises(FileNotFoundError)


class TestBranchRebase:
    """r15: squash-rebase makes fast-forward's divergence refusal
    actionable — an append-only branch grafts its added files onto
    the moved base as one collapsed metadata-only commit."""

    def _sn(self):
        from end_to_end_data_engineering_pipeline_spark.operators import (
            snapshots as sn,
        )

        return sn

    def test_rebase_then_fast_forward(self, spark, tmp_path):
        import pytest as _pytest

        sn = self._sn()
        t = str(tmp_path / "t")
        sn.snapshot_write(
            spark, t, spark.createDataFrame([(1, "a")], "k long, v string")
        )
        sn.snapshot_branch(t, "audit")
        sn.snapshot_write_branch(
            spark, t, "audit",
            spark.createDataFrame([(2, "b")], "k long, v string"),
        )
        # main advances: ff refuses, rebase grafts, ff succeeds
        sn.snapshot_write(
            spark, t, spark.createDataFrame([(9, "z")], "k long, v string")
        )
        with _pytest.raises(sn.SnapshotConflict):
            sn.snapshot_fast_forward(t, "audit")
        new_base = sn.snapshot_branch_rebase(t, "audit")
        assert new_base == 1
        got = {(r.k, r.v) for r in sn.snapshot_read_branch(spark, t, "audit").collect()}
        assert got == {(1, "a"), (2, "b"), (9, "z")}
        v2 = sn.snapshot_fast_forward(t, "audit")
        assert v2 == 2
        assert {(r.k, r.v) for r in sn.snapshot_read(spark, t).collect()} == got

    def test_rebase_refuses_overwrite_line(self, spark, tmp_path):
        import pytest as _pytest

        sn = self._sn()
        t = str(tmp_path / "t")
        sn.snapshot_write(
            spark, t, spark.createDataFrame([(1, "a")], "k long, v string")
        )
        sn.snapshot_branch(t, "rewrite")
        sn.snapshot_write_branch(
            spark, t, "rewrite",
            spark.createDataFrame([(2, "b")], "k long, v string"),
            mode="overwrite",
        )
        sn.snapshot_write(
            spark, t, spark.createDataFrame([(9, "z")], "k long, v string")
        )
        with _pytest.raises(sn.SnapshotConflict, match="overwrite"):
            sn.snapshot_branch_rebase(t, "rewrite")

    def test_rebase_no_commits_repoints_only(self, spark, tmp_path):
        sn = self._sn()
        t = str(tmp_path / "t")
        sn.snapshot_write(
            spark, t, spark.createDataFrame([(1, "a")], "k long, v string")
        )
        sn.snapshot_branch(t, "idle")
        sn.snapshot_write(
            spark, t, spark.createDataFrame([(9, "z")], "k long, v string")
        )
        assert sn.snapshot_branch_rebase(t, "idle") == 1
        got = {r.k for r in sn.snapshot_read_branch(spark, t, "idle").collect()}
        assert got == {1, 9}
        assert sn.snapshot_branches(t)["idle"]["base"] == 1


class TestBranchCrashSafety:
    """r15 advice: the branch line must stay crash-safe-at-every-step
    like the rest of the module — creation's mkdir/BASE window, the
    rebase claim race, overwrite schema semantics, and vacuum's
    tolerance of corrupt branch metadata."""

    def _sn(self):
        from end_to_end_data_engineering_pipeline_spark.operators import (
            snapshots as sn,
        )

        return sn

    def test_crashed_creation_invisible_and_recreatable(
        self, spark, tmp_path
    ):
        import os as _os

        import pytest as _pytest

        sn = self._sn()
        t = str(tmp_path / "t")
        sn.snapshot_write(
            spark, t, spark.createDataFrame([(1, "a")], "k long, v string")
        )
        # simulate a crash between mkdir and the BASE.json link
        _os.makedirs(_os.path.join(sn._branches_dir(t), "audit"))
        # the half-created dir is NOT a branch: listings skip it...
        assert sn.snapshot_branches(t) == {}
        # ...and the name is not poisoned — re-create adopts the dir
        assert sn.snapshot_branch(t, "audit") == 0
        assert sn.snapshot_branches(t) == {
            "audit": {"base": 0, "head": None, "commits": 0}
        }
        # a real duplicate still loses
        with _pytest.raises(ValueError, match="already exists"):
            sn.snapshot_branch(t, "audit")

    def test_overwrite_branch_drops_schema_key(self, spark, tmp_path):
        sn = self._sn()
        t = str(tmp_path / "t")
        sn.snapshot_write(
            spark, t, spark.createDataFrame([(1, "a")], "k long, v string")
        )
        # evolve main so its manifest records a union schema (k, v, w)
        sn.snapshot_merge(
            spark, t,
            spark.createDataFrame(
                [(2, "b", 7.0)], "k long, v string, w double"
            ),
            keys=["k"],
        )
        sn.snapshot_branch(t, "rw")
        # a branch APPEND keeps carrying the evolved union schema...
        sn.snapshot_write_branch(
            spark, t, "rw",
            spark.createDataFrame([(4, "d")], "k long, v string"),
        )
        assert "w" in {
            f["name"]
            for f in sn._branch_head_manifest(t, "rw")["schema"]["fields"]
        }
        # ...but an OVERWRITE replaces the table: df's own schema
        # governs, the evolved union must NOT persist (main
        # snapshot_write overwrite semantics)
        sn.snapshot_write_branch(
            spark, t, "rw",
            spark.createDataFrame([(3,)], "k long"),
            mode="overwrite",
        )
        head = sn._branch_head_manifest(t, "rw")
        assert "schema" not in head
        v = sn.snapshot_fast_forward(t, "rw")
        df = sn.snapshot_read(spark, t, version=v)
        assert df.columns == ["k"]
        assert {r.k for r in df.collect()} == {3}

    def test_rebase_claim_race_raises_conflict(self, spark, tmp_path):
        import os as _os

        import pytest as _pytest

        sn = self._sn()
        t = str(tmp_path / "t")
        sn.snapshot_write(
            spark, t, spark.createDataFrame([(1, "a")], "k long, v string")
        )
        sn.snapshot_branch(t, "audit")
        sn.snapshot_write_branch(
            spark, t, "audit",
            spark.createDataFrame([(2, "b")], "k long, v string"),
        )
        sn.snapshot_write(
            spark, t, spark.createDataFrame([(9, "z")], "k long, v string")
        )
        # a concurrent snapshot_write_branch wins the v1 claim in the
        # window between the rebase's version read and its link: drop
        # the winner's manifest just before the rebase's own link call
        d = sn._branch_dir(t, "audit")
        real_link = _os.link

        def racing_link(src, dst, **kw):
            if dst.endswith("v1.json") and not _os.path.exists(dst):
                with open(dst, "w") as fh:
                    fh.write("{}")
            return real_link(src, dst, **kw)

        monkeypatch = _pytest.MonkeyPatch()
        try:
            monkeypatch.setattr(sn.os, "link", racing_link)
            with _pytest.raises(
                sn.SnapshotConflict, match="advanced during"
            ):
                sn.snapshot_branch_rebase(t, "audit")
        finally:
            monkeypatch.undo()
        # no dot-temp manifest leaked
        assert [n for n in _os.listdir(d) if n.startswith(".v")] == []

    def test_vacuum_survives_corrupt_base_json(self, spark, tmp_path):
        import os as _os

        sn = self._sn()
        t = str(tmp_path / "t")
        for k in (1, 2, 3):
            sn.snapshot_write(
                spark, t,
                spark.createDataFrame([(k, "x")], "k long, v string"),
            )
        sn.snapshot_branch(t, "aud", version=0)
        with open(
            _os.path.join(sn._branch_dir(t, "aud"), "BASE.json"), "w"
        ) as fh:
            fh.write("not json{{{")
        # runnable, and conservative: unknowable base pins EVERYTHING
        sn.vacuum(t, keep_last=1, retention_seconds=0.0)
        assert sn.list_versions(t) == [0, 1, 2]
        assert {r.k for r in sn.snapshot_read(spark, t, version=0).collect()} == {1}

    def test_vacuum_survives_corrupt_branch_manifest(
        self, spark, tmp_path
    ):
        import os as _os

        sn = self._sn()
        t = str(tmp_path / "t")
        sn.snapshot_write(
            spark, t, spark.createDataFrame([(1, "a")], "k long, v string")
        )
        sn.snapshot_branch(t, "aud")
        sn.snapshot_write_branch(
            spark, t, "aud",
            spark.createDataFrame([(2, "b")], "k long, v string"),
        )
        sn.snapshot_write(
            spark, t, spark.createDataFrame([(9, "z")], "k long, v string")
        )
        n_data = len(_os.listdir(sn._data_dir(t)))
        with open(
            _os.path.join(sn._branch_dir(t, "aud"), "v0.json"), "w"
        ) as fh:
            fh.write("}corrupt")
        # runnable, but DATA deletion aborts: the corrupt manifest's
        # file references are unknowable, so no data file may sweep
        deleted = sn.vacuum(t, keep_last=1, retention_seconds=0.0)
        assert deleted == []
        assert len(_os.listdir(sn._data_dir(t))) == n_data


class TestDmlSaturationSample:
    """r15 verdict ask #6: the saturation estimate must not alias
    with admission patterns that cluster in commit (name) order."""

    def test_hash_order_defeats_periodic_admission(self):
        from end_to_end_data_engineering_pipeline_spark.operators import (
            snapshots as sn,
        )

        # 6400 files; the old stride sample (step=100) would pick
        # exactly the i%100==0 names — if those are the only admitting
        # files, it estimated 100% admission on a 1%-selective index
        cand = [f"part-{i:06d}.parquet" for i in range(6400)]
        sample = sn._dml_sample(cand)
        assert len(sample) == sn._BLOOM_DML_SAMPLE
        assert sample == sn._dml_sample(list(reversed(cand)))  # order-free
        periodic_hits = sum(
            1 for f in sample if int(f[5:11]) % 100 == 0
        )
        # expected ~0.64 of 64 under a uniform draw; 12 = p<<1e-9
        assert periodic_hits <= 12


class TestBranchCherrypick:
    """r16: Iceberg's cherrypick_snapshot — publish ONE branch commit
    onto moved main; the single-commit complement to rebase."""

    def _sn(self):
        from end_to_end_data_engineering_pipeline_spark.operators import (
            snapshots as sn,
        )

        return sn

    def _diverged(self, spark, tmp_path):
        """main v0 (1,a) → branch 'audit' with two appends (2,b) then
        (3,c) → main advances to v1 with (9,z)."""
        sn = self._sn()
        t = str(tmp_path / "t")
        sn.snapshot_write(
            spark, t, spark.createDataFrame([(1, "a")], "k long, v string")
        )
        sn.snapshot_branch(t, "audit")
        for row in [(2, "b"), (3, "c")]:
            sn.snapshot_write_branch(
                spark, t, "audit",
                spark.createDataFrame([row], "k long, v string"),
            )
        sn.snapshot_write(
            spark, t, spark.createDataFrame([(9, "z")], "k long, v string")
        )
        return sn, t

    def test_single_commit_applies_onto_moved_main(self, spark, tmp_path):
        import pytest as _pytest

        sn, t = self._diverged(spark, tmp_path)
        with _pytest.raises(sn.SnapshotConflict):
            sn.snapshot_fast_forward(t, "audit")  # diverged: refused
        # pick ONLY the second audit commit (branch-local v1 = (3,c))
        v = sn.snapshot_cherrypick(t, "audit", 1)
        assert v == 2
        got = {(r.k, r.v) for r in sn.snapshot_read(spark, t).collect()}
        assert got == {(1, "a"), (9, "z"), (3, "c")}  # not (2,b)
        m = sn._manifest(t, 2)
        assert m["extra"]["cherrypick_from"] == "audit@v1"
        # the branch line itself is untouched
        assert sn.snapshot_branches(t)["audit"]["commits"] == 2

    def test_first_commit_delta_is_vs_base(self, spark, tmp_path):
        sn, t = self._diverged(spark, tmp_path)
        sn.snapshot_cherrypick(t, "audit", 0)
        got = {(r.k, r.v) for r in sn.snapshot_read(spark, t).collect()}
        assert got == {(1, "a"), (9, "z"), (2, "b")}

    def test_double_pick_refused(self, spark, tmp_path):
        import pytest as _pytest

        sn, t = self._diverged(spark, tmp_path)
        sn.snapshot_cherrypick(t, "audit", 1)
        with _pytest.raises(sn.SnapshotConflict, match="conflicting file"):
            sn.snapshot_cherrypick(t, "audit", 1)

    def test_fast_forwarded_commit_refused(self, spark, tmp_path):
        import pytest as _pytest

        sn = self._sn()
        t = str(tmp_path / "t")
        sn.snapshot_write(
            spark, t, spark.createDataFrame([(1, "a")], "k long, v string")
        )
        sn.snapshot_branch(t, "audit")
        sn.snapshot_write_branch(
            spark, t, "audit",
            spark.createDataFrame([(2, "b")], "k long, v string"),
        )
        sn.snapshot_fast_forward(t, "audit")
        # the commit's files are live on main now: a pick double-counts
        with _pytest.raises(sn.SnapshotConflict, match="conflicting file"):
            sn.snapshot_cherrypick(t, "audit", 0)

    def test_overwrite_commit_refused(self, spark, tmp_path):
        import pytest as _pytest

        sn = self._sn()
        t = str(tmp_path / "t")
        sn.snapshot_write(
            spark, t, spark.createDataFrame([(1, "a")], "k long, v string")
        )
        sn.snapshot_branch(t, "rw")
        sn.snapshot_write_branch(
            spark, t, "rw",
            spark.createDataFrame([(2, "b")], "k long, v string"),
            mode="overwrite",
        )
        sn.snapshot_write(
            spark, t, spark.createDataFrame([(9, "z")], "k long, v string")
        )
        with _pytest.raises(sn.SnapshotConflict, match="overwrite"):
            sn.snapshot_cherrypick(t, "rw", 0)

    def test_unknown_version_and_empty_delta(self, spark, tmp_path):
        import pytest as _pytest

        sn, t = self._diverged(spark, tmp_path)
        with _pytest.raises(FileNotFoundError):
            sn.snapshot_cherrypick(t, "audit", 7)

    def test_vacuum_and_tag_interaction(self, spark, tmp_path):
        import os as _os

        sn, t = self._diverged(spark, tmp_path)
        picked_delta = set(
            sn._branch_head_manifest(t, "audit")["files"]
        ) - set(
            json.loads(
                open(
                    _os.path.join(sn._branch_dir(t, "audit"), "v0.json")
                ).read()
            )["files"]
        )
        unpicked_delta = set(
            json.loads(
                open(
                    _os.path.join(sn._branch_dir(t, "audit"), "v0.json")
                ).read()
            )["files"]
        ) - set(sn._manifest(t, 0)["files"])
        v = sn.snapshot_cherrypick(t, "audit", 1)
        sn.snapshot_tag(t, "picked", v)
        # branch gone: its unpicked files release; the picked delta is
        # referenced by MAIN now (and pinned by the tag regardless of
        # later overwrites), so vacuum must never reclaim it
        sn.snapshot_branch_delete(t, "audit")
        sn.snapshot_write(
            spark, t,
            spark.createDataFrame([(0, "o")], "k long, v string"),
            mode="overwrite",
        )
        sn.vacuum(t, keep_last=1, retention_seconds=0.0)
        left = set(_os.listdir(sn._data_dir(t)))
        assert picked_delta <= left
        assert not (unpicked_delta & left)
        # the tagged cherry-picked version still reads exactly
        got = {(r.k, r.v) for r in sn.snapshot_read(spark, t, version=v).collect()}
        assert got == {(1, "a"), (9, "z"), (3, "c")}


class TestSegmentHeadersEvolvedAndWideFanout:
    """r15 verdict ask #1: segment pruning headers must cover the
    long-lived-table shapes that previously fell back to full
    materialization — evolved partition specs (per-spec value lists /
    ``ss`` membership) and >SEG_SUMMARY_MAX_VALUES fan-out (bounded
    partition bloom)."""

    def _lower(self, monkeypatch):
        from end_to_end_data_engineering_pipeline_spark.operators import (
            snapshots,
        )

        monkeypatch.setattr(snapshots, "SEGMENT_MIN_FILES", 4)
        monkeypatch.setattr(snapshots, "SEGMENT_TARGET", 2)
        return snapshots

    def _trace_loads(self, monkeypatch, sn):
        loaded: list[str] = []
        real = sn._load_segment

        def spy(path, name):
            loaded.append(name)
            return real(path, name)

        monkeypatch.setattr(sn, "_load_segment", spy)
        return loaded

    def _evolved(self, spark, sn, path):
        """spec 0 = cell (8 values x 2 files), spec 1 = tag (4
        values), all above the (patched) segment threshold."""
        a = spark.createDataFrame(
            [(i, i % 8, f"t{i % 4}", i * 10) for i in range(16)],
            "id long, cell int, tag string, v long",
        ).repartition(F.col("cell"))
        sn.snapshot_write_partitioned(spark, path, a, "cell")
        b = spark.createDataFrame(
            [(100 + i, i % 8, f"t{i % 4}", i) for i in range(8)],
            "id long, cell int, tag string, v long",
        ).repartition(F.col("tag"))
        sn.snapshot_write_partitioned(
            spark, path, b, "tag", mode="append", evolve=True
        )

    def test_evolved_spec_read_opens_segment_subset(
        self, spark, tmp_path, monkeypatch
    ):
        sn = self._lower(monkeypatch)
        path = str(tmp_path / "t")
        self._evolved(spark, sn, path)
        raw = sn._raw_manifest(path, 1)
        segs = raw["files_segments"]
        meta = raw["seg_meta"]
        assert len(segs) >= 3
        # every header is new-format: spec membership + per-spec values
        assert all("ss" in meta[s] for s in segs)
        assert all("pvs" in meta[s] or "pb" in meta[s] for s in segs)
        assert all("pv" not in meta[s] for s in segs)
        sn._SEG_CACHE.clear()
        loaded = self._trace_loads(monkeypatch, sn)
        got = {
            (r.id, r.cell)
            for r in sn.snapshot_read_partitioned(
                spark, path, values=[3], col="cell"
            ).collect()
        }
        assert got == {(i, 3) for i in range(16) if i % 8 == 3} | {
            (100 + i, 3) for i in range(8) if i % 8 == 3
        }
        assert set(loaded) and set(loaded) < set(segs), (loaded, segs)

    def test_evolved_other_spec_segments_stay_admitted(
        self, spark, tmp_path, monkeypatch
    ):
        """A col-targeted read must still resolve every segment that
        holds OTHER specs' files — those files are admitted in full
        at file level, so dropping their segment would lose rows."""
        sn = self._lower(monkeypatch)
        path = str(tmp_path / "t")
        self._evolved(spark, sn, path)
        got = {
            (r.id, r.tag)
            for r in sn.snapshot_read_partitioned(
                spark, path, values=["t1"], col="tag"
            ).collect()
        }
        # spec-0 files (cell-partitioned) contribute their t1 rows via
        # the residual filter; spec-1 files prune by manifest value
        assert got == {(i, "t1") for i in range(16) if i % 4 == 1} | {
            (100 + i, "t1") for i in range(8) if i % 4 == 1
        }

    def test_widefanout_prunes_via_partition_bloom(
        self, spark, tmp_path, monkeypatch
    ):
        sn = self._lower(monkeypatch)
        monkeypatch.setattr(sn, "SEGMENT_TARGET", 4)
        monkeypatch.setattr(sn, "SEG_SUMMARY_MAX_VALUES", 2)
        path = str(tmp_path / "w")
        df = spark.createDataFrame(
            [(i, i % 16) for i in range(64)], "k long, cell int"
        ).repartition(F.col("cell"))
        sn.snapshot_write_partitioned(spark, path, df, "cell")
        raw = sn._raw_manifest(path, 0)
        segs = raw["files_segments"]
        meta = raw["seg_meta"]
        assert len(segs) >= 3
        # 4 files x 1 value each = 4 distinct values > cap 2: bloom
        assert any("pb" in meta[s] for s in segs)
        assert all("pv" not in meta[s] or len(meta[s]["pv"]) <= 2 for s in segs)
        sn._SEG_CACHE.clear()
        loaded = self._trace_loads(monkeypatch, sn)
        got = {
            (r.k, r.cell)
            for r in sn.snapshot_read_partitioned(
                spark, path, values=[5]
            ).collect()
        }
        assert got == {(i, 5) for i in range(64) if i % 16 == 5}
        assert set(loaded) and set(loaded) < set(segs), (loaded, segs)

    def test_evolved_widefanout_bloom_is_spec_qualified(
        self, spark, tmp_path, monkeypatch
    ):
        """Past the cap on an evolved table the bloom keys are
        sid|value — a value present under the OTHER spec only must
        not admit a target-spec segment through the bloom."""
        sn = self._lower(monkeypatch)
        monkeypatch.setattr(sn, "SEGMENT_TARGET", 4)
        monkeypatch.setattr(sn, "SEG_SUMMARY_MAX_VALUES", 2)
        path = str(tmp_path / "t")
        self._evolved(spark, sn, path)
        raw = sn._raw_manifest(path, 1)
        meta = raw["seg_meta"]
        assert any("pb" in h for h in meta.values())
        got = {
            (r.id, r.cell)
            for r in sn.snapshot_read_partitioned(
                spark, path, values=[6], col="cell"
            ).collect()
        }
        assert got == {(i, 6) for i in range(16) if i % 8 == 6} | {
            (100 + i, 6) for i in range(8) if i % 8 == 6
        }


def test_bloom_dml_chunked_early_exit_exact(spark, monkeypatch):
    """The chunked early-exit executor test must admit a file whose
    only matching key sits in the LAST block, and reject a file with
    no matching key — block boundaries change cost, never the
    answer."""
    import base64

    import numpy as np

    from end_to_end_data_engineering_pipeline_spark.operators import (
        snapshots as sn,
    )

    monkeypatch.setattr(sn, "_BLOOM_DML_CHUNK", 4)  # force many blocks
    # 2 of 3 candidates admit, which would trip the saturation
    # decline — disable the gate; this test pins the job's answer
    monkeypatch.setattr(sn, "BLOOM_DML_SATURATION", 1.1)
    m_bits = 256
    k = 2
    rng = np.random.default_rng(3)
    pos = rng.integers(0, m_bits, size=(23, k)).astype(np.int64)
    # file A's bitmap contains exactly the LAST key's positions
    bits = bytearray(m_bits >> 3)
    for p in pos[-1]:
        bits[p >> 3] |= 1 << (p & 7)
    enc_hit = base64.b64encode(bytes(bits)).decode("ascii")
    enc_miss = base64.b64encode(bytes(m_bits >> 3)).decode("ascii")
    b = {
        "col": "k",
        "type": "bigint",
        "m": m_bits,
        "k": k,
        "files": {"a": enc_hit, "b": enc_miss, "c": None},
    }
    out = sn._bloom_dml_prune_exec(spark, b, pos, ["a", "b", "c"])
    assert out == ["a", "c"]  # hit admits; None conservatively lives


class TestPartitionedBranches:
    """r16: branch commit lines on single-spec PARTITIONED tables —
    appends stage partitionBy under the committed spec, branch
    manifests carry the merged file->value map, reads keep manifest
    pruning, and fast-forward / rebase / cherry-pick republish full
    partition metadata (mismatched layouts refuse)."""

    def _sn(self):
        from end_to_end_data_engineering_pipeline_spark.operators import (
            snapshots as sn,
        )

        return sn

    def _seed(self, spark, sn, t):
        df = spark.createDataFrame(
            [(i, i % 4) for i in range(8)], "k long, cell int"
        ).repartition(F.col("cell"))
        sn.snapshot_write_partitioned(spark, t, df, "cell")

    def test_partitioned_branch_lifecycle(self, spark, tmp_path):
        sn = self._sn()
        t = str(tmp_path / "t")
        self._seed(spark, sn, t)
        sn.snapshot_branch(t, "audit")
        # a fresh branch of a partitioned table reads WITH the
        # partition column attached (pre-r16 this null-filled/dropped)
        got = {(r.k, r.cell) for r in sn.snapshot_read_branch(spark, t, "audit").collect()}
        assert got == {(i, i % 4) for i in range(8)}
        sn.snapshot_write_branch(
            spark, t, "audit",
            spark.createDataFrame([(100, 1), (101, 5)], "k long, cell int"),
        )
        m = sn._branch_head_manifest(t, "audit")
        assert m["part_col"] == "cell"
        assert set(m["partitions"]) == set(m["files"])
        # branch read: full and value-pruned
        got = {(r.k, r.cell) for r in sn.snapshot_read_branch(spark, t, "audit").collect()}
        assert got == {(i, i % 4) for i in range(8)} | {(100, 1), (101, 5)}
        pruned = {
            (r.k, r.cell)
            for r in sn.snapshot_read_branch(
                spark, t, "audit", values=[1]
            ).collect()
        }
        assert pruned == {(1, 1), (5, 1), (100, 1)}
        # main untouched; fast-forward republishes partition metadata
        assert sn.current_version(t) == 0
        v1 = sn.snapshot_fast_forward(t, "audit")
        mm = sn._manifest(t, v1)
        assert mm["part_col"] == "cell" and set(mm["partitions"]) == set(mm["files"])
        after = {
            (r.k, r.cell)
            for r in sn.snapshot_read_partitioned(spark, t, values=[5]).collect()
        }
        assert after == {(101, 5)}

    def test_partitioned_branch_overwrite_goes_plain(self, spark, tmp_path):
        sn = self._sn()
        t = str(tmp_path / "t")
        self._seed(spark, sn, t)
        sn.snapshot_branch(t, "rw")
        sn.snapshot_write_branch(
            spark, t, "rw",
            spark.createDataFrame([(7, 7)], "k long, cell int"),
            mode="overwrite",
        )
        m = sn._branch_head_manifest(t, "rw")
        assert "part_col" not in m  # main overwrite semantics: plain
        got = {(r.k, r.cell) for r in sn.snapshot_read_branch(spark, t, "rw").collect()}
        assert got == {(7, 7)}

    def test_partitioned_rebase_grafts_with_values(self, spark, tmp_path):
        sn = self._sn()
        t = str(tmp_path / "t")
        self._seed(spark, sn, t)
        sn.snapshot_branch(t, "audit")
        sn.snapshot_write_branch(
            spark, t, "audit",
            spark.createDataFrame([(100, 2)], "k long, cell int"),
        )
        # main advances under the same spec: rebase grafts
        sn.snapshot_write_partitioned(
            spark, t,
            spark.createDataFrame([(200, 3)], "k long, cell int"),
            "cell", mode="append",
        )
        assert sn.snapshot_branch_rebase(t, "audit") == 1
        m = sn._branch_head_manifest(t, "audit")
        assert m["part_col"] == "cell"
        assert set(m["partitions"]) == set(m["files"])
        got = {(r.k, r.cell) for r in sn.snapshot_read_branch(spark, t, "audit").collect()}
        assert got == {(i, i % 4) for i in range(8)} | {(100, 2), (200, 3)}
        v = sn.snapshot_fast_forward(t, "audit")
        pruned = {
            (r.k, r.cell)
            for r in sn.snapshot_read_partitioned(spark, t, values=[2], version=v).collect()
        }
        assert pruned == {(2, 2), (6, 2), (100, 2)}

    def test_partitioned_cherrypick_carries_values(self, spark, tmp_path):
        sn = self._sn()
        t = str(tmp_path / "t")
        self._seed(spark, sn, t)
        sn.snapshot_branch(t, "audit")
        for row in [(100, 0), (101, 1)]:
            sn.snapshot_write_branch(
                spark, t, "audit",
                spark.createDataFrame([row], "k long, cell int"),
            )
        sn.snapshot_write_partitioned(
            spark, t,
            spark.createDataFrame([(200, 3)], "k long, cell int"),
            "cell", mode="append",
        )
        v = sn.snapshot_cherrypick(t, "audit", 1)  # only (101, 1)
        m = sn._manifest(t, v)
        assert m["part_col"] == "cell" and set(m["partitions"]) == set(m["files"])
        got = {(r.k, r.cell) for r in sn.snapshot_read_partitioned(spark, t).collect()}
        assert got == {(i, i % 4) for i in range(8)} | {(200, 3), (101, 1)}

    def test_layout_mismatch_refuses(self, spark, tmp_path):
        import pytest as _pytest

        sn = self._sn()
        t = str(tmp_path / "t")
        # plain table, plain branch commit; main then becomes
        # partitioned via overwrite: graft/apply must refuse
        sn.snapshot_write(
            spark, t, spark.createDataFrame([(1, 0)], "k long, cell int")
        )
        sn.snapshot_branch(t, "audit")
        sn.snapshot_write_branch(
            spark, t, "audit",
            spark.createDataFrame([(2, 1)], "k long, cell int"),
        )
        sn.snapshot_write_partitioned(
            spark, t,
            spark.createDataFrame([(9, 2)], "k long, cell int"),
            "cell",
        )
        with _pytest.raises(sn.SnapshotConflict, match="layout"):
            sn.snapshot_branch_rebase(t, "audit")
        with _pytest.raises(sn.SnapshotConflict, match="layout"):
            sn.snapshot_cherrypick(t, "audit", 0)

    def test_evolved_spec_head_still_refuses(self, spark, tmp_path):
        import pytest as _pytest

        sn = self._sn()
        t = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(1, 0, "x")], "k long, cell int, tag string"
        )
        sn.snapshot_write_partitioned(spark, t, df, "cell")
        sn.snapshot_write_partitioned(
            spark, t, df, "tag", mode="append", evolve=True
        )
        sn.snapshot_branch(t, "audit")
        with _pytest.raises(ValueError, match="partitioned manifests only"):
            sn.snapshot_write_branch(spark, t, "audit", df)
        # but the no-commit branch READ of an evolved table works,
        # with both spec columns attached
        rows = [
            (r.k, r.cell, r.tag)
            for r in sn.snapshot_read_branch(spark, t, "audit").collect()
        ]
        assert sorted(rows) == [(1, 0, "x"), (1, 0, "x")]


def test_micros_ts_scope_refcounts_across_threads(spark):
    """r17: independent store commits may overlap from driver threads,
    and _micros_ts pins a PROCESS-GLOBAL session conf — the scope must
    refcount per session so the first exit can't unpin the timestamp
    type while a sibling's staging write is still planning, and the
    LAST exit must restore the pre-entry value."""
    from end_to_end_data_engineering_pipeline_spark.operators.snapshots import (
        _micros_ts,
    )

    key = "spark.sql.parquet.outputTimestampType"
    prev = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "INT96")
        with _micros_ts(spark):
            assert spark.conf.get(key) == "TIMESTAMP_MICROS"
            with _micros_ts(spark):
                assert spark.conf.get(key) == "TIMESTAMP_MICROS"
            # inner exit must NOT unpin while the outer scope is live
            assert spark.conf.get(key) == "TIMESTAMP_MICROS"
        assert spark.conf.get(key) == "INT96"
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
