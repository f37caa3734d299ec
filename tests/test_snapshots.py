"""Snapshot-versioned parquet table (operators/snapshots.py): commit
atomicity, time travel, overwrite-as-metadata, vacuum reclamation, and
crash-orphan invisibility."""

from __future__ import annotations

import json
import os

import pytest

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
    deleted = vacuum(t, keep_last=1)
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
    deleted = vacuum(t, keep_last=1)
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
    deleted = vacuum(t, keep_last=1)  # v1 references v0's files too
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
