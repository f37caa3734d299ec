"""Table maintenance for a parquet lake at 100 TB: small-file
compaction and sort-clustered writes.

Neither has a counterpart in the reference (its warehouse is Postgres,
where the storage engine owns layout — vacuum/CLUSTER are built in;
cf. dbt/dbt_project.yml full-rebuild materializations). A parquet lake
must own them explicitly:

- ``compact_partitions``: streaming ingestion (sources/rest.py appends
  one file set per batch) and partition-scoped MERGE both accrete
  small files; scan cost grows with file COUNT (driver listing, task
  scheduling, per-file open) long before it grows with bytes. This is
  Delta/Iceberg OPTIMIZE re-expressed over plain parquet: per
  partition, if the file count exceeds what the byte size justifies,
  rewrite that partition to ceil(bytes/target) files via a
  repartition write, atomically (stage + dir swap, the same
  self-read-hazard pattern as operators/merge.py). Partitions already
  compact are NOT rewritten — maintenance cost tracks the backlog,
  not the table.

- ``clustered_write``: parquet row-group/file min-max statistics prune
  IO only if values are clustered; a shuffled write scatters every key
  range across every file making the stats vacuous. Sorting within
  partitions before the write (Z-ORDER's 1-D case — for the common
  single-column range predicate) gives each file a narrow, mostly
  disjoint key range, so a point/range filter touches ~1 file instead
  of all of them. Verified in tests by reading the per-file footer
  stats with pyarrow: ranges must not all overlap.

Both are plain DataFrame/file ops — no UDFs, no driver-side row
iteration; the only driver work is file listing, which at cluster
scale is the metastore/manifest's job.
"""

from __future__ import annotations

import math
import os
import shutil
import time
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def _partition_dirs(path: str) -> list[str]:
    """Leaf hive partition dirs (key=value, recursing through
    multi-level partitioning) under path, or [path] itself for an
    unpartitioned table. Dot/underscore-prefixed dirs (compaction
    staging, Spark markers) are invisible, matching Spark's own
    path filter."""
    subs = [
        os.path.join(path, d)
        for d in sorted(os.listdir(path))
        if "=" in d
        and not d.startswith((".", "_"))
        and os.path.isdir(os.path.join(path, d))
    ]
    if not subs:
        return [path]
    out: list[str] = []
    for s in subs:
        out.extend(_partition_dirs(s))
    return out


_STAGE_PREFIX = ".__compact_"

# A staging dir younger than this is presumed to belong to a LIVE
# compaction and is never swept — running plan_compaction (or a second
# compact_partitions) concurrently with an in-flight run must not
# delete the live run's stage mid-write. One hour dwarfs any single
# partition rewrite; pass 0 to force-sweep in tests / after a known
# crash.
DEFAULT_SWEEP_MIN_AGE_S = 3600.0


def _stage_dir_pair(path: str, d: str, token: str) -> tuple[str, str]:
    """(stage, old) staging-dir paths for compacting partition dir
    ``d`` of the table at ``path``. Basenames are dot-prefixed (never
    visible to partition discovery or Spark's scan path filter) and
    encode the target partition's relative path in hex — hex carries
    no ``=`` or ``/`` — so crash recovery can map an orphaned pre-swap
    dir back to the exact partition it came from."""
    rel = os.path.relpath(d, path)
    enc = "" if rel == "." else rel.encode("utf-8").hex()
    if os.path.abspath(d) == os.path.abspath(path):
        # unpartitioned table: stage as a hidden SIBLING of the table
        # root (staging inside the dir being swapped would move with
        # the rename)
        parent, base = os.path.dirname(path), os.path.basename(path)
        root, marker = parent, f".{base}{_STAGE_PREFIX}"
    else:
        root, marker = path, _STAGE_PREFIX
    return (
        os.path.join(root, f"{marker}stage_{token}_{enc}"),
        os.path.join(root, f"{marker}old_{token}_{enc}"),
    )


def _parse_stage_name(name: str, marker: str) -> tuple[str, str] | None:
    """Decode a staging-dir basename -> (kind, target_relpath), or
    None when the name is not an attributable compaction artifact
    (the sweep never deletes what it cannot attribute)."""
    parts = name[len(marker):].split("_")
    if len(parts) != 3 or parts[0] not in ("stage", "old"):
        return None
    kind, _token, enc = parts
    try:
        rel = bytes.fromhex(enc).decode("utf-8") if enc else "."
    except ValueError:
        return None
    return kind, rel


def _sweep_stage_dirs(
    path: str, min_age_seconds: float = DEFAULT_SWEEP_MIN_AGE_S
) -> list[str]:
    """Recover or remove compaction staging dirs left by a crashed run.

    A crash between the two swap renames leaves the partition dir
    MISSING and its only committed copy in the ``old`` staging dir —
    such dirs are RESTORED (rename back into place, completing the
    interrupted swap), never deleted, and regardless of age. Everything
    else — uncommitted ``stage`` output, and ``old`` dirs whose
    partition dir exists (swap completed) — is garbage, removed once
    older than ``min_age_seconds`` (younger dirs may belong to a live
    concurrent run and are left alone). Returns the paths acted on.
    """
    acted = []
    now = time.time()
    roots = [path]
    parent, base = os.path.dirname(path), os.path.basename(path)
    if parent and os.path.isdir(parent):
        roots.append(parent)
    for root in roots:
        marker = (
            _STAGE_PREFIX if root == path else f".{base}{_STAGE_PREFIX}"
        )
        if not os.path.isdir(root):
            # the table root itself may be missing: a crash inside an
            # unpartitioned-table swap — its sibling `old` dir (scanned
            # via the parent root) is the restore source
            continue
        for name in os.listdir(root):
            if not name.startswith(marker):
                continue
            full = os.path.join(root, name)
            parsed = _parse_stage_name(name, marker)
            if parsed is None:
                continue
            kind, rel = parsed
            target = path if rel == "." else os.path.join(path, rel)
            if kind == "old" and not os.path.isdir(target):
                # the pre-swap dir is the ONLY copy of this
                # partition's committed data
                try:
                    tparent = os.path.dirname(target)
                    if tparent:
                        os.makedirs(tparent, exist_ok=True)
                    os.rename(full, target)
                    acted.append(full)
                except OSError:
                    pass  # target reappeared concurrently; next sweep decides
                continue
            try:
                age = now - os.path.getmtime(full)
            except OSError:
                continue
            if age < min_age_seconds:
                continue
            shutil.rmtree(full, ignore_errors=True)
            acted.append(full)
    return acted


def _data_files(d: str) -> list[str]:
    return [
        os.path.join(d, f)
        for f in os.listdir(d)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    ]


def plan_compaction(
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sweep_min_age_seconds: float = DEFAULT_SWEEP_MIN_AGE_S,
) -> dict[str, tuple[int, int]]:
    """Partition dir -> (current_file_count, target_file_count) for
    every partition whose file count exceeds what its bytes justify.
    Also runs the staging-dir sweep: restores any partition whose swap
    a crashed run left half-done, and removes attributable staging
    garbage older than ``sweep_min_age_seconds`` (younger dirs may
    belong to a live concurrent compaction and are left alone).
    Otherwise pure file-listing, safe to run anytime."""
    plan: dict[str, tuple[int, int]] = {}
    _sweep_stage_dirs(path, sweep_min_age_seconds)
    for d in _partition_dirs(path):
        files = _data_files(d)
        if len(files) <= 1:
            continue
        nbytes = sum(os.path.getsize(f) for f in files)
        want = max(1, math.ceil(nbytes / target_file_bytes))
        if len(files) > want:
            plan[d] = (len(files), want)
    return plan


def compact_partitions(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sweep_min_age_seconds: float = DEFAULT_SWEEP_MIN_AGE_S,
) -> dict[str, tuple[int, int]]:
    """Rewrite every over-fragmented partition of the parquet table at
    ``path`` down to ceil(bytes/target) files; leave compact partitions
    untouched (their files keep identity — mtime-pinned in tests).

    Returns the executed plan (partition dir -> (before, after) file
    counts). Row contents are bit-preserved: the rewrite is a plain
    coalescing read->write of the partition slice with no row
    transformation. Each partition swap is atomic (stage dir + rename)
    so a crash mid-compaction loses no committed partition.

    Staging safety: stage and pre-swap dirs are DOT-PREFIXED and carry
    no ``=`` in their basename, so neither partition discovery nor
    Spark's scan path filter can ever see them — a concurrent reader
    observes either the old or the new file set, never both. Crash
    recovery: the staging names encode the target partition, so if a
    run dies inside the swap window (partition dir renamed away, new
    dir not yet in place) the next ``plan_compaction`` RESTORES the
    pre-swap dir rather than sweeping it; committed data survives a
    crash at any instruction. If the second rename itself fails the
    pre-swap dir is renamed straight back in-line.
    """
    plan = plan_compaction(path, target_file_bytes, sweep_min_age_seconds)
    for d, (_, want) in plan.items():
        df = spark.read.parquet(d)
        stage, old = _stage_dir_pair(path, d, uuid.uuid4().hex)
        try:
            df.repartition(want).write.mode("overwrite").parquet(stage)
            os.rename(d, old)
            try:
                os.rename(stage, d)
            except OSError:
                os.rename(old, d)  # roll the swap back; committed data wins
                raise
            shutil.rmtree(old, ignore_errors=True)
        finally:
            shutil.rmtree(stage, ignore_errors=True)
    return plan


def clustered_write(
    df: DataFrame,
    path: str,
    sort_cols: Sequence[str],
    partition_col: str | None = None,
    n_files: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered on ``sort_cols``: range-
    partition the rows by the sort key (so each output file owns a
    contiguous, mostly disjoint key range), sort within partitions,
    and write. Point/range filters on ``sort_cols`` then prune to the
    few files whose footer min-max overlaps the predicate — the 1-D
    OPTIMIZE ... ZORDER BY analog for plain parquet.

    ``repartitionByRange`` samples the key distribution, so file sizes
    stay balanced under skew (quantile cuts, not hash buckets).
    """
    cols = [c for c in sort_cols]
    if not cols:
        raise ValueError("sort_cols must be non-empty")
    out = (
        df.repartitionByRange(n_files, *cols)
        if n_files is not None
        else df.repartitionByRange(*cols)
    )
    out = out.sortWithinPartitions(*cols)
    writer = out.write.mode("overwrite")
    if partition_col is not None:
        writer = writer.partitionBy(partition_col)
    writer.parquet(path)


def _zvalue(a, b, bits: int):
    """Interleave the low ``bits`` bits of two non-negative long
    columns into a Morton (Z-curve) value — pure JVM bitwise
    expressions, no UDF: z = sum_i (a_i << 2i | b_i << (2i+1))."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b, i).bitwiseAND(F.lit(1))
        z = (
            z.bitwiseOR(F.shiftleft(abit, 2 * i))
            .bitwiseOR(F.shiftleft(bbit, 2 * i + 1))
        )
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int,
    bits: int = 16,
) -> None:
    """Two-dimensional clustered write: rows ordered along a Morton
    (Z-order) curve over ``cols``, so EACH file covers a compact
    rectangle in (col1, col2) space and a predicate on EITHER column
    (or both) prunes most files by footer min-max — ``clustered_write``
    clusters one dimension perfectly and leaves the other scattered;
    Z-order trades a little of each for pruning on both (the Delta
    OPTIMIZE ... ZORDER BY analog, over plain parquet).

    Columns are first affinely quantized to ``bits``-bit grid cells
    using their observed min/max (one tiny agg action — the same
    two-pass shape as any statistics-driven rewrite); the z-value is
    built from pure bitwise expressions (no UDF), range-partitioned
    into ``n_files`` and sorted within partitions. The z-value is a
    write-time ordering artifact only — it is not persisted.
    """
    from pyspark.sql import functions as F

    if len(cols) != 2:
        raise ValueError("zorder_write clusters exactly two columns")
    c1, c2 = (F.col(c).cast("double") for c in cols)
    lo1, hi1, lo2, hi2 = df.agg(
        F.min(c1), F.max(c1), F.min(c2), F.max(c2)
    ).collect()[0]
    if lo1 is None or lo2 is None:
        raise ValueError("zorder_write: empty input or all-null cols")
    cells = (1 << bits) - 1

    def quant(c, lo, hi):
        if hi == lo:
            return F.lit(0).cast("long")
        return F.least(
            F.lit(cells).cast("long"),
            F.floor((c - F.lit(lo)) / F.lit(hi - lo) * F.lit(cells + 1)).cast(
                "long"
            ),
        )

    z = _zvalue(quant(c1, lo1, hi1), quant(c2, lo2, hi2), bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def expire_partitions(
    path: str, partition_col: str, cutoff: str
) -> list[str]:
    """Retention/TTL sweep: delete every hive partition whose
    (unescaped) value sorts BELOW ``cutoff`` — for ISO-date partition
    values, lexicographic order IS chronological order, so
    ``cutoff='2024-01-01'`` drops everything older. Returns the
    removed values (sorted) for audit logging.

    Metadata-only: no data file is ever read — cost is O(#partitions)
    driver-side listing plus the dir removals, which is what makes
    retention viable on a 100 TB table (the Delta/Iceberg
    DELETE-by-partition fast path). Idempotent: a second sweep with
    the same cutoff removes nothing. Dot-prefixed staging dirs from
    an in-flight compaction are ignored (never listed as
    partitions)."""
    from .merge import _hive_unescape

    removed = []
    prefix = f"{partition_col}="
    for d in sorted(os.listdir(path)):
        full = os.path.join(path, d)
        if not d.startswith(prefix) or not os.path.isdir(full):
            continue
        value = _hive_unescape(d[len(prefix):])
        if value < cutoff:
            shutil.rmtree(full, ignore_errors=True)
            removed.append(value)
    return removed

