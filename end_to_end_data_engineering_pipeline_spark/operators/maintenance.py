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


def _sweep_stage_dirs(path: str) -> list[str]:
    """Remove orphaned compaction staging/old dirs left by a crashed
    run. They are dot-prefixed (never visible to partition discovery
    or to Spark's scan path filter) so removal can never lose
    committed data — only uncommitted stage output or the pre-swap
    copy of an already-swapped partition."""
    swept = []
    roots = [path]
    parent, base = os.path.dirname(path), os.path.basename(path)
    if parent and os.path.isdir(parent):
        roots.append(parent)
    for root in roots:
        marker = (
            _STAGE_PREFIX if root == path else f".{base}{_STAGE_PREFIX}"
        )
        for d in os.listdir(root):
            if d.startswith(marker):
                shutil.rmtree(os.path.join(root, d), ignore_errors=True)
                swept.append(os.path.join(root, d))
    return swept


def _data_files(d: str) -> list[str]:
    return [
        os.path.join(d, f)
        for f in os.listdir(d)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    ]


def plan_compaction(
    path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> dict[str, tuple[int, int]]:
    """Partition dir -> (current_file_count, target_file_count) for
    every partition whose file count exceeds what its bytes justify.
    Also sweeps orphaned (dot-prefixed, never-readable) staging dirs
    from a previously crashed compaction; otherwise pure file-listing,
    safe to run anytime."""
    plan: dict[str, tuple[int, int]] = {}
    _sweep_stage_dirs(path)
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
    observes either the old or the new file set, never both, and a
    crash at any point leaves only invisible garbage (swept by the
    next ``plan_compaction``), never resurrectable data.
    """
    plan = plan_compaction(path, target_file_bytes)
    for d, (_, want) in plan.items():
        df = spark.read.parquet(d)
        token = uuid.uuid4().hex
        if os.path.abspath(d) == os.path.abspath(path):
            # unpartitioned table: stage as a hidden SIBLING of the
            # table root (staging inside the dir being swapped would
            # move with the rename)
            parent, base = os.path.dirname(d), os.path.basename(d)
            stage = os.path.join(parent, f".{base}{_STAGE_PREFIX}stage_{token}")
            old = os.path.join(parent, f".{base}{_STAGE_PREFIX}old_{token}")
        else:
            # partitioned table: stage under the table root, hidden
            stage = os.path.join(path, f"{_STAGE_PREFIX}stage_{token}")
            old = os.path.join(path, f"{_STAGE_PREFIX}old_{token}")
        try:
            df.repartition(want).write.mode("overwrite").parquet(stage)
            os.rename(d, old)
            os.rename(stage, d)
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
