"""Testdata catalog: the driver-generated TPC-H-ish tables.

Tables documented in TESTDATA.md / FIXTURES.md §B. ``load`` returns the
raw DataFrame; ``register_views`` exposes every table as a temp view so
SQL-authored queries and DataFrame-authored queries share one catalog.

Scan-path notes for scale: Parquet scans go through Spark's vectorized
reader; filters and projections applied on these DataFrames push down
into the scan (verify via ``df.explain`` → ``PushedFilters`` /
``ReadSchema``). At 100 TB these tables would be directories partitioned
on their natural keys (e.g. orders by month of o_orderdate) so partition
pruning applies; single-file layout here is the driver's fixture choice.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension-sized tables: always broadcast-joinable at any scale factor
# (region/nation are fixed-cardinality; part/supplier/customer grow with
# SF but stay orders of magnitude under the fact tables — at 100 TB they
# may exceed the broadcast threshold, at which point AQE falls back to
# sort-merge automatically; the hint is advisory).
SMALL_DIMS = frozenset({"region", "nation", "supplier", "part", "customer"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # defensive for driver-created sessions: timestamp rendering and
    # parsing must be UTC for oracle parity (SURVEY §7 risk 3);
    # runtime-settable, no-op under session.get_spark
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # defensive: the caller's session may not have been built by
        # session.get_spark — a TIMESTAMP(NANOS) fixture is unreadable
        # without this (runtime-settable) conf; a no-op for µs fixtures
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        # The fixture's ts encoding has varied across driver
        # regenerations: TIMESTAMP(NANOS) reads as bigint (under
        # nanosAsLong) and needs an explicit nanos→µs conversion;
        # timestamp[us] reads as TIMESTAMP_NTZ directly. Branch on the
        # dtype actually read so both encodings load identically
        # (integer DIV is lossless for µs-grained data; UTC session TZ).
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            df = df.withColumn(
                "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))")
            )
        else:
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


_SCAN_FAMILY_NODES = frozenset(
    {
        "Relation",
        "Project",
        "Filter",
        "Union",
        "LocalRelation",
        "OneRowRelation",
        "GlobalLimit",
        "LocalLimit",
        "Sample",
    }
)


def _scan_rooted(df: DataFrame) -> bool:
    """True when the optimized logical plan contains only scan-family
    nodes (scan/filter/project/union/limit) — i.e. no exchanges.
    Driver-side plan inspection only; optimization runs but no job.
    For such plans ``df.rdd`` is a pure plan walk; for plans WITH
    exchanges, touching ``.rdd`` under AQE finalizes query stages and
    eagerly runs the upstream jobs — which is why fan_out only probes
    scan-rooted inputs."""
    import re

    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:
        return False
    for line in plan.splitlines():
        m = re.match(r"^[\s:+\-]*'?([A-Za-z]+)", line)
        if m and m.group(1) not in _SCAN_FAMILY_NODES:
            return False
    return True


def fan_out(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition for compute-bound stages — ONLY when
    the input is a scan-rooted DataFrame that is under-split.

    Small-by-bytes inputs (single parquet file -> 1 split; AQE
    coalesces shuffles under the advisory byte size) serialize
    CPU-heavy per-row work like shingling, hashing, and pair scoring.
    Bytes are the wrong currency for those stages — spread them across
    cores explicitly. But when the scan already has >= target splits
    (any real-scale table), a repartition here would be a gratuitous
    full shuffle of the input — so it is skipped.

    Inputs whose plan contains exchanges (joins, aggregates, …) are
    returned UNCHANGED: their width is already the shuffle-partition
    count, and probing ``.rdd`` on such a plan under AQE would
    eagerly execute the upstream query stages at plan-construction
    time (so the skip-check itself would cost the jobs it tries to
    avoid). On small fixtures this is the difference between 1 and N
    cores; at 100 TB it is a true no-op."""
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    if not _scan_rooted(df):
        return df
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def pin_result(df: DataFrame, max_rows: int = 10_000) -> DataFrame:
    """Materialize an AGGREGATE-SIZED result as a driver-local
    DataFrame so its lineage detaches from scratch inputs (the
    mutation-style queries stage state in a tempdir, compute a small
    summary, and must rmtree the tempdir before returning — a lazy
    plan would re-scan deleted files when the driver collects it).

    This is the ONLY sanctioned collect-to-driver in the query layer,
    and it is guarded: the probe reads ``max_rows + 1`` rows and
    raises if the result exceeds the cap, so a future edit that turns
    a pinned result data-sized (e.g. dropping a groupBy) fails loudly
    at the pin instead of silently OOM-ing the driver at 100 TB. Do
    NOT raise the cap to accommodate a big result — restructure the
    query so the pinned frame stays aggregate-sized."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"pin_result: result exceeds max_rows={max_rows} — this "
            "helper pins SMALL aggregate results on the driver; a "
            "data-sized frame here means the query lost its reducing "
            "step (or needs a real sink, not a driver pin)"
        )
    return df.sparkSession.createDataFrame(rows, df.schema)


def pin_dataset(df: DataFrame) -> DataFrame:
    """Distributed pin for DATA-SIZED results: eager localCheckpoint
    materializes the partitions on the EXECUTORS and truncates
    lineage, so scratch inputs (a mutation query's tempdir table) can
    be deleted before return without the data ever flowing through
    the driver. Use this when the pinned frame scales with the table
    (a full-table merge readback, a CDF feed); use :func:`pin_result`
    for aggregate-sized summaries, where its row cap is the guard
    against accidentally data-sized plans. At 100 TB the checkpoint
    is executor-storage-sized per node — same footprint class as any
    shuffle — where a driver collect would simply OOM."""
    return df.localCheckpoint(eager=True)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view named after itself."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
