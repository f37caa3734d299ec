"""Partitioning strategies for 100 TB scale: bucketed co-located joins
and salted skew joins.

These are the two techniques the flat testdata can't show by default
(single files, uniform keys) but that dominate performance at cluster
scale (SURVEY §4.2, guide 'Partitioning & shuffle'):

- ``write_bucketed`` / ``bucketed_join``: persist both join sides
  bucketed+sorted on the key -> Catalyst plans a SortMergeJoin with
  NO Exchange on either side (verified by tests/test_partitioning.py
  via the physical plan). At 100 TB this removes the dominant shuffle
  of every fact-fact join (e.g. lineitem x orders on orderkey).

- ``salted_join``: explode a hot build-side key into S replicas and
  scatter the probe side with a random-free deterministic salt
  (hash of a disambiguating column), so one giant key no longer lands
  on one reducer. AQE's skew-join split handles moderate skew
  automatically; salting is for the pathological key that exceeds a
  single executor's memory.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    keys: Sequence[str],
    n_buckets: int = 16,
    path: str | None = None,
) -> None:
    """Persist as a bucketed+sorted table (hash(key) -> bucket file).
    Both sides of a later equi-join on ``keys`` with the same bucket
    count satisfy the join's required distribution from disk. With
    ``path`` the table is EXTERNAL (data at ``path``, only metadata in
    the catalog) — the 100 TB shape, where data lives on object
    storage and outlives any one metastore entry; without it, managed
    (lands in spark.sql.warehouse.dir). Read back via
    ``spark.table`` — a plain parquet read of ``path`` would not know
    the bucketing (the layout contract lives in the catalog, exactly
    as Hive/Iceberg bucket transforms do)."""
    writer = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .format("parquet")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    keys: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys — plans with
    zero Exchange operators (scan feeds sort-merge directly)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, list(keys), how)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    scatter_col: str | None = None,
) -> DataFrame:
    """Skew-resistant equi-join: replicate the small side per salt,
    scatter the big side deterministically.

    ``scatter_col`` (default: the first non-key column of ``big``)
    drives the salt via a hash — deterministic, so results are
    reproducible (no rand()). Output columns = big ⋈ small on key.
    """
    scatter = scatter_col or [c for c in big.columns if c != key][0]
    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(scatter)), F.lit(salt_buckets))
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(salt_buckets - 1))
    ).alias("__salt")
    small_replicated = small.select("*", salts)
    joined = big_salted.join(small_replicated, [key, "__salt"])
    return joined.drop("__salt")


def skew_report(
    df: DataFrame, key_cols: Sequence[str], top_n: int = 10
) -> DataFrame:
    """Shuffle-key skew audit: the ``top_n`` hottest key values with
    row count, share of total, cumulative share, and rank — the table
    you read BEFORE shuffling 100 TB on a key, because it tells you
    which mitigation the data needs: a top key holding >5-10% of rows
    wants ``salted_join``/band caps, a long flat tail wants nothing
    (AQE's skew split absorbs moderate imbalance on its own).

    One partial-aggregated groupBy on the key (the same shuffle shape
    the audited join would pay, but carrying only (key, count) rows),
    then the top-n selection goes through ``orderBy(...).limit`` —
    TakeOrderedAndProject, per-partition heaps + a driver merge of
    top_n rows — NEVER a global row_number window, which would drag
    every distinct key value through one partition (the audit of a
    billion-key column must not itself be the skew problem); rank and
    the cumulative window then run over the top_n surviving rows
    only. Shares are count/total double divisions of exact ints —
    engine-exact, so the audit itself sits under a value-hash oracle
    (e22)."""
    keys = [F.col(c) for c in key_cols]
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("__total"))
    w_rank = Window.orderBy(F.col("n_rows").desc(), *keys)
    top = (
        counts.orderBy(F.col("n_rows").desc(), *keys)
        .limit(top_n)
        .withColumn("rank", F.row_number().over(w_rank))
        .crossJoin(F.broadcast(total))
    )
    w_cum = Window.orderBy("rank").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return top.select(
        *key_cols,
        "n_rows",
        F.round(F.col("n_rows") / F.col("__total"), 6).alias("share"),
        F.round(
            F.sum("n_rows").over(w_cum) / F.col("__total"), 6
        ).alias("cum_share"),
        "rank",
    )


def fanout_report(
    left: DataFrame,
    right: DataFrame,
    key: str,
    top_n: int = 10,
) -> DataFrame:
    """Join-fanout audit: the ``top_n`` keys by OUTPUT rows they would
    contribute to ``left JOIN right ON key`` (n_left x n_right per
    key) plus each key's share of the total expansion — the companion
    to :func:`skew_report` for the multiplicative failure mode: a key
    modest on EACH side (10k x 10k) still emits 1e8 rows, which no
    per-side skew audit shows. Read it before running a join whose
    output size you have not proven.

    Two (key, count) aggregates, one join of count tables (cardinality
    = distinct keys, not rows), products and totals in exact int64,
    top-n via orderBy+limit (TakeOrderedAndProject — same
    billion-key-safe discipline as skew_report)."""
    lc = left.groupBy(key).agg(F.count(F.lit(1)).alias("n_left"))
    rc = right.groupBy(key).agg(F.count(F.lit(1)).alias("n_right"))
    prod = lc.join(rc, key).select(
        key,
        F.col("n_left").cast("long").alias("n_left"),
        F.col("n_right").cast("long").alias("n_right"),
        (F.col("n_left") * F.col("n_right")).cast("long").alias("out_rows"),
    )
    total = prod.agg(F.sum("out_rows").alias("__total"))
    top = prod.orderBy(F.col("out_rows").desc(), key).limit(top_n)
    return top.crossJoin(F.broadcast(total)).select(
        key,
        "n_left",
        "n_right",
        "out_rows",
        F.round(
            F.col("out_rows").cast("double") / F.col("__total"), 6
        ).alias("share"),
    )
