"""Deterministic, engine-portable sampling operators.

``df.sample()`` / ``TABLESAMPLE`` draw from engine-specific RNG streams
— results differ between Spark and any oracle, and between cluster
layouts (the seed is per-partition). For reproducible pipelines (and
for training-data curation, where a sample must be re-derivable from
the raw corpus months later) we sample by HASH of a stable key
instead: a row is in the p% sample iff ``hash32(key) % N < p*N``.
That is a pure function of the row, so it is independent of
partitioning, engine, cluster size, and run order — and it composes:
the 1% sample is a subset of the 10% sample (nested samples for
scaling-law curves) when buckets are nested.

Scale: both operators are embarrassingly parallel — the Bernoulli
filter is a partition-local scan predicate (pushed to the parquet
reader when the key is a stored column), and the stratified variant
shuffles once on the stratum key, same as any per-group top-k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import hash32

#: modulus for hash-bucket sampling; 1e6 buckets → rate granularity 1e-6
SAMPLE_BUCKETS = 1_000_000


def sample_key(*cols: Column | str) -> Column:
    """Stable sampling key: hash32 over the '|'-joined key columns."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return hash32(F.concat_ws("|", *[c.cast("string") for c in cs]))


def bernoulli_sample(df: DataFrame, rate: float, *key_cols: Column | str) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose key hashes into
    the first ``rate`` fraction of buckets. Nested: a row kept at
    rate r is kept at every rate >= r."""
    threshold = int(rate * SAMPLE_BUCKETS)
    return df.where(sample_key(*key_cols) % SAMPLE_BUCKETS < threshold)


def stratified_exact_k(
    df: DataFrame, strata: list[str], k: int, *key_cols: Column | str
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, chosen by hash order
    (deterministic, unbiased for keys independent of the payload).
    One shuffle on the stratum key; the window sort is per-group.
    For heavy strata at 100 TB, pre-filter with ``bernoulli_sample``
    at a rate that keeps ~10k candidates per stratum, then take k —
    the hash-order property makes the two-phase result identical to
    the one-phase result whenever the pre-filter keeps >= k rows."""
    tiebreak = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    w = Window.partitionBy(*strata).orderBy(sample_key(*key_cols).asc(), *tiebreak)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
