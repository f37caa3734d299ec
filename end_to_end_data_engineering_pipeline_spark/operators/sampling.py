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


def token_budget_prefix(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    numer: int,
    denom: int,
    *key_cols: Column | str,
) -> DataFrame:
    """Domain-mixture selection under a token budget: per group, keep
    documents in hash order until their cumulative weight (token
    count) reaches ``numer/denom`` of the group's total — the
    deterministic quota sampler behind training-mix construction
    ("30% of each source's tokens").

    A document is kept iff it STARTS before the budget boundary:
    ``(cum - w) * denom < numer * total`` — pure int64 arithmetic so
    any engine agrees exactly (a float threshold would compare
    differently-rounded doubles at the boundary). Hash order makes the
    selection a pure function of the rows (re-derivable months later,
    independent of partitioning), and nested: the 10% prefix is a
    subset of the 30% prefix.

    Scale: one shuffle on the group key; the per-group sort is the
    same cost as any windowed top-k. For groups too large to sort at
    100 TB, the two-phase variant applies: pick a hash threshold h*
    from a per-group token histogram (tiny aggregate), pre-filter
    ``sample_key < h*`` (scan predicate, no shuffle), and run this
    exact prefix only on the boundary stragglers — hash order makes
    the composition exact, same argument as ``stratified_exact_k``.
    """
    tiebreak = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    w_ord = (
        Window.partitionBy(group_col)
        .orderBy(sample_key(*key_cols).asc(), *tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(group_col)
    wl = F.col(weight_col).cast("long")
    return (
        df.withColumn("cum_w", F.sum(wl).over(w_ord))
        .withColumn("__tot", F.sum(wl).over(w_all))
        .where((F.col("cum_w") - wl) * denom < numer * F.col("__tot"))
        .drop("__tot")
    )


def assign_split(
    df: DataFrame,
    boundaries: list[tuple[str, int]],
    default_split: str,
    *key_cols: Column | str,
) -> DataFrame:
    """Deterministic train/val/test assignment: each row's hash bucket
    (``sample_key % SAMPLE_BUCKETS``) is compared against cumulative
    ``boundaries`` — e.g. ``[("train", 900000), ("val", 950000)]``
    with default ``"test"`` gives a 90/5/5 split. A pure function of
    the row key: re-derivable months later, stable under
    repartitioning and engine choice, and rows never migrate between
    splits when MORE data arrives (the property shuffle-split lacks —
    eval contamination at 100 TB usually enters through a re-rolled
    split). Adds a ``split`` column."""
    b = sample_key(*key_cols) % SAMPLE_BUCKETS
    expr = None
    for name, upper in boundaries:
        cond = b < upper
        expr = (
            F.when(cond, name) if expr is None else expr.when(cond, name)
        )
    expr = expr.otherwise(default_split) if expr is not None else F.lit(default_split)
    return df.withColumn("split", expr)


def pps_sample(
    df: DataFrame,
    expected_k: int,
    size_col: Column | str,
    *key_cols: Column | str,
) -> DataFrame:
    """Probability-proportional-to-size Bernoulli sample: row i is kept
    with probability ``min(1, expected_k * size_i / total_size)`` — the
    corpus-curation sampler that keeps big documents at a rate matching
    their token contribution (a uniform sample over-represents tiny
    docs in ROW terms and under-represents them in TOKEN terms).

    Deterministic and engine-exact: the decision is the pure-integer
    test ``hash32(key) * total_size < expected_k * size_i * 2^32``
    (hash32 is uniform on [0, 2^32)) — no float probability, so no
    boundary to disagree at, and re-running on any partitioning keeps
    the SAME rows (bound: total_size < 2^31 and k*size < 2^31 keep
    both products inside int64). The total is one scalar aggregate
    broadcast into the predicate; everything else is a scan filter —
    no shuffle of data rows, same shape as bernoulli_sample.
    """
    size = (size_col if isinstance(size_col, Column) else F.col(size_col)).cast(
        "long"
    )
    # Enforce the int64 bounds the predicate's docstring states: past
    # them the non-ANSI multiply wraps SILENTLY and the sample is wrong
    # with no error. assert_true raises at scan time on the first
    # violating row — one extra codegen'd comparison, no extra pass.
    bound = F.lit(1 << 31).cast("long")
    total = df.agg(F.sum(size).cast("long").alias("__total"))
    total = total.select(
        F.when(
            F.col("__total") < bound, F.col("__total")
        ).otherwise(
            F.raise_error(
                F.lit(
                    "pps_sample: total_size >= 2^31 overflows the int64 "
                    "decision product; pre-scale size_col (e.g. size//1024)"
                )
            ).cast("long")
        ).alias("__total")
    )
    h = sample_key(*key_cols)
    keep = F.when(
        F.lit(int(expected_k)) * size >= bound,
        F.raise_error(
            F.lit(
                "pps_sample: expected_k*size >= 2^31 overflows the int64 "
                "decision product; pre-scale size_col (e.g. size//1024)"
            )
        ).isNotNull(),
    ).otherwise(
        (h * F.col("__total"))
        < (F.lit(int(expected_k)) * size * F.lit(1 << 32))
    )
    return df.crossJoin(F.broadcast(total)).where(keep).drop("__total")


def isqrt_long(x: Column) -> Column:
    """Exact integer sqrt for non-negative longs < 2^52: floor(sqrt)
    on the double, then +-1 Newton corrections — the float sqrt is
    correctly rounded IEEE in every engine, and the corrections are
    pure integer comparisons, so the result is engine-exact even
    where the unguarded floor would straddle a perfect square."""
    s = F.floor(F.sqrt(x.cast("double"))).cast("long")
    s = F.when(s * s > x, s - 1).otherwise(s)
    return F.when((s + 1) * (s + 1) <= x, s + 1).otherwise(s)


def temperature_mixture(
    df: DataFrame,
    group_col: str,
    target_size: int,
    size_col: Column | str,
    *key_cols: Column | str,
) -> DataFrame:
    """Temperature-rebalanced corpus mixture (alpha = 1/2): sample a
    ~``target_size``-token corpus whose group shares are proportional
    to sqrt(group tokens) instead of group tokens — the standard
    LLM-mixture move that up-weights rare domains/languages without
    letting any one giant group dominate (alpha=1 reproduces natural
    proportions; alpha=0 is uniform-per-group; 1/2 is the classic
    compromise, and the ONE exponent with an engine-exact integer
    formulation, which is why it's the operator).

    Row keep test, fully integer (hash32 uniform on [0, 2^32); w_g =
    isqrt(n_g); S = sum of w_g):

        hash32(key) * n_g * S  <  target_size * w_g * 2^32

    i.e. keep probability min(1, target*w_g / (n_g*S)), so expected
    tokens from group g are target * w_g / S — the sqrt-share. The
    products run in DECIMAL(38,0) (exact to 1e38; bounds: n_g < 2^52
    for the isqrt, hash*n_g*S and target*w_g*2^32 < 1e38 — a 2.5e13-
    token 100 TB corpus with 1e6 groups sits orders of magnitude
    inside). Deterministic, layout-independent, nested under
    target_size growth (same hash ordering), and re-derivable months
    later — the same contract as every sampler in this module. Cost:
    one group-cardinality aggregate broadcast back; the keep test is
    a scan predicate."""
    size = (
        size_col if isinstance(size_col, Column) else F.col(size_col)
    ).cast("long")
    per = df.groupBy(group_col).agg(F.sum(size).alias("__ng"))
    per = per.withColumn("__wg", isqrt_long(F.col("__ng")))
    tot = per.agg(F.sum("__wg").alias("__S"))

    def d(c: Column) -> Column:
        return c.cast("decimal(38,0)")

    keep = d(sample_key(*key_cols)) * d(F.col("__ng")) * d(F.col("__S")) < (
        d(F.lit(int(target_size))) * d(F.col("__wg")) * d(F.lit(1 << 32))
    )
    return (
        df.join(F.broadcast(per), group_col)
        .crossJoin(F.broadcast(tot))
        .where(keep)
        .drop("__ng", "__wg", "__S")
    )
