"""Event-stream queries in batch form (SURVEY §2.9).

The reference is strictly batch (daily Airflow schedule); its late-data
story is keyed upsert over an overlapping refetch window. The engine
exposes the time-windowed surface in BATCH here (Spark's ``window()``
works identically in batch), and the same operators run under
Structured Streaming in ``streaming/`` with watermarks.

Parity notes:
- Window starts are emitted as 'yyyy-MM-dd HH:mm:ss' strings — both
  engines render epoch-aligned bucket boundaries identically, avoiding
  DATE/TIMESTAMP client-type mismatches.
- Spark ``window()`` buckets are epoch-aligned, exactly DuckDB's
  ``time_bucket``.
- value sums go through decimal (functions/scalar.py rules).
- Every window/order is made deterministic with event_id tiebreakers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load, pin_result
from .benchmeta import fixture_phase
from .registry import query

_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_O_TS_FMT = "%Y-%m-%d %H:%M:%S"


@query(
    "e1_tumbling_window_agg",
    oracle=f"""
    SELECT STRFTIME(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)),
                    '{_O_TS_FMT}') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(27,4))), 4) AS DOUBLE) AS total_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
)
def e1_tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate — the batch form of the
    streaming rollup (pure groupBy on a derived bucket: one shuffle,
    map-side combined; identical plan shape at any scale)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(27,4)")), 4)
            .cast("double")
            .alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.date_format("w.start", _TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
            "n_users",
        )
    )


@query(
    "e2_sliding_window_agg",
    oracle=f"""
    WITH shifted AS (
      SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
               - k * INTERVAL '30 minutes' AS w_start,
             value
      FROM events, (VALUES (0), (1)) offsets(k)
    )
    SELECT STRFTIME(w_start, '{_O_TS_FMT}') AS window_start,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(27,4))), 4) AS DOUBLE) AS total_value
    FROM shifted
    GROUP BY 1
    """,
)
def e2_sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h size, 30 min slide): each event lands in 2
    buckets. Spark's window() explodes the assignment internally; the
    oracle replicates it with an offsets cross join."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(27,4)")), 4)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.date_format("w.start", _TS_FMT).alias("window_start"),
            "n_events",
            "total_value",
        )
    )


@query(
    "e3_sessionization",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN CAST(ts AS TIMESTAMP)
                       - LAG(CAST(ts AS TIMESTAMP))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), sessions AS (
      SELECT user_id, ts, event_id, value,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS BIGINT)
               AS session_seq
      FROM ordered
    )
    SELECT user_id, session_seq,
           COUNT(*) AS n_events,
           STRFTIME(MIN(CAST(ts AS TIMESTAMP)), '{_O_TS_FMT}') AS session_start,
           STRFTIME(MAX(CAST(ts AS TIMESTAMP)), '{_O_TS_FMT}') AS session_end,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(27,4))), 4) AS DOUBLE) AS session_value
    FROM sessions
    GROUP BY user_id, session_seq
    """,
)
def e3_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min inactivity gap -> new session.

    Classic batch formulation (guide 'Common OLAP patterns'): lag() gap
    flag + running sum as session id, then per-session agg. One shuffle
    on user_id serves both windows AND the final groupBy (same key —
    Catalyst reuses the partitioning)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    is_new = F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0)
    sessions = ev.withColumn("is_new", is_new).withColumn(
        "session_seq",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), _TS_FMT).alias("session_start"),
        F.date_format(F.max("ts"), _TS_FMT).alias("session_end"),
        F.round(F.sum(F.col("value").cast("decimal(27,4)")), 4)
        .cast("double")
        .alias("session_value"),
    )


@query(
    "e4_json_extraction",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k,
           CAST(SUM(CASE WHEN CAST(props->>'k' AS BIGINT) > 50
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high
    FROM events
    GROUP BY event_type
    """,
)
def e4_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10/X11 JSON scalar surface: get_json_object path access on the
    props JSON column + downstream aggregation."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
        F.sum(F.when(k > 50, 1).otherwise(0)).alias("n_high"),
    )


@query(
    "e5_keyed_dedup_keep_first",
    oracle="""
    SELECT user_id, event_type, event_id AS first_event_id,
           STRFTIME(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS first_ts
    FROM events
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts, event_id) = 1
    """,
)
def e5_keyed_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 deterministic keep-first dedup on (user_id, event_type) — the
    operators/dedup.py operator applied to the events fixture."""
    from ..operators import dedup_keep_first

    ev = load(spark, sf_dir, "events")
    return dedup_keep_first(ev, ["user_id", "event_type"], ["ts", "event_id"]).select(
        "user_id",
        "event_type",
        F.col("event_id").alias("first_event_id"),
        F.date_format("ts", _TS_FMT).alias("first_ts"),
    )


@query(
    "e6_value_counts",
    oracle="""
    SELECT event_type, COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def e6_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 value-counts (reference fetch_data.py:235-238 status
    distribution, as groupBy-count)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "e7_latest_event_per_user",
    oracle="""
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
    FROM events
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def e7_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins per key — the batch-log status resolution operator
    (operators/merge.py latest_wins, replacing the reference's in-place
    UPDATE at ingestion/fetch_data.py:242-263)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("__rn", F.row_number().over(w))
        .where("__rn = 1")
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
        )
    )


@query(
    "e8_asof_join",
    oracle="""
    SELECT p.event_id, p.user_id,
           STRFTIME(CAST(p.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           c.event_id AS asof_event_id,
           c.value AS asof_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
    """,
)
def e8_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): each purchase matched to the
    user's most recent click at-or-before it — the time-series join
    Spark lacks natively, re-expressed as union + keyed window (one
    shuffle; DuckDB's built-in ASOF JOIN is the oracle)."""
    from ..operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_event_id"), "value"
    )
    joined = asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        payload_cols=["click_event_id", "value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT).alias("purchase_ts"),
        F.col("asof_click_event_id").alias("asof_event_id"),
        F.col("asof_value").alias("asof_value"),
    )


@query(
    "e9_range_join",
    oracle="""
    SELECT e.event_id AS error_id,
           CAST(COUNT(p.event_id) AS BIGINT) AS purchases_before,
           CAST(ROUND(COALESCE(SUM(CAST(p.value AS DECIMAL(27,4))), 0), 4) AS DOUBLE)
             AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id
     AND CAST(p.ts AS TIMESTAMP) >= CAST(e.ts AS TIMESTAMP) - INTERVAL '1 hour'
     AND CAST(p.ts AS TIMESTAMP) <  CAST(e.ts AS TIMESTAMP)
    GROUP BY e.event_id
    """,
)
def e9_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded range join: per error event, the user's purchases in the
    preceding hour. The user_id equi-key carries the shuffle; the time
    band is a post-join filter — at scale, add a coarse time-bucket
    equi-key to cap the per-user fan-out."""
    ev = load(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", F.col("ts").alias("e_ts")
    )
    # distinct column name on the right side: a self-join equality on
    # two same-named lineage-shared attributes relies on Spark's
    # ambiguous-self-join rewrite (it warns "trivially true
    # predicate") — aliasing makes the equi-key explicit
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
        F.col("event_id").alias("p_id"),
    )
    joined = errors.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("e_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("p_ts") < F.col("e_ts")),
        "left",
    )
    return joined.groupBy("error_id").agg(
        F.count("p_id").alias("purchases_before"),
        F.round(
            F.coalesce(F.sum(F.col("p_value").cast("decimal(27,4)")), F.lit(0)), 4
        )
        .cast("double")
        .alias("purchase_value"),
    )


@query(
    "e10_session_window_native",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN CAST(ts AS TIMESTAMP)
                       - LAG(CAST(ts AS TIMESTAMP))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), sessions AS (
      SELECT user_id, ts, value,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS BIGINT) AS session_seq
      FROM ordered
    )
    SELECT user_id,
           STRFTIME(MIN(CAST(ts AS TIMESTAMP)), '{_O_TS_FMT}') AS session_start,
           STRFTIME(MAX(CAST(ts AS TIMESTAMP)) + INTERVAL '30 minutes',
                    '{_O_TS_FMT}') AS session_end,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(27,4))), 4) AS DOUBLE)
             AS session_value
    FROM sessions
    GROUP BY user_id, session_seq
    """,
)
def e10_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window (gap-merged sessions, works in
    batch) cross-checked against the relational lag+cumsum
    sessionization in the oracle — the two formulations must agree
    exactly (window.start = first event, window.end = last + gap)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(27,4)")), 4)
            .cast("double")
            .alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", _TS_FMT).alias("session_start"),
            F.date_format("w.end", _TS_FMT).alias("session_end"),
            "n_events",
            "session_value",
        )
    )


@query(
    "e11_funnel",
    oracle=f"""
    SELECT user_id,
           STRFTIME(first_view, '{_O_TS_FMT}') AS first_view,
           STRFTIME(first_click, '{_O_TS_FMT}') AS first_click,
           STRFTIME(first_purchase, '{_O_TS_FMT}') AS first_purchase
    FROM (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view'
                      THEN CAST(ts AS TIMESTAMP) END) AS first_view,
             MIN(CASE WHEN event_type = 'click'
                      THEN CAST(ts AS TIMESTAMP) END) AS first_click,
             MIN(CASE WHEN event_type = 'purchase'
                      THEN CAST(ts AS TIMESTAMP) END) AS first_purchase
      FROM events
      GROUP BY user_id
    ) t
    WHERE first_view < first_click AND first_click < first_purchase
    """,
)
def e11_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): conditional MIN per
    step in ONE pass over events, then stage-order predicates. The
    standard product-analytics shape — scales as a single map-side-
    combinable aggregate on user_id, no self-joins, no per-user
    sorting. Sequence semantics: first occurrence of each stage must
    be strictly ordered."""
    ev = load(spark, sf_dir, "events")
    first_of = lambda t: F.min(  # noqa: E731
        F.when(F.col("event_type") == t, F.col("ts"))
    )
    agg = ev.groupBy("user_id").agg(
        first_of("view").alias("fv"),
        first_of("click").alias("fc"),
        first_of("purchase").alias("fp"),
    )
    return agg.where(
        (F.col("fv") < F.col("fc")) & (F.col("fc") < F.col("fp"))
    ).select(
        "user_id",
        F.date_format("fv", _TS_FMT).alias("first_view"),
        F.date_format("fc", _TS_FMT).alias("first_click"),
        F.date_format("fp", _TS_FMT).alias("first_purchase"),
    )


@query(
    "e12_weekly_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(date_trunc('week', MIN(CAST(ts AS TIMESTAMP))) AS DATE)
               AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE)
               AS active_week
      FROM events
    )
    SELECT STRFTIME(cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(datediff('day', cohort_week, active_week) / 7 AS BIGINT)
             AS week_offset,
           COUNT(*) AS n_active_users
    FROM firsts JOIN activity USING (user_id)
    GROUP BY 1, 2
    """,
)
def e12_weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-seen week,
    counted per (cohort, week-offset) — the standard retention
    triangle. Two aggregates on user_id (first-seen + distinct active
    weeks) share one shuffle key; the final count groups a
    users × weeks -sized input, never raw events. Week bucketing uses
    Monday-anchored date_trunc in both engines."""
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("active_week")
    ).distinct()
    return (
        firsts.join(activity, "user_id")
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


@query(
    "e13_inter_event_gaps",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             epoch_us(CAST(ts AS TIMESTAMP))
               - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events)
    SELECT user_id,
           COUNT(gap_us) AS n_gaps,
           MIN(gap_us) AS min_gap_us,
           MAX(gap_us) AS max_gap_us,
           CAST(SUM(CAST(gap_us AS DECIMAL(27,0))) AS BIGINT) AS total_gap_us,
           CAST(SUM(CASE WHEN gap_us > 3600000000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_session_breaks
    FROM gaps
    GROUP BY user_id
    """,
)
def e13_inter_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap analytics: per-user lag over event time, gap
    stats in exact integer microseconds (epoch subtraction — no float
    duration math), plus the >1h session-break count that e3's
    sessionization thresholds on. One window shuffle on user_id, the
    aggregate reuses the same partitioning."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id", (us - F.lag(us).over(w)).alias("gap_us")
    )
    return gaps.groupBy("user_id").agg(
        F.count("gap_us").alias("n_gaps"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        F.sum(F.col("gap_us").cast("decimal(27,0)")).cast("long").alias("total_gap_us"),
        F.sum((F.col("gap_us") > 3600000000).cast("long")).alias("n_session_breaks"),
    )


@query(
    "e14_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events)
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n,
           ROUND(COUNT(*) * 1000000.0
                 / SUM(COUNT(*)) OVER (PARTITION BY prev_type)) / 1000000.0
             AS p_next
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
)
def e14_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral transition matrix: per-user event-type bigrams (lag
    over event time) aggregated into global transition counts and
    row-normalized probabilities — the Markov-chain feature behind
    next-action models. The probability is an exact-int ratio
    (count*1e6/rowsum) so rounding agrees cross-engine. One window
    shuffle on user_id, one aggregate, one tiny window over the
    |types|^2 matrix."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).where(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w_row = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        (F.round(F.col("n") * 1000000.0 / F.sum("n").over(w_row)) / 1000000.0)
        .alias("p_next"),
    )


@query(
    "e15_cdc_latest_state",
    oracle="""
    WITH final AS (
      SELECT o_orderkey,
             o_orderstatus,
             CASE WHEN o_orderkey % 7 = 0
                  THEN CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 2
                            AS DECIMAL(15,2))
                  ELSE CAST(o_totalprice AS DECIMAL(15,2)) END AS price
      FROM orders WHERE o_orderkey % 13 <> 0
    )
    SELECT o_orderstatus,
           COUNT(*) AS n_rows,
           CAST(ROUND(SUM(price), 4) AS DOUBLE) AS sum_price
    FROM final GROUP BY o_orderstatus
    """,
)
def e15_cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog -> latest state (streaming family's batch twin,
    SURVEY §2.9): apply_changes (operators/merge.py) composes
    latest-wins sequencing with MERGE+DELETE — the full
    INSERT/UPDATE/DELETE contract the reference's ON CONFLICT upsert
    lacks (clean_data.py:222-243 can only insert/update).

    A deterministic changelog is derived from orders: batch 1 inserts
    every key (seq 1); batch 2 doubles the price of keys % 7 == 0
    (U, seq 2) and removes keys % 13 == 0 (D, seq 3 — D outranks a
    same-batch U on keys divisible by both). The oracle checks the
    CLOSED FORM of the final state, so the whole changelog machinery
    (per-key latest-wins, delete anti-join, two-batch application) must
    land exactly. The same operator runs under foreachBatch in
    streaming (tests/test_streaming.py CDC equivalence test)."""
    import shutil
    import tempfile

    from ..functions import dec2, dsum_expr
    from ..operators.merge import apply_changes

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", dec2("o_totalprice").alias("price")
    )
    inserts = o.select(
        "*", F.lit("I").alias("op"), F.lit(1).alias("seq")
    )
    updates = o.where(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        (F.col("price") * 2).cast("decimal(15,2)").alias("price"),
        F.lit("U").alias("op"),
        F.lit(2).alias("seq"),
    )
    deletes = o.where(F.col("o_orderkey") % 13 == 0).select(
        "*", F.lit("D").alias("op"), F.lit(3).alias("seq")
    )
    tmp = tempfile.mkdtemp(prefix="e15_cdc_")
    target = tmp + "/state"
    try:
        with fixture_phase():  # seed state; operator = the U+D merge
            apply_changes(spark, target, inserts, ["o_orderkey"], "seq")
        apply_changes(
            spark, target, updates.unionByName(deletes), ["o_orderkey"], "seq"
        )
        state = spark.read.parquet(target)
        out = state.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum_expr(F.col("price"), "sum_price"),
        )
        # materialize before the staged table is deleted
        out = pin_result(out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


@query(
    "e16_scd2_history",
    oracle="""
    WITH chg AS (
      SELECT o_orderkey AS k, o_orderstatus,
             CAST(o_totalprice AS DECIMAL(15,2)) AS price,
             'I' AS op, 1 AS seq
      FROM orders
      UNION ALL
      SELECT o_orderkey, o_orderstatus,
             CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 2 AS DECIMAL(15,2)),
             'U', 2
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey, o_orderstatus,
             CAST(o_totalprice AS DECIMAL(15,2)), 'D', 3
      FROM orders WHERE o_orderkey % 13 = 0
    ),
    rec AS (
      SELECT *, lead(seq) OVER (PARTITION BY k ORDER BY seq, op) AS valid_to
      FROM chg
    )
    SELECT o_orderstatus,
           COUNT(*) AS n_records,
           COUNT(*) FILTER (WHERE valid_to IS NULL) AS n_current,
           COUNT(*) FILTER (WHERE valid_to IS NOT NULL) AS n_closed,
           CAST(ROUND(SUM(CASE WHEN valid_to IS NULL THEN price END), 4)
                AS DOUBLE) AS sum_current_price
    FROM rec WHERE op <> 'D'
    GROUP BY o_orderstatus
    """,
)
def e16_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension build from a CDC changelog — the HISTORY
    twin of e15's latest-state apply (operators/merge.py:scd2_history).
    Same deterministic changelog as e15 (I seq 1 for every order, U
    seq 2 doubles keys % 7, D seq 3 removes keys % 13); the lead()
    window assigns [valid_from, valid_to) versions, deletes close
    their predecessor without emitting a record. The per-status
    aggregate pins record counts, open/closed splits, AND the summed
    current prices — so version boundaries, the delete-closes rule,
    and the U re-pricing must all land exactly. The oracle mirrors
    the operator generically (same window over the same UNION ALL
    changelog), not the closed form."""
    from ..functions import dec2, dsum_expr
    from ..operators.merge import scd2_history

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", dec2("o_totalprice").alias("price")
    )
    chg = (
        o.select("*", F.lit("I").alias("op"), F.lit(1).alias("seq"))
        .unionByName(
            o.where(F.col("o_orderkey") % 7 == 0).select(
                "o_orderkey",
                "o_orderstatus",
                (F.col("price") * 2).cast("decimal(15,2)").alias("price"),
                F.lit("U").alias("op"),
                F.lit(2).alias("seq"),
            )
        )
        .unionByName(
            o.where(F.col("o_orderkey") % 13 == 0).select(
                "*", F.lit("D").alias("op"), F.lit(3).alias("seq")
            )
        )
    )
    hist = scd2_history(chg, ["o_orderkey"], "seq", "op")
    return hist.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.count(F.when(F.col("is_current"), 1)).alias("n_current"),
        F.count(F.when(~F.col("is_current"), 1)).alias("n_closed"),
        dsum_expr(
            F.when(F.col("is_current"), F.col("price")), "sum_current_price"
        ),
    )


@query(
    "e17_scd2_incremental",
    oracle="""
    WITH chg AS (
      SELECT o_orderkey AS k, o_orderstatus,
             CAST(o_totalprice AS DECIMAL(15,2)) AS price,
             'I' AS op, 1 AS seq
      FROM orders
      UNION ALL
      SELECT o_orderkey, o_orderstatus,
             CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 2 AS DECIMAL(15,2)),
             'U', 2
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey, o_orderstatus,
             CAST(o_totalprice AS DECIMAL(15,2)), 'D', 3
      FROM orders WHERE o_orderkey % 13 = 0
    ),
    rec AS (
      SELECT *, lead(seq) OVER (PARTITION BY k ORDER BY seq, op) AS valid_to
      FROM chg
    )
    SELECT o_orderstatus,
           COUNT(*) AS n_records,
           COUNT(*) FILTER (WHERE valid_to IS NULL) AS n_current,
           COUNT(*) FILTER (WHERE valid_to IS NOT NULL) AS n_closed,
           CAST(ROUND(SUM(CASE WHEN valid_to IS NULL THEN price END), 4)
                AS DOUBLE) AS sum_current_price
    FROM rec WHERE op <> 'D'
    GROUP BY o_orderstatus
    """,
)
def e17_scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 maintenance (operators/merge.py:scd2_apply):
    the e16 changelog arrives in TWO batches — batch 1 the initial
    inserts, batch 2 the U/D tail — applied against a persisted
    history table, so the close-at-batch-boundary path (open records
    closed by the next batch's first seq) actually executes. The
    oracle is the ONE-SHOT rebuild SQL (identical to e16's), so the
    driver hash proves sequential-apply ≡ full-log rebuild on real
    data, complementing the hypothesis equivalence property."""
    import shutil
    import tempfile

    from ..functions import dec2, dsum_expr
    from ..operators.merge import scd2_apply

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", dec2("o_totalprice").alias("price")
    )
    b1 = o.select("*", F.lit("I").alias("op"), F.lit(1).alias("seq"))
    b2 = (
        o.where(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderkey",
            "o_orderstatus",
            (F.col("price") * 2).cast("decimal(15,2)").alias("price"),
            F.lit("U").alias("op"),
            F.lit(2).alias("seq"),
        )
        .unionByName(
            o.where(F.col("o_orderkey") % 13 == 0).select(
                "*", F.lit("D").alias("op"), F.lit(3).alias("seq")
            )
        )
    )
    tmp = tempfile.mkdtemp(prefix="e17_scd2_")
    target = tmp + "/hist"
    try:
        with fixture_phase():  # seed history; operator = batch-2 apply
            scd2_apply(spark, target, b1, ["o_orderkey"])
        scd2_apply(spark, target, b2, ["o_orderkey"])
        hist = spark.read.parquet(target)
        out = hist.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_records"),
            F.count(F.when(F.col("is_current"), 1)).alias("n_current"),
            F.count(F.when(~F.col("is_current"), 1)).alias("n_closed"),
            dsum_expr(
                F.when(F.col("is_current"), F.col("price")),
                "sum_current_price",
            ),
        )
        # materialize before the staged table is deleted
        out = pin_result(out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


@query(
    "e18_linear_interpolation",
    oracle="""
    WITH hourly AS (
      SELECT user_id,
             CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT) AS h,
             CAST(SUM(CAST(value AS DECIMAL(27,4))) * 10000 AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
    bounds AS (SELECT user_id, MIN(h) AS lo, MAX(h) AS hi
               FROM hourly GROUP BY user_id),
    spine AS (SELECT user_id, UNNEST(range(lo, hi + 1)) AS h FROM bounds),
    j AS (SELECT spine.user_id, spine.h, hourly.c
          FROM spine LEFT JOIN hourly
          ON hourly.user_id = spine.user_id AND hourly.h = spine.h),
    f AS (
      SELECT user_id, h, c,
             LAST_VALUE(c IGNORE NULLS) OVER w_prev AS pc,
             LAST_VALUE(CASE WHEN c IS NOT NULL THEN h END IGNORE NULLS)
               OVER w_prev AS ph,
             FIRST_VALUE(c IGNORE NULLS) OVER w_next AS nc,
             FIRST_VALUE(CASE WHEN c IS NOT NULL THEN h END IGNORE NULLS)
               OVER w_next AS nh
      FROM j
      WINDOW w_prev AS (PARTITION BY user_id ORDER BY h
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             w_next AS (PARTITION BY user_id ORDER BY h
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT user_id, h,
           CAST(c IS NOT NULL AS BIGINT) AS is_actual,
           CASE WHEN c IS NOT NULL THEN c / 10000.0
                ELSE (CAST(sign(pc * (nh - h) + nc * (h - ph)) AS BIGINT)
                      * ((abs(pc * (nh - h) + nc * (h - ph)) * 2 + (nh - ph))
                         // (2 * (nh - ph)))) / 10000.0
           END AS value_filled
    FROM f
    """,
)
def e18_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series LINEAR interpolation: per-user hourly value totals
    on a dense hour spine, gap hours filled by time-weighted
    interpolation between the neighboring observed hours —
    ``prev + (next - prev) * (h - prev_h)/(next_h - prev_h)`` — the
    sensor/metrics gap-repair that forward-fill (q71) can't express.

    Determinism: hourly totals are exact DECIMAL sums carried as
    integer ten-thousandths, hour ids are exact integers, and the
    interpolated value is rounded to ten-thousandths IN INTEGER
    arithmetic (``sign(n) * ((|n|*2 + d) div 2d)`` — half away from
    zero, the same primitive as SQ8 quantization) BEFORE the single
    /1e4 float division — a float-domain ROUND here differs between
    engines on exact-half quotients (Spark rounds the shortest
    decimal rendering, DuckDB the binary double; observed 1-ulp
    mismatches at sf0.001), integer rounding cannot. The spine is
    bounded per user (first..last observed hour), prev/next always
    exist inside it, so no NULL edges. Shape: one shuffle to the
    hourly aggregate, the spine explode is narrow, and the two
    unbounded windows reuse ONE user_id partitioning — at 100 TB the
    windowed side is |users| x |hours|, already reduced from the raw
    event stream."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id",
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("h"),
    ).agg(
        (F.sum(F.col("value").cast("decimal(27,4)")) * 10000)
        .cast("long")
        .alias("c")
    )
    bounds = hourly.groupBy("user_id").agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    spine = bounds.select(
        "user_id", F.explode(F.sequence("lo", "hi")).alias("h")
    )
    j = spine.join(hourly, ["user_id", "h"], "left_outer")
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_h = F.when(F.col("c").isNotNull(), F.col("h"))
    f = j.select(
        "user_id",
        "h",
        "c",
        F.last("c", ignorenulls=True).over(w_prev).alias("pc"),
        F.last(obs_h, ignorenulls=True).over(w_prev).alias("ph"),
        F.first("c", ignorenulls=True).over(w_next).alias("nc"),
        F.first(obs_h, ignorenulls=True).over(w_next).alias("nh"),
    )
    # integer half-away rounding of num/den to ten-thousandths; the only
    # float op in the query is the final exact-int / 1e4 division
    interp = F.expr(
        "(CAST(sign(pc * (nh - h) + nc * (h - ph)) AS BIGINT)"
        " * ((abs(pc * (nh - h) + nc * (h - ph)) * 2 + (nh - ph))"
        # explicit double divisor: a bare 10000.0 literal parses as
        # DECIMAL inside expr (q85 lesson) — here when/otherwise
        # unification with the double branch masked it, but the type
        # should not depend on coercion
        " DIV (2 * (nh - ph)))) / CAST(10000 AS DOUBLE)"
    )
    return f.select(
        "user_id",
        "h",
        F.col("c").isNotNull().cast("long").alias("is_actual"),
        F.when(F.col("c").isNotNull(), F.col("c") / 10000.0)
        .otherwise(interp)
        .alias("value_filled"),
    )


@query(
    "e19_attribution",
    oracle="""
    WITH t AS (
      SELECT event_type, value,
             FIRST_VALUE(CASE WHEN event_type IN ('click','view','signup')
                              THEN event_type END IGNORE NULLS)
               OVER w AS first_touch,
             LAST_VALUE(CASE WHEN event_type IN ('click','view','signup')
                             THEN event_type END IGNORE NULLS)
               OVER w AS last_touch
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
    conv AS (SELECT * FROM t WHERE event_type = 'purchase')
    SELECT model, attributed_type,
           CAST(COUNT(*) AS BIGINT) AS n_conversions,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(27,4))), 4) AS DOUBLE)
             AS total_value
    FROM (
      SELECT 'first_touch' AS model,
             COALESCE(first_touch, 'direct') AS attributed_type, value
      FROM conv
      UNION ALL
      SELECT 'last_touch' AS model,
             COALESCE(last_touch, 'direct') AS attributed_type, value
      FROM conv)
    GROUP BY model, attributed_type
    """,
)
def e19_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution: each purchase is credited to the user's
    FIRST and MOST RECENT preceding touch event (click/view/signup),
    'direct' when no touch precedes it — the first-touch/last-touch
    pair every growth pipeline reports. One window shuffle on user_id
    computes both touches in a single frame (UNBOUNDED PRECEDING..1
    PRECEDING, so the purchase itself can never self-attribute); the
    two models then UNPIVOT in-row (explode of a 2-element struct
    array — no second scan, no union re-read) into one small
    aggregate. Value totals use the exact DECIMAL sum pattern."""
    ev = load(spark, sf_dir, "events")
    touch = F.when(
        F.col("event_type").isin("click", "view", "signup"),
        F.col("event_type"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = ev.select(
        "event_type",
        "value",
        F.first(touch, ignorenulls=True).over(w).alias("first_touch"),
        F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
    ).where(F.col("event_type") == "purchase")
    models = F.explode(
        F.array(
            F.struct(
                F.lit("first_touch").alias("model"),
                F.coalesce("first_touch", F.lit("direct")).alias(
                    "attributed_type"
                ),
            ),
            F.struct(
                F.lit("last_touch").alias("model"),
                F.coalesce("last_touch", F.lit("direct")).alias(
                    "attributed_type"
                ),
            ),
        )
    )
    stacked = t.select(models.alias("m"), "value").select(
        "m.model", "m.attributed_type", "value"
    )
    return stacked.groupBy("model", "attributed_type").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.round(F.sum(F.col("value").cast("decimal(27,4)")), 4)
        .cast("double")
        .alias("total_value"),
    )


@query(
    "e21_scd2_asof",
    oracle="""
    WITH chg AS (
      SELECT o_orderkey AS k, o_orderstatus,
             CAST(o_totalprice AS DECIMAL(15,2)) AS price,
             'I' AS op, 1 AS seq
      FROM orders
      UNION ALL
      SELECT o_orderkey, o_orderstatus,
             CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 2 AS DECIMAL(15,2)),
             'U', 2
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey, o_orderstatus,
             CAST(o_totalprice AS DECIMAL(15,2)), 'D', 3
      FROM orders WHERE o_orderkey % 13 = 0
    ),
    rec AS (
      SELECT *, seq AS valid_from,
             lead(seq) OVER (PARTITION BY k ORDER BY seq, op) AS valid_to
      FROM chg
    ),
    hist AS (SELECT * FROM rec WHERE op <> 'D'),
    ats AS (SELECT UNNEST([1, 2, 3]) AS asof)
    SELECT ats.asof, h.o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(ROUND(SUM(h.price), 4) AS DOUBLE) AS sum_price
    FROM ats JOIN hist h
      ON h.valid_from <= ats.asof
     AND (h.valid_to IS NULL OR h.valid_to > ats.asof)
    GROUP BY ats.asof, h.o_orderstatus
    """,
)
def e21_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level time travel over SCD2 history (operators/merge.py
    scd2_asof): the e16 changelog's history queried AS OF each of the
    three sequence points — as of 1 every insert is live at its
    original price, as of 2 the %7 keys show doubled prices, as of 3
    the %13 deletes have dropped out (delete windows are interval
    gaps, so the as-of filter needs no delete-awareness). Where p9's
    snapshot table answers "the TABLE as of commit N", this answers
    "each KEY's version as of sequence T" from one stored history.
    The as-of read is a pure interval filter — scan-pushable, no
    shuffle — here joined against a 3-row as-of spine to pin all
    three snapshots in one result."""
    from ..functions import dec2, dsum_expr
    from ..operators.merge import scd2_asof, scd2_history

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", dec2("o_totalprice").alias("price")
    )
    chg = (
        o.select("*", F.lit("I").alias("op"), F.lit(1).alias("seq"))
        .unionByName(
            o.where(F.col("o_orderkey") % 7 == 0).select(
                "o_orderkey",
                "o_orderstatus",
                (F.col("price") * 2).cast("decimal(15,2)").alias("price"),
                F.lit("U").alias("op"),
                F.lit(2).alias("seq"),
            )
        )
        .unionByName(
            o.where(F.col("o_orderkey") % 13 == 0).select(
                "*", F.lit("D").alias("op"), F.lit(3).alias("seq")
            )
        )
    )
    hist = scd2_history(chg, ["o_orderkey"], "seq", "op")
    parts = [
        scd2_asof(hist, at)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            dsum_expr(F.col("price"), "sum_price"),
        )
        .select(
            F.lit(at).cast("int").alias("asof"),
            "o_orderstatus",
            "n_keys",
            "sum_price",
        )
        for at in (1, 2, 3)
    ]
    return parts[0].unionByName(parts[1]).unionByName(parts[2])


@query(
    "e22_skew_audit",
    oracle="""
    WITH counts AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM events GROUP BY user_id
    ),
    tot AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS t FROM counts),
    ranked AS (
      SELECT user_id, n_rows,
             ROW_NUMBER() OVER (ORDER BY n_rows DESC, user_id) AS rank
      FROM counts
    )
    SELECT user_id, n_rows,
           ROUND(CAST(n_rows AS DOUBLE) / t, 6) AS share,
           ROUND(SUM(CAST(n_rows AS DOUBLE)) OVER (
                   ORDER BY rank
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) / t, 6) AS cum_share,
           CAST(rank AS BIGINT) AS rank
    FROM ranked, tot
    WHERE rank <= 10
    """,
)
def e22_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew audit (operators/partitioning.py:skew_report):
    the 10 hottest event user_ids with row share and cumulative share
    — the diagnostic a 100 TB pipeline reads before choosing between
    a plain shuffle join, AQE skew-split, and salted_join. One
    partial-aggregated groupBy carrying only (key, count) rows, then
    a top-n window; the audit output is a handful of rows whatever
    the corpus size."""
    from ..operators.partitioning import skew_report

    ev = load(spark, sf_dir, "events")
    return skew_report(ev, ["user_id"], top_n=10).withColumn(
        "rank", F.col("rank").cast("long")
    )


@query(
    "e23_hll_distinct_users",
    oracle="""
    WITH h AS (
      SELECT event_type,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                  AS BIGINT) AS hv
      FROM events
    ),
    rr AS (
      SELECT event_type,
             CAST(hv // 67108864 AS INT) AS register,
             CASE WHEN hv % 67108864 = 0 THEN 27
                  ELSE 27 - length(bin(hv % 67108864)) END AS rho
      FROM h
    ),
    regs AS (
      SELECT event_type, register, MAX(rho) AS max_rho
      FROM rr GROUP BY event_type, register
    ),
    est AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_registers_set,
             ROUND(CAST(0.709 AS DOUBLE) * 64 * 64
                   / (SUM(CAST(1 AS DOUBLE) / (1 << max_rho))
                      + (64 - COUNT(*))), 6) AS raw_estimate
      FROM regs GROUP BY event_type
    ),
    ex AS (
      SELECT event_type,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
      FROM events GROUP BY event_type
    )
    SELECT e.event_type, e.n_registers_set, e.raw_estimate,
           x.exact_distinct
    FROM est e JOIN ex x ON x.event_type = e.event_type
    """,
)
def e23_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog distinct-user estimate per event type
    (operators/sketches.py:hll_registers/hll_estimate), alongside the
    exact COUNT(DISTINCT) for the accuracy exhibit. Like the CMS
    (t29), fixing the hash family makes the 'approximate' sketch a
    deterministic function of the input SET — registers, harmonic
    sum, and raw estimate all hash-match a DuckDB replay (the
    estimate arithmetic is engine-exact: dyadic 2^-rho terms sum
    exactly in any order; the ln small-range correction is omitted as
    not correctly-rounded across engines). At 100 TB the register
    table is 64 rows per group whatever the corpus — partial-agg max
    IS the merge; the exact side here shuffles every distinct key,
    which is precisely the cost the sketch exists to avoid."""
    from ..operators.sketches import hll_estimate, hll_registers

    ev = load(spark, sf_dir, "events")
    regs = hll_registers(ev, "user_id", group_cols=["event_type"])
    est = hll_estimate(regs, group_cols=["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    return est.join(exact, "event_type")


@query(
    "e24_session_trigrams",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN CAST(ts AS TIMESTAMP)
                       - LAG(CAST(ts AS TIMESTAMP))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), sessions AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS session_seq
      FROM ordered
    ), tri AS (
      SELECT event_type AS step1,
             LEAD(event_type, 1) OVER w AS step2,
             LEAD(event_type, 2) OVER w AS step3
      FROM sessions
      WINDOW w AS (PARTITION BY user_id, session_seq
                   ORDER BY ts, event_id)
    ), counts AS (
      SELECT step1, step2, step3, CAST(COUNT(*) AS BIGINT) AS n
      FROM tri WHERE step3 IS NOT NULL
      GROUP BY step1, step2, step3
    ), tot AS (SELECT SUM(n) AS t FROM counts)
    SELECT step1, step2, step3, n,
           ROUND(CAST(n AS DOUBLE) / t, 6) AS share,
           CAST(ROW_NUMBER() OVER (ORDER BY n DESC, step1, step2, step3)
                AS BIGINT) AS rank
    FROM counts, tot
    """,
)
def e24_session_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern mining over sessions: every 3-step
    event-type path occurring INSIDE one session (e3's 30-minute-gap
    session rule; crossing a session boundary is not a behavioral
    sequence), counted corpus-wide with share and rank — the
    order-sensitive generalization of e14's transition matrix
    (bigrams) that funnel analysis and next-action models consume.
    One shuffle on user_id serves sessionization AND the trigram
    leads (same window partition key); the pattern space is
    |event_types|^3 rows, so the count aggregate partial-combines to
    a handful of rows whatever the corpus size."""
    ev = load(spark, sf_dir, "events")
    order = [F.col("ts"), F.col("event_id")]
    w_user = Window.partitionBy("user_id").orderBy(*order)
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(
        w_user
    )
    is_new = F.when(
        gap.isNull() | (gap > 30 * 60), F.lit(1)
    ).otherwise(F.lit(0))
    sess = ev.withColumn(
        "session_seq",
        F.sum(is_new).over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    w_sess = Window.partitionBy("user_id", "session_seq").orderBy(*order)
    tri = sess.select(
        F.col("event_type").alias("step1"),
        F.lead("event_type", 1).over(w_sess).alias("step2"),
        F.lead("event_type", 2).over(w_sess).alias("step3"),
    ).where(F.col("step3").isNotNull())
    counts = tri.groupBy("step1", "step2", "step3").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    total = counts.agg(F.sum("n").alias("__t"))
    # bounded-window: input is the trigram-combination counts —
    # <= |event_type|^3 rows (single digits cubed), never event-scaled
    w_rank = Window.orderBy(
        F.col("n").desc(), "step1", "step2", "step3"
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "step1",
            "step2",
            "step3",
            "n",
            F.round(F.col("n") / F.col("__t"), 6).alias("share"),
            F.row_number().over(w_rank).cast("long").alias("rank"),
        )
    )


@query(
    "e25_drift_table",
    oracle="""
    WITH b AS (
      SELECT LEAST(CAST(FLOOR(value / 100) AS BIGINT), 9) AS bucket,
             CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
                  THEN 1 ELSE 0 END AS w1
      FROM events
    ),
    c AS (
      SELECT bucket,
             CAST(SUM(w1) AS BIGINT) AS n_before,
             CAST(SUM(1 - w1) AS BIGINT) AS n_after
      FROM b GROUP BY bucket
    ),
    tot AS (
      SELECT SUM(n_before) AS t1, SUM(n_after) AS t2 FROM c
    )
    SELECT bucket, n_before, n_after,
           ROUND(CAST(n_before AS DOUBLE) / t1, 6) AS share_before,
           ROUND(CAST(n_after AS DOUBLE) / t2, 6) AS share_after,
           ROUND(ABS(CAST(n_before AS DOUBLE) / t1
                     - CAST(n_after AS DOUBLE) / t2), 6) AS abs_shift
    FROM c, tot
    """,
)
def e25_drift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: the per-bucket share comparison a
    pipeline reads before trusting this week's data against last
    week's — value deciles' before/after counts, shares, and absolute
    share shift (the per-bucket terms of an L1/PSI drift statistic,
    emitted AS ROWS rather than pre-summed: the per-bucket divisions
    and one subtraction are single correctly-rounded IEEE ops any
    engine reproduces, while summing floats across buckets would be
    reduction-order-dependent — same discipline as q65's exact
    moments). One counting groupBy over (bucket, epoch flag); bucket
    cardinality is fixed (10), so the audit is a handful of rows from
    any corpus size."""
    ev = load(spark, sf_dir, "events")
    split = F.lit("2024-01-15 00:00:00").cast("timestamp")
    b = ev.select(
        F.least(
            F.floor(F.col("value") / 100).cast("long"), F.lit(9).cast("long")
        ).alias("bucket"),
        F.when(F.col("ts") < split, 1).otherwise(0).alias("w1"),
    )
    c = b.groupBy("bucket").agg(
        F.sum("w1").cast("long").alias("n_before"),
        F.sum(1 - F.col("w1")).cast("long").alias("n_after"),
    )
    tot = c.agg(
        F.sum("n_before").alias("__t1"), F.sum("n_after").alias("__t2")
    )
    s1 = F.col("n_before").cast("double") / F.col("__t1")
    s2 = F.col("n_after").cast("double") / F.col("__t2")
    return c.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_before",
        "n_after",
        F.round(s1, 6).alias("share_before"),
        F.round(s2, 6).alias("share_after"),
        F.round(F.abs(s1 - s2), 6).alias("abs_shift"),
    )


@query(
    "e26_join_fanout_audit",
    oracle="""
    WITH lc AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_left
      FROM events GROUP BY user_id
    ),
    rc AS (
      SELECT c_custkey AS user_id, CAST(COUNT(*) AS BIGINT) AS n_right
      FROM customer GROUP BY c_custkey
    ),
    prod AS (
      SELECT lc.user_id, n_left, n_right,
             CAST(n_left * n_right AS BIGINT) AS out_rows
      FROM lc JOIN rc USING (user_id)
    ),
    tot AS (SELECT SUM(out_rows) AS t FROM prod)
    SELECT user_id, n_left, n_right, out_rows,
           ROUND(CAST(out_rows AS DOUBLE) / t, 6) AS share
    FROM (SELECT * FROM prod ORDER BY out_rows DESC, user_id LIMIT 10) p,
         tot
    """,
)
def e26_join_fanout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-fanout audit (operators/partitioning.py:fanout_report):
    the 10 keys contributing the most OUTPUT rows to an
    events-to-customer join — the multiplicative failure mode
    (n_left x n_right) that per-side skew audits (e22) cannot show.
    Count tables only ever join (cardinality = distinct keys), the
    products and total are exact int64, and top-n goes through
    TakeOrderedAndProject."""
    from ..operators.partitioning import fanout_report

    ev = load(spark, sf_dir, "events")
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id")
    )
    return fanout_report(ev, cust, "user_id", top_n=10)


@query(
    "e27_hll_union_rollup",
    oracle="""
    WITH h AS (
      SELECT event_type,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                  AS BIGINT) AS hv
      FROM events
    ),
    rr AS (
      SELECT event_type,
             CAST(hv // 67108864 AS INT) AS register,
             CASE WHEN hv % 67108864 = 0 THEN 27
                  ELSE 27 - length(bin(hv % 67108864)) END AS rho
      FROM h
    ),
    regs AS (
      SELECT event_type, register, MAX(rho) AS max_rho
      FROM rr GROUP BY event_type, register
    ),
    per_type AS (
      SELECT event_type AS scope,
             CAST(COUNT(*) AS BIGINT) AS n_registers_set,
             ROUND(CAST(0.709 AS DOUBLE) * 64 * 64
                   / (SUM(CAST(1 AS DOUBLE) / (1 << max_rho))
                      + (64 - COUNT(*))), 6) AS raw_estimate
      FROM regs GROUP BY event_type
    ),
    gregs AS (
      SELECT register, MAX(max_rho) AS max_rho FROM regs GROUP BY register
    ),
    overall AS (
      SELECT '__all__' AS scope,
             CAST(COUNT(*) AS BIGINT) AS n_registers_set,
             ROUND(CAST(0.709 AS DOUBLE) * 64 * 64
                   / (SUM(CAST(1 AS DOUBLE) / (1 << max_rho))
                      + (64 - COUNT(*))), 6) AS raw_estimate
      FROM gregs
    ),
    ex AS (
      SELECT event_type AS scope,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
      FROM events GROUP BY event_type
      UNION ALL
      SELECT '__all__', CAST(COUNT(DISTINCT user_id) AS BIGINT)
      FROM events
    )
    SELECT u.scope, u.n_registers_set, u.raw_estimate, ex.exact_distinct
    FROM (SELECT * FROM per_type UNION ALL SELECT * FROM overall) u
    JOIN ex ON ex.scope = u.scope
    """,
)
def e27_hll_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL merge identity AS AN ORACLED QUERY: the global
    distinct-user estimate is computed from the PER-TYPE register
    tables alone (element-wise max across groups — no second scan of
    the events table for the rollup), alongside each type's estimate
    and the exact counts. This is the cross-day/cross-group union the
    100 TB story rests on: store per-partition register tables once,
    answer any union by maxing 64-row tables. The oracle replays
    registers, the union max, and the estimate arithmetic — so the
    merge identity itself sits under the value-hash gate, not just a
    pytest."""
    from ..operators.sketches import hll_estimate, hll_registers

    ev = load(spark, sf_dir, "events")
    regs = hll_registers(ev, "user_id", group_cols=["event_type"])
    per_type = hll_estimate(regs, group_cols=["event_type"]).select(
        F.col("event_type").alias("scope"),
        "n_registers_set",
        "raw_estimate",
    )
    gregs = regs.groupBy("register").agg(
        F.max("max_rho").alias("max_rho")
    )
    glob = hll_estimate(gregs).select(
        F.lit("__all__").alias("scope"), "n_registers_set", "raw_estimate"
    )
    exact = (
        ev.groupBy(F.col("event_type").alias("scope"))
        .agg(F.countDistinct("user_id").cast("long").alias("exact_distinct"))
        .unionByName(
            ev.agg(
                F.countDistinct("user_id").cast("long").alias(
                    "exact_distinct"
                )
            ).select(F.lit("__all__").alias("scope"), "exact_distinct")
        )
    )
    return per_type.unionByName(glob).join(exact, "scope")


@query(
    "e28_watermark_late_audit",
    oracle="""
    WITH e AS (
      SELECT event_id, ts,
             CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)
                  AS BIGINT) % 8 AS shard,
             CAST('0x' || substr(md5('a|' || CAST(event_id AS VARCHAR)), 1, 8)
                  AS BIGINT) % 1800 AS arr_delay
      FROM events
    ),
    w AS (
      SELECT *,
             MAX(ts) OVER (
               PARTITION BY shard
               ORDER BY ts + INTERVAL 1 SECOND * arr_delay, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm_src
      FROM e
    ),
    lt AS (
      SELECT strftime(ts, '%Y-%m-%d') AS event_date,
             CASE WHEN wm_src IS NOT NULL
                       AND ts < wm_src - INTERVAL 600 SECOND
                  THEN 1 ELSE 0 END AS is_late
      FROM w
    )
    SELECT event_date,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(is_late) AS BIGINT) AS n_late,
           ROUND(CAST(SUM(is_late) AS DOUBLE) / COUNT(*), 6) AS late_frac
    FROM lt
    GROUP BY event_date
    """,
)
def e28_watermark_late_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark LATE-ARRIVAL audit in batch form — per event date,
    how many events would a 10-minute watermark have dropped? The
    fixture's ts is already arrival-ordered, so ingestion skew is
    reconstructed deterministically (hash-derived per-event arrival
    delay up to 30 min), and the watermark is modeled the way
    Flink/Kafka consumers actually track it: PER SOURCE SHARD
    (hash(event_id)%8), each shard's watermark = max event time seen
    over its STRICTLY EARLIER arrivals minus the 10-min bound — a
    per-shard running max, no global sort, so the audit scales as a
    plain repartition-by-shard + window at 100 TB (the streaming
    global watermark is the min over shards, i.e. looser: this audit
    upper-bounds the drop). An event is late when its event time is
    below its shard's watermark AT ITS ARRIVAL. The streaming twin —
    withWatermark dropping a too-late row from an append-mode
    windowed count — is pinned in tests/test_streaming.py."""
    ev = load(spark, sf_dir, "events").select("event_id", "ts")
    eid = F.col("event_id").cast("string")
    h = lambda c: F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")  # noqa: E731
    e = ev.select(
        "event_id",
        "ts",
        (h(eid) % 8).alias("shard"),
        (h(F.concat(F.lit("a|"), eid)) % 1800).alias("arr_delay"),
    ).withColumn(
        "arrival_ts", F.expr("ts + make_interval(0,0,0,0,0,0, arr_delay)")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("arrival_ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wm_src = F.max("ts").over(w)
    lt = e.select(
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
        F.when(
            wm_src.isNotNull()
            & (F.col("ts") < wm_src - F.expr("INTERVAL 600 SECONDS")),
            1,
        )
        .otherwise(0)
        .alias("is_late"),
    )
    return lt.groupBy("event_date").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("is_late").cast("long").alias("n_late"),
        F.round(
            F.sum("is_late").cast("double") / F.count(F.lit(1)), 6
        ).alias("late_frac"),
    )


@query(
    "e29_ingest_lag_percentiles",
    oracle="""
    WITH lag AS (
      SELECT event_type,
             CAST('0x' || substr(md5('a|' || CAST(event_id AS VARCHAR)), 1, 8)
                  AS BIGINT) % 1800 AS delay_s
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(quantile_cont(delay_s, 0.5), 4) AS p50_delay_s,
           ROUND(quantile_cont(delay_s, 0.9), 4) AS p90_delay_s,
           ROUND(quantile_cont(delay_s, 0.99), 4) AS p99_delay_s,
           CAST(MAX(delay_s) AS BIGINT) AS max_delay_s
    FROM lag
    GROUP BY event_type
    """,
)
def e29_ingest_lag_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-lag SLA table — per event type, exact p50/p90/p99 of
    the event-time → arrival delay (the deterministic reconstructed
    arrival model shared with e28): the ops artifact that decides a
    watermark bound — e28 audits how many events a 10-minute bound
    drops, THIS reports what bound the delay distribution actually
    needs (p99 here ≈ the bound that drops ~1%). Exact interpolated
    percentiles over integer delays (the q20 cross-engine recipe), one
    partial-aggregated shuffle on event_type at any scale."""
    ev = load(spark, sf_dir, "events").select("event_id", "event_type")
    eid = F.col("event_id").cast("string")
    delay = (
        F.conv(F.substring(F.md5(F.concat(F.lit("a|"), eid)), 1, 8), 16, 10)
        .cast("long")
        % 1800
    ).alias("delay_s")
    lag = ev.select("event_type", delay)
    return lag.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.expr("percentile(delay_s, 0.5)"), 4).alias("p50_delay_s"),
        F.round(F.expr("percentile(delay_s, 0.9)"), 4).alias("p90_delay_s"),
        F.round(F.expr("percentile(delay_s, 0.99)"), 4).alias("p99_delay_s"),
        F.max("delay_s").cast("long").alias("max_delay_s"),
    )


@query(
    "e31_point_in_time_features",
    oracle="""
    WITH labels AS (
      SELECT user_id, event_id AS label_id, ts AS label_ts
      FROM events WHERE event_type = 'purchase'),
    feats AS (
      SELECT user_id, ts AS fts, value
      FROM events WHERE event_type <> 'purchase'),
    j AS (
      SELECT l.label_id, l.user_id, l.label_ts, f.fts, f.value
      FROM labels l
      LEFT JOIN feats f
        ON f.user_id = l.user_id
       AND f.fts < l.label_ts
       AND f.fts >= l.label_ts - INTERVAL 24 HOURS)
    SELECT label_id, user_id,
           CAST(COUNT(CASE WHEN fts >= label_ts - INTERVAL 1 HOUR
                           THEN 1 END) AS BIGINT) AS n_1h,
           CAST(COUNT(fts) AS BIGINT) AS n_24h,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(15,2))), 4) AS DOUBLE)
             AS sum_value_24h,
           CAST(date_diff('second', MAX(fts), MAX(label_ts)) AS BIGINT)
             AS secs_since_last
    FROM j
    GROUP BY label_id, user_id
    """,
)
def e31_point_in_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct training-set assembly — the feature-store
    backfill primitive: one feature row per label (purchase) built
    ONLY from that user's events STRICTLY BEFORE the label timestamp
    (ties excluded — the leakage rule), over two trailing horizons
    (1h / 24h counts, 24h decimal spend) plus the as-of recency gap
    in seconds. Labels with no qualifying history keep zero counts
    and null aggregates instead of dropping — a silent inner join
    here is exactly how training-serving skew is born. Plan: one
    bounded range join shuffled on user_id (the 24h bound keeps
    per-user state finite at 100 TB), horizons as conditional aggs
    in a single fold — never one join per horizon. Composes the
    as-of (e8/e21) and range-join (e9) primitives into the shape ML
    pipelines actually materialize."""
    ev = load(spark, sf_dir, "events")
    labels = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("label_id"),
        F.col("ts").alias("label_ts"),
    )
    feats = ev.where(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("f_user"),
        F.col("ts").alias("fts"),
        F.col("value").cast("decimal(15,2)").alias("fval"),
    )
    j = labels.join(
        feats,
        (F.col("f_user") == F.col("user_id"))
        & (F.col("fts") < F.col("label_ts"))
        & (
            F.col("fts")
            >= F.col("label_ts") - F.expr("INTERVAL 24 HOURS")
        ),
        "left",
    )
    return j.groupBy("label_id", "user_id").agg(
        F.count(
            F.when(
                F.col("fts")
                >= F.col("label_ts") - F.expr("INTERVAL 1 HOUR"),
                1,
            )
        )
        .cast("long")
        .alias("n_1h"),
        F.count("fts").cast("long").alias("n_24h"),
        F.round(F.sum("fval"), 4).cast("double").alias("sum_value_24h"),
        (
            F.unix_timestamp(F.max("label_ts"))
            - F.unix_timestamp(F.max("fts"))
        )
        .cast("long")
        .alias("secs_since_last"),
    )


@query(
    "e32_stream_stream_attribution",
    oracle="""
    SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
           v.event_id AS view_id, v.ts AS view_ts
    FROM events p JOIN events v
      ON v.user_id = p.user_id
     AND p.event_type = 'purchase' AND v.event_type = 'view'
     AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
    """,
)
def e32_stream_stream_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The watermarked STREAM-STREAM interval join under the value
    hash gate: this calls streaming/windows.py
    stream_stream_attribution — the exact function the streaming
    tests run with rate/file sources — on batch inputs (withWatermark
    is a no-op outside streaming, the join predicate is identical),
    so the oracle grades the very code path that attributes each
    purchase to the same user's views in the preceding hour under
    bounded state. The event-time-skew bound in the join condition
    is what lets Spark size and evict stream-stream join state; its
    batch semantics are just this interval join. Streaming delivery
    semantics (state eviction, late rows dropping, left-outer
    emit-on-watermark) are pinned in tests/test_streaming.py."""
    from ..streaming.windows import stream_stream_attribution

    ev = load(spark, sf_dir, "events")
    return stream_stream_attribution(
        ev.where(F.col("event_type") == "view"),
        ev.where(F.col("event_type") == "purchase"),
        gap="1 hour",
    )


@query(
    "e34_attribution_left_outer",
    oracle="""
    SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
           v.event_id AS view_id, v.ts AS view_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON v.user_id = p.user_id
     AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
    """,
)
def e34_attribution_left_outer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The LEFT-OUTER stream-stream interval join under the value
    hash — e32's completeness half: purchases with NO qualifying
    view in the preceding hour must ALSO emit (null view columns).
    Same streaming/windows.py function, how='left_outer', so the
    oracle grades exactly the code path whose streaming delivery
    contract (outer rows emit only once the watermark proves no
    match can still arrive; state evicts at watermark + gap) is
    pinned in tests/test_streaming.py:336. At scale the unmatched
    long tail IS the interesting output — the un-attributed
    conversions a marketing pipeline alerts on — and the outer join
    costs the same bounded state as the inner one."""
    from ..streaming.windows import stream_stream_attribution

    ev = load(spark, sf_dir, "events")
    return stream_stream_attribution(
        ev.where(F.col("event_type") == "view"),
        ev.where(F.col("event_type") == "purchase"),
        gap="1 hour",
        how="left_outer",
    )


@query(
    "e33_rfm_segments",
    oracle="""
    WITH pu AS (
      SELECT user_id, MAX(ts) AS last_ts,
             CAST(COUNT(*) AS BIGINT) AS freq,
             SUM(CAST(value AS DECIMAL(15,2))) AS money
      FROM events WHERE event_type = 'purchase' GROUP BY user_id),
    cuts AS (
      SELECT quantile_cont(epoch_us(last_ts), [0.75, 0.5, 0.25]) AS c_r,
             quantile_cont(CAST(freq AS DOUBLE), [0.75, 0.5, 0.25]) AS c_f,
             quantile_cont(CAST(money AS DOUBLE), [0.75, 0.5, 0.25]) AS c_m
      FROM pu),
    scored AS (
      SELECT user_id, freq, money,
             1 + len(list_filter(c_r, c -> epoch_us(last_ts) < c)) AS r,
             1 + len(list_filter(c_f, c -> CAST(freq AS DOUBLE) < c)) AS f,
             1 + len(list_filter(c_m, c -> CAST(money AS DOUBLE) < c)) AS m
      FROM pu, cuts)
    SELECT CAST(r AS BIGINT) || '-' || CAST(f AS BIGINT) || '-'
             || CAST(m AS BIGINT) AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(freq) AS BIGINT) AS n_purchases,
           CAST(ROUND(SUM(money), 4) AS DOUBLE) AS total_value
    FROM scored GROUP BY r, f, m
    """,
)
def e33_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic lifecycle-marketing workload:
    each purchasing user scored into recency/frequency/monetary
    quartile segments, users grouped into 'r-f-m' segments with
    counts and exact decimal value totals.

    Segments are VALUE-QUANTILE buckets (the r8/r9-documented
    cut-points semantics, now implemented): one aggregate computes
    the exact interpolated quartile boundaries of each dimension
    (the q20 cross-engine percentile recipe, over epoch_us for the
    timestamp), a one-row broadcast carries them to every user row,
    and the segment id is 1 + (boundaries the value sorts below) —
    ties share a segment by construction (semantically right for
    RFM: equal spend never splits across segments), segment
    populations are quarter-sized up to boundary ties. ZERO sorts,
    zero windows, one job: at a billion purchasing users this is one
    fact fold + one 3x3-double broadcast + a comparison — nothing
    single-partition anywhere (the r8 NTILE formulation dragged all
    users through one executor three times; exact-NTILE-at-scale
    remains available as operators/partitioning.py scalable_ntile,
    oracled by q91). The DuckDB oracle computes the same
    quantile_cont boundaries."""
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    pu = ev.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum(F.col("value").cast("decimal(15,2)")).alias("money"),
    )
    qs = F.lit([0.75, 0.5, 0.25])
    cuts = pu.agg(
        F.percentile(F.unix_micros("last_ts"), qs).alias("c_r"),
        F.percentile(F.col("freq").cast("double"), qs).alias("c_f"),
        F.percentile(F.col("money").cast("double"), qs).alias("c_m"),
    )
    ts_us = F.unix_micros(F.col("last_ts")).cast("double")
    seg = lambda arr, v: F.lit(1) + F.size(F.filter(arr, lambda c: v < c))
    scored = pu.crossJoin(F.broadcast(cuts)).select(
        "user_id",
        "freq",
        "money",
        seg(F.col("c_r"), ts_us).alias("r"),
        seg(F.col("c_f"), F.col("freq").cast("double")).alias("f"),
        seg(F.col("c_m"), F.col("money").cast("double")).alias("m"),
    )
    return scored.groupBy("r", "f", "m").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("freq").cast("long").alias("n_purchases"),
        F.round(F.sum("money"), 4).cast("double").alias("total_value"),
    ).select(
        F.concat_ws(
            "-",
            F.col("r").cast("long"),
            F.col("f").cast("long"),
            F.col("m").cast("long"),
        ).alias("segment"),
        "n_users",
        "n_purchases",
        "total_value",
    )
