"""Relational operator coverage over the TPC-H-ish tables.

Exercises SURVEY §2 categories the reference uses (projection/filter
P1-P9, aggregation A1-A8, sort O1-O2, dedup O3, set-op U1, joins
J1-J4) plus the standard surface Spark gives for free (SURVEY §2.4
engine note, §2.5 note): semi/anti joins, rollup/cube, windows,
top-k, set ops.

Scale notes (these run at 100 TB):
- All aggregates are expressed declaratively → Catalyst plans partial
  (map-side) aggregation before the shuffle; no row ever crosses the
  network un-combined.
- Dim joins (nation/region/supplier/part/customer) use ``F.broadcast``
  → broadcast-hash join, no shuffle of the fact side.
- Double sums go through decimal accumulators (functions.scalar.dsum)
  → results are partitioning-independent, so re-running with AQE on a
  different cluster layout is bit-stable.
- Filters reference raw parquet columns directly → pushed to the scan
  (PushedFilters), and only referenced columns are read (ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions import (
    davg,
    dec2,
    dec4,
    dsum,
    dsum_expr,
    oracle_davg,
    oracle_dsum,
    oracle_dsum_expr,
)
from .registry import query

# exact-decimal product fragments shared by the oracle strings
_O_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(15,2))"
    " * (1 - CAST(l_discount AS DECIMAL(9,4)))"
)
_O_CHARGE = _O_DISC_PRICE + " * (1 + CAST(l_tax AS DECIMAL(9,4)))"

# --------------------------------------------------------------------------
# Aggregations (SURVEY §2.5)
# --------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {oracle_dsum('l_quantity')} AS sum_qty,
           {oracle_dsum('l_extendedprice')} AS sum_base_price,
           {oracle_dsum_expr(_O_DISC_PRICE)} AS sum_disc_price,
           {oracle_dsum_expr(_O_CHARGE)} AS sum_charge,
           {oracle_davg('l_quantity')} AS avg_qty,
           {oracle_davg('l_extendedprice')} AS avg_price,
           {oracle_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter + 2-key hash agg with 8 aggregates.

    Reference analogs: filtered scan S5, one-pass multi-aggregate A3/A4
    pattern (quality/checks.py:91-107 computes many counters in one
    pass — here Catalyst fuses all aggregates into one HashAggregate).
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = dec2("l_extendedprice") * (F.lit(1) - dec4("l_discount"))
    charge = disc_price * (F.lit(1) + dec4("l_tax"))
    return (
        li.where(F.to_date("l_shipdate") <= F.lit("2000-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum_expr(disc_price, "sum_disc_price"),
            dsum_expr(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q2_group_count_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q2_group_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash agg with COUNT DISTINCT (expands to two-phase agg in Spark)."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


@query(
    "q3_null_and_range_audit",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_totalprice,
           CAST(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT) AS negative_totalprice,
           CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS bad_status
    FROM orders
    """,
)
def q3_null_and_range_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quality-gate aggregate shape (SURVEY §2.11): every rule as a
    ``sum(when(...))`` counter, all computed in ONE pass over the table
    (reference runs one filter per rule, quality/checks.py:100-107)."""
    o = load(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0)).alias(
            "null_totalprice"
        ),
        F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(0)).alias(
            "negative_totalprice"
        ),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        ).alias("bad_status"),
    )


# --------------------------------------------------------------------------
# Joins (SURVEY §2.4: equi/semi/anti + broadcast star joins J4)
# --------------------------------------------------------------------------


@query(
    "q4_star_join_revenue",
    oracle=f"""
    SELECT r_name AS region, n_name AS nation,
           {oracle_dsum_expr(_O_DISC_PRICE)} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderstatus = 'F'
    GROUP BY r_name, n_name
    """,
)
def q4_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way star join: fact(lineitem) ⋈ orders ⋈ broadcast dims.

    lineitem⋈orders is the one genuine shuffle (both big, equi-key);
    customer/nation/region ride broadcast-hash joins — no fact shuffle.
    At 100 TB: co-partition lineitem/orders on orderkey (bucketing) to
    elide the big shuffle too.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    disc_price = dec2("l_extendedprice") * (F.lit(1) - dec4("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            dsum_expr(disc_price, "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q5_semi_join_exists",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 200000)
    GROUP BY c_mktsegment
    """,
)
def q5_semi_join_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join = EXISTS (engine-note surface, SURVEY §2.4)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 200000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "q6_anti_join_not_exists",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_without_orders
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def q6_anti_join_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join = NOT EXISTS — also the referential-integrity test
    shape (J2/J3: dbt relationships test as anti-join)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_without_orders"))
    )


@query(
    "q7_left_outer_join_null_handling",
    oracle="""
    SELECT n_name AS nation,
           CAST(COUNT(s_suppkey) AS BIGINT) AS n_suppliers,
           CAST(ROUND(COALESCE(SUM(CAST(s_acctbal AS DECIMAL(27,4))), 0), 4) AS DOUBLE) AS total_acctbal
    FROM nation
    LEFT JOIN supplier ON n_nationkey = s_nationkey
    GROUP BY n_name
    """,
)
def q7_left_outer_join_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join with null-aware aggregates (COUNT(col) skips
    nulls; SUM over empty group coalesced to 0)."""
    n = load(spark, sf_dir, "nation")
    s = load(spark, sf_dir, "supplier")
    return (
        n.join(s, n.n_nationkey == s.s_nationkey, "left")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("s_suppkey").alias("n_suppliers"),
            F.round(
                F.coalesce(F.sum(F.col("s_acctbal").cast("decimal(27,4)")), F.lit(0)),
                4,
            )
            .cast("double")
            .alias("total_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# Window functions (engine surface per SURVEY §2.6 note)
# --------------------------------------------------------------------------


@query(
    "q8_window_rank_topk_per_group",
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice, rk
    FROM (
      SELECT c_mktsegment, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders JOIN customer ON o_custkey = c_custkey
    ) t WHERE rk <= 5
    """,
)
def q8_window_rank_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via row_number window (deterministic tiebreak on
    the unique key — required for oracle parity AND reproducibility)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
    )


@query(
    "q9_window_lag_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           LAG(o_orderkey) OVER w AS prev_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) OVER
                (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q9_window_lag_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG + running sum frames. The running sum accumulates DECIMAL so
    the per-row prefix values are engine- and partitioning-independent."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.sum(dec2("o_totalprice"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_spend"),
    )


# --------------------------------------------------------------------------
# Grouping sets / rollup / cube (free from Spark, SURVEY §2.5 note)
# --------------------------------------------------------------------------


@query(
    "q10_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(27,4))), 4) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q10_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"), F.count(F.lit(1)).alias("n")
    )


@query(
    "q11_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(27,4))), 4) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q11_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "total")
    )


# --------------------------------------------------------------------------
# Set operations (SURVEY §2.7)
# --------------------------------------------------------------------------


@query(
    "q12_set_ops",
    oracle="""
    SELECT c_nationkey, kind FROM (
      SELECT c_nationkey, 'both' AS kind FROM
        (SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
         INTERSECT
         SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      UNION ALL
      SELECT c_nationkey, 'building_only' AS kind FROM
        (SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
         EXCEPT
         SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY')
    ) t
    """,
)
def q12_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL composition (U1 + built-ins)."""
    c = load(spark, sf_dir, "customer")
    b = c.where(F.col("c_mktsegment") == "BUILDING").select("c_nationkey").distinct()
    m = c.where(F.col("c_mktsegment") == "MACHINERY").select("c_nationkey").distinct()
    both = b.intersect(m).withColumn("kind", F.lit("both"))
    only = b.exceptAll(m).withColumn("kind", F.lit("building_only"))
    return both.unionByName(only)


# --------------------------------------------------------------------------
# Sort / limit / top-k (SURVEY §2.6)
# --------------------------------------------------------------------------


@query(
    "q13_global_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q13_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT — Spark plans TakeOrderedAndProject:
    per-partition top-k then a k-row merge on the driver; no total sort
    at any scale. Deterministic via unique-key tiebreak."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Scalar functions: string / date / hash (SURVEY §2.8)
# --------------------------------------------------------------------------


@query(
    "q14_string_functions",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand) AS brand_upper,
           LENGTH(p_name) AS name_len,
           SUBSTR(p_type, 1, 5) AS type_prefix,
           CONCAT_WS('|', p_brand, CAST(p_size AS VARCHAR)) AS brand_size,
           MD5(CONCAT_WS('|', p_brand, p_type)) AS brand_type_key
    FROM part
    WHERE p_name LIKE '%gre%'
    """,
)
def q14_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X2 surrogate-key scalars + LIKE filter + string projection."""
    p = load(spark, sf_dir, "part")
    return p.where(F.col("p_name").like("%gre%")).select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("|", F.col("p_brand"), F.col("p_size").cast("string")).alias(
            "brand_size"
        ),
        F.md5(F.concat_ws("|", F.col("p_brand"), F.col("p_type"))).alias(
            "brand_type_key"
        ),
    )


@query(
    "q15_date_functions",
    oracle="""
    SELECT STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
           EXTRACT(year FROM o_orderdate) AS yr,
           EXTRACT(month FROM o_orderdate) AS mo,
           EXTRACT(isodow FROM o_orderdate) AS iso_dow,
           EXTRACT(week FROM o_orderdate) AS iso_week,
           COUNT(*) AS n
    FROM orders
    GROUP BY 1, 2, 3, 4, 5
    """,
)
def q15_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3-X6 date-part parity incl. the isodow re-anchor (dim_date
    semantics, dbt/models/analytics/dim_date.sql:1-13)."""
    from ..functions import iso_dow

    o = load(spark, sf_dir, "orders")
    return (
        o.select(
            # emit the date as a 'yyyy-MM-dd' string: DATE-typed results
            # surface as midnight timestamps from some clients, which
            # breaks cross-engine value comparison (SURVEY §7 risk 3)
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mo"),
            iso_dow("o_orderdate").cast("long").alias("iso_dow"),
            F.weekofyear("o_orderdate").cast("long").alias("iso_week"),
        )
        .groupBy("order_date", "yr", "mo", "iso_dow", "iso_week")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q16_conditional_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_partial
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q16_conditional_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual pivot via conditional aggregation (one pass, map-side
    combinable — scales better than .pivot() metadata inference)."""
    o = load(spark, sf_dir, "orders")

    def cnt(status: str, alias: str):
        return F.sum(
            F.when(F.col("o_orderstatus") == status, 1).otherwise(0)
        ).alias(alias)

    return o.groupBy("o_orderpriority").agg(
        cnt("O", "n_open"), cnt("F", "n_finished"), cnt("P", "n_partial")
    )


@query(
    "q17_distinct_projection",
    oracle="""
    SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
    """,
)
def q17_distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: DISTINCT projection (the dim_location/dim_date build shape)."""
    return load(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()


@query(
    "q18_having_group_filter",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(27,4))), 4) AS DOUBLE) AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) > 20
    """,
)
def q18_having_group_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING = post-aggregation filter (A1 duplicate-finder shape:
    group-count then filter on the count, quality/checks.py:93-97)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "spend"))
        .where(F.col("n_orders") > 20)
    )


@query(
    "q19_duplicate_audit",
    oracle="""
    SELECT user_id, event_type,
           CAST(n AS BIGINT) AS n_rows,
           CAST(n - 1 AS BIGINT) AS surplus
    FROM (SELECT user_id, event_type, COUNT(*) AS n
          FROM events GROUP BY user_id, event_type) t
    WHERE n > 1
    """,
)
def q19_duplicate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2: the duplicate-finder aggregate (reference quality/
    checks.py:93-98 — group-count on the key, filter count>1, surplus
    = count-1 per key)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .where(F.col("n_rows") > 1)
        .select(
            "user_id",
            "event_type",
            "n_rows",
            (F.col("n_rows") - 1).alias("surplus"),
        )
    )


@query(
    "q20_percentiles",
    oracle="""
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
           ROUND(MIN(o_totalprice), 4) AS min_price,
           ROUND(MAX(o_totalprice), 4) AS max_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q20_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (both engines implement the
    standard (1-g)*lo + g*hi continuous quantile over the sorted
    group; interpolation on exact 2-decimal inputs is deterministic)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
        F.round(F.min("o_totalprice"), 4).alias("min_price"),
        F.round(F.max("o_totalprice"), 4).alias("max_price"),
    )


@query(
    "q21_shipping_priority_topk",
    oracle=f"""
    SELECT l_orderkey,
           {oracle_dsum_expr(_O_DISC_PRICE)} AS revenue,
           STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND CAST(o_orderdate AS DATE) < DATE '1998-03-15'
      AND CAST(l_shipdate AS DATE) > DATE '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q21_shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective 3-way join + agg + global top-k.

    Both date filters push into the scans; TakeOrderedAndProject caps
    the sort at k rows per partition."""
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").where(
        F.to_date("o_orderdate") < F.lit("1998-03-15").cast("date")
    )
    li = load(spark, sf_dir, "lineitem").where(
        F.to_date("l_shipdate") > F.lit("1998-03-15").cast("date")
    )
    disc_price = dec2("l_extendedprice") * (F.lit(1) - dec4("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum_expr(disc_price, "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "q22_above_customer_average",
    oracle="""
    WITH cust_avg AS (
      SELECT o_custkey AS ck,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE)
               / COUNT(*) AS avg_price
      FROM orders GROUP BY o_custkey
    )
    SELECT o_orderkey, o_custkey, o_totalprice,
           avg_price AS cust_avg_price
    FROM orders JOIN cust_avg ON o_custkey = ck
    WHERE o_totalprice > 1.5 * avg_price
    """,
)
def q22_above_customer_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape, decorrelated as aggregate + self-join
    (what Catalyst does to correlated scalar subqueries)."""
    o = load(spark, sf_dir, "orders")
    cust_avg = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(27,4)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_price")
    )
    return (
        o.join(cust_avg, o.o_custkey == cust_avg.ck)
        .where(F.col("o_totalprice") > 1.5 * F.col("avg_price"))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            # no ROUND here: the quotient is an exact-decimal sum over a
            # count — already bit-identical across engines, and rounding
            # doubles diverges exactly when the value IS a decimal tie
            F.col("avg_price").alias("cust_avg_price"),
        )
    )


@query(
    "q23_regexp_extract",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head,
           CASE WHEN regexp_matches(p_name, '(red|green|blue)')
                THEN regexp_extract(p_name, '(red|green|blue)', 1)
                ELSE '' END AS color,
           CAST(regexp_replace(p_brand, '[^0-9]', '', 'g') AS BIGINT) AS brand_num
    FROM part
    WHERE p_size BETWEEN 10 AND 20
    """,
)
def q23_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar surface: extract/replace/match (Java and RE2 agree
    on this ASCII subset). Range predicate pushes to the scan."""
    p = load(spark, sf_dir, "part")
    return p.where(F.col("p_size").between(10, 20)).select(
        "p_partkey",
        F.regexp_extract("p_type", "^([A-Z]+)", 1).alias("type_head"),
        F.regexp_extract("p_name", "(red|green|blue)", 1).alias("color"),
        F.regexp_replace("p_brand", "[^0-9]", "").cast("long").alias("brand_num"),
    )


@query(
    "q24_monthly_rollup",
    oracle="""
    SELECT STRFTIME(date_trunc('month', CAST(o_orderdate AS DATE)), '%Y-%m-%d')
             AS order_month,
           o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(27,4))), 4) AS DOUBLE)
             AS monthly_total
    FROM orders
    GROUP BY 1, 2
    """,
)
def q24_monthly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc month rollup — the calendar-bucketed aggregate every
    warehouse runs; at scale the natural partition key for orders."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "order_month"
            ),
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "monthly_total"),
        )
    )


@query(
    "q25_nation_supplier_balance",
    oracle="""
    SELECT n_name,
           CAST(COUNT(CASE WHEN s_acctbal > 0 THEN 1 END) AS BIGINT) AS n_positive,
           CAST(COUNT(CASE WHEN s_acctbal <= 0 THEN 1 END) AS BIGINT) AS n_nonpositive,
           CAST(ROUND(MAX(CAST(s_acctbal AS DECIMAL(15,2))), 4) AS DOUBLE) AS max_bal,
           CAST(ROUND(MIN(CAST(s_acctbal AS DECIMAL(15,2))), 4) AS DOUBLE) AS min_bal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    HAVING COUNT(*) >= 1
    """,
)
def q25_nation_supplier_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional COUNT + decimal-exact MIN/MAX over a broadcast join."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.when(F.col("s_acctbal") > 0, 1)).alias("n_positive"),
            F.count(F.when(F.col("s_acctbal") <= 0, 1)).alias("n_nonpositive"),
            F.round(F.max(dec2("s_acctbal")), 4).cast("double").alias("max_bal"),
            F.round(F.min(dec2("s_acctbal")), 4).cast("double").alias("min_bal"),
            F.count(F.lit(1)).alias("__n"),
        )
        .where(F.col("__n") >= 1)
        .drop("__n")
    )


@query(
    "q26_grouping_sets",
    oracle="""
    SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
           COALESCE(l_linestatus, '<all>') AS linestatus,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(27,4))), 4) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q26_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (SQL-authored; rollup/cube's general
    form). NULL group markers coalesced to '<all>' so the driver's
    value hash can't confuse a grouping null with a data null."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
               COALESCE(l_linestatus, '<all>') AS linestatus,
               COUNT(*) AS n,
               CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(27,4))), 4) AS DOUBLE) AS qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "q27_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(ROUND(SUM(CASE WHEN l_linestatus = 'O'
                               THEN CAST(l_quantity AS DECIMAL(27,4)) END), 4)
                AS DOUBLE) AS O,
           CAST(ROUND(SUM(CASE WHEN l_linestatus = 'F'
                               THEN CAST(l_quantity AS DECIMAL(27,4)) END), 4)
                AS DOUBLE) AS F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q27_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The .pivot() API with explicit values (no metadata-discovery
    pass — listing the pivot values keeps it one job at any scale)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(
            F.round(F.sum(F.col("l_quantity").cast("decimal(27,4)")), 4).cast(
                "double"
            )
        )
    )


@query(
    "q28_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, value FROM (
      SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value
      FROM lineitem WHERE l_orderkey <= 100
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'discount', l_discount
      FROM lineitem WHERE l_orderkey <= 100
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'tax', l_tax
      FROM lineitem WHERE l_orderkey <= 100
    ) t
    """,
)
def q28_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unpivot/melt: wide measures -> (measure, value) rows
    (DataFrame.unpivot = the stack() path; row explosion is
    partition-local, no shuffle)."""
    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 100)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "measure",
        "value",
    ).withColumn(
        "measure",
        F.when(F.col("measure") == "l_quantity", "quantity")
        .when(F.col("measure") == "l_discount", "discount")
        .otherwise("tax"),
    )


@query(
    "q29_sorted_array_agg",
    oracle="""
    SELECT o_custkey,
           array_to_string(list(o_orderkey ORDER BY o_orderkey), ',') AS order_keys,
           COUNT(*) AS n_orders
    FROM orders
    WHERE o_custkey <= 50
    GROUP BY o_custkey
    """,
)
def q29_sorted_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered collect: array_agg sorted deterministically then joined
    to a string (collect_list order is partition-dependent — the sort
    is what makes the result reproducible)."""
    o = load(spark, sf_dir, "orders").where(F.col("o_custkey") <= 50)
    return o.groupBy("o_custkey").agg(
        F.array_join(F.array_sort(F.collect_list("o_orderkey")), ",").alias(
            "order_keys"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "q30_salted_join_agg",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(27,4))), 4) AS DOUBLE)
             AS nation_spend
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
    """,
)
def q30_salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant salted join under the correctness gate: the
    salted formulation (operators/partitioning.salted_join — hot keys
    scattered over 8 deterministic salt buckets, small side replicated)
    must produce EXACTLY the plain join's aggregate."""
    from ..operators.partitioning import salted_join

    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"), "o_totalprice", "o_orderkey"
    )
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), "c_nationkey"
    )
    joined = salted_join(o, c, "k", salt_buckets=8, scatter_col="o_orderkey")
    return joined.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "nation_spend"),
    )


@query(
    "q31_approx_sketches",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS exact_median,
           TRUE AS approx_cd_in_bound,
           TRUE AS approx_median_in_bound
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q31_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate sketch surface: approx_count_distinct (HLL++) and
    percentile_approx (GK quantile summaries) — the constant-memory
    counterparts of q2/q20 for 100 TB interactive profiling.

    Fully oracled since r10 (it was the registry's last rows-only
    entry): raw sketch values are engine-specific by design, so the
    output carries EXACT anchors (count, exact distinct, exact
    interpolated median — all hash-checked cross-engine) plus two
    booleans asserting each sketch lands inside its accuracy
    contract: HLL++ at default rsd=0.05 within 15% (3 sigma) of the
    exact distinct count, and percentile_approx(accuracy=1000),
    whose rank-error guarantee is n/1000, between the exact 0.45 and
    0.55 quantiles (50x slack on the guarantee). The booleans are
    deterministic for fixed data, so the oracle pins them TRUE — a
    broken sketch (or a Spark regression in either algorithm) flips
    a bit and fails the value hash."""
    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("l_partkey").cast("long").alias("exact_parts"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias(
            "exact_median"
        ),
        F.approx_count_distinct("l_partkey").alias("__approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias(
            "__approx_median"
        ),
        F.expr("percentile(l_extendedprice, 0.45)").alias("__p45"),
        F.expr("percentile(l_extendedprice, 0.55)").alias("__p55"),
    )
    return agg.select(
        "l_returnflag",
        "n",
        "exact_parts",
        "exact_median",
        (
            F.abs(F.col("__approx_parts") - F.col("exact_parts"))
            <= F.col("exact_parts") * F.lit(0.15)
        ).alias("approx_cd_in_bound"),
        F.col("__approx_median")
        .between(F.col("__p45"), F.col("__p55"))
        .alias("approx_median_in_bound"),
    )


_Q32_SQL = """
    SELECT n_name,
           (SELECT COUNT(*) FROM customer WHERE c_nationkey = n_nationkey)
             AS n_customers
    FROM nation
    WHERE EXISTS (
      SELECT 1 FROM customer
      WHERE c_nationkey = n_nationkey
        AND c_custkey IN (SELECT o_custkey FROM orders
                          GROUP BY o_custkey HAVING COUNT(*) > 25)
    )
"""


@query("q32_nested_exists_in", oracle=_Q32_SQL)
def q32_nested_exists_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: EXISTS containing an IN over an aggregated
    subquery, plus a correlated scalar subquery in the projection.
    Catalyst decorrelates all three into joins (no per-row re-execution
    — verify: the plan is joins + aggregates, SURVEY §4.2). Same SQL
    text runs on both engines."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_Q32_SQL)


_Q33_SQL = """
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
"""


@query("q33_exists_and_not_exists", oracle=_Q33_SQL)
def q33_exists_and_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: conjunction of EXISTS and NOT EXISTS on the
    same table -> semi-join + anti-join stack over one orders scan."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_Q33_SQL)
