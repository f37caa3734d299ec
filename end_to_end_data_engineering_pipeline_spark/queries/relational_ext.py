"""Extended relational coverage: the join/window/date shapes q1-q33
leave out.

Completes the engine-note surface of SURVEY §2.4/§2.5/§2.6: full outer
join, min-per-group join-back (TPC-H Q2 shape), null-aware NOT IN
(TPC-H Q16 shape), positional explode (lateral view), date/interval
arithmetic, RANGE-frame windows, dense-report cross-join spines,
first/last/nth window navigation, and numeric bucketing.

Scale notes (these run at 100 TB):
- q35's join-back touches lineitem twice but the second pass joins a
  pre-aggregated (partkey, min) table — shuffle on l_partkey both
  times, so with AQE the Exchange is reused, not recomputed.
- q36's NOT IN compiles to a null-aware anti join; the subquery side
  (suppliers in debt) is tiny → broadcast, no fact shuffle.
- q39's RANGE frame is value-based: ties are peers, so results are
  partitioning-independent — the safe default for money-window
  features at scale (ROWS frames need a unique-key tiebreak).
- q40 cross-joins two DISTINCT spines that are small by construction
  (months × flags) — both broadcast; the fact side aggregates before
  any join, so the NL join sees thousands of rows, not billions.
- q37's posexplode is partition-local (no shuffle); row explosion is
  bounded by tokens-per-doc, and the downstream agg combines
  map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from .registry import query

# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------


@query(
    "q34_full_outer_join",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_customers
               FROM customer GROUP BY c_nationkey),
         s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers
               FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(n_customers, 0) AS n_customers,
           COALESCE(n_suppliers, 0) AS n_suppliers
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
)
def q34_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates with key coalescing — the
    missing member of the q5/q6/q7 join family. Both inputs aggregate
    BEFORE the join (partial agg map-side), so the outer join runs on
    |nations|-sized inputs regardless of fact size."""
    c = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return c.join(s, "nk", "full_outer").select(
        F.col("nk").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


@query(
    "q35_min_per_group_joinback",
    oracle="""
    WITH m AS (SELECT l_partkey, MIN(l_extendedprice) AS min_price
               FROM lineitem GROUP BY l_partkey)
    SELECT l.l_partkey,
           CAST(m.min_price AS DOUBLE) AS min_price,
           MIN(l.l_suppkey) AS best_suppkey
    FROM lineitem l
    JOIN m ON l.l_partkey = m.l_partkey
          AND l.l_extendedprice = m.min_price
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 10
    GROUP BY l.l_partkey, m.min_price
    """,
)
def q35_min_per_group_joinback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest row per group found by aggregating then
    joining back on (group, min) — with MIN(suppkey) breaking price
    ties deterministically. The join-back equality on the double is
    exact: MIN returns a stored value, not an arithmetic result.
    Both lineitem passes shuffle on l_partkey → AQE reuses the
    exchange; part is a broadcast dim filter."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_size") <= 10)
    m = (
        li.groupBy(F.col("l_partkey").alias("m_partkey"))
        .agg(F.min("l_extendedprice").alias("min_price"))
    )
    return (
        li.join(
            m,
            (F.col("l_partkey") == F.col("m_partkey"))
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "min_price")
        .agg(F.min("l_suppkey").alias("best_suppkey"))
        .select(
            "l_partkey",
            F.col("min_price").cast("double").alias("min_price"),
            "best_suppkey",
        )
    )


@query(
    "q36_notin_count_distinct",
    oracle="""
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_size IN (1, 4, 7, 10, 13)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    """,
)
def q36_notin_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN over a subquery + COUNT DISTINCT per
    attribute pair. The subquery key is non-null so NOT IN ≡ left
    anti join (Catalyst would otherwise plan the null-aware variant);
    the in-debt supplier list is tiny → broadcast anti join, and part
    is a broadcast dim — the only shuffle is the distinct agg."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#45") & F.col("p_size").isin(1, 4, 7, 10, 13)
    )
    in_debt = load(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        li.join(F.broadcast(in_debt), "l_suppkey", "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Lateral / positional explode
# --------------------------------------------------------------------------


@query(
    "q37_posexplode_tokens",
    oracle="""
    SELECT doc_id,
           generate_subscripts(toks, 1) - 1 AS pos,
           unnest(toks) AS tok
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
          FROM documents WHERE doc_id <= 50) t
    """,
)
def q37_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW posexplode: tokenize each document and keep token
    position — the row-generating operator (UDTF shape) the reference's
    array flatten (F1) generalizes to. Explosion is partition-local:
    no shuffle, rows fan out inside the scan stage."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") <= 50)
    return d.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), "\\s+")).alias("pos", "tok"),
    )


# --------------------------------------------------------------------------
# Date / interval arithmetic
# --------------------------------------------------------------------------


@query(
    "q38_date_arithmetic",
    oracle="""
    SELECT o_orderkey, l_linenumber,
           datediff('day', CAST(o_orderdate AS DATE),
                    CAST(l_shipdate AS DATE)) AS ship_delay_days,
           STRFTIME(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE),
                    '%Y-%m-%d') AS plus3m,
           STRFTIME(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
             AS month_end,
           STRFTIME(CAST(date_trunc('quarter', CAST(o_orderdate AS DATE))
                         AS DATE), '%Y-%m-%d') AS qtr_start
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey <= 200
    """,
)
def q38_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic parity: day diffs, month addition (both
    engines clamp Jan-31 + 1m → Feb-28/29), month-end, quarter trunc.
    Complements q15's date-part extraction (X3-X6)."""
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 200)
    li = load(spark, sf_dir, "lineitem")
    od = F.to_date("o_orderdate")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            o.o_orderkey,
            li.l_linenumber,
            F.datediff(F.to_date("l_shipdate"), od).alias("ship_delay_days"),
            # dates emitted as 'yyyy-MM-dd' strings (repo determinism
            # rule: DATE results surface as midnight timestamps from
            # some clients, breaking cross-engine value comparison)
            F.date_format(F.add_months(od, 3), "yyyy-MM-dd").alias("plus3m"),
            F.date_format(F.last_day(od), "yyyy-MM-dd").alias("month_end"),
            F.date_format(F.date_trunc("quarter", od), "yyyy-MM-dd").alias(
                "qtr_start"
            ),
        )
    )


# --------------------------------------------------------------------------
# Window frames / navigation
# --------------------------------------------------------------------------


@query(
    "q39_range_frame_window",
    oracle="""
    SELECT o_orderkey, o_custkey,
           COUNT(*) OVER w AS n_orders_30d,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(27,4))) OVER w, 4)
                AS DOUBLE) AS spend_30d
    FROM orders
    WHERE o_custkey <= 100
    WINDOW w AS (
      PARTITION BY o_custkey
      ORDER BY datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
      RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
    """,
)
def q39_range_frame_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-day trailing count/spend per customer via a RANGE frame over
    a day index. RANGE is value-based — same-day orders are peers and
    always aggregate together, so the result is independent of row
    order / partition layout (a ROWS frame here would need a unique
    tiebreak; q9 shows that variant). Decimal accumulator keeps the
    windowed SUM order-independent too."""
    o = load(spark, sf_dir, "orders").where(F.col("o_custkey") <= 100)
    day_idx = F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day_idx)
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(27,4)")).over(w), 4)
        .cast("double")
        .alias("spend_30d"),
    )


@query(
    "q41_window_navigation",
    oracle="""
    SELECT o_orderkey, o_custkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey) OVER w AS last_order,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_order
    FROM orders
    WHERE o_custkey <= 100
    WINDOW w AS (
      PARTITION BY o_custkey
      ORDER BY CAST(o_orderdate AS DATE), o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q41_window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over an explicit unbounded
    frame (the default frame stops at CURRENT ROW, which makes
    last_value a footgun in both engines). Order carries an o_orderkey
    tiebreak so navigation is deterministic."""
    o = load(spark, sf_dir, "orders").where(F.col("o_custkey") <= 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.to_date("o_orderdate"), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


# --------------------------------------------------------------------------
# Dense reports / bucketing
# --------------------------------------------------------------------------


@query(
    "q40_dense_report_spine",
    oracle="""
    WITH months AS (SELECT DISTINCT
                      STRFTIME(CAST(date_trunc('month', CAST(l_shipdate AS DATE))
                                    AS DATE), '%Y-%m-%d') AS m
                    FROM lineitem),
         flags AS (SELECT DISTINCT l_returnflag AS f FROM lineitem),
         actual AS (SELECT
                      STRFTIME(CAST(date_trunc('month', CAST(l_shipdate AS DATE))
                                    AS DATE), '%Y-%m-%d') AS m,
                      l_returnflag AS f, COUNT(*) AS n
                    FROM lineitem GROUP BY 1, 2)
    SELECT months.m AS ship_month, flags.f AS returnflag,
           COALESCE(actual.n, 0) AS n_items
    FROM months CROSS JOIN flags
    LEFT JOIN actual ON months.m = actual.m AND flags.f = actual.f
    """,
)
def q40_dense_report_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense report: cross-join a (month × flag) spine, left-join the
    actual aggregate, zero-fill gaps — the standard fix for BI charts
    dropping empty buckets. The fact table aggregates FIRST; the cross
    join only ever sees the two tiny DISTINCT spines (broadcast NL
    join on |months|·|flags| rows)."""
    li = load(spark, sf_dir, "lineitem")
    month = F.date_format(F.date_trunc("month", F.to_date("l_shipdate")), "yyyy-MM-dd")
    months = li.select(month.alias("m")).distinct()
    flags = li.select(F.col("l_returnflag").alias("f")).distinct()
    actual = (
        li.groupBy(month.alias("m"), F.col("l_returnflag").alias("f"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        months.crossJoin(F.broadcast(flags))
        .join(actual, ["m", "f"], "left")
        .select(
            F.col("m").alias("ship_month"),
            F.col("f").alias("returnflag"),
            F.coalesce("n", F.lit(0)).alias("n_items"),
        )
    )


@query(
    "q42_histogram_buckets",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
           COUNT(*) AS n_orders,
           CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
           CAST(MAX(o_totalprice) AS DOUBLE) AS hi
    FROM orders
    GROUP BY 1
    """,
)
def q42_histogram_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via integer bucketing — the constant-
    memory profiling aggregate (vs q20's exact percentiles, which
    sort). One map-side-combinable pass at any scale."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 50000).cast("long").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
        )
    )


_Q43_SQL = """
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(27,4))), 4)
                AS DOUBLE) / 7.0 AS avg_yearly,
           COUNT(*) AS n_small_orders
    FROM lineitem l JOIN part p ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (SELECT 0.2 * AVG(l_quantity) FROM lineitem
                        WHERE l_partkey = l.l_partkey)
"""


@query("q43_correlated_avg_subquery", oracle=_Q43_SQL)
def q43_correlated_avg_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar AVG subquery in the WHERE.
    Catalyst decorrelates into a per-partkey aggregate joined back to
    lineitem — one shuffle on l_partkey feeding both the aggregate and
    the probe side (AQE exchange reuse); the brand filter broadcasts.
    Same SQL text runs on both engines (the q32/q33 pattern)."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_Q43_SQL)


# --------------------------------------------------------------------------
# Scalar-function surfaces (SURVEY §2.8 breadth)
# --------------------------------------------------------------------------


@query(
    "q44_math_functions",
    oracle="""
    SELECT o_orderkey,
           ABS(o_totalprice - 100000.0) AS abs_dev,
           CAST(CEIL(o_totalprice / 1000.0) AS BIGINT) AS ceil_k,
           CAST(FLOOR(o_totalprice / 1000.0) AS BIGINT) AS floor_k,
           ROUND(SQRT(o_totalprice), 6) AS sqrt_price,
           ROUND(LN(o_totalprice), 6) AS ln_price,
           ROUND(LOG10(o_totalprice), 6) AS log10_price,
           ROUND(POWER(o_totalprice, 0.5), 6) AS pow_half,
           CAST(o_orderkey % 7 AS BIGINT) AS mod7,
           CAST(SIGN(o_totalprice - 150000.0) AS BIGINT) AS sign_dev
    FROM orders
    WHERE o_orderkey <= 500
    """,
)
def q44_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar surface: abs/ceil/floor/sqrt/ln/log10/power/mod/
    sign. All whole-stage-codegen JVM intrinsics on IEEE doubles —
    ROUND(6) guards the one place engines could differ (libm last-ulp
    on transcendentals)."""
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 500)
    tp = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.abs(tp - 100000.0).alias("abs_dev"),
        F.ceil(tp / 1000.0).cast("long").alias("ceil_k"),
        F.floor(tp / 1000.0).cast("long").alias("floor_k"),
        F.round(F.sqrt(tp), 6).alias("sqrt_price"),
        F.round(F.log(tp), 6).alias("ln_price"),
        F.round(F.log10(tp), 6).alias("log10_price"),
        F.round(F.pow(tp, 0.5), 6).alias("pow_half"),
        (F.col("o_orderkey") % 7).cast("long").alias("mod7"),
        F.signum(tp - 150000.0).cast("long").alias("sign_dev"),
    )


@query(
    "q45_null_semantics",
    oracle="""
    SELECT s_suppkey,
           COALESCE(NULLIF(s_name, ''), 'unknown') AS name_or_default,
           CASE WHEN s_acctbal < 0 THEN NULL ELSE s_acctbal END AS pos_bal,
           COALESCE(CASE WHEN s_acctbal < 0 THEN NULL
                         ELSE s_acctbal END, 0.0) AS bal_zero_filled,
           GREATEST(s_acctbal, 0.0) AS bal_clamped,
           LEAST(CAST(s_nationkey AS BIGINT), 10) AS nation_capped,
           (s_acctbal IS NULL) AS bal_is_null,
           (CASE WHEN s_acctbal < 0 THEN NULL ELSE s_acctbal END
              IS DISTINCT FROM s_acctbal) AS was_nulled
    FROM supplier
    """,
)
def q45_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics surface: coalesce/nullif/greatest/least/
    IS DISTINCT FROM (null-safe compare = Spark's eqNullSafe). These
    are the expressions every silver-layer cleaning rule builds on
    (reference clean_data.py drop_nulls + lenient casts)."""
    s = load(spark, sf_dir, "supplier")
    pos_bal = F.when(F.col("s_acctbal") < 0, F.lit(None)).otherwise(
        F.col("s_acctbal")
    )
    return s.select(
        "s_suppkey",
        F.coalesce(
            F.nullif(F.col("s_name"), F.lit("")), F.lit("unknown")
        ).alias("name_or_default"),
        pos_bal.alias("pos_bal"),
        F.coalesce(pos_bal, F.lit(0.0)).alias("bal_zero_filled"),
        F.greatest(F.col("s_acctbal"), F.lit(0.0)).alias("bal_clamped"),
        F.least(F.col("s_nationkey").cast("long"), F.lit(10)).alias(
            "nation_capped"
        ),
        F.col("s_acctbal").isNull().alias("bal_is_null"),
        (~pos_bal.eqNullSafe(F.col("s_acctbal"))).alias("was_nulled"),
    )


@query(
    "q46_string_advanced",
    oracle="""
    SELECT p_partkey,
           LPAD(CAST(p_partkey AS VARCHAR), 10, '0') AS padded_key,
           TRANSLATE(p_brand, '#', '-') AS brand_dashed,
           REVERSE(p_brand) AS brand_rev,
           REPEAT('*', p_size % 5) AS stars,
           SPLIT_PART(p_type, ' ', 1) AS type_head,
           INSTR(p_name, 'a') AS first_a,
           SUBSTR(p_name, 1, 8) AS name_prefix,
           LENGTH(REPLACE(p_name, ' ', '')) AS n_nonspace
    FROM part
    WHERE p_partkey <= 500
    """,
)
def q46_string_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar surface beyond q14: lpad/translate/reverse/
    repeat/split_part/instr/substr — the ID-formatting and
    token-surgery helpers ETL key-building leans on (X1/X2 family)."""
    p = load(spark, sf_dir, "part").where(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("padded_key"),
        F.translate("p_brand", "#", "-").alias("brand_dashed"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat(F.lit("*"), (F.col("p_size") % 5).cast("int")).alias("stars"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.instr("p_name", "a").cast("long").alias("first_a"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length(F.regexp_replace("p_name", " ", "")).cast("long").alias(
            "n_nonspace"
        ),
    )


@query(
    "q47_nation_trade_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           EXTRACT(year FROM CAST(l_shipdate AS DATE)) AS l_year,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(15,2))
                          * (1 - CAST(l_discount AS DECIMAL(9,4)))), 4)
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND CAST(l_shipdate AS DATE)
          BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
    GROUP BY 1, 2, 3
    """,
)
def q47_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bi-national trade volume by year. Five-way join
    where every dim (customer/supplier/nation x2) broadcasts and the
    only shuffles are lineitem->orders on orderkey and the final
    3-key aggregate; the nation-pair predicate prunes suppliers and
    customers BEFORE their joins (filter pushdown through the
    broadcast)."""
    from ..functions import dec2, dec4, dsum_expr

    li = load(spark, sf_dir, "lineitem").where(
        F.to_date("l_shipdate").between("1995-01-01", "1996-12-31")
    )
    o = load(spark, sf_dir, "orders")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    ).where(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    ).where(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk")
    )
    c = load(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk")
    )
    disc_price = dec2("l_extendedprice") * (F.lit(1) - dec4("l_discount"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.to_date("l_shipdate")).cast("long").alias("l_year"),
        )
        .agg(
            dsum_expr(disc_price, "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q48_market_share",
    oracle="""
    WITH rev AS (
      SELECT EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS o_year,
             n_name AS supp_nation,
             SUM(CAST(l_extendedprice AS DECIMAL(15,2))
                 * (1 - CAST(l_discount AS DECIMAL(9,4)))) AS volume
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      GROUP BY 1, 2
    )
    SELECT o_year, supp_nation,
           CAST(ROUND(volume, 4) AS DOUBLE) AS nation_volume,
           ROUND(CAST(ROUND(volume, 4) AS DOUBLE) * 1000000
                 / CAST(ROUND(SUM(volume) OVER (PARTITION BY o_year), 4)
                        AS DOUBLE), 4) AS share_ppm
    FROM rev
    """,
)
def q48_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: per-nation revenue share of the yearly total —
    a ratio of two decimal sums (aggregate + windowed re-aggregate
    over the tiny (year, nation) grid; the window runs on ~|years| x
    |nations| rows, never on lineitem). The division is exact-decimal
    scaled to ppm THEN rounded — one correctly-rounded double cast in
    both engines."""
    from ..functions import dec2, dec4

    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    disc_price = dec2("l_extendedprice") * (F.lit(1) - dec4("l_discount"))
    rev = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.year(F.to_date("o_orderdate")).cast("long").alias("o_year"),
            F.col("n_name").alias("supp_nation"),
        )
        .agg(F.sum(disc_price).alias("volume"))
    )
    w = Window.partitionBy("o_year")
    return rev.select(
        "o_year",
        "supp_nation",
        F.round("volume", 4).cast("double").alias("nation_volume"),
        # divide DOUBLES, not decimals: decimal-division scale rules
        # differ across engines in the last digit; rounding each sum to
        # an exact decimal first makes both engines perform the same
        # single IEEE division
        F.round(
            F.round("volume", 4).cast("double") * 1000000
            / F.round(F.sum("volume").over(w), 4).cast("double"),
            4,
        ).alias("share_ppm"),
    )


@query(
    "q49_rank_distribution",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           CAST(NTILE(4) OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal DESC, c_custkey)
                AS BIGINT) AS quartile
    FROM customer
    WHERE c_custkey <= 300
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC)
    """,
)
def q49_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-family windows: rank/dense_rank/percent_rank/cume_dist
    (tie-stable: they depend only on the ORDER BY values) and ntile
    (row-order dependent -> unique c_custkey tiebreak). The
    quality-percentile scoring shape for corpus curation at scale."""
    c = load(spark, sf_dir, "customer").where(F.col("c_custkey") <= 300)
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc())
    wt = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(wt).cast("long").alias("quartile"),
    )


@query(
    "q50_disjunctive_join_predicates",
    oracle="""
    SELECT COUNT(*) AS n_items,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(15,2))
                          * (1 - CAST(l_discount AS DECIMAL(9,4)))), 4)
                AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q50_disjunctive_join_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-conjunctions mixing both join sides.
    Catalyst extracts the common single-side conjuncts (brand IN /
    size, quantity ranges) below the join, so the broadcast hash join
    probes a pre-filtered part table and only the residual disjunction
    evaluates post-join — the standard test that disjunctive
    predicates don't force a cartesian residual."""
    from ..functions import dec2, dec4, dsum_expr

    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15)
           & q.between(20, 30))
    )
    disc_price = dec2("l_extendedprice") * (F.lit(1) - dec4("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum_expr(disc_price, "revenue"),
        )
    )


@query(
    "q51_promo_revenue_share",
    oracle="""
    SELECT
      CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO'
                          THEN CAST(l_extendedprice AS DECIMAL(15,2))
                               * (1 - CAST(l_discount AS DECIMAL(9,4)))
                          ELSE 0 END), 4) AS DOUBLE) AS promo_revenue,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(15,2))
                     * (1 - CAST(l_discount AS DECIMAL(9,4)))), 4)
           AS DOUBLE) AS total_revenue,
      ROUND(CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO'
                                THEN CAST(l_extendedprice AS DECIMAL(15,2))
                                     * (1 - CAST(l_discount AS DECIMAL(9,4)))
                                ELSE 0 END), 4) AS DOUBLE) * 100
            / CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(15,2))
                             * (1 - CAST(l_discount AS DECIMAL(9,4)))), 4)
                   AS DOUBLE), 4) AS promo_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1995-09-01'
                                       AND DATE '1995-09-30'
    """,
)
def q51_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional revenue share (promo %) in one
    pass — CASE inside the aggregate, no second scan; the ratio
    divides two exact-decimal-rounded doubles (one IEEE division,
    engine-independent)."""
    from ..functions import dec2, dec4

    li = load(spark, sf_dir, "lineitem").where(
        F.to_date("l_shipdate").between("1995-09-01", "1995-09-30")
    )
    p = load(spark, sf_dir, "part")
    disc_price = dec2("l_extendedprice") * (F.lit(1) - dec4("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(
        F.lit(0).cast("decimal(24,6)")
    )
    joined = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    promo_d = F.round(F.sum(promo), 4).cast("double")
    total_d = F.round(F.sum(disc_price), 4).cast("double")
    return joined.agg(
        promo_d.alias("promo_revenue"),
        total_d.alias("total_revenue"),
        F.round(promo_d * 100 / total_d, 4).alias("promo_pct"),
    )
