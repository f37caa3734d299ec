"""TPC-H analog round-out (q52-q63): the classic decision-support
shapes q1-q51 had not yet covered, adapted to the testdata schema
(no partsupp / shipmode / phone columns — see TESTDATA.md), plus
deterministic hash-bucket sampling as a first-class operator.

Covered shapes and their TPC-H ancestors:
- q52 Q15  view-with-max (revenue view joined to its own MAX)
- q53 Q4   EXISTS with a correlated inequality (late shipments)
- q54 Q10  returned-item revenue ranking (top-k over 4-way join)
- q55 Q12  CASE-sum priority classes over a join
- q56 Q13  outer-join count distribution (distribution of counts)
- q57 Q18  IN-subquery on a grouped HAVING (large-volume orders)
- q58 Q22  anti-join + scalar avg subquery over a derived cohort
- q59 Q6   single-pass predicate aggregate (forecast revenue)
- q60 Q9   profit decomposition with expression-derived cost
- q61 Q5   six-way local-supplier join with two-column equality
- q62      deterministic Bernoulli sample (hash-bucket, operators/sampling.py)
- q63      stratified exact-k sample by hash order

Scale notes (these run at 100 TB):
- q52's revenue view is computed ONCE and reused for both the MAX and
  the join-back (Spark reuses the exchange under AQE; the MAX side
  collapses to one row and broadcasts).
- q53/q57/q58's subqueries become semi/anti joins on the fact's own
  join key — the orders/lineitem shuffle is shared with the main join.
- q54's top-k does a full sort only of the AGGREGATED result
  (|customers| rows, not |lineitem|), then limit 20.
- q60 keeps all arithmetic in exact decimal; the 5-way join broadcasts
  every dimension (part is the largest at ~2M rows/TB — still far
  under the 8GB broadcast ceiling as a pruned 2-column projection).
- q62/q63: the Bernoulli filter is a scan predicate (no shuffle); the
  stratified variant shuffles once on the stratum key. Hash-bucket
  sampling is layout- and engine-independent — same sample on
  local[32] and on 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions import dec2, dec4, dsum_expr, oracle_dsum_expr
from .registry import query

_REV = "CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(9,4)))"


def _rev_col() -> F.Column:
    return dec2("l_extendedprice") * (F.lit(1) - dec4("l_discount"))


# --------------------------------------------------------------------------
# q52 — TPC-H Q15: top supplier via revenue view + MAX join-back
# --------------------------------------------------------------------------


@query(
    "q52_top_supplier_view",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {oracle_dsum_expr(_REV)} AS total_revenue
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE)
            BETWEEN DATE '1996-01-01' AND DATE '1996-03-31'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q52_top_supplier_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (dbt-style ephemeral view reused twice —
    reference models stack views the same way, dbt/models/staging/
    stg_weather.sql over raw): build the revenue view once, take its
    MAX as a 1-row broadcast, equi-filter the view against it, then
    join supplier. Cross-engine equality on the double is exact
    because both engines round the decimal sum to scale 4 first."""
    li = load(spark, sf_dir, "lineitem").where(
        F.to_date("l_shipdate").between("1996-01-01", "1996-03-31")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum_expr(_rev_col(), "total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    top = revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx")).drop("mx")
    s = load(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(top), s.s_suppkey == top.supplier_no)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# q53 — TPC-H Q4: order priority with correlated EXISTS
# --------------------------------------------------------------------------


@query(
    "q53_late_shipment_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND CAST(l_shipdate AS DATE)
                        > CAST(o_orderdate AS DATE) + 90)
    GROUP BY o_orderpriority
    """,
)
def q53_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS with a correlated inequality (shipment
    more than 90 days after order) compiled as a LEFT SEMI join on
    orderkey with the inequality as a join residual — one shuffle on
    the shared key, no second scan of orders."""
    o = load(spark, sf_dir, "orders").where(
        (F.to_date("o_orderdate") >= "1996-01-01")
        & (F.to_date("o_orderdate") < "1996-07-01")
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (o.o_orderkey == li.l_orderkey) & (
        F.to_date(li.l_shipdate) > F.date_add(F.to_date(o.o_orderdate), 90)
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------------------
# q54 — TPC-H Q10: returned item revenue ranking
# --------------------------------------------------------------------------


@query(
    "q54_returned_items_topk",
    oracle=f"""
    SELECT c_custkey, c_name,
           {oracle_dsum_expr(_REV)} AS revenue,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q54_returned_items_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue. Aggregates to
    |customers| rows BEFORE the global sort, so the top-k sort is
    cheap; c_custkey tiebreak makes the limit deterministic
    cross-engine. customer and nation broadcast; the only big shuffle
    is lineitem->orders on orderkey."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.to_date("o_orderdate") >= "1996-01-01")
        & (F.to_date("o_orderdate") < "1997-01-01")
    )
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum_expr(_rev_col(), "revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# q55 — TPC-H Q12: CASE-sum priority classes
# --------------------------------------------------------------------------


@query(
    "q55_priority_shipping_classes",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
    GROUP BY l_linestatus
    """,
)
def q55_priority_shipping_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode column absent -> l_linestatus carries
    the grouping): conditional aggregation classifying order priority
    into high/low bands. The CASE-sums combine map-side; the 2-group
    result is tiny regardless of fact size."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").where(
        (F.to_date("l_shipdate") >= "1996-01-01")
        & (F.to_date("l_shipdate") < "1997-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# q56 — TPC-H Q13: customer order-count distribution
# --------------------------------------------------------------------------


@query(
    "q56_customer_order_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey)
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def q56_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts,
    including zero (LEFT OUTER + COUNT(col) counts only matched
    rows). Two aggregations: the first shuffles on custkey, the
    second on the |distinct counts|-sized intermediate — negligible."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# q57 — TPC-H Q18: large-volume customers (HAVING subquery via IN)
# --------------------------------------------------------------------------


@query(
    "q57_large_volume_customers",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey
                         HAVING SUM(CAST(l_quantity AS DECIMAL(15,2))) > 300)
    GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
    """,
)
def q57_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds 300,
    joined back to their customers. The IN-subquery is the same
    aggregate the outer query needs — computed once, used as a
    semi-join filter; both lineitem passes shuffle on orderkey so
    AQE reuses the exchange."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec2("l_quantity")).alias("q"))
        .where(F.col("q") > 300)
        .select("l_orderkey")
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        li.join(big.withColumnRenamed("l_orderkey", "b_orderkey"),
                F.col("l_orderkey") == F.col("b_orderkey"), "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(F.sum(dec2("l_quantity")).cast("double").alias("sum_qty"))
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "sum_qty",
        )
    )


# --------------------------------------------------------------------------
# q58 — TPC-H Q22: dormant high-balance cohorts
# --------------------------------------------------------------------------


@query(
    "q58_dormant_account_cohorts",
    oracle="""
    WITH pos AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(27,4))) AS DOUBLE)
               / COUNT(c_acctbal) AS avg_bal
      FROM customer WHERE c_acctbal > 0.0 AND c_custkey % 10 IN (1, 3, 5, 7))
    SELECT c_custkey % 10 AS cohort,
           COUNT(*) AS numcust,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(15,2))), 4) AS DOUBLE)
             AS totacctbal
    FROM customer, pos
    WHERE c_custkey % 10 IN (1, 3, 5, 7)
      AND c_acctbal > pos.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY cohort
    """,
)
def q58_dormant_account_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (no phone column -> custkey mod-10 cohorts):
    customers above the positive-balance average with NO orders,
    grouped by cohort. The scalar avg is a 1-row broadcast; NOT
    EXISTS compiles to a LEFT ANTI join against the orders key
    projection. davg convention keeps the threshold bit-identical
    across engines, so the > comparison partitions customers
    identically."""
    from ..functions import davg

    c = load(spark, sf_dir, "customer").where(
        (F.col("c_custkey") % 10).isin(1, 3, 5, 7)
    )
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal", "avg_bal")
    )
    o = load(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy((F.col("c_custkey") % 10).alias("cohort"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum_expr(dec2("c_acctbal"), "totacctbal"),
        )
    )


# --------------------------------------------------------------------------
# q59 — TPC-H Q6: forecast revenue change
# --------------------------------------------------------------------------


@query(
    "q59_forecast_revenue",
    oracle=f"""
    SELECT {oracle_dsum_expr(
        "CAST(l_extendedprice AS DECIMAL(15,2)) * CAST(l_discount AS DECIMAL(9,4))"
    )} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q59_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, zero joins — the
    canonical pushdown probe. All three predicates reach the parquet
    reader (PushedFilters); the aggregate is a single map-side
    partial + 1-row final. The BETWEEN on raw doubles is safe
    cross-engine: same literals, same IEEE comparisons."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.to_date("l_shipdate") >= "1996-01-01")
            & (F.to_date("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum_expr(dec2("l_extendedprice") * dec4("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# q60 — TPC-H Q9: product-type profit decomposition
# --------------------------------------------------------------------------

_PROFIT = (
    "CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(9,4)))"
    " - CAST(p_retailprice AS DECIMAL(15,2)) * CAST(l_quantity AS DECIMAL(9,4))"
    "   * CAST(0.6 AS DECIMAL(9,4))"
)


@query(
    "q60_product_profit",
    oracle=f"""
    SELECT n_name AS nation,
           EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS o_year,
           {oracle_dsum_expr(_PROFIT)} AS profit
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN part     ON p_partkey = l_partkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, o_year
    """,
)
def q60_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no partsupp -> supply cost modeled as 60% of
    retail price): profit per supplier-nation per year for one
    product family. Every dimension broadcasts (part pruned to
    matching names and 2 columns BEFORE the join); lineitem->orders
    is the only big shuffle. Arithmetic stays in exact decimal end
    to end — sums are order-independent, so the result is identical
    on any cluster layout."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation")
    p = (
        load(spark, sf_dir, "part")
        .where(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    profit = _rev_col() - dec2("p_retailprice") * dec4("l_quantity") * dec4(
        F.lit(0.6)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.to_date("o_orderdate")).alias("o_year"),
        )
        .agg(dsum_expr(profit, "profit"))
    )


# --------------------------------------------------------------------------
# q61 — TPC-H Q5: local supplier volume
# --------------------------------------------------------------------------


@query(
    "q61_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {oracle_dsum_expr(_REV)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name IN ('ASIA', 'EUROPE')
      AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
    GROUP BY n_name
    """,
)
def q61_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue through suppliers LOCAL to the
    customer (two-column join condition l_suppkey AND nationkey
    equality). region->nation->supplier prune as a broadcast chain
    before touching the fact; customer broadcasts with its
    nationkey; the lineitem->orders orderkey shuffle dominates, as
    it should."""
    r = load(spark, sf_dir, "region").where(F.col("r_name").isin("ASIA", "EUROPE"))
    n = load(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load(spark, sf_dir, "orders").where(
        (F.to_date("o_orderdate") >= "1996-01-01")
        & (F.to_date("o_orderdate") < "1997-01-01")
    ).select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(dsum_expr(_rev_col(), "revenue"))
    )


# --------------------------------------------------------------------------
# q62/q63 — deterministic sampling (operators/sampling.py)
# --------------------------------------------------------------------------

_O_KEY32 = (
    "CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) AS BIGINT)"
)


@query(
    "q62_deterministic_sample",
    oracle=f"""
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(15,2))), 4) AS DOUBLE)
             AS sum_price
    FROM orders
    WHERE {_O_KEY32} % 1000000 < 100000
    GROUP BY o_orderpriority
    """,
)
def q62_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% Bernoulli sample of orders by hash bucket
    (operators/sampling.py) — reproducible across engines, cluster
    layouts, and time, unlike TABLESAMPLE. Aggregating the sample
    proves the composition: the filter is a scan predicate, the agg
    combines map-side."""
    from ..operators.sampling import bernoulli_sample

    o = load(spark, sf_dir, "orders")
    return (
        bernoulli_sample(o, 0.10, "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum_expr(dec2("o_totalprice"), "sum_price"),
        )
    )


@query(
    "q63_stratified_sample",
    oracle="""
    WITH ranked AS (
      SELECT c_custkey, c_mktsegment, c_nationkey,
             ROW_NUMBER() OVER (
               PARTITION BY c_mktsegment
               ORDER BY CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8)
                             AS BIGINT), c_custkey) AS rn
      FROM customer)
    SELECT c_custkey, c_mktsegment, c_nationkey
    FROM ranked WHERE rn <= 15
    """,
)
def q63_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k stratified sample: 15 customers per market segment in
    hash order (operators/sampling.py:stratified_exact_k) — the
    deterministic replacement for sampleBy(). One shuffle on the
    stratum key; per-group sort only."""
    from ..operators.sampling import stratified_exact_k

    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    return stratified_exact_k(c, ["c_mktsegment"], 15, "c_custkey")
