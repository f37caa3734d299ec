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
