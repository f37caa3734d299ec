"""Scale-technique tests: bucketed joins must elide the shuffle
(asserted on the physical plan), salted joins must match the plain
join's results."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from end_to_end_data_engineering_pipeline_spark.operators.partitioning import (
    bucketed_join,
    salted_join,
    write_bucketed,
)


def _physical_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    # managed tables land in ./spark-warehouse (warehouse.dir is a
    # static conf); dropped in the finally block
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    write_bucketed(
        orders.withColumnRenamed("o_custkey", "custkey"), "orders_b", ["custkey"], 4
    )
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "custkey"), "customer_b", ["custkey"], 4
    )
    # disable broadcast so the join actually needs a distribution
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "orders_b", "customer_b", ["custkey"])
        plan = _physical_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucketing satisfied the distribution
        # and the result matches the plain join
        plain = orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count()
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").alias("k"), "o_orderkey", "o_totalprice"
    )
    nation_of = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("k"), "c_nationkey"
    )
    plain = orders.join(nation_of, "k").select("k", "o_orderkey", "c_nationkey")
    salted = salted_join(orders, nation_of, "k", salt_buckets=4).select(
        "k", "o_orderkey", "c_nationkey"
    )
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
