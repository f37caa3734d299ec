"""Model runner tests: the dbt-layer analog (SURVEY §3 entry 3) —
view/table materializations, ref-style dependencies via spark.table,
full-rebuild semantics, and the star-join consumer surface."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from end_to_end_data_engineering_pipeline_spark.pipeline import run_pipeline, Warehouse
from end_to_end_data_engineering_pipeline_spark.plans import (
    ModelRunner,
    build_dim_date,
    build_dim_location,
    build_fact_weather,
)
from end_to_end_data_engineering_pipeline_spark.plans.star import star_join
from end_to_end_data_engineering_pipeline_spark.sources import (
    Location,
    synthetic_fetcher,
)

LOCS = [Location("Paris", 48.8566, 2.3522), Location("Lyon", 45.764, 4.8357)]


def test_model_runner_views_tables_and_star_join(spark, tmp_path):
    out = run_pipeline(
        spark,
        str(tmp_path),
        LOCS,
        dt.date(2026, 8, 1),
        dt.date(2026, 8, 2),
        synthetic_fetcher(),
    )
    wh = Warehouse(str(tmp_path))

    runner = ModelRunner(warehouse_dir=str(tmp_path / "gold_models"))

    @runner.model("stg_weather", materialization="view")
    def stg(s):
        return s.read.parquet(wh.silver)

    @runner.model("m_dim_location", materialization="table")
    def dim_loc(s):
        return build_dim_location(s.table("stg_weather"))

    @runner.model("m_dim_date", materialization="table")
    def dim_date(s):
        return build_dim_date(s.table("stg_weather"))

    @runner.model("m_fact", materialization="table")
    def fact(s):
        return build_fact_weather(s.table("stg_weather"))

    built = runner.run(spark)
    assert set(built) == {"stg_weather", "m_dim_location", "m_dim_date", "m_fact"}
    # table models persisted + re-registered as views
    assert (tmp_path / "gold_models" / "m_fact").is_dir()
    assert spark.table("m_dim_location").count() == 2

    # star join (J4): every fact row resolves both dims, row count kept
    joined = star_join(
        spark.table("m_fact"),
        spark.table("m_dim_location"),
        spark.table("m_dim_date"),
    )
    assert joined.count() == spark.table("m_fact").count() == out["n_silver"]
    assert joined.where(F.col("city").isNull()).count() == 0

    # full rebuild: running again replaces tables (same counts, no dup)
    built2 = runner.run(spark)
    assert built2["m_fact"].count() == out["n_silver"]
