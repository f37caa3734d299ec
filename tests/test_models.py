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


def test_incremental_model_rewrites_only_touched_partitions(spark, tmp_path):
    """Second run of an incremental model must (1) upsert by key and
    (2) leave data files of un-touched partitions byte-identical on
    disk — the partition-scoped MERGE contract."""
    import os

    from end_to_end_data_engineering_pipeline_spark.plans import ModelRunner

    runner = ModelRunner(warehouse_dir=str(tmp_path))
    batches = {
        1: [("2026-01", "a", 10.0), ("2026-01", "b", 20.0), ("2026-02", "c", 5.0)],
        # touches ONLY 2026-02: update c, insert d
        2: [("2026-02", "c", 7.0), ("2026-02", "d", 1.0)],
    }
    phase = {"n": 1}

    @runner.model(
        "inc", materialization="incremental",
        unique_key=("month", "k"), partition_col="month",
    )
    def inc(s):
        return s.createDataFrame(batches[phase["n"]], ["month", "k", "v"])

    runner.run(spark)

    def part_files(month):
        d = tmp_path / "inc" / f"month={month}"
        return {
            f: os.path.getmtime(d / f)
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    jan_before = part_files("2026-01")
    phase["n"] = 2
    built = runner.run(spark)

    assert part_files("2026-01") == jan_before  # untouched partition intact
    rows = {
        (r.month, r.k): r.v for r in built["inc"].collect()
    }
    assert rows == {
        ("2026-01", "a"): 10.0,
        ("2026-01", "b"): 20.0,
        ("2026-02", "c"): 7.0,   # updated
        ("2026-02", "d"): 1.0,   # inserted
    }


def test_manifest_passes_and_appends_audit(spark, tmp_path):
    """Declarative schema.yml-analog manifest: a clean run passes every
    test and appends one audit row per test."""
    from end_to_end_data_engineering_pipeline_spark.plans import (
        ModelRunner,
        not_null,
        relationships,
        unique,
    )

    runner = ModelRunner(warehouse_dir=str(tmp_path))

    @runner.model(
        "t_dim", materialization="table",
        tests=[not_null("id"), unique("id")],
    )
    def dim(s):
        return s.createDataFrame([(1, "x"), (2, "y")], ["id", "name"])

    @runner.model(
        "t_fact", materialization="table",
        tests=[
            not_null("dim_id"),
            relationships("dim_id", to="t_dim", field="id"),
        ],
    )
    def fact(s):
        return s.createDataFrame([(1, 5.0), (2, 6.0), (2, 7.0)], ["dim_id", "v"])

    runner.run(spark)
    audit = spark.read.parquet(str(tmp_path / "_model_test_results"))
    assert audit.count() == 4
    assert audit.where(F.col("status") != "PASS").count() == 0
    assert {r.test for r in audit.collect()} == {
        "not_null", "unique", "relationships"
    }


def test_manifest_violation_fails_build(spark, tmp_path):
    """A violated rule must halt the build (QualityGateError) and still
    record the FAIL audit rows — dbt test semantics."""
    import pytest

    from end_to_end_data_engineering_pipeline_spark.plans import (
        ModelRunner,
        not_null,
        relationships,
        unique,
    )
    from end_to_end_data_engineering_pipeline_spark.quality import QualityGateError

    runner = ModelRunner(warehouse_dir=str(tmp_path))

    @runner.model(
        "b_dim", materialization="table",
        tests=[not_null("id"), unique("id")],
    )
    def dim(s):
        # duplicate id AND a null id: 2 of 3 tests must fail
        return s.createDataFrame(
            [(1, "x"), (1, "y"), (None, "z")], "id int, name string"
        )

    @runner.model(
        "b_fact", materialization="table",
        tests=[relationships("dim_id", to="b_dim", field="id")],
    )
    def fact(s):
        return s.createDataFrame([(1, 5.0), (9, 6.0)], "dim_id int, v double")

    with pytest.raises(QualityGateError):
        runner.run(spark)
    audit = spark.read.parquet(str(tmp_path / "_model_test_results"))
    failed = {
        (r.model, r.column, r.test)
        for r in audit.where(F.col("status") == "FAIL").collect()
    }
    assert failed == {
        ("b_dim", "id", "not_null"),
        ("b_dim", "id", "unique"),
        ("b_fact", "dim_id", "relationships"),
    }


def test_relationships_child_with_colliding_field_name(spark, tmp_path):
    """The child model may already carry a column named like the parent
    key (here the fact has its own ``id`` plus the FK ``dim_id``); the
    relationships test must project/alias, not rename — a rename would
    produce a duplicate column and an ambiguity AnalysisException."""
    from end_to_end_data_engineering_pipeline_spark.plans import (
        ModelRunner,
        relationships,
    )

    runner = ModelRunner(warehouse_dir=str(tmp_path))

    @runner.model("c_dim", materialization="table")
    def dim(s):
        return s.createDataFrame([(1, "x"), (2, "y")], ["id", "name"])

    @runner.model(
        "c_fact", materialization="table",
        tests=[relationships("dim_id", to="c_dim", field="id")],
    )
    def fact(s):
        # 'id' here is the fact's own key, colliding with c_dim's key name
        return s.createDataFrame(
            [(100, 1, 5.0), (101, 2, 6.0)], ["id", "dim_id", "v"]
        )

    runner.run(spark)
    audit = spark.read.parquet(str(tmp_path / "_model_test_results"))
    rel = audit.where(F.col("test") == "relationships").collect()
    assert len(rel) == 1 and rel[0].status == "PASS"


def test_incremental_agg_empties_and_creates_groups(spark):
    """apply_agg_delta edge contract: a group whose count reaches zero
    DROPS from the maintained aggregate; a group born in the batch
    appears; untouched groups carry through bit-identical."""
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_pipeline_spark.operators.merge import (
        apply_agg_delta,
        incremental_agg_delta,
    )

    agg = spark.createDataFrame(
        [("a", 2, 30.0), ("b", 1, 5.0), ("c", 4, 100.0)],
        "g string, n long, total double",
    )
    changes = spark.createDataFrame(
        [
            ("a", "D", 10.0, None),
            ("a", "D", 20.0, None),   # group a emptied
            ("d", "I", None, 7.0),    # group d born
            ("b", "U", 5.0, 8.0),     # group b repriced
        ],
        "g string, op string, before double, after double",
    )
    delta = incremental_agg_delta(changes, ["g"])
    out = {
        r.g: (r.n, r.total)
        for r in apply_agg_delta(agg, delta, ["g"], "n", "total").collect()
    }
    assert out == {"b": (1, 8.0), "c": (4, 100.0), "d": (1, 7.0)}


def test_incremental_join_delta_partitions_the_view_delta(spark):
    """dV = (dA x B_new) + (A_old x dB): disjoint terms, duplicate
    rows keep their join multiplicity, and seed+delta equals a full
    rebuild of the inner-join view."""
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_pipeline_spark.operators.merge import (
        incremental_join_delta,
    )

    a_old = spark.createDataFrame([(1, "a1"), (2, "a2")], "k long, av string")
    d_a = spark.createDataFrame([(2, "a2x"), (3, "a3")], "k long, av string")
    # duplicate key rows on the B side: multiplicity must survive
    b_old = spark.createDataFrame(
        [(1, "b1"), (2, "b2"), (2, "b2dup")], "k long, bv string"
    )
    d_b = spark.createDataFrame([(3, "b3"), (1, "b1x")], "k long, bv string")
    b_new = b_old.unionByName(d_b)
    dv = incremental_join_delta(a_old, d_a, b_new, d_b, ["k"])
    full_new = a_old.unionByName(d_a).join(b_new, ["k"])
    full_old = a_old.join(b_old, ["k"])
    # multiset equality: V_old + dV == V_new, via counted tuples
    def counts(df):
        return {
            (r.k, r.av, r.bv, r["count"])
            for r in df.groupBy("k", "av", "bv").count().collect()
        }

    merged = full_old.unionByName(dv)
    assert counts(merged) == counts(full_new)
    # and the delta really is additive-only (no row of V_old repeated)
    assert dv.count() == full_new.count() - full_old.count()
