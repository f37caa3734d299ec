"""Round-trip every supported format with explicit schemas; values must
survive bit-exactly (CSV/JSON string round-trip included)."""

from __future__ import annotations

import pytest

from end_to_end_data_engineering_pipeline_spark.sources.formats import (
    delta_available,
    read_table,
    write_table,
)


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_roundtrip(spark, sf_dir, tmp_path, fmt):
    src = spark.read.parquet(f"{sf_dir}/nation.parquet")
    path = str(tmp_path / f"t_{fmt}")
    write_table(src, path, fmt)
    back = read_table(spark, path, fmt, schema=src.schema)
    assert back.schema == src.schema
    a = sorted(map(tuple, src.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_csv_requires_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, str(tmp_path), "csv")


def test_delta_not_in_image(spark):
    # documents the fallback path: merge.py's anti-join MERGE is used
    assert delta_available(spark) is False


def test_schema_evolution_merge_schema(spark, tmp_path):
    """Additive schema evolution on a parquet table: old files lack the
    new column; mergeSchema unions file schemas and back-fills nulls —
    the no-rewrite column-add every long-lived 100 TB table needs."""
    path = str(tmp_path / "evo")
    spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]).write.mode(
        "append"
    ).parquet(path)
    spark.createDataFrame(
        [(3, "c", 30.0)], ["id", "v", "score"]
    ).write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "v", "score"}
    rows = {r.id: (r.v, r.score) for r in merged.collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", 30.0)}

    # default read (no mergeSchema) may pick either file's schema —
    # pinning the read schema explicitly is the stable contract
    pinned = spark.read.schema("id long, v string, score double").parquet(path)
    assert {r.id: r.score for r in pinned.collect()}[3] == 30.0


def test_events_loader_handles_both_ts_encodings(spark, tmp_path):
    """catalog.load('events') must read BOTH fixture encodings the
    driver has shipped across rounds: parquet timestamp[us] (current)
    and TIMESTAMP(NANOS) (read as bigint under nanosAsLong) — same
    resulting values either way."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from end_to_end_data_engineering_pipeline_spark.catalog import load

    real = load(spark, "/root/testdata/sf0.001", "events")
    assert dict(real.dtypes)["ts"] == "timestamp"
    want = sorted(
        (r.event_id, r.ts) for r in real.select("event_id", "ts").limit(50).collect()
    )

    # rewrite the same rows as TIMESTAMP(NANOS) into a twin sf dir
    tbl = pq.read_table("/root/testdata/sf0.001/events.parquet")
    ts_ns = tbl.column("ts").cast(pa.timestamp("ns"))
    tbl_ns = tbl.set_column(tbl.schema.get_field_index("ts"), "ts", ts_ns)
    twin = tmp_path / "sf_nanos"
    twin.mkdir()
    pq.write_table(tbl_ns, str(twin / "events.parquet"))

    nanos = load(spark, str(twin), "events")
    assert dict(nanos.dtypes)["ts"] == "timestamp"
    got = sorted(
        (r.event_id, r.ts) for r in nanos.select("event_id", "ts").limit(50).collect()
    )
    assert got == want
