"""Gold star schema: dim_location, dim_date, fact_weather_hourly.

Rebuilds the reference dbt models (dbt/models/analytics/*.sql) as
DataFrame functions over the silver table.

Surrogate-key parity note (SURVEY §7 risk 1): the reference computes
``md5(city || '|' || latitude::text || '|' || longitude::text)``
(dim_location.sql:10). Postgres float8::text and Spark double->string
can format differently (e.g. trailing digits), so the engine formats
lat/lon with a fixed 4-decimal format on BOTH the dim and fact side —
self-consistent keys; the relationships test (J2) is the invariant,
not the literal hash text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import iso_dow, surrogate_key


def _loc_key(df: DataFrame):
    return surrogate_key(
        F.col("city"),
        F.format_number(F.col("latitude"), 4),
        F.format_number(F.col("longitude"), 4),
    )


def build_dim_location(silver: DataFrame) -> DataFrame:
    """DISTINCT city/lat/lon + md5 surrogate key (dim_location.sql:1-14,
    A7 distinct projection + X1/X2 scalar parity)."""
    return (
        silver.select("city", "latitude", "longitude")
        .distinct()
        .select(
            _loc_key(silver).alias("location_id"),
            "city",
            "latitude",
            "longitude",
        )
    )


def build_dim_date(silver: DataFrame) -> DataFrame:
    """DISTINCT calendar attrs of ts_utc::date (dim_date.sql:1-13).

    ISO semantics: isodow Monday=1 (X4 re-anchor), ISO week via
    weekofyear (X5 — Spark's weekofyear is ISO-8601, matching
    Postgres ``extract(week ...)``)."""
    return (
        silver.select(F.to_date("ts_utc").alias("date_id"))
        .distinct()
        .select(
            "date_id",
            iso_dow("date_id").alias("iso_day_of_week"),
            F.weekofyear("date_id").alias("iso_week"),
            F.month("date_id").alias("month"),
            F.year("date_id").alias("year"),
        )
    )


def build_fact_weather(silver: DataFrame) -> DataFrame:
    """Fact with location/date surrogate keys (fact_weather_hourly.sql:
    17-28 — P3 derived-column projection; no join needed to build)."""
    return silver.select(
        _loc_key(silver).alias("location_id"),
        F.to_date("ts_utc").alias("date_id"),
        "ts_utc",
        "temperature_c",
        "relative_humidity_pct",
        "precipitation_mm",
        "wind_speed_kmh",
        "batch_id",
        "source_ingested_at",
        "loaded_at",
    )


def star_join(fact: DataFrame, dim_location: DataFrame, dim_date: DataFrame) -> DataFrame:
    """J4 consumer-surface star join: broadcast-hash both dims (they are
    tiny relative to the fact at every scale)."""
    return fact.join(F.broadcast(dim_location), "location_id").join(
        F.broadcast(dim_date), "date_id"
    )
