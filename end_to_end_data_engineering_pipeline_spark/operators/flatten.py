"""F1/F2: JSON struct-of-parallel-arrays -> one row per element.

The reference's signature transform (transformation/clean_data.py:59-89,
``_flatten_open_meteo_payload``): the `hourly` object holds parallel
arrays (`time[]`, `temperature_2m[]`, ...); zip them positionally into
one row per hour, replicating the envelope columns (city/lat/lon/
ingested_at). Missing arrays are tolerated as empty
(clean_data.py:60-61,69-72).

Spark-first design (SURVEY §2.3): pure Catalyst —
``from_json`` -> ``explode(arrays_zip(...))`` -> select. No Python UDF
touches the hot path, so the whole transform stays inside whole-stage
codegen and scales linearly with executors; the explode multiplies rows
partition-locally (no shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import PAYLOAD

# measure name in payload -> (silver column, cast type)
MEASURES = {
    "temperature_2m": ("temperature_c", "double"),
    "relative_humidity_2m": ("relative_humidity_pct", "int"),
    "precipitation": ("precipitation_mm", "double"),
    "wind_speed_10m": ("wind_speed_kmh", "double"),
}

# reference time format %Y-%m-%dT%H:%M (clean_data.py:78) -> SURVEY §2.8 X7
TIME_FMT = "yyyy-MM-dd'T'HH:mm"


def _arr(name: str) -> Column:
    """Missing-array tolerance F2: absent/null array -> [] so arrays_zip
    still emits rows for the measures that are present."""
    return F.coalesce(F.col(f"p.hourly.{name}"), F.array())


def flatten_payloads(bronze: DataFrame) -> DataFrame:
    """Bronze responses -> one typed row per (city, hour).

    Input: BRONZE_RESPONSES-shaped DataFrame. Applies the skip-row
    predicate P6 (http_status==200 AND payload IS NOT NULL,
    clean_data.py:116-118) then flattens. Output columns: city,
    latitude, longitude, ts_utc, <4 measures>, source_ingested_at.
    """
    ok = bronze.where(
        (F.col("http_status") == 200) & F.col("payload").isNotNull()
    )
    parsed = ok.withColumn("p", F.from_json("payload", PAYLOAD))
    zipped = parsed.select(
        "city",
        # payload lat/lon wins over envelope when present (the reference
        # reads them from the payload row dict, clean_data.py:75-77)
        F.coalesce(F.col("p.latitude"), F.col("latitude")).alias("latitude"),
        F.coalesce(F.col("p.longitude"), F.col("longitude")).alias("longitude"),
        F.col("ingested_at").alias("source_ingested_at"),
        F.explode(
            F.arrays_zip(
                F.col("p.hourly.time").alias("time"),
                *[_arr(m).alias(m) for m in MEASURES],
            )
        ).alias("h"),
    )
    return zipped.select(
        "city",
        "latitude",
        "longitude",
        F.to_timestamp(F.col("h.time"), TIME_FMT).alias("ts_utc"),
        *[
            F.col(f"h.{src}").cast(typ).alias(dst)
            for src, (dst, typ) in MEASURES.items()
        ],
        "source_ingested_at",
    )
