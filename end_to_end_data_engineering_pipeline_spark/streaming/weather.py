"""Streaming twin of the reference ETL: bronze responses arriving as a
file stream -> flatten -> dedup -> MERGE into silver.

The reference runs this daily in batch (airflow DAG, SURVEY §3); this
is the same dataflow under Structured Streaming — late/overlapping
refetches are absorbed by the same keyed MERGE the batch path uses
(operators/merge.py via foreachBatch), so a micro-batch arriving with
already-seen (city, ts_utc) keys updates rather than duplicates:
exactly the reference's ON CONFLICT semantics, continuously.

The flatten operator (operators/flatten.py) is reused UNCHANGED —
from_json/explode are streaming-compatible Catalyst expressions; the
only streaming-specific pieces are the source, the watermark, and the
sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import dedup_keep_first
from ..operators.flatten import flatten_payloads
from ..operators.merge import merge_upsert
from ..schemas import BRONZE_RESPONSES, SILVER_KEY


def stream_bronze(spark: SparkSession, bronze_path: str) -> DataFrame:
    return (
        spark.readStream.schema(BRONZE_RESPONSES)
        .option("maxFilesPerTrigger", 1)
        .parquet(bronze_path)
    )


def weather_stream_to_silver(
    spark: SparkSession,
    bronze_path: str,
    silver_path: str,
    checkpoint: str,
    watermark: str = "1 day",
):
    """Continuous bronze->silver: returns the DataStreamWriter (caller
    .start()s it). Within a micro-batch, keep-first dedup matches the
    batch transform; across micro-batches, MERGE makes re-delivery and
    overlapping refetch idempotent."""
    flat = flatten_payloads(stream_bronze(spark, bronze_path))
    watermarked = flat.withWatermark("source_ingested_at", watermark)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        deduped = dedup_keep_first(
            batch_df, SILVER_KEY, ["source_ingested_at"]
        ).withColumn("loaded_at", F.lit("2026-01-01 00:00:00").cast("timestamp"))
        merge_upsert(spark, silver_path, deduped, SILVER_KEY)

    return (
        watermarked.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(sink)
    )
