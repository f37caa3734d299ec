"""Rate-source synthetic event stream: a built-in load generator.

``format("rate")`` emits (timestamp, value) rows at a configured
rows-per-second entirely inside the engine — no files, no network —
which makes it the standard tool for (a) soak-testing a streaming
topology before pointing it at Kafka, and (b) measuring sink/state
throughput limits. ``rate_event_stream`` shapes those rows into the
engine's events schema so every streaming operator in this package
(windows, dedup, stream-static enrich, stateful totals) can run
against it unchanged.

The mapping is pure deterministic column arithmetic on ``value``
(user id, event type, payload), so a given offset range always
produces the same rows — restarts replay identically, which keeps
checkpoint recovery testable.

Scale: the rate source is partitioned (``numPartitions``); each
partition generates independently, so generation itself never
bottlenecks — at 1000 executors point numPartitions at the
parallelism you want to stress.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_TYPES = ("view", "click", "purchase")


def rate_event_stream(
    spark: SparkSession,
    rows_per_second: int = 100,
    num_partitions: int = 2,
) -> DataFrame:
    """Streaming DataFrame in the events shape (event_id, ts, user_id,
    event_type, value, props), synthesized from the rate source."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .option("numPartitions", num_partitions)
        .load()
    )
    v = F.col("value")
    typ = F.element_at(
        F.array(*[F.lit(t) for t in EVENT_TYPES]), (v % 3 + 1).cast("int")
    )
    return rate.select(
        v.alias("event_id"),
        F.col("timestamp").alias("ts"),
        (v % 50).alias("user_id"),
        typ.alias("event_type"),
        (v % 1000).cast("double").alias("value"),
        F.to_json(F.struct(v.alias("seq"))).alias("props"),
    )
