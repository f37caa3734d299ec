"""As-of join: for each left row, the most recent right row at or
before its timestamp (per key).

Spark has no native ASOF JOIN (guide 'Common OLAP patterns'); the
scalable formulation is the union-tag-window trick:

    tag both sides -> union -> window per key ordered by (ts, side)
    -> last(right payload, ignoreNulls) carries the latest right value
    forward -> keep left rows.

One shuffle on the key (the window), no per-row search: O(n log n)
within key groups vs the naive per-left-row subquery. Right-side ties
at identical timestamps resolve to the later-sorted row; callers
needing stronger determinism add a tiebreaker to ``right_order``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    right_order: list[str] | None = None,
) -> DataFrame:
    """left columns + ``payload_cols`` from the latest right row with
    right_ts <= left_ts (null when no prior right row exists)."""
    lt = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),  # left sorts after right at equal ts
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in payload_cols],
    )
    rt = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
    )
    for c in left.columns:
        if c not in (key,):
            rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in payload_cols
        ],
    )
    out = carried.where(F.col("__side") == 1).select(
        *[c for c in left.columns],
        *[F.col(f"__m_{c}").alias(f"asof_{c}") for c in payload_cols],
    )
    return out
