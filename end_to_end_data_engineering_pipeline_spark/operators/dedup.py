"""O3: deterministic keyed dedup, keep-first.

Reference: ``.unique(subset=["city","ts_utc"], keep="first")`` after a
sort (transformation/clean_data.py:150-151). Spark's ``dropDuplicates``
keeps an ARBITRARY row, which breaks oracle hash-matching and silver
reproducibility (SURVEY §4.3.4) — so the engine formulation is a
row_number window over the key, ordered by an explicit tiebreaker.

Scale: the window is a single hash-shuffle on the key columns — the
same shuffle a groupBy would need; no extra pass. At 100 TB, if the
silver table is bucketed by the key, Catalyst elides this shuffle
entirely (bucketed scan satisfies the required distribution).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_keep_first(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
) -> DataFrame:
    """Keep exactly one row per key: the first under ``order_by``.

    ``order_by`` must be a total order within each key group for the
    result to be deterministic (add a unique id as the last column).
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
