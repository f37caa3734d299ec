"""Custom stateful streaming operator: per-key running aggregates via
``applyInPandasWithState`` (the public arbitrary-stateful-op API).

The reference has no streaming, but its batch-log counters
(http_success/failure accumulated across a run, fetch_data.py:139-142)
are exactly the "running per-key totals" shape — this operator is the
streaming generalization: per user, maintain (n_events, total_value)
across micro-batches, emitting the updated totals each batch.

State is one tiny row per key; the watermark-less variant grows with
|keys| only. At cluster scale keys hash-partition across executors and
state lives in the state store (RocksDB provider in prod configs).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
# cents-exact running total: state holds scaled longs so the result is
# independent of micro-batch arrival order (same rule as the batch
# engine's decimal accumulators)
STATE_SCHEMA = "n long, total_cents long"


def _update_user_totals(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    n, total_cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total_cents += int(pdf["value"].mul(100).round().astype("int64").sum())
    state.update((n, total_cents))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total_cents / 100.0],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running (count, total_value) — emits one row
    per user per micro-batch with the post-batch totals."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
