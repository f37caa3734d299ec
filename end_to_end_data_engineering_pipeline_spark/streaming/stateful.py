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


class _RunningTotalsProcessor:
    """StatefulProcessor for :func:`running_user_totals_tws` — defined
    lazily (imported base class) so importing this module never
    requires the Spark 4 transformWithState surface."""

    def __new__(cls):
        from pyspark.sql.streaming import StatefulProcessor

        class P(StatefulProcessor):
            def init(self, handle) -> None:
                from pyspark.sql.types import (
                    LongType,
                    StructField,
                    StructType,
                )

                self._state = handle.getValueState(
                    "totals",
                    StructType(
                        [
                            StructField("n", LongType()),
                            StructField("total_cents", LongType()),
                        ]
                    ),
                )

            def handleInputRows(self, key, rows, timerValues):
                if self._state.exists():
                    n, cents = self._state.get()
                else:
                    n, cents = 0, 0
                for pdf in rows:
                    n += len(pdf)
                    cents += int(
                        pdf["value"].mul(100).round().astype("int64").sum()
                    )
                self._state.update((n, cents))
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "n_events": [n],
                        "total_value": [cents / 100.0],
                    }
                )

            def close(self) -> None:
                pass

        return P()


class StatefulV2Unavailable(RuntimeError):
    """transformWithStateInPandas needs the protobuf runtime (its
    Python state server speaks protobuf to the JVM); this container
    ships pyspark without it. Same honesty contract as the multimodal
    CodecsUnavailableError: the operator exists and is correct where
    the dependency exists, and fails loudly here instead of half-
    working."""


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """The Spark 4 ``transformWithStateInPandas`` twin of
    :func:`running_user_totals` — same per-user running (count,
    cents-exact total) contract on the successor API (SPARK-49564
    arbitrary stateful processing v2: explicit StatefulProcessor
    lifecycle, composable typed state handles, timers). Requires the
    RocksDB state store provider (the API rejects the default HDFS
    provider), which is also what a production deployment runs —
    state lives off-heap and scales with |keys| per executor, not
    heap. Parity with the v1 operator is pytest-pinned on identical
    micro-batch input (skipped where protobuf is absent — the
    API's Python state server requires it)."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as e:
        raise StatefulV2Unavailable(
            "transformWithStateInPandas requires the protobuf runtime "
            "(pip install protobuf); use running_user_totals "
            "(applyInPandasWithState) in this environment"
        ) from e
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_RunningTotalsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
