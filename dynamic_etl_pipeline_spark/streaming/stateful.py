"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY §2.9/§2.11): arbitrary per-key state the built-in windowed
aggregations can't express.

State is partitioned by key across executors, so throughput scales
with the cluster; each micro-batch touches only the keys present in
that batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

_OUT = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])
_STATE = StructType([
    StructField("n", LongType()),
    StructField("total", DoubleType()),
])


def _update(key: tuple, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, float(total)))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def user_running_totals(events: DataFrame,
                        watermark: str = "2 hours") -> DataFrame:
    """Cumulative per-user event count + value total, emitted once per
    user per micro-batch — running state no windowed agg expresses
    (batch equivalent after a full replay: plain groupBy sum/count)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update, _OUT, _STATE, "update", GroupStateTimeout.NoTimeout
        )
    )


# ---------------------------------------------------------------------------
# The same operator on Spark 4's transformWithStateInPandas — the
# successor API to applyInPandasWithState: explicit state variables on
# a handle (value/list/map state, timers, TTL) instead of one opaque
# tuple, and a RocksDB-backed store.


def user_running_totals_tws(events: DataFrame,
                            watermark: str = "2 hours") -> DataFrame:
    """Twin of user_running_totals on the transformWithState API.

    Requires the RocksDB state-store provider (tests set it per-run)
    AND the ``protobuf`` Python package (the API's state-server wire
    format) — absent protobuf, raises NotImplementedError up front
    instead of crashing the streaming Python worker mid-query.
    Functionally identical output: one (user_id, n_events,
    total_value) row per user per micro-batch.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "transformWithStateInPandas needs the protobuf package "
            "(not installed in this environment); use "
            "user_running_totals (applyInPandasWithState) instead"
        ) from exc
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", _STATE
            )

        def handleInputRows(self, key, rows, timerValues):
            existing = self._totals.get()
            n, total = existing if existing is not None else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].fillna(0.0).sum())
            self._totals.update((n, float(total)))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotals(),
            outputStructType=_OUT,
            outputMode="Update",
            timeMode="None",
        )
    )
