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
