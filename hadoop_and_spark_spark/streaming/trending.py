"""Stateful trend detection over a stream (reference a7
TrendingArrivals.scala:47-68,140 — `mapWithState` keeping
(prev_count) per key, alert when the current batch count at least
doubles the previous and reaches a floor).

Structured-Streaming re-expression: `applyInPandasWithState` over
groupBy(key). Each micro-batch delivers the key's new rows; state
holds the previous batch's count. Emits one row per (key, batch)
with the alert flag — mirroring the reference, which emitted state
for every key every batch (TrendingArrivals.scala:140).

The batch-checkable twin (lag() over event-time windows) lives in
streaming/windows.py::trending_arrivals_batch; tests replay the same
events through both and cross-check the alert semantics on scripted
burst sequences.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .windows import TREND_FACTOR, TREND_MIN

OUTPUT_SCHEMA = (
    "key string, cnt long, prev long, trending boolean"
)
STATE_SCHEMA = "prev long"


def _trend_fn(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    cur = sum(len(pdf) for pdf in batches)
    prev = state.get[0] if state.exists else 0
    trending = cur >= TREND_FACTOR * max(prev, 1) and cur >= TREND_MIN
    state.update((cur,))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "cnt": [cur],
            "prev": [prev],
            "trending": [trending],
        }
    )


def trending_stream(events_stream: DataFrame, key_col: str = "event_type") -> DataFrame:
    """Per-micro-batch arrival counts per key with trend alerts.

    Matches the reference's batch-granularity semantics (each
    micro-batch plays the role of one 1-minute DStream batch; the
    10-minute windowing variant composes this after a windowed
    pre-aggregation).
    """
    from pyspark.sql import functions as F

    keyed = events_stream.select(F.col(key_col).alias("key"))
    return keyed.groupBy("key").applyInPandasWithState(
        _trend_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
