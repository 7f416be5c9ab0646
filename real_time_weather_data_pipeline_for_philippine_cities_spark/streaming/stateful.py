"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.9 'custom stateful operators' slot).

``running_totals`` keeps one state row per key — (n_events, sum_value,
last_ts) — and emits the updated totals for every key touched by each
micro-batch. This is the streaming generalization of the reference's
append-only observation log: instead of re-scanning the fact table for
per-location counters, state is O(|keys|) and updates are incremental.

Arrow-batched (pandas per group), update output mode, and a GroupState
timeout is deliberately NOT set: location-style dimension keys are
low-cardinality and long-lived. For unbounded key spaces set a TTL via
``GroupStateTimeout.ProcessingTimeTimeout`` and ``state.setTimeoutDuration``.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)

_STATE_SCHEMA = "n_events LONG, sum_value DOUBLE, last_ts TIMESTAMP"


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total, last_ts = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        vals = pdf["value"].dropna()
        n += len(pdf)
        total += float(vals.sum())
        batch_max = pdf["ts"].max()
        if last_ts is None or (batch_max is not pd.NaT and batch_max > last_ts):
            last_ts = batch_max
    state.update((n, total, last_ts))
    yield pd.DataFrame(
        {"key": [key[0]], "n_events": [n], "sum_value": [round(total, 2)], "last_ts": [last_ts]}
    )


def running_totals(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming (or batch) per-key running totals with explicit state.

    On a streaming DataFrame this compiles to a stateful operator backed by
    the state store (exactly-once per epoch); shuffles once on ``key_col``.
    """
    projected = events.selectExpr(
        f"CAST({key_col} AS STRING) AS key",
        f"{ts_col} AS ts",
        f"CAST({value_col} AS DOUBLE) AS value",
    )
    return projected.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
