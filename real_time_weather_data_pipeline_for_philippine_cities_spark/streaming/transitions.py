"""Streaming per-user event-transition counting — the stateful twin of the
batch ``event_transitions`` catalog query (plans/warehouse_queries.py).

State is one row per user: the (ts, event_id, event_type) of the user's
LAST seen event. Each micro-batch sorts its rows per user by (ts,
event_id) — the same total order the batch query's lag() uses — prepends
the remembered last event, and emits the batch's (prev_type, next_type)
pair counts, so transitions that straddle a micro-batch boundary are
counted exactly once. Downstream, a foreachBatch sink appends the
per-epoch partial counts; the global matrix is a plain groupBy-sum over
the sink — identical to the batch query's output when the landed chunks
arrive in event-time order (the availableNow replay contract every other
streaming surface here uses).

Scale: state is O(users) x ~3 small fields; each micro-batch shuffles
once on user_id (the same key the batch query windows on); emitted rows
are per-user-per-batch PARTIAL counts, already combiner-sized.
"""

from __future__ import annotations

from collections import Counter
from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

TRANSITIONS_SCHEMA = StructType(
    [
        StructField("prev_type", StringType()),
        StructField("next_type", StringType()),
        StructField("n", LongType()),
    ]
)

_STATE_SCHEMA = "last_ts TIMESTAMP, last_id LONG, last_type STRING"


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    last_ts, last_id, last_type = (
        state.get if state.exists else (None, None, None)
    )
    batch = pd.concat(list(pdfs), ignore_index=True)
    if len(batch) == 0:  # timeout-style empty group: nothing to emit
        return
    batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
    types = batch["event_type"].tolist()
    prevs = [last_type] + types[:-1]
    counts = Counter(
        (p, n) for p, n in zip(prevs, types) if p is not None
    )
    tail = batch.iloc[-1]
    state.update((tail["ts"].to_pydatetime(), int(tail["event_id"]), tail["event_type"]))
    if counts:
        yield pd.DataFrame(
            {
                "prev_type": [k[0] for k in counts],
                "next_type": [k[1] for k in counts],
                "n": list(counts.values()),
            }
        )


def streaming_transitions(events: DataFrame) -> DataFrame:
    """Per-micro-batch partial transition counts with per-user state.

    Works on a streaming OR batch DataFrame with (user_id, ts, event_id,
    event_type) columns; on a stream it compiles to a state-store-backed
    operator, exactly-once per epoch, shuffling once on user_id.
    """
    projected = events.selectExpr(
        "user_id", "ts", "event_id", "CAST(event_type AS STRING) AS event_type"
    )
    return projected.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=TRANSITIONS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
