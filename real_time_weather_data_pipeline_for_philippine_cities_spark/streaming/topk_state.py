"""Streaming per-key top-k tracker via applyInPandasWithState
(SURVEY.md §2.9 custom-stateful slot, second operator alongside
running_totals).

Keeps the k best (score, id) pairs per key across micro-batches — the
streaming form of ``topk_per_group`` (operators/relational.py): a
leaderboard that stays O(k · |keys|) in state no matter how long the
stream runs, where the batch operator would need a full rescan per
refresh. Emitted rows are the COMPLETE current top-k for every key the
epoch touched (update mode), so a downstream sink can overwrite that
key's leaderboard idempotently — epoch replay converges to the same
state because merging a batch into a top-k set is idempotent and
commutative for distinct ids.

Determinism: ties on score break by smaller id (same contract as the
batch operator's deterministic ordering); state stores ids/scores as
plain lists, ordered best-first.
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
)

TOPK_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("rank", LongType()),
        StructField("item_id", LongType()),
        StructField("score", DoubleType()),
    ]
)

_STATE_SCHEMA = "ids ARRAY<LONG>, scores ARRAY<DOUBLE>"

TOPK_K = 3


def _merge_topk(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        ids, scores = state.get
        best = {int(i): float(s) for i, s in zip(ids, scores)}
    else:
        best = {}
    for pdf in pdfs:
        for item_id, score in zip(pdf["item_id"], pdf["score"]):
            if pd.isna(score):
                continue
            i, s = int(item_id), float(score)
            # keep the max score per id (re-observations upgrade, never
            # downgrade — what makes epoch replay idempotent)
            if i not in best or s > best[i]:
                best[i] = s
    # best-first, ties by smaller id; truncate to k
    top = sorted(best.items(), key=lambda kv: (-kv[1], kv[0]))[:TOPK_K]
    state.update(([i for i, _ in top], [s for _, s in top]))
    yield pd.DataFrame(
        {
            "key": [key[0]] * len(top),
            "rank": [r + 1 for r in range(len(top))],
            "item_id": [i for i, _ in top],
            "score": [s for _, s in top],
        }
    )


def streaming_topk(
    events: DataFrame,
    key_col: str = "event_type",
    id_col: str = "event_id",
    score_col: str = "value",
) -> DataFrame:
    """Per-key streaming top-k leaderboard; shuffles once on ``key_col``,
    state bounded at k entries per key."""
    projected = events.selectExpr(
        f"CAST({key_col} AS STRING) AS key",
        f"CAST({id_col} AS LONG) AS item_id",
        f"CAST({score_col} AS DOUBLE) AS score",
    )
    return projected.groupBy("key").applyInPandasWithState(
        _merge_topk,
        outputStructType=TOPK_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
