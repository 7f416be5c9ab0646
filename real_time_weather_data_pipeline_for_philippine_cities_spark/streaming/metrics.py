"""Streaming observability (SURVEY.md §2.11): the reference's DEBUG
logging (weather_data_fetcher.py:14,47,129) maps to a
StreamingQueryListener capturing per-epoch progress — rows/sec, batch
duration, state size — queryable as a DataFrame for the same
analytics surface as any other table.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

PROGRESS_SCHEMA = (
    "query_id string, batch_id long, timestamp string,"
    " num_input_rows long, input_rows_per_second double,"
    " process_rows_per_second double, batch_duration_ms long"
)


class ProgressRecorder(StreamingQueryListener):
    """Collects micro-batch progress events in memory (driver-side; one
    small dict per epoch — bounded by retention, not stream volume)."""

    def __init__(self, max_events: int = 1000) -> None:
        self.events: list[dict[str, Any]] = []
        self._max = max_events

    # -- listener callbacks -------------------------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        self.events.append(
            {
                "query_id": str(p.get("id")),
                "batch_id": int(p.get("batchId", -1)),
                "timestamp": str(p.get("timestamp")),
                "num_input_rows": int(p.get("numInputRows", 0)),
                "input_rows_per_second": float(p.get("inputRowsPerSecond", 0.0) or 0.0),
                "process_rows_per_second": float(
                    p.get("processedRowsPerSecond", 0.0) or 0.0
                ),
                "batch_duration_ms": int(p.get("batchDuration", 0)),
            }
        )
        if len(self.events) > self._max:
            del self.events[: len(self.events) - self._max]

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # -- analytics surface --------------------------------------------------
    def progress_df(self, spark: SparkSession) -> DataFrame:
        rows = [tuple(e[k] for k in (
            "query_id", "batch_id", "timestamp", "num_input_rows",
            "input_rows_per_second", "process_rows_per_second",
            "batch_duration_ms",
        )) for e in self.events]
        return spark.createDataFrame(rows or [], PROGRESS_SCHEMA)
