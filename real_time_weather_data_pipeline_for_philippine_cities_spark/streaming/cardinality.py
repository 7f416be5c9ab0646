"""Streaming distinct-count sketch per event-time window.

The batch catalog's KMV-style sketch
(plans/profiling_queries.py::q_kmv_distinct_sketch) re-expressed as a
watermarked windowed aggregation: the R hash minima are plain min()
aggregate columns (functions/hashing.py::kmv_minima_aggs), so Spark's
streaming state per open window is exactly R BIGINTs per key — merged
monotonically across micro-batches, emitted once the watermark passes
(append mode), then evicted. Exact COUNT(DISTINCT) is impossible in
streaming append mode without unbounded state; the sketch is the
streaming-native answer, and it is the SAME expressions as the batch twin,
so a backfill and the live stream agree bit-for-bit on the estimate.

Works identically on a batch DataFrame (unified semantics) — the e2e test
asserts streaming output == the batch run on the same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import (
    KMV_R,
    kmv_estimate_col,
    kmv_hash_col,
    kmv_minima_aggs,
)


def windowed_distinct_sketch(
    df: DataFrame,
    window_duration: str = "1 day",
    event_time_col: str = "ts",
    id_col: str = "user_id",
    key_cols: tuple[str, ...] = (),
    r: int = KMV_R,
    slide: str | None = None,
) -> DataFrame:
    """Per-window (and optional per-key) distinct-``id_col`` estimate.

    Streaming callers must apply ``withWatermark(event_time_col, ...)``
    upstream so the window state is evictable; batch callers can use it
    directly. ``slide`` makes the windows overlapping (same contract as
    windows.py::windowed_observation_stats) — each row then feeds every
    window it falls in, and state is R BIGINTs per OPEN window, so the
    overlap factor multiplies state rows, not row width. Output: window
    bounds, keys, n_est.
    """
    win = (
        F.window(event_time_col, window_duration, slide)
        if slide
        else F.window(event_time_col, window_duration)
    )
    mins = (
        df.withColumn("kmv_h0", kmv_hash_col(id_col))
        .groupBy(win.alias("w"), *key_cols)
        .agg(*kmv_minima_aggs(r))
    )
    return mins.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *key_cols,
        kmv_estimate_col(r).alias("n_est"),
    )
