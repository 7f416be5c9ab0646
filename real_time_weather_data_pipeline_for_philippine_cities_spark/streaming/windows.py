"""Windowed streaming aggregates — the analytics layer the reference's
README promises but never ships (README.md:4; SURVEY.md §2.5).

Works identically on a batch or streaming DataFrame (Spark's unified
semantics): tumbling/sliding event-time windows over observations. In
streaming mode the caller must have applied withWatermark so window state
is evictable; in append output mode a window emits once its watermark
passes — the deterministic late-data contract the reference lacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_observation_stats(
    obs: DataFrame,
    window_duration: str = "1 hour",
    slide: str | None = None,
    event_time_col: str = "data_datetime",
    key_cols: tuple[str, ...] = (),
    value_col: str = "value",
) -> DataFrame:
    """Tumbling (or sliding, if ``slide`` given) per-key window stats."""
    win = (
        F.window(event_time_col, window_duration, slide)
        if slide
        else F.window(event_time_col, window_duration)
    )
    return (
        obs.groupBy(win.alias("w"), *key_cols)
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.round(F.min(value_col), 2).alias("min_value"),
            F.round(F.max(value_col), 2).alias("max_value"),
            F.round(F.avg(value_col), 2).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *key_cols,
            "n_obs",
            "min_value",
            "max_value",
            "avg_value",
        )
    )


def session_window_stats(
    obs: DataFrame,
    gap: str = "30 minutes",
    event_time_col: str = "data_datetime",
    key_cols: tuple[str, ...] = (),
    value_col: str = "value",
) -> DataFrame:
    """Native session windows (gap-merged), batch or streaming.

    Boundary semantics: an event at exactly ``prev_ts + gap`` starts a NEW
    session (Spark's session_window is [start, start+gap) exclusive),
    whereas operators.timeseries.sessionize keeps gap == threshold
    in-session — off-boundary streams produce identical sessions (tested).
    Streaming callers must apply withWatermark first so session state is
    evictable.
    """
    sw = F.session_window(F.col(event_time_col), gap)
    return (
        obs.groupBy(sw.alias("w"), *key_cols)
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *key_cols,
            "n_obs",
            "sum_value",
        )
    )
