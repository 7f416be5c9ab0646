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
