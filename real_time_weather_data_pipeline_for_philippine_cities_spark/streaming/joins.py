"""Watermarked stream-stream interval join (SURVEY.md §2.9 family).

The reference correlates its two feeds (geocode lookups and weather
observations) by running them in the same batch process; the streaming
generalization is an event-time interval join where BOTH sides are
unbounded: each left event matches right events for the same key whose
timestamp falls in ``[left_ts - max_delay, left_ts]``.

Why the watermark + time-range condition matter at 100 TB: a
stream-stream equi-join without them buffers BOTH streams forever
(unbounded state). With watermarks on both sides and a range predicate
tying the two event times, Spark derives a state horizon per side and
EVICTS rows the watermark has passed — state is bounded by
rate × (watermark delay + interval), independent of stream age. The e2e
test demonstrates both retention (a match lands across epochs while
inside the horizon) and eviction (a stale row stops matching once the
watermark passes it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "10 minutes",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Inner interval join: right event within ``max_delay`` BEFORE the
    left event, same key. Both inputs must be streaming DataFrames with
    the named event-time columns; watermarks are applied here so the
    state bound is part of the operator's contract, not caller homework.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (F.col(f"__l.{key}") == F.col(f"__r.{key}"))
        & (F.col(f"__r.{right_ts}") >= F.col(f"__l.{left_ts}") - F.expr(f"INTERVAL {max_delay}"))
        & (F.col(f"__r.{right_ts}") <= F.col(f"__l.{left_ts}"))
    )
    return lw.alias("__l").join(rw.alias("__r"), cond, "inner").select(
        F.col(f"__l.{key}").alias(key),
        F.col(f"__l.{left_ts}").alias(left_ts),
        F.col(f"__r.{right_ts}").alias(right_ts),
        *[
            F.col(f"__l.{c}").alias(c)
            for c in left.columns
            if c not in (key, left_ts)
        ],
        *[
            F.col(f"__r.{c}").alias(c)
            for c in right.columns
            if c not in (key, right_ts)
        ],
    )
