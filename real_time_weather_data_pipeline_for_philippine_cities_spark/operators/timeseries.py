"""Time-series operators Spark lacks as primitives (as-of join,
gap-based sessionization) built from one-shuffle window compositions.

Both are 'custom operators' in the SURVEY §7.6 sense: the reference has no
equivalent, but any observation-log warehouse (its WeatherData fact is
one — wdf.py:75-97) needs them, and a training-data pipeline needs them
for event/telemetry alignment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    right_key: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward (most-recent-at-or-before) as-of join, one shuffle.

    Instead of a range join (quadratic per key without interval
    partitioning), tag and union both sides, sort each key partition once
    by (ts, side), and carry the right side's values forward with
    ``last_value(..., ignoreNulls)``. Left rows then hold the latest
    right-side values with ``right_ts <= left_ts`` — exactly DuckDB's
    ``ASOF LEFT JOIN`` (the oracle). Right side is deduplicated to one row
    per (key, ts) (max by ts-order) so the pick is deterministic.

    Scale: ONE hash shuffle on ``key`` + a per-partition sort — same cost
    as a sort-merge join, no candidate blowup, skew handled by AQE.
    """
    lcols = left.columns
    rk = right_key or key
    # one row per (key, ts): deterministic representative
    agg_exprs = [F.max(c).alias(c) for c in value_cols]
    r = (
        right.groupBy(F.col(rk).alias("__k"), F.col(right_ts).alias("__ts"))
        .agg(*agg_exprs)
        .withColumn("__side", F.lit(0))
    )
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
    )
    for c in value_cols:
        l = l.withColumn(c, F.lit(None).cast(r.schema[c].dataType))
    r_full = r.select(
        "__k",
        "__ts",
        "__side",
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *value_cols,
    )
    unioned = l.select("__k", "__ts", "__side", *lcols, *value_cols).unionByName(r_full)

    # right rows (side 0) sort before left rows (side 1) at equal ts →
    # inclusive right_ts <= left_ts semantics.
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__side",
        *lcols,
        F.col("__ts"),
        *[
            F.last(F.when(F.col("__side") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"{prefix}{c}")
            for c in value_cols
        ],
        F.last(F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True)
        .over(w)
        .alias(f"{prefix}ts"),
    )
    return carried.filter(F.col("__side") == 1).drop("__side", "__ts")


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the previous event of the same key exceeds ``gap_seconds``.

    lag → flag → running sum, all inside ONE window shuffle on ``key``.
    Adds ``session_seq`` (1-based per key). SQL-expressible (the DuckDB
    oracle is the identical lag+cumsum), unlike an opaque state-store
    implementation — per SURVEY §7.7.5's determinism preference.
    """
    tb = [F.col(c).asc() for c in (order_tiebreak or [])]
    w_order = Window.partitionBy(key).orderBy(F.col(ts).asc(), *tb)
    # Gap in exact integer MICROSECONDS: cast-to-long floors to whole
    # seconds, which disagrees with a fractional-seconds gap definition
    # exactly at the boundary (10 of 573k sessions flipped vs the oracle
    # in the sf1 strict sweep). unix_micros is exact on both engines
    # (DuckDB twin: epoch_us).
    gap = F.unix_micros(F.col(ts)) - F.lag(F.unix_micros(F.col(ts))).over(w_order)
    is_new = F.when(
        gap.isNull() | (gap > gap_seconds * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    w_run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("__new", is_new).withColumn(
        "session_seq", F.sum("__new").over(w_run)
    ).drop("__new")


def session_stats(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    value_col: str | None = None,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Sessionize then aggregate one row per session: bounds, event count,
    optional value sum."""
    s = sessionize(df, key, ts, gap_seconds, order_tiebreak=order_tiebreak)
    aggs = [
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        # Integer-cents sum: double accumulation order differs between
        # Spark partial aggregates and the DuckDB oracle, crossing .xx5
        # rounding boundaries (Spark HALF_UP vs DuckDB). values are 2dp;
        # summing exact BIGINT cents is order-independent on both engines.
        aggs.append(
            (F.sum(F.round(F.col(value_col) * 100).cast("long")) / 100.0).alias(
                "sum_value"
            )
        )
    return s.groupBy(F.col(key), F.col("session_seq")).agg(*aggs)
