"""Streaming windowed distinct-count sketch e2e
(streaming/cardinality.py): time-ordered parquet chunks drive a
watermarked availableNow stream in append mode; emitted per-day estimates
must equal the batch run of the SAME function on the same rows (unified
semantics — a backfill agrees with the live stream), and the state store
must stay bounded at R minima per open window."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from real_time_weather_data_pipeline_for_philippine_cities_spark.sources.registry import (
    load_table,
)
from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.cardinality import (
    windowed_distinct_sketch,
)

EVENTS_SCHEMA = "event_id long, ts timestamp, user_id long"
SENTINEL_TS = "2099-01-01 00:00:00"


def test_streaming_sketch_equals_batch_and_bounds_state(spark, sf_dir, tmp_path):
    land = tmp_path / "land"
    land.mkdir()
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")

    # land 3 TIME-ORDERED chunks (watermark must advance monotonically),
    # then a far-future sentinel that pushes the watermark past every real
    # window so append mode emits them all before the stream drains
    bounds = ["2024-01-11", "2024-01-21"]
    chunks = [
        ev.filter(F.col("ts") < bounds[0]),
        ev.filter((F.col("ts") >= bounds[0]) & (F.col("ts") < bounds[1])),
        ev.filter(F.col("ts") >= bounds[1]),
    ]
    # FileStreamSource admits files in modification-time order; a fast
    # write burst can tie mtimes, which would let the far-future sentinel
    # sort ahead and watermark-drop every real row. Pin STRICTLY ascending
    # mtimes in true landing order by tracking which part-file each write
    # produced.
    import os

    def _pin_mtime(write, order):
        before = set(os.listdir(land))
        write()
        for p in set(os.listdir(land)) - before:
            if p.endswith(".parquet"):
                t = 1_700_000_000 + 10 * order
                os.utime(os.path.join(land, p), (t, t))

    for i, c in enumerate(chunks):
        _pin_mtime(
            lambda c=c: c.coalesce(1).write.mode("append").parquet(str(land)), i
        )
    sentinel = (
        spark.createDataFrame([(10**9, None, 10**9)], EVENTS_SCHEMA)
        .withColumn("ts", F.lit(SENTINEL_TS).cast("timestamp"))
        .select("event_id", "ts", "user_id")
    )
    _pin_mtime(
        lambda: sentinel.coalesce(1).write.mode("append").parquet(str(land)),
        len(chunks),
    )

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(land))
        .withWatermark("ts", "3 days")
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        windowed_distinct_sketch(stream, "1 day")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    streamed = {
        r["window_start"]: r["n_est"]
        for r in spark.read.parquet(out_dir).collect()
        if r["window_start"].year == 2024  # sentinel window never emits anyway
    }
    batch = {
        r["window_start"]: r["n_est"]
        for r in windowed_distinct_sketch(ev, "1 day").collect()
    }
    assert streamed == batch  # every real window emitted, estimates identical
    assert len(streamed) >= 28  # the full January day grid

    # and the BATCH CATALOG twin agrees per day — proves the live stream,
    # a streaming-function backfill, and the batch catalog entry share one
    # estimator (single KMV_R source of truth in functions/hashing.py)
    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.catalog import (
        CATALOG,
    )

    catalog_est = {
        r["day"]: r["n_est"]
        for r in CATALOG["kmv_distinct_sketch"].fn(spark, sf_dir).collect()
    }
    assert {ws.date(): e for ws, e in streamed.items()} == catalog_est

    # bounded state: at most |open windows| rows (one row of R minima each)
    state_rows = []
    for p in q.recentProgress:
        if isinstance(p, str):
            p = json.loads(p)
        for so in p.get("stateOperators") or []:
            state_rows.append(int(so.get("numRowsTotal", 0) or 0))
    assert state_rows and max(state_rows) <= len(batch) + 2


def test_sliding_sketch_overlap_consistency(spark, sf_dir):
    """Sliding 2-day/1-day windows: each tumbling day's id set is a subset
    of both sliding windows covering it, so every sliding estimate must be
    >= the max of its two member days' tumbling estimates (minima only
    decrease as sets grow) — and window bookkeeping must produce one
    window per slide step."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    tumbling = {
        r["window_start"].date(): r["n_est"]
        for r in windowed_distinct_sketch(ev, "1 day").collect()
    }
    sliding = windowed_distinct_sketch(ev, "2 days", slide="1 day").collect()
    assert len(sliding) >= len(tumbling)  # one window per slide step + edges
    import datetime

    for r in sliding:
        days = [r["window_start"].date(), r["window_start"].date() + datetime.timedelta(days=1)]
        members = [tumbling[d] for d in days if d in tumbling]
        if members:
            # union of the member days' id sets -> minima can only shrink
            # -> estimate can only grow (up to rounding at 1dp)
            assert r["n_est"] >= max(members) - 0.1
