"""Stream-stream interval join e2e (streaming/joins.py): matches land
across epochs while inside the watermark horizon; state the watermark has
passed is evicted and stops matching."""

from __future__ import annotations

import json

from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.joins import (
    stream_interval_join,
)

L_SCHEMA = "city string, obs_ts timestamp, temp double"
R_SCHEMA = "city string, geo_ts timestamp, lat double"


def _write(d, name, rows):
    (d / name).write_text("".join(json.dumps(r) + "\n" for r in rows))


def _run(spark, ldir, rdir, sink, ckpt):
    left = spark.readStream.schema(L_SCHEMA).json(str(ldir))
    right = spark.readStream.schema(R_SCHEMA).json(str(rdir))
    out = stream_interval_join(
        left, right, key="city", left_ts="obs_ts", right_ts="geo_ts",
        max_delay="10 minutes", watermark="5 minutes",
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_interval_join_matches_within_horizon_and_evicts_stale_state(spark, tmp_path):
    ldir, rdir = tmp_path / "l", tmp_path / "r"
    ldir.mkdir(), rdir.mkdir()
    sink, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    # epoch 1: an observation with no geocode yet (state must be kept),
    # plus a same-epoch matched pair, plus a geocode too OLD to match
    _write(ldir, "l1.json", [
        {"city": "Manila", "obs_ts": "2024-01-01 10:00:00", "temp": 31.0},
        {"city": "Cebu", "obs_ts": "2024-01-01 10:02:00", "temp": 29.0},
    ])
    _write(rdir, "r1.json", [
        {"city": "Cebu", "geo_ts": "2024-01-01 09:55:00", "lat": 10.3},
        {"city": "Manila", "geo_ts": "2024-01-01 09:40:00", "lat": 14.6},  # >10min before obs
    ])
    _run(spark, ldir, rdir, sink, ckpt)
    rows = {(r["city"], str(r["obs_ts"])) for r in spark.read.parquet(sink).collect()}
    assert ("Cebu", "2024-01-01 10:02:00") in rows
    assert not any(c == "Manila" for c, _ in rows)  # 09:40 geocode out of interval

    # epoch 2: a geocode arriving late but inside Manila's interval — the
    # buffered left row must still be in state and now match
    _write(rdir, "r2.json", [
        {"city": "Manila", "geo_ts": "2024-01-01 09:58:00", "lat": 14.6},
        # advance both watermarks far ahead so epoch-3 state is evicted
        {"city": "ZZZ", "geo_ts": "2024-01-01 12:00:00", "lat": 0.0},
    ])
    _write(ldir, "l2.json", [
        {"city": "ZZZ", "obs_ts": "2024-01-01 12:00:00", "temp": 0.0},
    ])
    _run(spark, ldir, rdir, sink, ckpt)
    rows = {(r["city"], str(r["obs_ts"])) for r in spark.read.parquet(sink).collect()}
    assert ("Manila", "2024-01-01 10:00:00") in rows  # cross-epoch match

    # epoch 3: a geocode inside the 10:00 interval arrives AFTER the
    # watermark moved to ~11:55 — the 10:00 left row was evicted, no match
    _write(rdir, "r3.json", [
        {"city": "Manila", "geo_ts": "2024-01-01 09:59:00", "lat": 14.6},
    ])
    _run(spark, ldir, rdir, sink, ckpt)
    n_manila = len([
        r for r in spark.read.parquet(sink).collect() if r["city"] == "Manila"
    ])
    assert n_manila == 1  # still only the epoch-2 match; stale state gone
