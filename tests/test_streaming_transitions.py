"""Streaming transition-matrix e2e: the stateful streaming operator must
reproduce the batch ``event_transitions`` catalog query exactly when the
same events are replayed in event-time-ordered micro-batches — including
transitions that straddle micro-batch boundaries (the per-user state row).
"""

from __future__ import annotations

import json
import os
import time

import duckdb

from pyspark.sql import functions as F

from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.warehouse_queries import (
    q_event_transitions,
)
from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.transitions import (
    streaming_transitions,
)

_SCHEMA = "user_id long, ts timestamp, event_id long, event_type string"


def _space_mtimes(*paths) -> None:
    """FileStreamSource admits files in MODIFICATION-TIME order (ms
    granularity); files written back-to-back can tie and then replay in
    either order, which scrambles cross-chunk transitions (the one
    intermittent failure of the full-suite run). Pin strictly increasing
    mtimes so chunk order is the written order, deterministically."""
    base = time.time() - 2 * len(paths)  # stay in the past
    for i, p in enumerate(paths):
        os.utime(p, (base + 2 * i, base + 2 * i))


def _run_stream(spark, landing, sink, ckpt):
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(landing))
    )
    q = (
        streaming_transitions(stream)
        .writeStream.foreachBatch(
            lambda df, epoch: df.write.mode("append").parquet(str(sink))
        )
        .option("checkpointLocation", str(ckpt))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)


def _matrix_from_sink(spark, sink):
    out = spark.read.parquet(str(sink))
    return {
        (r["prev_type"], r["next_type"]): r["total"]
        for r in out.groupBy("prev_type", "next_type")
        .agg(F.sum("n").alias("total"))
        .collect()
    }


def test_boundary_transition_counted_once(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    # user 7's b->c pair straddles the two files: state must carry 'b'
    with open(landing / "b1.json", "w") as f:
        f.write(json.dumps({"user_id": 7, "ts": "2024-01-01T00:00:00",
                            "event_id": 1, "event_type": "a"}) + "\n")
        f.write(json.dumps({"user_id": 7, "ts": "2024-01-01T00:01:00",
                            "event_id": 2, "event_type": "b"}) + "\n")
    with open(landing / "b2.json", "w") as f:
        f.write(json.dumps({"user_id": 7, "ts": "2024-01-01T00:02:00",
                            "event_id": 3, "event_type": "c"}) + "\n")
    _space_mtimes(landing / "b1.json", landing / "b2.json")
    sink, ckpt = tmp_path / "sink", tmp_path / "ckpt"
    _run_stream(spark, landing, sink, ckpt)
    assert _matrix_from_sink(spark, sink) == {("a", "b"): 1, ("b", "c"): 1}


def test_streaming_matrix_equals_batch_query(spark, tmp_path, sf_dir):
    # replay the real sf0.001 events table in 3 event-time-ordered chunks
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT user_id, strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') AS ts,
                   event_id, event_type
            FROM read_parquet('{sf_dir}/events.parquet')
            ORDER BY ts, event_id"""
    ).fetchall()
    landing = tmp_path / "landing"
    landing.mkdir()
    k = (len(rows) + 2) // 3
    for i in range(3):
        with open(landing / f"chunk{i}.json", "w") as f:
            for u, ts, eid, et in rows[i * k : (i + 1) * k]:
                f.write(
                    json.dumps(
                        {"user_id": u, "ts": ts, "event_id": eid,
                         "event_type": et}
                    )
                    + "\n"
                )
    _space_mtimes(*(landing / f"chunk{i}.json" for i in range(3)))
    sink, ckpt = tmp_path / "sink", tmp_path / "ckpt"
    _run_stream(spark, landing, sink, ckpt)
    got = _matrix_from_sink(spark, sink)
    want = {
        (r["prev_type"], r["next_type"]): r["n_transitions"]
        for r in q_event_transitions(spark, sf_dir).collect()
    }
    assert got == want
