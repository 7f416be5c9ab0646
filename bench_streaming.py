"""Streaming throughput bench (VERDICT r04 #6): drives the availableNow
streaming surfaces over landed chunks of the $SPARK_GRAFT_SF_DIR tables
and records per-surface rows/sec, micro-batch count, and state-store size
from the engine's own StreamingQueryProgress events.

Surfaces (all reuse the tested streaming operators verbatim):
  * windowed_agg   — watermark + tumbling window over the events stream
  * stream_dedup   — dropDuplicatesWithinWatermark on content-keyed docs
  * stream_topk    — applyInPandasWithState per-key top-k leaderboard
  * stream_neardup — MinHash/LSH near-dup foreachBatch with a parquet
                     signature store folded per epoch
  * change_detect  — xlsx-snapshot diff state machine (anti-join epochs)
  * dq_gate        — per-epoch clean/quarantine split + violation report
  * interval_join  — watermarked stream-stream event-time interval join
  * distinct_sketch — windowed KMV-style distinct-count sketch (R minima
                     of state per open window)
  * transitions    — per-user stateful event-transition counting (one
                     state row per user carries the last event across
                     micro-batch boundaries)

Output: ONE JSON line (also written to STREAMBENCH.json):
  {"metric": "streaming_bench", "sf": ..., "surfaces": {name:
    {"rows": N, "wall_sec": s, "rows_per_sec": r, "epochs": n,
     "state_rows_max": n|null, "state_mem_bytes_max": n|null}}}

Each surface streams the SAME landed input split into multiple files with
maxFilesPerTrigger=1, so availableNow admission control produces several
micro-batches per run — per-epoch incremental cost (the thing that matters
for a resident stream) is what gets measured, not one monolithic batch.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

from real_time_weather_data_pipeline_for_philippine_cities_spark.session import get_spark
from real_time_weather_data_pipeline_for_philippine_cities_spark.sources.registry import load_table

N_CHUNKS = int(os.environ.get("SPARK_GRAFT_STREAM_CHUNKS", "4"))
AWAIT_SEC = 600

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)
DOCS_SCHEMA = "doc_id long, text string, lang string, source string, ingest_ts timestamp"


def _land(spark, sf_dir: str, root: str) -> tuple[str, str]:
    """Write events/documents as N_CHUNKS single-file parquet chunks so the
    file stream source admits them one per micro-batch."""
    ev_dir, doc_dir = os.path.join(root, "events"), os.path.join(root, "documents")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "ingest_ts",
        F.to_timestamp(F.lit("2024-01-01 00:00:00"))
        + F.make_interval(secs=F.col("doc_id") % 3600),
    )
    for i in range(N_CHUNKS):
        ev.filter(F.pmod("event_id", F.lit(N_CHUNKS)) == i).coalesce(1).write.mode(
            "append"
        ).parquet(ev_dir)
        docs.filter(F.pmod("doc_id", F.lit(N_CHUNKS)) == i).coalesce(1).write.mode(
            "append"
        ).parquet(doc_dir)
    return ev_dir, doc_dir


def _progress_stats(q) -> dict:
    epochs = 0
    rows = 0
    state_rows = []
    state_mem = []
    for p in q.recentProgress:
        if isinstance(p, str):
            p = json.loads(p)
        n = int(p.get("numInputRows", 0) or 0)
        if n == 0 and epochs:  # trailing empty commit batch
            continue
        epochs += 1
        rows += n
        for so in p.get("stateOperators") or []:
            state_rows.append(int(so.get("numRowsTotal", 0) or 0))
            state_mem.append(int(so.get("memoryUsedBytes", 0) or 0))
    return {
        "rows": rows,
        "epochs": epochs,
        "state_rows_max": max(state_rows) if state_rows else None,
        "state_mem_bytes_max": max(state_mem) if state_mem else None,
    }


def _run(q) -> None:
    q.awaitTermination(AWAIT_SEC)
    if q.isActive:  # hung stream must fail the bench, not hang the driver
        q.stop()
        raise TimeoutError("stream did not drain within AWAIT_SEC")


def _reader(spark, path: str, schema: str):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(path)
    )


def bench_windowed_agg(spark, ev_dir: str, work: str) -> dict:
    from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.windows import (
        windowed_observation_stats,
    )

    stream = _reader(spark, ev_dir, EVENTS_SCHEMA).withWatermark("ts", "1 hour")
    out = windowed_observation_stats(
        stream, "1 hour", event_time_col="ts", key_cols=("event_type",)
    )
    t0 = time.monotonic()
    q = (
        out.writeStream.outputMode("update")
        .format("noop")
        .option("checkpointLocation", os.path.join(work, "ckpt_win"))
        .trigger(availableNow=True)
        .start()
    )
    _run(q)
    return {"wall_sec": round(time.monotonic() - t0, 3), **_progress_stats(q)}


def bench_stream_dedup(spark, doc_dir: str, work: str) -> dict:
    from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.dedup import (
        content_keyed,
        dedup_stream,
    )

    stream = _reader(spark, doc_dir, DOCS_SCHEMA)
    out = dedup_stream(
        content_keyed(stream), ("content_hash",), "ingest_ts", delay="1 hour"
    )
    t0 = time.monotonic()
    q = (
        out.writeStream.format("parquet")
        .option("path", os.path.join(work, "dedup_out"))
        .option("checkpointLocation", os.path.join(work, "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    _run(q)
    return {"wall_sec": round(time.monotonic() - t0, 3), **_progress_stats(q)}


def bench_stream_topk(spark, ev_dir: str, work: str) -> dict:
    from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.topk_state import (
        streaming_topk,
    )

    stream = _reader(spark, ev_dir, EVENTS_SCHEMA)
    out = streaming_topk(stream)
    t0 = time.monotonic()
    q = (
        out.writeStream.outputMode("update")
        .format("noop")
        .option("checkpointLocation", os.path.join(work, "ckpt_topk"))
        .trigger(availableNow=True)
        .start()
    )
    _run(q)
    return {"wall_sec": round(time.monotonic() - t0, 3), **_progress_stats(q)}


def bench_stream_neardup(spark, doc_dir: str, work: str) -> dict:
    from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.ingest import (
        run_available_now,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.neardup import (
        neardup_epoch_fn,
    )

    stream = _reader(spark, doc_dir, DOCS_SCHEMA)
    epoch = neardup_epoch_fn(
        spark,
        os.path.join(work, "nd_store"),
        os.path.join(work, "nd_matches"),
    )
    t0 = time.monotonic()
    q = run_available_now(stream, epoch, os.path.join(work, "ckpt_nd"))
    _run(q)
    return {"wall_sec": round(time.monotonic() - t0, 3), **_progress_stats(q)}


def bench_change_detect(spark, doc_dir: str, work: str) -> dict:
    from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.ingest import (
        foreach_batch_change_detect,
        run_available_now,
    )

    stream = _reader(spark, doc_dir, DOCS_SCHEMA)
    epoch = foreach_batch_change_detect(
        spark,
        ("doc_id", "source"),
        os.path.join(work, "cd_snapshot"),
        os.path.join(work, "cd_novel"),
    )
    t0 = time.monotonic()
    q = run_available_now(stream, epoch, os.path.join(work, "ckpt_cd"))
    _run(q)
    return {"wall_sec": round(time.monotonic() - t0, 3), **_progress_stats(q)}


def bench_dq_gate(spark, doc_dir: str, work: str) -> dict:
    from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.dq import (
        foreach_batch_dq_gate,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.ingest import (
        run_available_now,
    )

    stream = _reader(spark, doc_dir, DOCS_SCHEMA)
    epoch = foreach_batch_dq_gate(
        {
            "short_text": F.length("text") < 8,
            "null_lang": F.col("lang").isNull(),
            "bad_source": ~F.col("source").rlike("."),
        },
        os.path.join(work, "dq_clean"),
        os.path.join(work, "dq_quarantine"),
        os.path.join(work, "dq_report"),
    )
    t0 = time.monotonic()
    q = run_available_now(stream, epoch, os.path.join(work, "ckpt_dq"))
    _run(q)
    return {"wall_sec": round(time.monotonic() - t0, 3), **_progress_stats(q)}


def bench_stream_decontam(spark, doc_dir: str, work: str) -> dict:
    from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.decontam import (
        benchmark_shingle_set,
        foreach_batch_decontam,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.ingest import (
        run_available_now,
    )

    # static benchmark split: same shape as the batch decontaminate_overlap
    # entry (bounded id-keyed sample -> broadcastable shingle set)
    bench_docs = spark.read.parquet(doc_dir).filter(F.col("doc_id") % 37 == 0)
    bench_sh = benchmark_shingle_set(bench_docs, n=8).persist()
    bench_sh.count()  # materialize outside the measured window
    stream = _reader(spark, doc_dir, DOCS_SCHEMA)
    epoch = foreach_batch_decontam(
        bench_sh,
        os.path.join(work, "dc_clean"),
        os.path.join(work, "dc_flagged"),
        n=8,
    )
    t0 = time.monotonic()
    q = run_available_now(stream, epoch, os.path.join(work, "ckpt_decontam"))
    _run(q)
    try:
        return {"wall_sec": round(time.monotonic() - t0, 3), **_progress_stats(q)}
    finally:
        bench_sh.unpersist()


def bench_interval_join(spark, ev_dir: str, work: str) -> dict:
    from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.joins import (
        stream_interval_join,
    )

    left = (
        _reader(spark, ev_dir, EVENTS_SCHEMA)
        .filter(F.pmod("event_id", F.lit(2)) == 0)
        .select("user_id", F.col("ts").alias("l_ts"), "value")
    )
    right = (
        _reader(spark, ev_dir, EVENTS_SCHEMA)
        .filter(F.pmod("event_id", F.lit(2)) == 1)
        .select("user_id", F.col("ts").alias("r_ts"), "event_type")
    )
    out = stream_interval_join(
        left, right, "user_id", "l_ts", "r_ts", max_delay="10 minutes"
    )
    t0 = time.monotonic()
    q = (
        out.writeStream.format("noop")
        .option("checkpointLocation", os.path.join(work, "ckpt_ij"))
        .trigger(availableNow=True)
        .start()
    )
    _run(q)
    return {"wall_sec": round(time.monotonic() - t0, 3), **_progress_stats(q)}


def bench_transitions(spark, ev_dir: str, work: str) -> dict:
    """Per-user stateful transition counting (arrival-order semantics on
    the bench's hash-chunked replay; the ts-ordered-replay ≡ batch-query
    law is proven in tests/test_streaming_transitions.py)."""
    from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.transitions import (
        streaming_transitions,
    )

    stream = _reader(spark, ev_dir, EVENTS_SCHEMA)
    out = streaming_transitions(stream)
    t0 = time.monotonic()
    q = (
        out.writeStream.outputMode("update")
        .format("noop")
        .option("checkpointLocation", os.path.join(work, "ckpt_trans"))
        .trigger(availableNow=True)
        .start()
    )
    _run(q)
    return {"wall_sec": round(time.monotonic() - t0, 3), **_progress_stats(q)}


def bench_distinct_sketch(spark, ev_dir: str, work: str) -> dict:
    from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.cardinality import (
        windowed_distinct_sketch,
    )

    stream = _reader(spark, ev_dir, EVENTS_SCHEMA).withWatermark("ts", "1 hour")
    out = windowed_distinct_sketch(
        stream, "1 day", key_cols=("event_type",)
    )
    t0 = time.monotonic()
    q = (
        out.writeStream.outputMode("update")
        .format("noop")
        .option("checkpointLocation", os.path.join(work, "ckpt_kmv"))
        .trigger(availableNow=True)
        .start()
    )
    _run(q)
    return {"wall_sec": round(time.monotonic() - t0, 3), **_progress_stats(q)}


def bench_ks_gate(spark, ev_dir: str, work: str) -> dict:
    """Per-epoch numeric KS drift gate vs a frozen reference distribution
    (streaming/drift.py::foreach_batch_ks_drift — the batch catalog's own
    integer-exact KS core)."""
    from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.drift import (
        foreach_batch_ks_drift,
        write_reference_distribution,
    )

    ref = os.path.join(work, "ks_ref")
    # the landing dir is PARQUET (see _land) — reading it as json parses
    # every row to NULL and freezes an empty reference, turning the gate
    # into a degenerate no-op (round-5 advice finding).
    write_reference_distribution(
        spark.read.schema(EVENTS_SCHEMA)
        .parquet(ev_dir)
        .filter("value IS NOT NULL"),
        "value",
        ref,
    )
    report = os.path.join(work, "ks_report")
    stream = _reader(spark, ev_dir, EVENTS_SCHEMA)
    t0 = time.monotonic()
    q = (
        stream.writeStream.foreachBatch(foreach_batch_ks_drift(ref, report))
        .option("checkpointLocation", os.path.join(work, "ckpt_ks"))
        .trigger(availableNow=True)
        .start()
    )
    _run(q)
    wall = round(time.monotonic() - t0, 3)
    # prove the gate actually computed: every epoch's report row must carry
    # a real ks_stat against a non-empty reference (nb > 0).
    rep = spark.read.parquet(report)
    live = rep.filter("ks_stat IS NOT NULL AND n_ref > 0").count()
    return {
        "wall_sec": wall,
        "ks_live_epochs": live,
        "ks_report_epochs": rep.count(),
        **_progress_stats(q),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("rtw-stream-bench")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        load_start = round(os.getloadavg()[0], 2)
    except OSError:
        load_start = None

    work = tempfile.mkdtemp(prefix="streambench_")
    try:
        ev_dir, doc_dir = _land(spark, sf_dir, work)
        surfaces = {}
        for name, fn, src in (
            ("windowed_agg", bench_windowed_agg, ev_dir),
            ("stream_dedup", bench_stream_dedup, doc_dir),
            ("stream_topk", bench_stream_topk, ev_dir),
            ("stream_neardup", bench_stream_neardup, doc_dir),
            ("change_detect", bench_change_detect, doc_dir),
            ("dq_gate", bench_dq_gate, doc_dir),
            ("stream_decontam", bench_stream_decontam, doc_dir),
            ("interval_join", bench_interval_join, ev_dir),
            ("distinct_sketch", bench_distinct_sketch, ev_dir),
            ("transitions", bench_transitions, ev_dir),
            ("ks_gate", bench_ks_gate, ev_dir),
        ):
            r = fn(spark, src, work)
            r["rows_per_sec"] = (
                round(r["rows"] / r["wall_sec"], 1) if r["wall_sec"] else None
            )
            surfaces[name] = r
    finally:
        shutil.rmtree(work, ignore_errors=True)

    payload = {
        "metric": "streaming_bench",
        "sf": sf,
        "n_chunks": N_CHUNKS,
        "loadavg_start": load_start,
        "surfaces": surfaces,
    }
    line = json.dumps(payload)
    out = os.environ.get(
        "SPARK_GRAFT_STREAMBENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "STREAMBENCH.json"),
    )
    with open(out, "w") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
