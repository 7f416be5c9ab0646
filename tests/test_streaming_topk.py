"""Streaming per-key top-k leaderboard e2e (streaming/topk_state.py):
state keeps the k best (score, id) per key across epochs via the
checkpoint; re-observations upgrade but never downgrade; ties break by
smaller id."""

from __future__ import annotations

import json

from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.topk_state import (
    TOPK_K,
    streaming_topk,
)

SCHEMA = "event_type string, event_id long, value double"


def _write_batch(d, name, rows):
    (d / name).write_text("".join(json.dumps(r) + "\n" for r in rows))


def _run(spark, d, sink, ckpt):
    stream = spark.readStream.schema(SCHEMA).json(str(d))
    q = (
        streaming_topk(stream)
        .writeStream.foreachBatch(
            lambda df, epoch: df.withColumn(
                "epoch_id", __import__("pyspark.sql.functions", fromlist=["lit"]).lit(epoch)
            )
            .write.mode("append")
            .parquet(sink)
        )
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streaming_topk_state_across_epochs(spark, tmp_path):
    d = tmp_path / "landing"
    d.mkdir()
    sink, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    _write_batch(d, "b1.json", [
        {"event_type": "click", "event_id": 1, "value": 5.0},
        {"event_type": "click", "event_id": 2, "value": 9.0},
        {"event_type": "click", "event_id": 3, "value": 7.0},
        {"event_type": "click", "event_id": 4, "value": 1.0},
        {"event_type": "buy", "event_id": 5, "value": 3.0},
    ])
    _run(spark, d, sink, ckpt)

    # epoch 2: one score beats the current #1; one duplicate id re-observed
    # LOWER (must not downgrade); one key untouched
    _write_batch(d, "b2.json", [
        {"event_type": "click", "event_id": 6, "value": 9.5},
        {"event_type": "click", "event_id": 2, "value": 0.5},
    ])
    _run(spark, d, sink, ckpt)

    out = spark.read.parquet(sink)
    last_epoch = max(r["epoch_id"] for r in out.collect())
    final = {
        (r["key"], r["rank"]): (r["item_id"], r["score"])
        for r in out.filter(out.epoch_id == last_epoch).collect()
    }
    # click leaderboard after both epochs: 6 (9.5), 2 (9.0 — kept, not 0.5), 3 (7.0)
    assert final[("click", 1)] == (6, 9.5)
    assert final[("click", 2)] == (2, 9.0)
    assert final[("click", 3)] == (3, 7.0)
    assert ("click", TOPK_K + 1) not in final
    # 'buy' untouched in epoch 2 -> not re-emitted (update mode)
    assert ("buy", 1) not in final
    # but its epoch-1 emission exists
    e1 = {
        (r["key"], r["rank"]): (r["item_id"], r["score"])
        for r in out.filter(out.epoch_id == 0).collect()
    }
    assert e1[("buy", 1)] == (5, 3.0)


def test_streaming_topk_tie_breaks_by_smaller_id(spark, tmp_path):
    d = tmp_path / "landing"
    d.mkdir()
    sink, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write_batch(d, "b1.json", [
        {"event_type": "x", "event_id": 9, "value": 4.0},
        {"event_type": "x", "event_id": 2, "value": 4.0},
        {"event_type": "x", "event_id": 5, "value": 4.0},
        {"event_type": "x", "event_id": 1, "value": 4.0},
    ])
    _run(spark, d, sink, ckpt)
    rows = spark.read.parquet(sink).collect()
    order = [r["item_id"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert order == [1, 2, 5]  # k=3, equal scores -> ascending id
