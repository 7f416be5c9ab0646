"""Streaming exact-dedup e2e (streaming/dedup.py): duplicate documents
arriving across micro-batches within the watermark horizon emit exactly
once; state carries across availableNow restarts via the checkpoint."""

from __future__ import annotations

from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.dedup import (
    content_keyed,
    dedup_stream,
)

SCHEMA = "doc_id long, text string, ingest_ts timestamp"


def _doc(doc_id, text, ts):
    return f'{{"doc_id": {doc_id}, "text": "{text}", "ingest_ts": "{ts}"}}\n'


def _run(spark, landing, sink, ckpt):
    stream = spark.readStream.schema(SCHEMA).json(str(landing))
    out = dedup_stream(
        content_keyed(stream), ("content_hash",), "ingest_ts", delay="1 hour"
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_dedup_within_watermark_across_epochs(spark, tmp_path):
    d = tmp_path / "landing"
    d.mkdir()
    sink, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    # epoch 1: two distinct texts, one duplicated in-batch
    (d / "f1.json").write_text(
        _doc(1, "alpha body", "2024-01-01 10:00:00")
        + _doc(2, "beta body", "2024-01-01 10:01:00")
        + _doc(3, "alpha body", "2024-01-01 10:02:00")
    )
    _run(spark, d, sink, ckpt)

    # epoch 2: a cross-epoch duplicate (alpha again, within the 1h horizon
    # of state kept at the checkpoint) plus a genuinely new text
    (d / "f2.json").write_text(
        _doc(4, "alpha body", "2024-01-01 10:10:00")
        + _doc(5, "gamma body", "2024-01-01 10:11:00")
    )
    _run(spark, d, sink, ckpt)

    rows = spark.read.parquet(sink).collect()
    texts = sorted(r.text for r in rows)
    assert texts == ["alpha body", "beta body", "gamma body"]
    # the FIRST-seen copy survives
    winners = {r.text: r.doc_id for r in rows}
    assert winners["alpha body"] == 1


def test_dedup_stream_batch_twin_semantics(spark):
    """Unified semantics: on a batch frame the operator is exact dedup."""
    df = spark.createDataFrame(
        [
            (1, "x", "2024-01-01 00:00:00"),
            (2, "x", "2024-01-01 00:30:00"),
            (3, "y", "2024-01-01 00:45:00"),
        ],
        SCHEMA.replace("timestamp", "string"),
    ).selectExpr("doc_id", "text", "CAST(ingest_ts AS TIMESTAMP) AS ingest_ts")
    out = dedup_stream(content_keyed(df), ("content_hash",), "ingest_ts")
    assert sorted(r.text for r in out.collect()) == ["x", "y"]
