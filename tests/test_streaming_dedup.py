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


def test_stream_and_batch_dedup_survivor_sets_agree(spark, tmp_path):
    """Lambda-shape pin (VERDICT r03 #8): a corpus pushed through the
    streaming path (availableNow, shared md5 content key) and through the
    batch ``exact_dedup`` operator must keep the SAME survivor set — one
    row per distinct text, same distinct-text universe — whenever every
    row falls inside one watermark horizon (so the stream evicts nothing
    and its semantics collapse to exact dedup)."""
    import random

    from pyspark.sql import functions as F

    from real_time_weather_data_pipeline_for_philippine_cities_spark.operators.dedup import (
        exact_dedup,
    )

    rng = random.Random(42)
    texts = [f"corpus text {i}" for i in range(40)]
    docs = [
        # 200 rows over ~3.5 minutes — well inside the 1h horizon; doc_id
        # order == event-time order.
        (doc_id, rng.choice(texts), "2024-01-01 10:%02d:%02d" % divmod(doc_id, 60))
        for doc_id in range(200)
    ]

    d = tmp_path / "landing"
    d.mkdir()
    for part in range(4):  # several files → several input splits
        (d / f"f{part}.json").write_text(
            "".join(_doc(i, t, ts) for i, t, ts in docs[part * 50 : (part + 1) * 50])
        )
    sink, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _run(spark, d, sink, ckpt)
    stream_rows = spark.read.parquet(sink).collect()

    batch = spark.createDataFrame(
        [(i, t) for i, t, _ in docs], "doc_id long, text string"
    )
    kept = (
        exact_dedup(batch, F.md5("text"), "doc_id")
        .filter("kept")
        .collect()
    )

    assert sorted(r.text for r in stream_rows) == sorted(r.text for r in kept)
    # exactly one survivor per distinct text on both paths
    assert len(stream_rows) == len({t for _, t, _ in docs})
