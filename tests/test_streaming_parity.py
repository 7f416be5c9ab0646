"""Systematic streaming↔batch parity (VERDICT r05 #5): ONE file drives
every streaming surface and its batch twin over IDENTICAL landed chunks
and asserts frame equality — not just rows>0.

Harness: each surface lands the same deterministic chunk split of the
sf0.001 tables (pinned strictly-ascending mtimes so FileStreamSource
admits them in landing order), drives the stream availableNow, and
compares against the batch computation on the same rows. Epoch-scoped
surfaces (foreachBatch folds, per-epoch reports) get a deterministic
chunk→epoch mapping by running ONE availableNow pass per landed chunk
against a shared checkpoint.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from real_time_weather_data_pipeline_for_philippine_cities_spark.sources.registry import (
    load_table,
)

SF_DIR = "/root/testdata/sf0.001"
EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)
DOCS_SCHEMA = "doc_id long, text string, lang string, source string"
SENTINEL_TS = "2099-01-01 00:00:00"
N_CHUNKS = 3


def _key(t):
    return tuple((v is None, str(type(v)), v) for v in t)


def _rows(df_or_rows):
    rows = df_or_rows.collect() if hasattr(df_or_rows, "collect") else df_or_rows
    return sorted(map(tuple, rows), key=_key)


def _pin_mtime(land, write, order):
    """FileStreamSource admits files in mtime order; a fast write burst can
    tie mtimes. Pin strictly ascending stamps in true landing order."""
    before = set(os.listdir(land)) if os.path.isdir(land) else set()
    write()
    for p in set(os.listdir(land)) - before:
        if p.endswith(".parquet"):
            t = 1_700_000_000 + 10 * order
            os.utime(os.path.join(land, p), (t, t))


def _land_chunks(land, chunks):
    os.makedirs(land, exist_ok=True)
    for i, c in enumerate(chunks):
        _pin_mtime(
            land, lambda c=c: c.coalesce(1).write.mode("append").parquet(land), i
        )


def _events(spark):
    return load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def _event_chunks(ev):
    """Time-ordered split (watermarked surfaces need monotone progress)."""
    bounds = ["2024-01-11", "2024-01-21"]
    return [
        ev.filter(F.col("ts") < bounds[0]),
        ev.filter((F.col("ts") >= bounds[0]) & (F.col("ts") < bounds[1])),
        ev.filter(F.col("ts") >= bounds[1]),
    ]


def _docs(spark):
    return load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang", "source"
    )


def _doc_chunks(docs):
    return [docs.filter(F.pmod("doc_id", F.lit(N_CHUNKS)) == i) for i in range(N_CHUNKS)]


def _sentinel(spark):
    return (
        spark.createDataFrame(
            [(10**9, None, 10**9, "zz_sentinel", 0.0)], EVENTS_SCHEMA
        )
        .withColumn("ts", F.lit(SENTINEL_TS).cast("timestamp"))
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


def _event_stream(spark, land):
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(land)
    )


def _doc_stream(spark, land):
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(land)
    )


def _drain(q, timeout=180):
    assert q.awaitTermination(timeout), "stream did not drain"


def _run_sink(df, out, ckpt, mode):
    q = (
        df.writeStream.outputMode(mode)
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)


def _run_foreach_epochs(spark, land, chunks, schema, fn, ckpt):
    """Deterministic chunk→epoch mapping: land one chunk, drain one
    availableNow pass, repeat — the shared checkpoint increments epochs."""
    for i, c in enumerate(chunks):
        _pin_mtime(
            land, lambda c=c: c.coalesce(1).write.mode("append").parquet(land), i
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(land)
        )
        q = (
            stream.writeStream.foreachBatch(fn)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)


# --------------------------------------------------------------------------
# 1. windowed aggregate
# --------------------------------------------------------------------------
def test_parity_windowed_agg(spark, tmp_path):
    from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.windows import (
        windowed_observation_stats,
    )

    ev = _events(spark)
    land = str(tmp_path / "land")
    _land_chunks(land, _event_chunks(ev) + [_sentinel(spark)])
    stream = _event_stream(spark, land).withWatermark("ts", "3 days")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _run_sink(
        windowed_observation_stats(
            stream, "1 day", event_time_col="ts", key_cols=("event_type",)
        ),
        out,
        ckpt,
        "append",
    )
    streamed = spark.read.parquet(out).filter(F.year("window_start") == 2024)
    batch = windowed_observation_stats(
        ev, "1 day", event_time_col="ts", key_cols=("event_type",)
    )
    assert _rows(streamed) == _rows(batch)


# --------------------------------------------------------------------------
# 2. content-keyed dedup
# --------------------------------------------------------------------------
def test_parity_stream_dedup(spark, tmp_path):
    from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.dedup import (
        content_keyed,
        dedup_stream,
    )

    docs = _docs(spark).withColumn(
        "ingest_ts",
        F.to_timestamp(F.lit("2024-01-01 00:00:00"))
        + F.make_interval(secs=F.col("doc_id") % 3600),
    )
    land = str(tmp_path / "land")
    _land_chunks(land, _doc_chunks(docs))
    stream = (
        spark.readStream.schema(DOCS_SCHEMA + ", ingest_ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(land)
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _run_sink(
        dedup_stream(content_keyed(stream), ("content_hash",), "ingest_ts"),
        out,
        ckpt,
        "append",
    )
    # the KEPT KEY SET is the deterministic contract (which duplicate row
    # survives is first-seen on the stream, arbitrary in batch)
    streamed_keys = {r["content_hash"] for r in spark.read.parquet(out).collect()}
    batch_keys = {
        r["content_hash"]
        for r in dedup_stream(
            content_keyed(docs), ("content_hash",), "ingest_ts"
        ).collect()
    }
    assert streamed_keys == batch_keys
    # and the stream kept exactly one row per key
    assert spark.read.parquet(out).count() == len(streamed_keys)


# --------------------------------------------------------------------------
# 3. stateful top-k leaderboard
# --------------------------------------------------------------------------
def test_parity_stream_topk(spark, tmp_path):
    from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.topk_state import (
        TOPK_K,
        streaming_topk,
    )

    ev = _events(spark)
    land = str(tmp_path / "land")
    _land_chunks(land, _event_chunks(ev))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        streaming_topk(_event_stream(spark, land))
        .writeStream.outputMode("update")
        .foreachBatch(
            lambda df, eid: df.withColumn("epoch_id", F.lit(eid))
            .write.mode("append")
            .parquet(out)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    emitted = spark.read.parquet(out)
    # final leaderboard per key = the key's emission in its LAST epoch
    last = emitted.groupBy("key").agg(F.max("epoch_id").alias("epoch_id"))
    final = emitted.join(last, ["key", "epoch_id"]).select(
        "key", "rank", "item_id", "score"
    )
    # batch twin: max score per (key, item), then top-k by (-score, item)
    from pyspark.sql import Window

    best = (
        ev.select(
            F.col("event_type").alias("key"),
            F.col("event_id").alias("item_id"),
            F.col("value").cast("double").alias("score"),
        )
        .filter(F.col("score").isNotNull())
        .groupBy("key", "item_id")
        .agg(F.max("score").alias("score"))
    )
    w = Window.partitionBy("key").orderBy(F.col("score").desc(), F.col("item_id").asc())
    batch = (
        best.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK_K)
        .select("key", "rank", "item_id", "score")
    )
    assert _rows(final) == _rows(batch)


# --------------------------------------------------------------------------
# 4. near-dup fold (incremental == one-shot epoch on the full corpus)
# --------------------------------------------------------------------------
def test_parity_stream_neardup(spark, tmp_path):
    from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.neardup import (
        neardup_epoch_fn,
    )

    docs = _docs(spark)
    land = str(tmp_path / "land")
    inc_store, inc_matches = str(tmp_path / "store_inc"), str(tmp_path / "m_inc")
    _run_foreach_epochs(
        spark,
        land,
        _doc_chunks(docs),
        DOCS_SCHEMA,
        neardup_epoch_fn(spark, inc_store, inc_matches),
        str(tmp_path / "ckpt"),
    )
    # batch twin: the SAME epoch function applied once to the whole corpus
    one_store, one_matches = str(tmp_path / "store_one"), str(tmp_path / "m_one")
    neardup_epoch_fn(spark, one_store, one_matches)(docs, 0)
    def undirected(path):
        # cross-epoch pairs orient (stored, new); one-shot pairs orient
        # (lo, hi) — the CONTRACT is the unordered pair set + jaccard
        return _rows(
            spark.read.parquet(path).select(
                F.least("doc_id_a", "doc_id_b").alias("lo"),
                F.greatest("doc_id_a", "doc_id_b").alias("hi"),
                "jaccard",
            )
        )

    inc, one = undirected(inc_matches), undirected(one_matches)
    assert inc == one
    assert len(inc) > 0  # the dup family guarantees matches


# --------------------------------------------------------------------------
# 5. snapshot change detection
# --------------------------------------------------------------------------
def test_parity_change_detect(spark, tmp_path):
    from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.ingest import (
        foreach_batch_change_detect,
    )

    docs = _docs(spark)
    # duplicate keys across chunks: chunk 2 repeats chunk 0's keys
    chunks = _doc_chunks(docs)
    chunks[2] = chunks[2].unionByName(chunks[0])
    land = str(tmp_path / "land")
    snap, novel = str(tmp_path / "snap"), str(tmp_path / "novel")
    _run_foreach_epochs(
        spark,
        land,
        chunks,
        DOCS_SCHEMA,
        foreach_batch_change_detect(spark, ("doc_id",), snap, novel),
        str(tmp_path / "ckpt"),
    )
    batch_keys = _rows(docs.select("doc_id").distinct())
    # final snapshot == batch distinct; novel rows are exactly-once per key
    assert _rows(spark.read.parquet(snap).select("doc_id")) == batch_keys
    assert _rows(spark.read.parquet(novel).select("doc_id")) == batch_keys


# --------------------------------------------------------------------------
# 6. DQ gate
# --------------------------------------------------------------------------
def test_parity_dq_gate(spark, tmp_path):
    from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.dq import (
        foreach_batch_dq_gate,
    )

    ev = _events(spark)
    preds = {
        "null_value": F.col("value").isNull(),
        "negative_value": F.col("value") < 0,
    }
    land = str(tmp_path / "land")
    clean, quar, rep = (
        str(tmp_path / "clean"),
        str(tmp_path / "quar"),
        str(tmp_path / "rep"),
    )
    _run_foreach_epochs(
        spark,
        land,
        _event_chunks(ev),
        EVENTS_SCHEMA,
        foreach_batch_dq_gate(preds, clean, quar, rep),
        str(tmp_path / "ckpt"),
    )
    bad = F.coalesce(preds["null_value"], F.lit(True)) | F.coalesce(
        preds["negative_value"], F.lit(True)
    )
    assert _rows(spark.read.parquet(clean)) == _rows(ev.filter(~bad))
    quar_df = spark.read.parquet(quar).drop("__dq_null_value", "__dq_negative_value")
    assert _rows(quar_df.select(*ev.columns)) == _rows(ev.filter(bad))
    # report totals across epochs == batch violation counts
    got = {
        r["check_name"]: r["n"]
        for r in spark.read.parquet(rep)
        .groupBy("check_name")
        .agg(F.sum("n_violations").alias("n"))
        .collect()
    }
    want = {
        name: ev.filter(F.coalesce(p, F.lit(True))).count()
        for name, p in preds.items()
    }
    assert got == want


# --------------------------------------------------------------------------
# 7. stream-stream interval join
# --------------------------------------------------------------------------
def test_parity_interval_join(spark, tmp_path):
    from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.joins import (
        stream_interval_join,
    )

    ev = _events(spark)
    left_b = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("l_ts"), F.col("event_id").alias("l_id")
    )
    right_b = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("r_ts"), F.col("event_id").alias("r_id")
    )
    land_l, land_r = str(tmp_path / "l"), str(tmp_path / "r")
    sent = _sentinel(spark)
    _land_chunks(
        land_l,
        [
            c.select("user_id", F.col("ts").alias("l_ts"), F.col("event_id").alias("l_id"))
            for c in _event_chunks(ev.filter(F.col("event_type") == "purchase"))
        ]
        + [sent.select("user_id", F.col("ts").alias("l_ts"), F.col("event_id").alias("l_id"))],
    )
    _land_chunks(
        land_r,
        [
            c.select("user_id", F.col("ts").alias("r_ts"), F.col("event_id").alias("r_id"))
            for c in _event_chunks(ev.filter(F.col("event_type") == "click"))
        ]
        + [sent.select("user_id", F.col("ts").alias("r_ts"), F.col("event_id").alias("r_id"))],
    )
    schema_l = "user_id long, l_ts timestamp, l_id long"
    schema_r = "user_id long, r_ts timestamp, r_id long"
    sl = (
        spark.readStream.schema(schema_l).option("maxFilesPerTrigger", "1").parquet(land_l)
    )
    sr = (
        spark.readStream.schema(schema_r).option("maxFilesPerTrigger", "1").parquet(land_r)
    )
    joined = stream_interval_join(
        sl, sr, "user_id", "l_ts", "r_ts", max_delay="1 hour", watermark="1 day"
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _run_sink(joined, out, ckpt, "append")
    streamed = (
        spark.read.parquet(out)
        .filter(F.year("l_ts") == 2024)
        .select("user_id", "l_ts", "r_ts", "l_id", "r_id")
    )
    batch = stream_interval_join(
        left_b, right_b, "user_id", "l_ts", "r_ts", max_delay="1 hour", watermark="1 day"
    ).select("user_id", "l_ts", "r_ts", "l_id", "r_id")
    assert _rows(streamed) == _rows(batch)
    assert streamed.count() > 0


# --------------------------------------------------------------------------
# 8. windowed KMV distinct sketch
# --------------------------------------------------------------------------
def test_parity_distinct_sketch(spark, tmp_path):
    from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.cardinality import (
        windowed_distinct_sketch,
    )

    ev = _events(spark)
    land = str(tmp_path / "land")
    _land_chunks(land, _event_chunks(ev) + [_sentinel(spark)])
    stream = _event_stream(spark, land).withWatermark("ts", "3 days")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _run_sink(windowed_distinct_sketch(stream, "1 day"), out, ckpt, "append")
    streamed = spark.read.parquet(out).filter(F.year("window_start") == 2024)
    batch = windowed_distinct_sketch(ev, "1 day")
    assert _rows(streamed) == _rows(batch)


# --------------------------------------------------------------------------
# 9. per-user transition counts
# --------------------------------------------------------------------------
def test_parity_transitions(spark, tmp_path):
    from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.transitions import (
        streaming_transitions,
    )

    ev = _events(spark)
    land = str(tmp_path / "land")
    _land_chunks(land, _event_chunks(ev))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        streaming_transitions(_event_stream(spark, land))
        .writeStream.outputMode("update")
        .foreachBatch(lambda df, eid: df.write.mode("append").parquet(out))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    streamed = (
        spark.read.parquet(out)
        .groupBy("prev_type", "next_type")
        .agg(F.sum("n").alias("n"))
    )
    # batch twin: lag over (ts, event_id) per user, then count pairs
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    batch = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert _rows(streamed) == _rows(batch)


# --------------------------------------------------------------------------
# 10. KS drift gate (per-epoch report == per-chunk batch arithmetic)
# --------------------------------------------------------------------------
def test_parity_ks_gate(spark, tmp_path):
    from real_time_weather_data_pipeline_for_philippine_cities_spark.operators.stats import (
        ks_from_counts,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.drift import (
        foreach_batch_ks_drift,
        write_reference_distribution,
    )

    ev = _events(spark)
    ref = str(tmp_path / "ref")
    write_reference_distribution(ev.filter("value IS NOT NULL"), "value", ref)
    land = str(tmp_path / "land")
    report = str(tmp_path / "report")
    chunks = _event_chunks(ev)
    _run_foreach_epochs(
        spark,
        land,
        chunks,
        EVENTS_SCHEMA,
        foreach_batch_ks_drift(ref, report),
        str(tmp_path / "ckpt"),
    )
    rep = spark.read.parquet(report)
    assert rep.filter("ks_stat IS NULL OR n_ref <= 0").count() == 0
    got = {
        r["epoch_id"]: (r["ks_stat"], r["n_batch"], r["n_ref"])
        for r in rep.collect()
    }
    assert len(got) == len(chunks)
    ref_counts = spark.read.parquet(ref)
    for i, c in enumerate(chunks):
        inc = (
            c.filter(F.col("value").isNotNull())
            .groupBy(F.col("value"))
            .agg(F.count(F.lit(1)).alias("n_inc"))
        )
        per = inc.join(ref_counts, "value", "full_outer").select(
            "value",
            F.coalesce("n_inc", F.lit(0)).cast("long").alias("n1"),
            F.coalesce("n_ref", F.lit(0)).cast("long").alias("n2"),
        )
        want = ks_from_counts(per, "value").collect()[0]
        assert got[i] == (want["ks_stat"], want["n_a"], want["n_b"]), i


def test_parity_stream_decontam(spark, tmp_path):
    """The ingest-time decontamination gate must reproduce the batch
    sweep exactly: clean ∪ flagged, reconstructed to the batch schema
    (doc_id, n_overlap, contaminated), frame-equals benchmark_overlap on
    the same corpus rows with the same benchmark split."""
    from real_time_weather_data_pipeline_for_philippine_cities_spark.operators.decontam import (
        benchmark_overlap,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.decontam import (
        benchmark_shingle_set,
        foreach_batch_decontam,
    )

    docs = _docs(spark)
    pred = F.col("doc_id") % 37 == 0
    batch = benchmark_overlap(docs, pred, n=8)

    bench_sh = benchmark_shingle_set(docs.filter(pred), n=8).persist()
    try:
        land = str(tmp_path / "land")
        clean = str(tmp_path / "clean")
        flagged = str(tmp_path / "flagged")
        corpus = docs.filter(~pred)
        _run_foreach_epochs(
            spark,
            land,
            _doc_chunks(corpus),
            DOCS_SCHEMA,
            foreach_batch_decontam(bench_sh, clean, flagged, n=8),
            str(tmp_path / "ckpt"),
        )
        got_clean = spark.read.parquet(clean).select(
            "doc_id",
            F.lit(0).cast("bigint").alias("n_overlap"),
            F.lit(False).alias("contaminated"),
        )
        got_flagged = spark.read.parquet(flagged).select(
            "doc_id",
            F.col("n_overlap").cast("bigint"),
            F.lit(True).alias("contaminated"),
        )
        assert _rows(got_clean.union(got_flagged)) == _rows(
            batch.select(
                "doc_id",
                F.col("n_overlap").cast("bigint"),
                "contaminated",
            )
        )
        # the gate must actually split: this split has both kinds
        assert spark.read.parquet(flagged).count() > 0
        assert spark.read.parquet(clean).count() > 0
    finally:
        bench_sh.unpersist()


SURFACES = [
    "windowed_agg",
    "stream_dedup",
    "stream_topk",
    "stream_neardup",
    "change_detect",
    "dq_gate",
    "interval_join",
    "distinct_sketch",
    "transitions",
    "ks_gate",
    "stream_decontam",
]


def test_all_surfaces_covered():
    """Rot guard: the parity file must keep one test per streaming
    surface in the bench inventory (bench_streaming.py)."""
    import bench_streaming  # noqa: F401  (import proves the inventory exists)

    here = open(__file__).read()
    for s in SURFACES:
        assert f"def test_parity_{s}(" in here, s
