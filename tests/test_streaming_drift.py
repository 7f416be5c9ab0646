"""Streaming mixture-drift monitor e2e (streaming/drift.py): per-epoch
language KL reports against a frozen base profile, appended across
availableNow restarts; a skewed epoch flags its over-represented
language, and the epoch arithmetic is the batch query's own code."""

from __future__ import annotations

from pyspark.sql import Row

from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.drift import (
    foreach_batch_drift,
    write_base_profile,
)

SCHEMA = "doc_id long, lang string"


def _doc(doc_id, lang):
    return f'{{"doc_id": {doc_id}, "lang": "{lang}"}}\n'


def _run(spark, landing, profile, report, ckpt):
    stream = spark.readStream.schema(SCHEMA).json(str(landing))
    q = (
        stream.writeStream.foreachBatch(foreach_batch_drift(profile, report))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streaming_drift_flags_skewed_epoch(spark, tmp_path):
    profile = str(tmp_path / "profile")
    report = str(tmp_path / "report")
    ckpt = str(tmp_path / "ckpt")
    d = tmp_path / "landing"
    d.mkdir()

    # frozen base mixture: 4 en, 4 de
    base = spark.createDataFrame(
        [Row(doc_id=i, lang="en") for i in range(4)]
        + [Row(doc_id=10 + i, lang="de") for i in range(4)]
    )
    write_base_profile(base, profile)

    # epoch 1: matches the base mixture
    (d / "e1.json").write_text(
        _doc(100, "en") + _doc(101, "en") + _doc(102, "de") + _doc(103, "de")
    )
    _run(spark, d, profile, report, ckpt)

    # epoch 2: all-French — a language the base has never seen
    (d / "e2.json").write_text(
        _doc(200, "fr") + _doc(201, "fr") + _doc(202, "fr") + _doc(203, "fr")
    )
    _run(spark, d, profile, report, ckpt)

    rows = spark.read.parquet(report).collect()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r["epoch_id"], {})[r["lang"]] = r
    assert len(by_epoch) == 2
    e1, e2 = (by_epoch[k] for k in sorted(by_epoch))

    # balanced epoch: tiny |KL| terms for both languages
    assert set(e1) == {"en", "de"}
    assert all(abs(r["kl_term"]) < 0.01 for r in e1.values())

    # skewed epoch: fr reported despite n_base = 0 (full-outer + smoothing)
    # with a strongly positive KL term; absent base langs report n_inc = 0
    assert set(e2) == {"en", "de", "fr"}
    assert e2["fr"]["n_base"] == 0 and e2["fr"]["kl_term"] > 0.5
    assert e2["en"]["n_inc"] == 0 and e2["de"]["n_inc"] == 0


def test_streaming_epoch_report_equals_batch_arithmetic(spark):
    """One epoch through the streaming helper's join path must equal the
    batch helper called on the same counts — pinned by sharing
    kl_drift_from_counts, checked end-to-end here."""
    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.curation_queries import (
        kl_drift_from_counts,
    )

    per = spark.createDataFrame(
        [Row(lang="en", n_inc=3, n_base=8), Row(lang="de", n_inc=9, n_base=2)]
    )
    got = {r["lang"]: r for r in kl_drift_from_counts(per).collect()}
    assert got["de"]["kl_term"] > 0 > got["en"]["kl_term"]
    # shares are exact smoothed ratios
    assert got["en"]["share_incoming"] == round(4 / 14, 6)
    assert got["en"]["share_base"] == round(9 / 12, 6)


def test_streaming_ks_gate_flags_shifted_epoch(spark, tmp_path):
    """Numeric KS gate e2e: a micro-batch drawn from the reference's own
    support scores near 0; a location-shifted batch scores near 1; both
    epochs append with their ids, and the epoch arithmetic is the batch
    catalog's own ks_from_counts (identical statistic when recomputed
    driver-side)."""
    import json

    from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.drift import (
        foreach_batch_ks_drift,
        write_reference_distribution,
    )

    ref_vals = [float(v) for v in range(0, 50)] * 4
    ref_df = spark.createDataFrame([(v,) for v in ref_vals], "value double")
    ref = str(tmp_path / "ref")
    write_reference_distribution(ref_df, "value", ref)

    landing = tmp_path / "landing"
    landing.mkdir()
    report = str(tmp_path / "report")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = spark.readStream.schema("event_id long, value double").json(
            str(landing)
        )
        q = (
            stream.writeStream.foreachBatch(
                foreach_batch_ks_drift(ref, report)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # epoch 0: same support as the reference -> tiny KS
    (landing / "a.json").write_text(
        "".join(
            json.dumps({"event_id": i, "value": float(i % 50)}) + "\n"
            for i in range(200)
        )
    )
    run()
    # epoch 1: shifted far right -> KS ~ 1
    (landing / "b.json").write_text(
        "".join(
            json.dumps({"event_id": 1000 + i, "value": 500.0 + i}) + "\n"
            for i in range(100)
        )
    )
    run()

    rows = {r["epoch_id"]: r for r in spark.read.parquet(report).collect()}
    assert len(rows) == 2
    lo, hi = sorted(rows)
    assert rows[lo]["ks_stat"] < 0.05
    assert rows[hi]["ks_stat"] > 0.95
    assert rows[hi]["n_batch"] == 100 and rows[hi]["n_ref"] == len(ref_vals)


def test_streaming_ks_gate_restart_appends_nothing_new(spark, tmp_path):
    """Effectively-once: restarting the availableNow query with NO new
    landed files must not re-run committed epochs — the report row count
    is unchanged after the second run (checkpoint replay semantics, same
    contract as the KL gate and the JDBC epoch sink)."""
    import json

    from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.drift import (
        foreach_batch_ks_drift,
        write_reference_distribution,
    )

    ref_df = spark.createDataFrame([(float(v),) for v in range(20)], "value double")
    ref = str(tmp_path / "ref")
    write_reference_distribution(ref_df, "value", ref)
    landing = tmp_path / "landing"
    landing.mkdir()
    report = str(tmp_path / "report")
    ckpt = str(tmp_path / "ckpt")
    (landing / "a.json").write_text(
        "".join(
            json.dumps({"event_id": i, "value": float(i % 20)}) + "\n"
            for i in range(50)
        )
    )

    def run():
        stream = spark.readStream.schema("event_id long, value double").json(
            str(landing)
        )
        q = (
            stream.writeStream.foreachBatch(foreach_batch_ks_drift(ref, report))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    n1 = spark.read.parquet(report).count()
    run()  # no new files -> no new epochs
    assert spark.read.parquet(report).count() == n1 == 1
