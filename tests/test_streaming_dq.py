"""Streaming DQ gate e2e (streaming/dq.py): every micro-batch splits into
clean vs quarantined rows with per-epoch per-check violation counts; no
row is ever dropped (clean + quarantine == input), and the checkpoint
carries processed files across availableNow restarts."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.dq import (
    foreach_batch_dq_gate,
)
from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.ingest import (
    run_available_now,
)

SCHEMA = "reading_id long, city string, temp_c double"


def _row(rid, city, temp):
    c = "null" if city is None else f'"{city}"'
    t = "null" if temp is None else str(temp)
    return f'{{"reading_id": {rid}, "city": {c}, "temp_c": {t}}}\n'


def _gate(tmp_path):
    return foreach_batch_dq_gate(
        {
            "temp_out_of_range": (F.col("temp_c") < -90.0) | (F.col("temp_c") > 60.0),
            "city_missing": F.col("city").isNull(),
        },
        clean_path=str(tmp_path / "clean"),
        quarantine_path=str(tmp_path / "quarantine"),
        report_path=str(tmp_path / "report"),
    )


def _run(spark, landing, tmp_path):
    stream = spark.readStream.schema(SCHEMA).json(str(landing))
    q = run_available_now(stream, _gate(tmp_path), str(tmp_path / "ckpt"))
    q.awaitTermination(120)


def test_dq_gate_splits_and_counts_across_epochs(spark, tmp_path):
    d = tmp_path / "landing"
    d.mkdir()

    # epoch 1: one clean row, one out-of-range, one null city AND null temp
    # (null predicate result must count as a violation, not pass silently)
    (d / "f1.json").write_text(
        _row(1, "Manila", 31.0) + _row(2, "Cebu", 99.5) + _row(3, None, None)
    )
    _run(spark, d, tmp_path)

    clean = spark.read.parquet(str(tmp_path / "clean"))
    quar = spark.read.parquet(str(tmp_path / "quarantine"))
    assert [r["reading_id"] for r in clean.collect()] == [1]
    assert sorted(r["reading_id"] for r in quar.collect()) == [2, 3]
    # quarantine keeps the per-check flags for triage
    flags = {r["reading_id"]: (r["__dq_temp_out_of_range"], r["__dq_city_missing"])
             for r in quar.collect()}
    assert flags[2] == (True, False)
    assert flags[3] == (True, True)  # null temp -> unevaluable -> violation

    report = {
        (r["epoch_id"], r["check_name"]): r["n_violations"]
        for r in spark.read.parquet(str(tmp_path / "report")).collect()
    }
    assert report[(0, "temp_out_of_range")] == 2
    assert report[(0, "city_missing")] == 1

    # epoch 2: restart from the same checkpoint — only the NEW file is
    # processed (no double-count), and conservation holds per epoch
    (d / "f2.json").write_text(_row(4, "Davao", 28.0) + _row(5, "Iloilo", -120.0))
    _run(spark, d, tmp_path)

    clean2 = spark.read.parquet(str(tmp_path / "clean"))
    quar2 = spark.read.parquet(str(tmp_path / "quarantine"))
    assert sorted(r["reading_id"] for r in clean2.collect()) == [1, 4]
    assert sorted(r["reading_id"] for r in quar2.collect()) == [2, 3, 5]
    report2 = {
        (r["epoch_id"], r["check_name"]): r["n_violations"]
        for r in spark.read.parquet(str(tmp_path / "report")).collect()
    }
    # epoch ids continue across restarts (checkpointed batch counter):
    # run 1's counts stay under epoch 0, run 2's land under epoch 1
    assert report2[(0, "temp_out_of_range")] == 2
    assert report2[(1, "temp_out_of_range")] == 1
    assert report2[(1, "city_missing")] == 0


def test_dq_gate_rejects_empty_check_set():
    with pytest.raises(ValueError):
        foreach_batch_dq_gate({}, "c", "q", "r")
