"""Rot protection for bench_streaming.py: the ten availableNow surfaces
must still drive end-to-end and emit a well-formed STREAMBENCH payload.
Runs in-process at sf0.001 with 2 chunks so the whole sweep stays cheap;
output is diverted so the committed sf0.1 STREAMBENCH.json is untouched."""

from __future__ import annotations

import json
import os
import sys


def test_bench_streaming_all_surfaces(spark, tmp_path, monkeypatch):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out = tmp_path / "stream.json"
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_STREAMBENCH_OUT", str(out))

    import bench_streaming

    monkeypatch.setattr(bench_streaming, "N_CHUNKS", 2)
    bench_streaming.main()

    payload = json.loads(out.read_text())
    assert payload["metric"] == "streaming_bench"
    surfaces = payload["surfaces"]
    assert set(surfaces) == {
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
    }
    for name, s in surfaces.items():
        assert s["epochs"] >= 1, name
        assert s["rows"] > 0, name
        assert s["wall_sec"] > 0, name
    # the KS gate must have computed REAL statistics against a non-empty
    # reference in every epoch — a frozen-empty reference (the round-5
    # read-as-json bug) produced NULL ks_stat rows this would catch.
    assert surfaces["ks_gate"]["ks_report_epochs"] >= 1
    assert (
        surfaces["ks_gate"]["ks_live_epochs"]
        == surfaces["ks_gate"]["ks_report_epochs"]
    )
    # stateful surfaces must report state metrics from the engine
    assert surfaces["windowed_agg"]["state_rows_max"] > 0
    assert surfaces["stream_topk"]["state_rows_max"] > 0
    assert surfaces["interval_join"]["state_rows_max"] > 0
    assert surfaces["distinct_sketch"]["state_rows_max"] > 0
    assert surfaces["transitions"]["state_rows_max"] > 0
