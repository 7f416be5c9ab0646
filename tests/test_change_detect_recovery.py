"""Crash recovery of the streaming snapshot state machine (round 7: the
change-detect epoch adopted operators/promote — marker-judged snapshot
validity + O(1) rename promote). The hazard being pinned: a crashed
epoch's half-written snapshot must NOT read as "first epoch", which
would re-emit every already-known key as novel on replay."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.ingest import (
    foreach_batch_change_detect,
)

SCHEMA = "doc_id long, text string"


def _batch(spark, ids):
    return spark.createDataFrame([(i, f"d{i}") for i in ids], SCHEMA)


def _ids(spark, path, col="doc_id"):
    return sorted(r[col] for r in spark.read.parquet(path).collect())


def test_epochs_fold_and_dedupe(spark, tmp_path):
    snap, novel = str(tmp_path / "snap"), str(tmp_path / "novel")
    run = foreach_batch_change_detect(spark, ("doc_id",), snap, novel)
    run(_batch(spark, [1, 2, 3]), 0)
    run(_batch(spark, [2, 3, 4]), 1)  # only 4 is novel
    assert _ids(spark, snap) == [1, 2, 3, 4]
    assert _ids(spark, novel) == [1, 2, 3, 4]  # exactly once per key
    # promote leaves no droppings
    assert not os.path.exists(snap + "_next")
    assert not os.path.exists(snap + "_old")


def test_crashed_promote_does_not_reset_to_first_epoch(spark, tmp_path):
    snap, novel = str(tmp_path / "snap"), str(tmp_path / "novel")
    run = foreach_batch_change_detect(spark, ("doc_id",), snap, novel)
    run(_batch(spark, [1, 2, 3]), 0)

    # crash simulation: promote died between the renames — the only
    # committed copy is _next; snapshot_path is an uncommitted wreck
    shutil.copytree(snap, snap + "_next")
    shutil.rmtree(snap)
    os.makedirs(snap)  # exists, no marker, no data

    run(_batch(spark, [1, 2, 3, 9]), 1)  # replayed epoch, one new key
    assert _ids(spark, snap) == [1, 2, 3, 9]
    # keys 1-3 were already known: the recovered snapshot must suppress
    # them — only 9 lands in the novel sink for epoch 1
    novel_rows = spark.read.parquet(novel).filter(F.col("epoch_id") == 1)
    assert sorted(r["doc_id"] for r in novel_rows.collect()) == [9]


def test_half_written_snapshot_without_next_is_first_epoch(spark, tmp_path):
    """With no committed copy ANYWHERE (both snapshot and _next wrecked),
    first-epoch semantics are the only correct option — and the marker
    check must reach that conclusion without trusting a partial read."""
    snap, novel = str(tmp_path / "snap"), str(tmp_path / "novel")
    run = foreach_batch_change_detect(spark, ("doc_id",), snap, novel)
    run(_batch(spark, [1, 2]), 0)
    os.remove(os.path.join(snap, "_SUCCESS"))  # wreck: marker gone

    run(_batch(spark, [2, 3]), 1)
    assert _ids(spark, snap) == [2, 3]  # rebuilt from the replayed batch
