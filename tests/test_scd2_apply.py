"""SCD2 merge APPLY laws (VERDICT r05 #4): the executed merge must be
idempotent under replay, atomic at the directory level, and must produce
exactly the action set the plan query classifies."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_weather_data_pipeline_for_philippine_cities_spark.operators.scd2 import (
    scd2_apply,
    scd2_apply_write,
)

KEYS = ["key"]
ATTRS = ["segment", "acctbal"]


def _dim(spark):
    return spark.createDataFrame(
        [
            # key 1: will change; key 2: unchanged; key 3: absent from snap
            (1, "AUTO", 10.0, 0, None, True),
            (2, "BIKE", 20.0, 0, None, True),
            (3, "SHIP", 30.0, 0, None, True),
            # history row must pass through untouched
            (1, "LEGACY", 0.0, -1, 0, False),
        ],
        "key int, segment string, acctbal double, valid_from int, "
        "valid_to int, is_current boolean",
    )


def _snap(spark):
    return spark.createDataFrame(
        [
            (1, "AUTO", 99.0),  # attr change -> close + insert
            (2, "BIKE", 20.0),  # identical -> keep
            (4, "FARM", 40.0),  # new key -> insert
        ],
        "key int, segment string, acctbal double",
    )


def _key(t):
    return tuple((v is None, v) for v in t)


def _rows(df):
    return sorted(map(tuple, df.collect()), key=_key)


def test_scd2_apply_action_semantics(spark):
    out = scd2_apply(_dim(spark), _snap(spark), KEYS, ATTRS, epoch=1)
    got = _rows(out)
    assert got == sorted(
        [
            (1, "LEGACY", 0.0, -1, 0, False),  # history untouched
            (1, "AUTO", 10.0, 0, 1, False),  # closed old version
            (1, "AUTO", 99.0, 1, None, True),  # new version
            (2, "BIKE", 20.0, 0, None, True),  # unchanged current
            (3, "SHIP", 30.0, 0, None, True),  # absent from snap: kept
            (4, "FARM", 40.0, 1, None, True),  # brand-new key
        ],
        key=_key,
    )


def test_scd2_apply_idempotent_on_replay(spark):
    """Applying the same snapshot again — same or later epoch — is a
    no-op: the post-merge state already agrees with the snapshot."""
    snap = _snap(spark)
    once = scd2_apply(_dim(spark), snap, KEYS, ATTRS, epoch=1)
    for replay_epoch in (1, 2):
        twice = scd2_apply(once, snap, KEYS, ATTRS, epoch=replay_epoch)
        assert _rows(twice) == _rows(once), replay_epoch


def test_scd2_apply_null_attr_transitions_close(spark):
    """NULL→value and value→NULL are real changes (eqNullSafe compare)."""
    dim = spark.createDataFrame(
        [(1, None, 1.0, 0, None, True), (2, "B", None, 0, None, True)],
        "key int, segment string, acctbal double, valid_from int, "
        "valid_to int, is_current boolean",
    )
    snap = spark.createDataFrame(
        [(1, "A", 1.0), (2, "B", None)],
        "key int, segment string, acctbal double",
    )
    out = scd2_apply(dim, snap, KEYS, ATTRS, epoch=5)
    got = _rows(out)
    # key 1 closes and re-inserts; key 2 (NULL == NULL, same) keeps
    assert (1, None, 1.0, 0, 5, False) in got
    assert (1, "A", 1.0, 5, None, True) in got
    assert (2, "B", None, 0, None, True) in got
    assert len(got) == 3


def test_scd2_apply_write_swap_and_replay(spark, tmp_path):
    """First load inserts everything at the given epoch; a replayed write
    of the same snapshot converges to the identical state; the promoted
    directory always reads back complete."""
    path = str(tmp_path / "dim")
    snap = _snap(spark)
    scd2_apply_write(path, snap, KEYS, ATTRS, epoch=0)
    first = _rows(spark.read.parquet(path))
    assert first == sorted(
        [
            (1, "AUTO", 99.0, 0, None, True),
            (2, "BIKE", 20.0, 0, None, True),
            (4, "FARM", 40.0, 0, None, True),
        ],
        key=_key,
    )
    scd2_apply_write(path, snap, KEYS, ATTRS, epoch=1)  # replay: no-op
    assert _rows(spark.read.parquet(path)) == first

    changed = snap.withColumn(
        "acctbal", F.when(F.col("key") == 2, 21.0).otherwise(F.col("acctbal"))
    )
    scd2_apply_write(path, changed, KEYS, ATTRS, epoch=2)
    now = _rows(spark.read.parquet(path))
    assert (2, "BIKE", 20.0, 0, 2, False) in now  # closed
    assert (2, "BIKE", 21.0, 2, None, True) in now  # new version
    assert len(now) == 4  # keys 1+4 unchanged currents, key 2 closed + new


def test_scd2_catalog_entry_matches_plan_actions(spark, sf_dir):
    """The executed merge and the plan query must tell the same story:
    every close+insert key contributes one closed + one epoch-1 row, every
    insert key one epoch-1 row, every keep key one epoch-0 current row."""
    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.catalog import (
        CATALOG,
    )

    actions = {
        r["key"]: r["action"]
        for r in CATALOG["scd2_merge_plan"].fn(spark, sf_dir).collect()
    }
    out = CATALOG["scd2_apply"].fn(spark, sf_dir).collect()
    closed = {r["key"] for r in out if r["valid_to"] == 1}
    inserted = {r["key"] for r in out if r["valid_from"] == 1 and r["is_current"]}
    kept = {
        r["key"]
        for r in out
        if r["valid_from"] == 0 and r["is_current"] and r["valid_to"] is None
    }
    assert closed == {k for k, a in actions.items() if a == "close+insert"}
    assert inserted == {
        k for k, a in actions.items() if a in ("close+insert", "insert")
    }
    assert kept == {k for k, a in actions.items() if a == "keep"}


# -- hypothesis laws ---------------------------------------------------------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# random dim/snapshot over a small shared key space so all three actions
# (close+insert / insert / keep) and key-absent-from-snapshot occur
_dim_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.sampled_from(["A", "B", None]),
        st.sampled_from([1.0, 2.0, None]),
    ),
    min_size=0,
    max_size=10,
    unique_by=lambda r: r[0],
)
_snap_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.sampled_from(["A", "B", None]),
        st.sampled_from([1.0, 2.0, None]),
    ),
    min_size=0,
    max_size=10,
    unique_by=lambda r: r[0],
)


@_SETTINGS
@given(_dim_rows, _snap_rows)
def test_scd2_laws_random_states(spark, dim_rows, snap_rows):
    """Three laws on random states: (1) replay idempotence — applying the
    same snapshot again changes nothing; (2) version-chain validity —
    exactly one current row per key, closed rows have valid_to set;
    (3) currency — after the merge, every snapshot key's current
    attributes equal the snapshot's."""
    schema_d = (
        "key int, segment string, acctbal double, valid_from int, "
        "valid_to int, is_current boolean"
    )
    dim = spark.createDataFrame(
        [(k, s, b, 0, None, True) for k, s, b in dim_rows], schema_d
    )
    snap = spark.createDataFrame(
        list(snap_rows), "key int, segment string, acctbal double"
    )
    once = scd2_apply(dim, snap, KEYS, ATTRS, epoch=1)
    once_rows = _rows(once)

    # (1) replay idempotence
    again = scd2_apply(once, snap, KEYS, ATTRS, epoch=2)
    assert _rows(again) == once_rows

    # (2) version-chain validity
    by_key = {}
    for r in once_rows:
        by_key.setdefault(r[0], []).append(r)
    snap_by_key = {k: (s, b) for k, s, b in snap_rows}
    for k, rows in by_key.items():
        currents = [r for r in rows if r[5]]
        assert len(currents) == 1, (k, rows)
        for r in rows:
            if not r[5]:
                assert r[4] is not None, r  # closed rows carry valid_to
        # (3) currency: snapshot keys' current attrs == snapshot attrs
        if k in snap_by_key:
            cur = currents[0]
            assert (cur[1], cur[2]) == snap_by_key[k], (k, cur)


def test_scd2_apply_rejects_duplicate_keys(spark):
    """MERGE semantics (round-6 review finding): duplicate business keys
    on either side would fan the join out into multiple current versions —
    the in-plan guard must fail the merge loudly instead."""
    import pytest

    dup_snap = spark.createDataFrame(
        [(1, "A", 1.0), (1, "B", 2.0)], "key int, segment string, acctbal double"
    )
    with pytest.raises(Exception, match="duplicate business key"):
        scd2_apply(_dim(spark), dup_snap, KEYS, ATTRS, epoch=1).collect()

    dup_dim = spark.createDataFrame(
        [(1, "A", 1.0, 0, None, True), (1, "B", 2.0, 0, None, True)],
        "key int, segment string, acctbal double, valid_from int, "
        "valid_to int, is_current boolean",
    )
    with pytest.raises(Exception, match="duplicate business key"):
        scd2_apply(dup_dim, _snap(spark), KEYS, ATTRS, epoch=1).collect()

    # duplicate keys among HISTORY rows are legal (a key closes many times)
    hist_dim = spark.createDataFrame(
        [
            (1, "A", 1.0, 0, None, True),
            (1, "OLD1", 0.0, -2, -1, False),
            (1, "OLD2", 0.0, -1, 0, False),
        ],
        "key int, segment string, acctbal double, valid_from int, "
        "valid_to int, is_current boolean",
    )
    out = scd2_apply(hist_dim, _snap(spark), KEYS, ATTRS, epoch=1)
    assert out.filter("NOT is_current AND segment LIKE 'OLD%'").count() == 2


def _changed_snap(snap):
    return snap.withColumn(
        "acctbal", F.when(F.col("key") == 2, 21.0).otherwise(F.col("acctbal"))
    )


def _crash_states(spark, tmp_path, name):
    """Materialize every distinct on-disk state a crash can leave behind
    during the epoch-2 merge of `changed` over the epoch-0 load of `snap`
    (the rename-promote protocol: write _next → rename dim→_old → rename
    _next→dim → drop _old), plus the expected post-merge state. Returns
    (path, snapshot_df, expected_rows) with the wreck installed at path."""
    import os
    import shutil

    snap, changed = _snap(spark), _changed_snap(_snap(spark))

    # the state the replay must converge to, built on a pristine twin
    ref = str(tmp_path / "ref")
    scd2_apply_write(ref, snap, KEYS, ATTRS, epoch=0)
    scd2_apply_write(ref, changed, KEYS, ATTRS, epoch=2)
    expected = _rows(spark.read.parquet(ref))

    path = str(tmp_path / f"dim_{name}")
    scd2_apply_write(path, snap, KEYS, ATTRS, epoch=0)  # committed base
    base = spark.read.parquet(path)
    merged = scd2_apply(base, changed, KEYS, ATTRS, epoch=2)

    if name == "during_write_next":
        # partial, uncommitted _next: data file but no marker
        os.makedirs(path + "_next")
        open(path + "_next/part-00000.parquet", "wb").close()
    elif name == "after_write_next":
        merged.write.mode("overwrite").parquet(path + "_next")
    elif name == "after_rename_dim_to_old":
        merged.write.mode("overwrite").parquet(path + "_next")
        os.rename(path, path + "_old")
    elif name == "after_rename_next_to_dim":
        merged.write.mode("overwrite").parquet(path + "_next")
        os.rename(path, path + "_old")
        os.rename(path + "_next", path)
    elif name == "during_drop_old":
        merged.write.mode("overwrite").parquet(path + "_next")
        os.rename(path, path + "_old")
        os.rename(path + "_next", path)
        os.remove(path + "_old/_SUCCESS")  # rmtree died mid-way
    elif name == "dim_wreck_next_committed":
        # round-6 finding's shape: dim half-deleted (exists, no marker),
        # the only good copy is the committed _next
        merged.write.mode("overwrite").parquet(path + "_next")
        shutil.rmtree(path)
        os.makedirs(path)
    else:  # pragma: no cover
        raise AssertionError(name)
    return path, changed, expected


import pytest


@pytest.mark.parametrize(
    "step",
    [
        "during_write_next",
        "after_write_next",
        "after_rename_dim_to_old",
        "after_rename_next_to_dim",
        "during_drop_old",
        "dim_wreck_next_committed",
    ],
)
def test_scd2_apply_write_recovers_from_crash_at_every_step(
    spark, tmp_path, step
):
    """Replaying the epoch after a crash at ANY protocol step converges to
    the same post-merge state — never a silent reset to first-load, never
    a half-written directory trusted as a dimension (round-6 review
    finding + round-6 verdict's O(1)-promote item)."""
    import os

    path, changed, expected = _crash_states(spark, tmp_path, step)
    scd2_apply_write(path, changed, KEYS, ATTRS, epoch=2)  # replay
    assert _rows(spark.read.parquet(path)) == expected, step
    # protocol leaves no droppings once a merge completes
    assert not os.path.exists(path + "_next"), step
    assert not os.path.exists(path + "_old"), step


def test_scd2_apply_write_is_single_data_write(spark, tmp_path, monkeypatch):
    """The round-6 verdict's O(1)-promote contract: a merge performs
    exactly ONE Spark data write (to _next); the promote is renames."""
    from pyspark.sql.readwriter import DataFrameWriter

    writes: list[str] = []
    orig = DataFrameWriter.parquet

    def spy(self, p, **kw):
        writes.append(p)
        return orig(self, p, **kw)

    monkeypatch.setattr(DataFrameWriter, "parquet", spy)
    path = str(tmp_path / "dim")
    scd2_apply_write(path, _snap(spark), KEYS, ATTRS, epoch=0)
    assert writes == [path + "_next"]
    writes.clear()
    scd2_apply_write(path, _changed_snap(_snap(spark)), KEYS, ATTRS, epoch=1)
    assert writes == [path + "_next"]


def test_scd2_apply_write_rejects_remote_schemes(spark, tmp_path):
    """os.path-based markers can't see remote storage: an existing
    hdfs:///s3a:// dimension would always read as a first load and be
    silently overwritten — the operator must refuse such paths loudly
    (round-6 advice)."""
    import pytest

    for bad in ("hdfs://nn/warehouse/dim", "s3a://bucket/dim"):
        with pytest.raises(ValueError, match="only local"):
            scd2_apply_write(bad, _snap(spark), KEYS, ATTRS, epoch=0)
    # file: prefix IS local and must keep working end-to-end
    path = "file:" + str(tmp_path / "dim_file")
    scd2_apply_write(path, _snap(spark), KEYS, ATTRS, epoch=0)
    assert spark.read.parquet(path).count() == 3


def test_scd2_duplicate_key_guard_survives_optimizer(spark):
    """The MERGE guard is assert_true inside a kept filter; a future
    Catalyst simplification of If(c, null, raise_error) IS NULL to `true`
    would silently drop it (round-6 advice). Pin the OPTIMIZED plan: the
    raise_error expression must survive optimization on both guard sides."""
    out = scd2_apply(_dim(spark), _snap(spark), KEYS, ATTRS, epoch=1)
    optimized = out._jdf.queryExecution().optimizedPlan().toString()
    assert optimized.count("raise_error") >= 2, optimized
