"""applyInPandasWithState running totals + timeseries operator edges."""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import functions as F

from real_time_weather_data_pipeline_for_philippine_cities_spark.operators.timeseries import (
    asof_join_backward,
    sessionize,
)
from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.stateful import (
    running_totals,
)


def _write_batch(d, name, rows):
    with open(d / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_running_totals_state_accumulates_across_batches(spark, tmp_path):
    d = tmp_path / "landing"
    d.mkdir()
    _write_batch(d, "b1.json", [
        {"event_type": "click", "ts": "2024-12-01T00:00:00", "value": 1.0},
        {"event_type": "click", "ts": "2024-12-01T00:01:00", "value": 2.0},
        {"event_type": "buy", "ts": "2024-12-01T00:02:00", "value": 10.0},
    ])
    schema = "event_type string, ts timestamp, value double"
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_pass():
        stream = spark.readStream.schema(schema).json(str(d))
        q = (
            running_totals(stream)
            .writeStream.foreachBatch(
                lambda df, epoch: df.write.mode("append").parquet(sink)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_pass()
    _write_batch(d, "b2.json", [
        {"event_type": "click", "ts": "2024-12-01T00:05:00", "value": 4.0},
    ])
    run_pass()

    out = spark.read.parquet(sink)
    # latest emission per key reflects cumulative state across both passes
    latest = {
        r.key: (r.n_events, r.sum_value)
        for r in out.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                    "key"
                ).orderBy(F.col("n_events").desc())
            ),
        )
        .filter("rn = 1")
        .collect()
    }
    assert latest["click"] == (3, 7.0)
    assert latest["buy"] == (1, 10.0)


def test_asof_join_no_match_gives_nulls(spark):
    left = spark.createDataFrame(
        [(1, 10, dt.datetime(2024, 1, 2))], "id int, k int, lts timestamp"
    )
    right = spark.createDataFrame(
        [(10, dt.datetime(2024, 1, 3), 5.0)], "k int, rts timestamp, v double"
    )  # right event AFTER left ts → no backward match
    out = asof_join_backward(left, right, key="k", left_ts="lts", right_ts="rts",
                             value_cols=["v"]).collect()
    assert len(out) == 1
    assert out[0]["asof_v"] is None and out[0]["asof_ts"] is None


def test_asof_join_equal_ts_is_inclusive(spark):
    t = dt.datetime(2024, 1, 2)
    left = spark.createDataFrame([(1, 10, t)], "id int, k int, lts timestamp")
    right = spark.createDataFrame([(10, t, 7.0)], "k int, rts timestamp, v double")
    out = asof_join_backward(left, right, key="k", left_ts="lts", right_ts="rts",
                             value_cols=["v"]).collect()
    assert out[0]["asof_v"] == 7.0 and out[0]["asof_ts"] == t


def test_sessionize_boundary_gap_not_new_session(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0),
        (1, t0 + dt.timedelta(seconds=100)),   # same session (gap 100 <= 100)
        (1, t0 + dt.timedelta(seconds=201)),   # new session (gap 101 > 100)
        (2, t0),
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp")
    out = sessionize(df, key="k", ts="ts", gap_seconds=100).collect()
    by_row = {(r.k, r.ts): r.session_seq for r in out}
    assert by_row[(1, t0)] == 1
    assert by_row[(1, t0 + dt.timedelta(seconds=100))] == 1
    assert by_row[(1, t0 + dt.timedelta(seconds=201))] == 2
    assert by_row[(2, t0)] == 1


def test_native_session_window_agrees_with_lag_sessionize(spark, sf_dir):
    """Off gap-boundary data: Spark's native session_window must produce
    the same (key, session_start, n_events) sessions as the lag+cumsum
    sessionizer (which is DuckDB-oracle-paired)."""
    from real_time_weather_data_pipeline_for_philippine_cities_spark.operators.timeseries import (
        session_stats,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.sources.registry import (
        load_table,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.windows import (
        session_window_stats,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    gap_s = 6 * 3600
    lag_based = session_stats(ev, key="user_id", ts="ts", gap_seconds=gap_s,
                              order_tiebreak=["event_id"])
    native = session_window_stats(ev, gap=f"{gap_s} seconds",
                                  event_time_col="ts", key_cols=("user_id",))
    a = sorted((r.user_id, r.session_start, r.n_events)
               for r in lag_based.select("user_id", "session_start", "n_events").collect())
    b = sorted((r.user_id, r.session_start, r.n_obs)
               for r in native.select("user_id", "session_start", "n_obs").collect())
    assert a == b


# -- binned range join ------------------------------------------------------
def _rj_fixture(spark):
    import datetime as _dt

    d = _dt.date
    pts = spark.createDataFrame(
        [(d(1995, 1, 1),), (d(1995, 1, 17),), (d(1969, 12, 25),), (d(1995, 3, 1),)],
        "day date",
    )
    iv = spark.createDataFrame(
        [
            # spans a 16-day bin boundary (bins of 1995-01-01 and 1995-01-17 differ)
            ("a", d(1994, 12, 30), d(1995, 1, 18)),
            ("b", d(1995, 1, 17), d(1995, 1, 17)),  # single-day interval
            ("c", d(1969, 12, 20), d(1969, 12, 31)),  # pre-epoch: floor-div bins
            ("d", d(1995, 2, 1), d(1995, 2, 10)),  # matches nothing
        ],
        "iv_id string, start date, end date",
    )
    return pts, iv


def test_point_in_interval_join_equals_brute_force(spark):
    from real_time_weather_data_pipeline_for_philippine_cities_spark.operators.rangejoin import (
        point_in_interval_join,
    )

    pts, iv = _rj_fixture(spark)
    got = sorted(
        (r.day, r.iv_id)
        for r in point_in_interval_join(
            pts, iv, point_col="day", start_col="start", end_col="end", bin_days=16
        ).collect()
    )
    brute = sorted(
        (r.day, r.iv_id)
        for r in pts.crossJoin(iv)
        .filter((F.col("day") >= F.col("start")) & (F.col("day") <= F.col("end")))
        .collect()
    )
    assert got == brute
    # boundary-spanning interval 'a' matched twice via DIFFERENT bins but
    # each (point, interval) pair appears exactly once — no dedup needed
    assert len(got) == len(set(got))
    assert (dt.date(1995, 1, 1), "a") in got and (dt.date(1995, 1, 17), "a") in got
    assert (dt.date(1969, 12, 25), "c") in got  # pre-epoch bins floor correctly
    assert all(iv_id != "d" for _, iv_id in got)


def test_point_in_interval_join_rejects_bad_args(spark):
    import pytest as _pytest

    from real_time_weather_data_pipeline_for_philippine_cities_spark.operators.rangejoin import (
        point_in_interval_join,
    )

    pts, iv = _rj_fixture(spark)
    with _pytest.raises(ValueError, match="bin_days"):
        point_in_interval_join(pts, iv, "day", "start", "end", bin_days=0)
    with _pytest.raises(ValueError, match="ambiguous"):
        point_in_interval_join(
            pts.withColumnRenamed("day", "start"), iv, "start", "start", "end", 16
        )


def test_ewma_per_user_hand_computed_and_event_time_ordered(spark, tmp_path):
    """EWMA must fold in (ts, event_id) order even when the input rows
    arrive shuffled, and match the hand recurrence exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.timeseries_queries import (
        EWMA_ALPHA,
        q_ewma_per_user,
    )

    # rows written OUT of time order; values chosen so order matters
    base = dt.datetime(2024, 12, 1)
    rows = [
        (3, base + dt.timedelta(minutes=2), 8.0),
        (1, base + dt.timedelta(minutes=0), 4.0),
        (2, base + dt.timedelta(minutes=1), 16.0),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([42] * 3, pa.int64()),
                "event_type": pa.array(["m"] * 3, pa.string()),
                "value": pa.array([r[2] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * 3, pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    out = q_ewma_per_user(spark, str(tmp_path)).collect()
    assert len(out) == 1 and out[0]["n_events"] == 3
    e = 4.0
    for v in (16.0, 8.0):  # time order, not written order
        e = EWMA_ALPHA * v + (1.0 - EWMA_ALPHA) * e
    assert out[0]["ewma"] == round(e, 6)


def test_event_value_outliers_flags_planted_spike(spark, tmp_path):
    """A 100x value spike in one event type must be counted as an outlier
    for that type only; a constant-valued type has std 0 and none."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.timeseries_queries import (
        q_event_value_outliers,
    )

    base = dt.datetime(2024, 12, 1)
    # 40 base points: a single spike's z-score is (n-1)/sqrt(n) ~ 6.2 > 3
    # (with only ~10 points one spike can never exceed 3 sigma)
    vals = [("a", 10.0)] * 40 + [("a", 1000.0)] + [("b", 5.0)] * 4
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(vals)), pa.int64()),
                "ts": pa.array(
                    [base + dt.timedelta(minutes=i) for i in range(len(vals))],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([1] * len(vals), pa.int64()),
                "event_type": pa.array([v[0] for v in vals], pa.string()),
                "value": pa.array([v[1] for v in vals], pa.float64()),
                "props": pa.array(["{}"] * len(vals), pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = {r["event_type"]: r for r in
           q_event_value_outliers(spark, str(tmp_path)).collect()}
    assert got["a"]["n_outliers"] == 1  # the 1000.0 spike
    assert got["b"]["n_outliers"] == 0 and got["b"]["std_value"] == 0.0


def test_resample_interpolate_hand_computed(spark, tmp_path):
    """Planted series: user 7 observes buckets b, b+2, b+5 (values 2, 8, 2)
    — the gaps must fill linearly (b+1 -> 5.0; b+3 -> 6.0, b+4 -> 4.0) and
    two same-bucket observations must average exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.timeseries_queries import (
        RESAMPLE_BUCKET_S,
        q_resample_interpolate,
    )

    base = dt.datetime(2024, 6, 1)  # midnight: exact bucket boundary
    step = dt.timedelta(seconds=RESAMPLE_BUCKET_S)
    rows = [  # (event_id, ts, value)
        (1, base + 0 * step, 1.0),
        (2, base + 0 * step + dt.timedelta(minutes=5), 3.0),  # same bucket -> avg 2.0
        (3, base + 2 * step, 8.0),
        (4, base + 5 * step, 2.0),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([7] * len(rows), pa.int64()),
                "event_type": pa.array(["m"] * len(rows), pa.string()),
                "value": pa.array([r[2] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    df = q_resample_interpolate(spark, str(tmp_path))
    out = {r["bucket_ts"]: (r["value_filled"], r["src"]) for r in df.collect()}
    assert len(out) == 6  # grid spans b0..b0+5 inclusive
    got = {int((k - base).total_seconds()) // RESAMPLE_BUCKET_S: v for k, v in out.items()}
    assert got[0] == (2.0, "observed")  # same-bucket average
    assert got[1] == (5.0, "interpolated")  # midpoint of 2 and 8
    assert got[2] == (8.0, "observed")
    assert got[3] == (6.0, "interpolated")  # 8 + (2-8)*1/3
    assert got[4] == (4.0, "interpolated")  # 8 + (2-8)*2/3
    assert got[5] == (2.0, "observed")
    # the IGNORE NULLS folds and the lead() chain are two Window ops over
    # the SAME partition/order spec (the lead consumes the folds, so they
    # can't collapse into one node) — but they must share ONE sort and ONE
    # exchange: exactly 1 Sort node, and exactly 2 hash exchanges in the
    # whole query (the groupBy onto (user,b) + the window's user_id one).
    # (count only the FINAL adaptive plan — toString appends the initial
    # plan after execution, which would double-count)
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("+- == Initial Plan ==")[0]
    assert final.count("Window [") == 2
    assert final.count("Sort [") == 1
    assert final.count("Exchange hashpartitioning") <= 2


def test_resample_interpolate_randomized_vs_python_oracle(spark, tmp_path):
    """Randomized (fixed-seed) series vs a pure-Python implementation of
    the ORIGINAL grid semantics (span b0..b1, per-bucket micro means,
    fwd/bwd non-null neighbors, linear fill) — guards the r5 lead()+
    sequence() restructure against semantic drift on shapes the planted
    test doesn't cover: multi-user, adjacent buckets, single-observation
    users, long gaps, duplicate-bucket averaging."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.timeseries_queries import (
        RESAMPLE_BUCKET_S,
        q_resample_interpolate,
    )

    rng = random.Random(42)
    base = dt.datetime(2024, 6, 1)
    rows = []
    eid = 0
    for user in range(1, 6):
        n_obs = rng.choice([1, 2, 3, 8])
        buckets = sorted(rng.sample(range(0, 25), n_obs))
        for b in buckets:
            for _ in range(rng.choice([1, 1, 2])):  # sometimes same-bucket dups
                eid += 1
                off = dt.timedelta(seconds=b * RESAMPLE_BUCKET_S + rng.randrange(RESAMPLE_BUCKET_S))
                rows.append((eid, base + off, user, rng.randrange(-10_000, 10_000) / 1000.0))
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array(["m"] * len(rows), pa.string()),
                "value": pa.array([r[3] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )

    # pure-Python oracle: original grid formulation
    per_bucket: dict[tuple[int, int], list[float]] = {}
    for _, ts, user, val in rows:
        b = int((ts - dt.datetime(1970, 1, 1)).total_seconds()) // RESAMPLE_BUCKET_S
        per_bucket.setdefault((user, b), []).append(val)
    expected = {}
    users = sorted({u for u, _ in per_bucket})
    for u in users:
        bs = sorted(b for uu, b in per_bucket if uu == u)
        means = {
            b: (sum(round(v * 1e6) for v in per_bucket[(u, b)]) / len(per_bucket[(u, b)])) / 1e6
            for b in bs
        }
        for b in range(bs[0], bs[-1] + 1):
            if b in means:
                expected[(u, b)] = (means[b], "observed")
            else:
                pb = max(x for x in bs if x < b)
                nb = min(x for x in bs if x > b)
                ratio = (b - pb) / (nb - pb)
                expected[(u, b)] = (
                    means[pb] + (means[nb] - means[pb]) * ratio,
                    "interpolated",
                )

    got = {}
    for r in q_resample_interpolate(spark, str(tmp_path)).collect():
        b = int(r["bucket_ts"].timestamp()) // RESAMPLE_BUCKET_S
        got[(r["user_id"], b)] = (r["value_filled"], r["src"])

    assert set(got) == set(expected)
    for k, (val, src) in expected.items():
        gval, gsrc = got[k]
        assert gsrc == src, k
        assert abs(gval - round(val, 6)) < 1e-9, (k, gval, val)
