"""Semantic tests for the round-5 warehouse/analytics additions (the
TPC-H Q3/Q6/Q8/Q9/Q10/Q18 shapes are value-proven by the DuckDB strict
oracle; here we test what parity can't): hand-built inputs with known
closed-form answers for the event-transition matrix, the revenue Gini,
shingle containment, and the Zipf-slope fit.
"""

from __future__ import annotations

import datetime
import math

import pyarrow as pa
import pyarrow.parquet as pq

from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.warehouse_queries import (
    CONTAINMENT_DF_CAP,
    q_event_transitions,
    q_revenue_gini,
    q_shingle_containment,
    q_zipf_slope,
)


def _write_events(path, rows):
    """rows: list of (event_id, user_id, ts, event_type)."""
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([0.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(path / "events.parquet"),
    )


def _write_orders(path, rows):
    """rows: list of (o_orderkey, o_custkey, o_totalprice)."""
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
                "o_totalprice": pa.array(
                    [float(r[2]) for r in rows], pa.float64()
                ),
            }
        ),
        str(path / "orders.parquet"),
    )


def _write_docs(path, texts):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["s"] * len(texts), pa.string()),
                "n_chars": pa.array([len(x) for x in texts], pa.int64()),
            }
        ),
        str(path / "documents.parquet"),
    )


# ------------------------------------------------------- event transitions
def test_event_transitions_counts_and_shares(spark, tmp_path):
    d = tmp_path / "tr"
    d.mkdir()
    t0 = datetime.datetime(2024, 1, 1)

    def ts(m):
        return t0 + datetime.timedelta(minutes=m)

    _write_events(
        d,
        [
            # user 1: a -> b -> b
            (0, 1, ts(0), "a"),
            (1, 1, ts(1), "b"),
            (2, 1, ts(2), "b"),
            # user 2: b -> a
            (3, 2, ts(0), "b"),
            (4, 2, ts(1), "a"),
            # user 3: tied timestamps — event_id must break the tie: c -> d
            (5, 3, ts(0), "c"),
            (6, 3, ts(0), "d"),
        ],
    )
    rows = {
        (r["prev_type"], r["next_type"]): r
        for r in q_event_transitions(spark, str(d)).collect()
    }
    assert set(rows) == {("a", "b"), ("b", "b"), ("b", "a"), ("c", "d")}
    assert rows[("a", "b")]["n_transitions"] == 1
    assert rows[("a", "b")]["share"] == 1.0
    # prev=b row splits evenly between next=a and next=b
    assert rows[("b", "a")]["share"] == 0.5
    assert rows[("b", "b")]["share"] == 0.5
    assert rows[("c", "d")]["n_transitions"] == 1


# ------------------------------------------------------------- revenue Gini
def test_revenue_gini_uniform_is_zero(spark, tmp_path):
    d = tmp_path / "g0"
    d.mkdir()
    _write_orders(d, [(i, i, 7.0) for i in range(1, 9)])
    row = q_revenue_gini(spark, str(d)).collect()[0]
    assert row["gini"] == 0.0
    assert row["n_customers"] == 8
    assert row["total_revenue"] == 56.0


def test_revenue_gini_known_distribution(spark, tmp_path):
    # x = [1,2,3,4]: G = (2*(1+4+9+16) - 5*10) / (4*10) = 0.25
    d = tmp_path / "g1"
    d.mkdir()
    _write_orders(d, [(1, 1, 1.0), (2, 2, 2.0), (3, 3, 3.0), (4, 4, 4.0)])
    row = q_revenue_gini(spark, str(d)).collect()[0]
    assert row["gini"] == 0.25
    assert row["n_customers"] == 4
    # multiple orders per customer aggregate before ranking
    d2 = tmp_path / "g2"
    d2.mkdir()
    _write_orders(
        d2, [(1, 1, 0.5), (2, 1, 0.5), (3, 2, 2.0), (4, 3, 3.0), (5, 4, 4.0)]
    )
    row2 = q_revenue_gini(spark, str(d2)).collect()[0]
    assert row2["gini"] == 0.25
    assert row2["n_customers"] == 4


# ------------------------------------------------------ shingle containment
def test_containment_subset_doc_scores_one(spark, tmp_path):
    d = tmp_path / "c0"
    d.mkdir()
    small = " ".join(f"w{i}" for i in range(10))  # 6 distinct 5-shingles
    big = small + " " + " ".join(f"x{i}" for i in range(5))
    other = " ".join(f"z{i}" for i in range(10))
    _write_docs(d, [small, big, other])
    rows = q_shingle_containment(spark, str(d)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (0, 1)
    assert r["n_a"] == 6 and r["shared"] == 6
    assert r["cont_a"] == 1.0
    assert r["cont_b"] == round(6 / 11, 6)


def test_containment_df_cap_suppresses_boilerplate(spark, tmp_path):
    # every shingle appears in CAP+10 docs -> excluded -> no pairs at all
    d = tmp_path / "c1"
    d.mkdir()
    text = " ".join(f"b{i}" for i in range(8))
    _write_docs(d, [text] * (CONTAINMENT_DF_CAP + 10))
    assert q_shingle_containment(spark, str(d)).count() == 0


# ----------------------------------------------------------------- Zipf fit
def test_zipf_slope_exact_power_law(spark, tmp_path):
    # freq_i = 840 / i for i = 1..8: log(freq) is EXACTLY linear in
    # log(rank) with slope -1, so the least-squares fit must return -1.0.
    d = tmp_path / "z"
    d.mkdir()
    freqs = [840 // i for i in range(1, 9)]  # all exact divisors
    text = " ".join(" ".join(f"t{i}" for _ in range(f)) for i, f in enumerate(freqs))
    _write_docs(d, [text])
    row = q_zipf_slope(spark, str(d)).collect()[0]
    assert row["n_terms"] == 8
    assert row["zipf_slope"] == -1.0
    assert row["zipf_intercept"] == round(math.log(840), 4)


# ------------------------------------------------------- quantile sketch
def test_quantile_sketch_small_group_degrades_to_exact(spark, tmp_path):
    """Groups smaller than the prefilter budget keep every row, so the
    sketch's order statistics are EXACT ceil-position order statistics."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.profiling_queries import (
        q_quantile_sketch,
    )

    d = tmp_path / "qs"
    d.mkdir()
    vals = [float(v) for v in (5, 1, 9, 3, 7, 2, 8, 4, 6, 10)]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(10), pa.int64()),
                "ts": pa.array(
                    [dt.datetime(2024, 1, 1)] * 10, pa.timestamp("us")
                ),
                "user_id": pa.array([1] * 10, pa.int64()),
                "event_type": pa.array(["x"] * 10, pa.string()),
                "value": pa.array(vals, pa.float64()),
                "props": pa.array(["{}"] * 10, pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    row = q_quantile_sketch(spark, str(d)).collect()[0]
    assert row["n"] == 10 and row["sample_k"] == 10
    ordered = sorted(vals)
    # ceil(q*k)-th order statistics of the full group
    assert row["p50_est"] == ordered[5 - 1]  # ceil(0.5*10)  = 5
    assert row["p90_est"] == ordered[9 - 1]  # ceil(0.9*10)  = 9
    assert row["p99_est"] == ordered[10 - 1]  # ceil(0.99*10) = 10


def test_quantile_sketch_accuracy_on_real_events(spark, sf_dir):
    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.profiling_queries import (
        q_quantile_sketch,
    )

    for r in q_quantile_sketch(spark, sf_dir).collect():
        assert r["sample_k"] >= 1
        assert r["p50_est"] <= r["p90_est"] <= r["p99_est"]
        # at sf0.001 each type has ~200 rows (< K): the sample is the whole
        # group and the median estimate must sit within one step of exact
        assert r["p50_rel_err"] < 0.05, (r["event_type"], r["p50_rel_err"])
