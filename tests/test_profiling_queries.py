"""Planted-violation tests for the profiling/data-quality queries —
oracle parity (tests/test_oracle_parity.py) proves engine agreement; these
prove the SEMANTICS against hand-built tables."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.profiling_queries import (
    q_dq_checks,
    q_table_profile,
)


def _write(tmp_path, name, table):
    pq.write_table(table, str(tmp_path / f"{name}.parquet"))


def _events(tmp_path, event_ids, values):
    base = dt.datetime(2024, 1, 1)
    _write(
        tmp_path,
        "events",
        pa.table(
            {
                "event_id": pa.array(event_ids, pa.int64()),
                "ts": pa.array(
                    [base + dt.timedelta(minutes=i) for i in range(len(event_ids))],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([1] * len(event_ids), pa.int64()),
                "event_type": pa.array(["a"] * len(event_ids), pa.string()),
                "value": pa.array(values, pa.float64()),
                "props": pa.array(["{}"] * len(event_ids), pa.string()),
            }
        ),
    )


def test_table_profile_counts_nulls_distincts_minmax(spark, tmp_path):
    _events(tmp_path, [1, 2, 3, 4], [5.0, None, 5.0, -2.5])
    prof = {
        r["column_name"]: r for r in q_table_profile(spark, str(tmp_path)).collect()
    }
    v = prof["value"]
    assert v["n_nulls"] == 1
    assert v["n_distinct"] == 2  # 5.0 and -2.5; NULL not counted
    assert v["min_num"] == -2.5 and v["max_num"] == 5.0
    assert v["min_str"] is None and v["max_str"] is None
    e = prof["event_type"]
    assert e["min_str"] == "a" and e["max_str"] == "a"
    assert e["min_num"] is None and e["max_num"] is None
    assert prof["event_id"]["n_distinct"] == 4


def test_dq_checks_counts_planted_violations(spark, tmp_path):
    # 2 lineitems, one orphaned; 1 order with missing customer; dup event id;
    # one nonpositive price; one out-of-range discount (same row counts twice
    # in different checks by design).
    _write(
        tmp_path,
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array([10, 99], pa.int64()),
                "l_partkey": pa.array([1, 1], pa.int64()),
                "l_suppkey": pa.array([1, 1], pa.int64()),
                "l_linenumber": pa.array([1, 1], pa.int32()),
                "l_quantity": pa.array([1.0, 1.0], pa.float64()),
                "l_extendedprice": pa.array([-5.0, 100.0], pa.float64()),
                "l_discount": pa.array([0.9, 0.1], pa.float64()),
                "l_tax": pa.array([0.0, 0.0], pa.float64()),
                "l_returnflag": pa.array(["N", "N"], pa.string()),
                "l_linestatus": pa.array(["O", "O"], pa.string()),
                "l_shipdate": pa.array(
                    [dt.datetime(2024, 1, 1)] * 2, pa.timestamp("us")
                ),
            }
        ),
    )
    _write(
        tmp_path,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array([10], pa.int64()),
                "o_custkey": pa.array([777], pa.int64()),
                "o_orderstatus": pa.array(["O"], pa.string()),
                "o_totalprice": pa.array([100.0], pa.float64()),
                "o_orderdate": pa.array([dt.datetime(2024, 1, 1)], pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"], pa.string()),
            }
        ),
    )
    _write(
        tmp_path,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array([1], pa.int64()),
                "c_name": pa.array(["c1"], pa.string()),
                "c_nationkey": pa.array([0], pa.int32()),
                "c_acctbal": pa.array([0.0], pa.float64()),
                "c_mktsegment": pa.array(["BUILDING"], pa.string()),
            }
        ),
    )
    _events(tmp_path, [7, 7, 8], [1.0, 1.0, 1.0])
    got = {
        r["check_name"]: r["n_violations"]
        for r in q_dq_checks(spark, str(tmp_path)).collect()
    }
    assert got == {
        "lineitem_orphan_orderkey": 1,
        "orders_orphan_custkey": 1,
        "events_dup_event_id": 1,
        "lineitem_nonpositive_price": 1,
        "lineitem_discount_range": 1,
    }


def test_winsorized_stats_clamps_only_the_tails(spark, sf_dir):
    """Per type: the clipped row count is (exactly) the rows strictly
    outside [p01, p99] — about 2% — and the winsorized mean recomputes
    from a driver-side clamp of the raw values."""
    from pyspark.sql import functions as F

    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.profiling_queries import (
        q_winsorized_stats,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.sources.registry import (
        load_table,
    )

    rows = {r["event_type"]: r for r in q_winsorized_stats(spark, sf_dir).collect()}
    assert rows
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
        .collect()
    )
    by_type = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(r.value)
    for etype, vals in by_type.items():
        r = rows[etype]
        assert r["n"] == len(vals)
        assert 0 <= r["clipped_n"] <= max(2, int(0.03 * len(vals)) + 2)
        # driver-side recompute with Spark's own percentile values
        bounds = (
            load_table(spark, sf_dir, "events")
            .filter(
                F.col("value").isNotNull() & (F.col("event_type") == etype)
            )
            .agg(
                F.expr("percentile(value, 0.01)").alias("p01"),
                F.expr("percentile(value, 0.99)").alias("p99"),
            )
            .collect()[0]
        )
        clamped = [min(max(v, bounds.p01), bounds.p99) for v in vals]
        assert abs(r["winsorized_mean"] - round(sum(clamped) / len(clamped), 4)) < 1e-3
        assert r["clipped_n"] == sum(
            1 for v in vals if v < bounds.p01 or v > bounds.p99
        )


def test_rare_category_collapse_conserves_and_thresholds(spark, sf_dir):
    """Mass conservation (n_docs sums to the corpus, n_sources to the
    distinct source count), every surviving category holds >= the share
    floor by the exact integer test, and '(other)' aggregates only
    sub-floor sources."""
    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.curation_queries import (
        RARE_SHARE_PCT,
        q_rare_category_collapse,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.sources.registry import (
        load_table,
    )

    rows = q_rare_category_collapse(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    total = docs.count()
    n_sources = docs.select("source").distinct().count()
    assert sum(r["n_docs"] for r in rows) == total
    assert sum(r["n_sources"] for r in rows) == n_sources
    for r in rows:
        if r["category"] != "(other)":
            assert r["n_sources"] == 1
            assert r["n_docs"] * 100 >= total * RARE_SHARE_PCT
        assert abs(r["share"] - round(r["n_docs"] / total, 4)) < 1e-9
