"""Sketch-based approximations — the 100 TB substitutes for exact
distinct-counts and percentiles. They can't be DuckDB-oracle-paired (each
engine's sketch differs), so the contract tested here is error-bounded
agreement with the EXACT operators that are oracle-paired.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_weather_data_pipeline_for_philippine_cities_spark.sources.registry import load_table


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).collect()[0]
    # HLL++ at rsd=0.02: allow 3 sigma.
    assert abs(row.approx - row.exact) <= max(1, 0.06 * row.exact), row


def test_percentile_approx_brackets_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    row = ev.agg(
        F.expr("percentile(value, 0.95)").alias("exact"),
        F.percentile_approx("value", 0.95, 10000).alias("approx"),
    ).collect()[0]
    spread = ev.agg((F.max("value") - F.min("value")).alias("r")).collect()[0].r
    assert abs(row.approx - row.exact) <= 0.01 * spread, row
