"""Bucketed co-located joins: pre-shuffling both fact tables into the same
bucket layout makes the orderkey join exchange-free — the canonical way to
amortize one shuffle across every downstream join of the same key at
100 TB (SURVEY.md §4.2; bucketing beats per-query repartition whenever the
join key is stable)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_weather_data_pipeline_for_philippine_cities_spark.sources.registry import load_table

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    for name, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        (
            load_table(spark, sf_dir, name)
            .write.mode("overwrite")
            .bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .option("path", str(wh / f"{name}_bucketed"))
            .saveAsTable(f"{name}_bucketed")
        )
    yield
    for name in ("lineitem", "orders"):
        spark.sql(f"DROP TABLE IF EXISTS {name}_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    li = spark.table("lineitem_bucketed")
    orders = spark.table("orders_bucketed")
    # Disable broadcast so the join must pick a shuffle strategy — bucketing
    # should make that strategy exchange-free.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_section = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # No Exchange between the scans and the join: buckets line up.
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan

        # And the result matches the unbucketed plan.
        expected = (
            spark.table("lineitem_bucketed")
            .join(spark.table("orders_bucketed").hint("merge"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, expected.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
