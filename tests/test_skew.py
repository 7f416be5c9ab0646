"""salted_join must be result-identical to the plain join while spreading
hot keys across salt buckets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_weather_data_pipeline_for_philippine_cities_spark.operators.skew import (
    salted_join,
    skew_ratio,
    top_heavy_keys,
)


@pytest.fixture()
def skewed(spark):
    # 90% of fact rows share one key — the classic hot-key shape.
    rows = [(1, f"v{i}") for i in range(900)] + [(k, f"v{k}") for k in range(2, 102)]
    fact = spark.createDataFrame(rows, "k int, payload string")
    dim = spark.createDataFrame([(k, f"name{k}") for k in range(1, 102)], "k int, name string")
    return fact, dim


def _norm(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_join_matches_plain(spark, skewed, how):
    fact, dim = skewed
    plain = fact.join(dim, ["k"], how)
    salted = salted_join(fact, dim, ["k"], how=how, n_salt=8)
    assert sorted(salted.columns) == sorted(plain.columns)
    assert _norm(salted) == _norm(plain)


def test_salted_join_rejects_right_joins(spark, skewed):
    fact, dim = skewed
    with pytest.raises(ValueError):
        salted_join(fact, dim, ["k"], how="full_outer")


def test_skew_diagnostics(spark, skewed):
    fact, _ = skewed
    top = top_heavy_keys(fact, ["k"], top=1).collect()
    assert top[0]["k"] == 1 and top[0]["n_rows"] == 900
    assert skew_ratio(fact, ["k"]) > 50  # 900 vs avg ~9.9


def test_salted_catalog_query_identity_and_plan(spark):
    """The salted catalog entry must (a) equal the same aggregation over a
    plain unsalted join, and (b) actually execute the salted shuffle path
    — no BroadcastHashJoin swallowing the salt."""
    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.catalog import (
        CATALOG,
    )

    sf = "/root/testdata/sf0.01"
    salted = CATALOG["salted_skew_join_agg"].fn(spark, sf)
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan

    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.base import t
    from pyspark.sql import functions as F

    orders = t(spark, sf, "orders").select("o_orderpriority", "o_totalprice")
    dim = (
        orders.select("o_orderpriority").distinct()
        .withColumn("tier", F.substring("o_orderpriority", 1, 1))
    )
    plain = (
        orders.join(dim, "o_orderpriority")
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100.0).alias(
                "total_revenue"
            ),
        )
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
