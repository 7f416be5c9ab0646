"""AQE skew-join mechanics on a planted hot key (VERDICT r05 #6): the
runtime rewrite must actually SPLIT the hot partition — not just be
enabled in config — and must agree with the salted fallback bit-for-bit.
The wall-clock comparison lives in tools/skew_experiment.py (BASELINE.md
records the verdict); this pins the mechanism so a config regression
can't silently turn the recommended path into the straw man."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_weather_data_pipeline_for_philippine_cities_spark.operators.skew import (
    salted_join,
)
from tools.skew_experiment import N_KEYS, build_dim, build_fact

N_ROWS = 1_000_000


@pytest.fixture()
def skew_conf(spark):
    keep = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # scale the 256MB-default mechanism down to test-sized partitions
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    for k, v in keep.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_planted_hot_key_and_matches_salted(skew_conf):
    spark = skew_conf
    fact = build_fact(spark, N_ROWS)
    dim = build_dim(spark)

    plain = fact.join(dim.hint("shuffle_hash"), "k")
    agg = plain.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("v") * 100).cast("long")).alias("sv"),
        F.sum((F.col("w") * 100).cast("long")).alias("sw"),
    )
    got = agg.collect()[0]
    # the ADAPTIVE executed plan must mark the skewed side as split
    final_plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in final_plan, final_plan[:2000]

    salted = salted_join(fact, dim, on=["k"], n_salt=8, force_shuffle=True)
    want = salted.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("v") * 100).cast("long")).alias("sv"),
        F.sum((F.col("w") * 100).cast("long")).alias("sw"),
    ).collect()[0]
    assert (got["n"], got["sv"], got["sw"]) == (want["n"], want["sv"], want["sw"])
    # sanity: the planted skew is real — key 0 owns ~half the fact
    hot = fact.filter(F.col("k") == 0).count()
    assert hot >= 0.49 * N_ROWS
