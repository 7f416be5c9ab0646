"""Structural input bounds on the two quadratic-cost baselines (VERDICT r04
#2/#3): the exact all-pairs cosine twin and the Levenshtein cross join must
be safe BY CONSTRUCTION — the cap lives inside the operator, not in caller
convention, so a drifting caller filter can never point O(n²) compute at an
unbounded input."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_weather_data_pipeline_for_philippine_cities_spark.operators.geocode import (
    FUZZY_PROBE_CAP,
    fuzzy_best_match,
)
from real_time_weather_data_pipeline_for_philippine_cities_spark.operators.similarity import (
    EXACT_PAIRS_CAP,
    near_dup_pairs_cosine_blocked,
)


def test_fuzzy_probe_cap_enforced_inside_operator(spark):
    """100 probes, max_probe=5 → only the 5 lexicographically smallest
    probe names can appear in the output, regardless of caller filters —
    and the binding cap warns under the explicit truncate opt-in."""
    import warnings

    probe = spark.range(100).select(
        F.format_string("name_%03d", F.col("id")).alias("query_name")
    )
    cand = spark.createDataFrame(
        [("name_000x",), ("name_0999",), ("zzz_far_away",)], ["cand_name"]
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = fuzzy_best_match(
            probe, cand, max_dist=10, max_probe=5, on_excess="truncate"
        )
        assert any("structural cap" in str(x.message) for x in w)
    got = {r["query_name"] for r in out.collect()}
    allowed = {f"name_{i:03d}" for i in range(5)}
    assert got  # the close candidates match within distance 10
    assert got <= allowed


def test_fuzzy_binding_cap_raises_by_default(spark):
    """A silently incomplete match set is the round-5 advice bug — when
    the cap would bind, the DEFAULT contract is a loud ValueError."""
    import pytest

    probe = spark.range(100).select(
        F.format_string("name_%03d", F.col("id")).alias("query_name")
    )
    cand = spark.createDataFrame([("name_000x",)], ["cand_name"])
    with pytest.raises(ValueError, match="structural cap"):
        fuzzy_best_match(probe, cand, max_dist=10, max_probe=5)


def test_fuzzy_probe_cap_counts_distinct_names_not_rows(spark):
    """Duplicate probe rows must not eat the cap budget: 3 copies of 10
    names under max_probe=10 → ALL 10 names are matched (pre-fix, the
    row-counted cap admitted only ~4 distinct names)."""
    probe = spark.range(30).select(
        F.format_string("name_%03d", F.col("id") % 10).alias("query_name")
    )
    cand = spark.createDataFrame([("name_000x",)], ["cand_name"])
    out = fuzzy_best_match(probe, cand, max_dist=10, max_probe=10)
    got = {r["query_name"] for r in out.collect()}
    assert got == {f"name_{i:03d}" for i in range(10)}


def test_fuzzy_probe_side_is_local_relation_not_rescan(spark):
    """The admitted probe batch comes from ONE bounded top-k job
    (bounds.bounded_key_cutoff) and enters the plan as a local ≤cap-row
    relation — the result plan must NOT rescan or re-sort the original
    probe side (the round-6 review's double-distinct finding)."""
    probe = spark.range(5000).select(
        F.format_string("n%05d", F.col("id")).alias("query_name")
    )
    cand = spark.createDataFrame([("n00000",)], ["cand_name"])
    df = fuzzy_best_match(probe, cand, on_excess="truncate")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert (
        "LocalTableScan" in plan
        or "LocalRelation" in plan
        or "Scan ExistingRDD" in plan
    )
    assert "Range (0, 5000" not in plan  # the raw probe is not in the plan
    assert "TakeOrderedAndProject" not in plan  # the bound already ran


def test_fuzzy_default_cap_positive():
    assert FUZZY_PROBE_CAP >= 200  # the reference geocode-batch bound fits


def test_exact_pairs_cap_enforced(spark, sf_dir):
    """With max_rows=50 on a 500-vector corpus, every emitted pair id is
    among the 50 smallest vec_ids — the quadratic stage never sees the
    rest of the corpus."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = near_dup_pairs_cosine_blocked(
        emb, threshold=0.0, max_rows=50, on_excess="truncate"
    )
    rows = out.collect()
    assert rows  # threshold 0 keeps plenty of pairs among 50 vectors
    cap_ids = {
        r["vec_id"]
        for r in emb.select("vec_id").orderBy("vec_id").limit(50).collect()
    }
    for r in rows:
        assert r["vec_a"] in cap_ids and r["vec_b"] in cap_ids


def test_exact_pairs_cap_noop_below_cap(spark, sf_dir):
    """At corpus sizes below the cap (the strict/driver regime) the bound
    is a pass-through: same pair set with and without an explicit huge cap."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assert emb.count() <= EXACT_PAIRS_CAP
    capped = near_dup_pairs_cosine_blocked(emb, threshold=0.45)
    uncapped = near_dup_pairs_cosine_blocked(emb, threshold=0.45, max_rows=1 << 30)
    a = sorted(map(tuple, capped.collect()))
    b = sorted(map(tuple, uncapped.collect()))
    assert a == b


def test_exact_pairs_binding_cap_raises_by_default(spark, sf_dir):
    """Default contract: a corpus larger than max_rows raises instead of
    silently dropping vectors from the exact pair set."""
    import pytest

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    with pytest.raises(ValueError, match="structural cap"):
        near_dup_pairs_cosine_blocked(emb, threshold=0.0, max_rows=50)
