"""Unit contract of operators/bounds.bounded_key_cutoff — the shared
single-job structural-cap primitive behind EXACT_PAIRS_CAP and
FUZZY_PROBE_CAP (round-6 self-review consolidation)."""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F

from real_time_weather_data_pipeline_for_philippine_cities_spark.operators.bounds import (
    bounded_key_cutoff,
)


def test_under_cap_returns_none_cutoff_and_all_values(spark):
    df = spark.range(5).select(F.col("id").alias("k"))
    cutoff, values = bounded_key_cutoff(df, "k", 10, "error", "t")
    assert cutoff is None  # no filter needed — plan stays unbounded-clean
    assert values == [0, 1, 2, 3, 4]


def test_exactly_at_cap_is_not_excess(spark):
    df = spark.range(10).select(F.col("id").alias("k"))
    cutoff, values = bounded_key_cutoff(df, "k", 10, "error", "t")
    assert cutoff is None
    assert len(values) == 10


def test_over_cap_error_policy_raises(spark):
    df = spark.range(11).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="structural cap"):
        bounded_key_cutoff(df, "k", 10, "error", "t")


def test_over_cap_truncate_warns_and_returns_smallest(spark):
    df = spark.range(100).select((99 - F.col("id")).alias("k"))  # unsorted
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cutoff, values = bounded_key_cutoff(df, "k", 10, "truncate", "t")
        assert any("structural cap" in str(x.message) for x in w)
    assert cutoff == 9  # the cap-th smallest key is the admitted cutoff
    assert values == list(range(10))


def test_invalid_policy_rejected(spark):
    df = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="on_excess"):
        bounded_key_cutoff(df, "k", 10, "ignore", "t")


def test_null_keys_do_not_consume_cap_budget(spark):
    """NULL keys sort first in the top-k yet can never pass a caller's
    `col <= cutoff` filter — budgeting them would make the admitted list
    and the filtered set disagree (round-6 advice). They are excluded from
    the probe exactly as the filter excludes them."""
    df = spark.createDataFrame(
        [(None,), (None,), (1,), (2,), (3,)], "k int"
    )
    cutoff, values = bounded_key_cutoff(df, "k", 3, "error", "t")
    assert cutoff is None  # 3 non-null keys fit the cap of 3
    assert values == [1, 2, 3]


def test_duplicate_keys_at_boundary_raise(spark):
    """A duplicate at/below the cutoff would admit more than cap rows
    through a `<= cutoff` bound — the probe must refuse, not distort the
    budget (round-6 advice)."""
    df = spark.createDataFrame([(1,), (2,), (2,), (3,)], "k int")
    with pytest.raises(ValueError, match="duplicate"):
        bounded_key_cutoff(df, "k", 3, "truncate", "t")


def test_fuzzy_preserves_nonstring_probe_type(spark):
    """The rebuilt local probe relation must carry the probe column's OWN
    type — a hard-coded string schema would coerce or reject integer keys
    (round-6 advice)."""
    from real_time_weather_data_pipeline_for_philippine_cities_spark.operators.geocode import (
        fuzzy_best_match,
    )

    probe = spark.createDataFrame([(111,), (222,)], "query_name bigint")
    cand = spark.createDataFrame([("112",)], ["cand_name"])
    out = fuzzy_best_match(probe, cand, max_dist=10)
    assert dict(out.dtypes)["query_name"] == "bigint"
    got = {r["query_name"]: r["edit_dist"] for r in out.collect()}
    assert got == {111: 1, 222: 2}


def test_fuzzy_handles_null_probe_names(spark):
    """NULL probe names never match (levenshtein of NULL is NULL, filtered
    by the distance bound) and — since round 7 — never consume probe-cap
    budget either, mirroring the `<= cutoff` filter's NULL semantics."""
    from real_time_weather_data_pipeline_for_philippine_cities_spark.operators.geocode import (
        fuzzy_best_match,
    )

    probe = spark.createDataFrame(
        [(None,), ("alpha",), ("alphb",), (None,)], "query_name string"
    )
    cand = spark.createDataFrame([("alpha",)], ["cand_name"])
    got = {r["query_name"]: r["cand_name"] for r in fuzzy_best_match(probe, cand).collect()}
    assert got == {"alpha": "alpha", "alphb": "alpha"}
