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


def test_kmv_set_ops_merge_identity_and_inclusion_exclusion(spark, sf_dir):
    """Two defining properties of the merged-KMV set algebra. (1) Merge
    identity: least(a_i, b_i) of the per-set minima IS the sketch of the
    union stream — computed both ways and compared bitwise. (2) The exact
    columns obey inclusion-exclusion, and the estimates land within a loose
    3-sigma-ish envelope of the exacts (R=32 → ~18% sigma)."""
    from pyspark.sql import functions as F

    from real_time_weather_data_pipeline_for_philippine_cities_spark.functions.hashing import (
        KMV_R,
        MINHASH_PRIME,
        kmv_hash_col,
        minhash_coefficients,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.profiling_queries import (
        q_kmv_set_ops,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.sources.registry import (
        load_table,
    )

    row = q_kmv_set_ops(spark, sf_dir).collect()[0]
    assert row.n_union_exact == row.n_a_exact + row.n_b_exact - row.n_inter_exact
    for est, exact in (
        ("n_a_est", "n_a_exact"),
        ("n_b_est", "n_b_exact"),
        ("n_union_est", "n_union_exact"),
    ):
        assert abs(row[est] - row[exact]) <= 0.55 * row[exact], (est, row)
    assert 0.0 <= row.jaccard_est <= 1.0

    # merge identity: sketch(A) elementwise-min sketch(B) == sketch(A ∪ B)
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select("user_id", "event_type")
    )
    coeffs = minhash_coefficients(KMV_R)
    perm = [(F.col("kmv_h0") * a + b) % MINHASH_PRIME for a, b in coeffs]
    h = ev.select("event_type", kmv_hash_col("user_id"))
    is_a = F.col("event_type") == "purchase"
    per_set = h.agg(
        *[F.min(F.when(is_a, p)).alias(f"a{i}") for i, p in enumerate(perm)],
        *[F.min(F.when(~is_a, p)).alias(f"b{i}") for i, p in enumerate(perm)],
    ).collect()[0]
    union = h.agg(
        *[F.min(p).alias(f"u{i}") for i, p in enumerate(perm)]
    ).collect()[0]
    merged = [min(per_set[f"a{i}"], per_set[f"b{i}"]) for i in range(KMV_R)]
    assert merged == [union[f"u{i}"] for i in range(KMV_R)]


def test_numeric_histogram_is_total_and_conserves_mass(spark, sf_dir):
    """The 20 bins are contiguous (each bin_hi == next bin_lo), cover
    [min, max], and the counts sum to the non-null row count — the
    mass-conservation law a mergeable histogram must keep per shard."""
    from pyspark.sql import functions as F

    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.profiling_queries import (
        HIST_BINS,
        q_numeric_histogram,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.sources.registry import (
        load_table,
    )

    rows = q_numeric_histogram(spark, sf_dir).collect()
    assert [r["bin"] for r in rows] == list(range(HIST_BINS))
    for a, b in zip(rows, rows[1:]):
        assert a["bin_hi"] == b["bin_lo"]
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    stats = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    ).collect()[0]
    assert sum(r["n"] for r in rows) == stats["n"]
    assert abs(rows[0]["bin_lo"] - stats["lo"]) < 1e-5
    assert abs(rows[-1]["bin_hi"] - stats["hi"]) < 1e-5


def test_ks_drift_matches_brute_force(spark, sf_dir):
    """The bucketed integer-arithmetic KS must equal a brute-force
    two-sample KS computed driver-side over the collected values, and
    land in [0, 1]."""
    from pyspark.sql import functions as F

    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.profiling_queries import (
        q_ks_drift,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.sources.registry import (
        load_table,
    )

    row = q_ks_drift(spark, sf_dir).collect()[0]
    assert 0.0 <= row.ks_stat <= 1.0
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull()
            & F.col("event_type").isin("click", "view")
        )
        .select("value", "event_type")
        .collect()
    )
    a = sorted(r.value for r in ev if r.event_type == "click")
    b = sorted(r.value for r in ev if r.event_type == "view")
    assert (len(a), len(b)) == (row.n_a, row.n_b)
    import bisect

    pts = sorted(set(a) | set(b))
    ks = max(
        abs(
            bisect.bisect_right(a, v) * len(b)
            - bisect.bisect_right(b, v) * len(a)
        )
        for v in pts
    ) / (len(a) * len(b))
    assert row.ks_stat == ks  # raw passthrough: bit-identical division


def test_join_key_skew_profile_internal_consistency(spark, sf_dir):
    """Each profiled key's row count must equal the raw table count,
    max >= p99 >= 1, and skew_ratio == max * n_keys / n_rows."""
    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.profiling_queries import (
        SKEW_KEYS,
        q_join_key_skew_profile,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.sources.registry import (
        load_table,
    )

    rows = {r["join_key"]: r for r in q_join_key_skew_profile(spark, sf_dir).collect()}
    assert set(rows) == {label for label, _, _ in SKEW_KEYS}
    for label, tbl, _col in SKEW_KEYS:
        r = rows[label]
        assert r["n_rows"] == load_table(spark, sf_dir, tbl).count()
        assert r["max_fanout"] >= r["p99_fanout"] >= 1
        assert r["n_keys"] <= r["n_rows"]
        expect = round(r["max_fanout"] * r["n_keys"] / r["n_rows"], 4)
        assert r["skew_ratio"] == expect


def test_numeric_histogram_bins_merge_across_shards(spark, sf_dir):
    """Shard mergeability: binning each half of the data separately with
    the GLOBAL bounds and adding the per-bin counts reproduces the
    whole-table histogram exactly — the property that lets a 100 TB
    profile run per shard and merge 20-row sketches."""
    from pyspark.sql import functions as F

    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.profiling_queries import (
        HIST_BINS,
        q_numeric_histogram,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.sources.registry import (
        load_table,
    )

    whole = {r["bin"]: r["n"] for r in q_numeric_histogram(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    lo, hi = ev.agg(F.min("value"), F.max("value")).collect()[0]
    w = (hi - lo) / HIST_BINS
    bin_col = F.least(
        F.floor((F.col("value") - F.lit(lo)) / F.lit(w)).cast("int"),
        F.lit(HIST_BINS - 1),
    ).alias("bin")
    merged = {b: 0 for b in range(HIST_BINS)}
    for shard in (ev.filter(F.col("event_id") % 2 == 0), ev.filter(F.col("event_id") % 2 == 1)):
        for r in shard.select(bin_col).groupBy("bin").count().collect():
            merged[r["bin"]] += r["count"]
    assert merged == whole
