"""Algebraic laws for the wave-3 analytics (hypothesis where input shape
matters, closed-form otherwise): Gini scale-invariance and bounds, Zipf
slope invariance under corpus duplication, transition-share stochasticity,
containment symmetry on identical docs.
"""

from __future__ import annotations

import math
import tempfile
from pathlib import Path

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.warehouse_queries import (
    q_event_transitions,
    q_revenue_gini,
    q_shingle_containment,
    q_zipf_slope,
)
from tests.test_warehouse_suite import _write_docs, _write_orders

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# positive cent-scale revenues, >= 2 customers
revenues = st.lists(
    st.integers(min_value=1, max_value=10_000), min_size=2, max_size=20
)


def _gini(spark, vals):
    d = Path(tempfile.mkdtemp(prefix="gini_"))
    _write_orders(
        d, [(i, i, v / 100.0) for i, v in enumerate(vals, start=1)]
    )
    return q_revenue_gini(spark, str(d)).collect()[0]


@SETTINGS
@given(revenues)
def test_gini_is_scale_invariant(spark, vals):
    """G(k*x) = G(x) for any positive scalar k — concentration is a
    share-of-total property, not a magnitude property."""
    g1 = _gini(spark, vals)["gini"]
    g3 = _gini(spark, [3 * v for v in vals])["gini"]
    assert g1 == g3


@SETTINGS
@given(revenues)
def test_gini_bounds_and_python_oracle(spark, vals):
    """0 <= G <= 1 - 1/n, and the distributed rank-sum matches the
    independent textbook formula computed in plain Python."""
    row = _gini(spark, vals)
    n = len(vals)
    xs = sorted(vals)
    total = sum(xs)
    expected = sum((2 * i - n - 1) * x for i, x in enumerate(xs, start=1)) / (
        n * total
    )
    assert row["gini"] == round(expected, 6)
    assert 0.0 <= row["gini"] <= 1.0 - 1.0 / n + 1e-9


def test_transition_shares_are_row_stochastic(spark, sf_dir):
    rows = q_event_transitions(spark, sf_dir).collect()
    by_prev: dict[str, float] = {}
    for r in rows:
        by_prev[r["prev_type"]] = by_prev.get(r["prev_type"], 0.0) + r["share"]
    # rounding each share to 6dp leaves the row sum within 5e-6 * n_cells
    for prev, s in by_prev.items():
        assert abs(s - 1.0) < 5e-5, (prev, s)


def test_zipf_slope_invariant_under_corpus_duplication(spark, tmp_path):
    """Duplicating the corpus doubles every frequency: slope must be
    unchanged and the intercept must shift by exactly ln(2)."""
    freqs = [120 // i for i in range(1, 6)]  # 120,60,40,30,24
    text = " ".join(
        " ".join(f"t{i}" for _ in range(f)) for i, f in enumerate(freqs)
    )
    d1, d2 = tmp_path / "z1", tmp_path / "z2"
    d1.mkdir(), d2.mkdir()
    _write_docs(d1, [text])
    _write_docs(d2, [text, text])
    r1 = q_zipf_slope(spark, str(d1)).collect()[0]
    r2 = q_zipf_slope(spark, str(d2)).collect()[0]
    assert r1["n_terms"] == r2["n_terms"] == 5
    assert r1["zipf_slope"] == r2["zipf_slope"] == -1.0
    assert abs((r2["zipf_intercept"] - r1["zipf_intercept"]) - math.log(2)) < 1e-3


def test_containment_identical_docs_is_one_both_ways(spark, tmp_path):
    d = tmp_path / "cid"
    d.mkdir()
    text = " ".join(f"q{i}" for i in range(12))
    _write_docs(d, [text, text])
    rows = q_shingle_containment(spark, str(d)).collect()
    assert len(rows) == 1
    assert rows[0]["cont_a"] == 1.0 and rows[0]["cont_b"] == 1.0


def test_ship_delay_bands_partition_all_joined_lines(spark, sf_dir):
    """The four delay bands partition the joined fact rows: high+low summed
    over bands equals the lineitem⋈orders row count, and every band's two
    counts are non-negative (the CASE ladder can't drop or double-count)."""
    from pyspark.sql import functions as F

    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.warehouse_queries import (
        q_ship_delay_bands,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.sources.registry import (
        load_table,
    )

    rows = q_ship_delay_bands(spark, sf_dir).collect()
    assert {r["delay_band"] for r in rows} <= {"early", "prompt", "standard", "late"}
    total = sum(r["high_line_count"] + r["low_line_count"] for r in rows)
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert total == joined
    assert all(r["high_line_count"] >= 0 and r["low_line_count"] >= 0 for r in rows)


def test_supplier_variety_denylist_only_shrinks_counts(spark, sf_dir):
    """Monotonicity of the NOT-IN exclusion: recomputing any returned group
    WITHOUT the denylist can only raise its distinct-supplier count, and the
    returned counts arrive non-increasing (the ORDER BY contract)."""
    from pyspark.sql import functions as F

    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.warehouse_queries import (
        q_supplier_variety,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.sources.registry import (
        load_table,
    )

    rows = q_supplier_variety(spark, sf_dir).collect()
    assert rows
    cnts = [r["supplier_cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    g = rows[0]
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == g["p_brand"])
        & (F.col("p_type") == g["p_type"])
        & (F.col("p_size") == g["p_size"])
    )
    unfiltered = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select("l_suppkey")
        .distinct()
        .count()
    )
    assert unfiltered >= g["supplier_cnt"]


def test_pareto_frontier_is_a_strict_antichain(spark, sf_dir):
    """Frontier rows ordered by size DESC must have strictly decreasing
    best price (any tie or increase would be a dominated row), the largest
    size is always present, and a brute-force dominance sweep over the
    per-size minima finds no survivor the query missed."""
    from pyspark.sql import functions as F

    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.warehouse_queries import (
        q_pareto_frontier,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.sources.registry import (
        load_table,
    )

    rows = q_pareto_frontier(spark, sf_dir).collect()
    sizes = [r["p_size"] for r in rows]
    prices = [r["best_price"] for r in rows]
    assert sizes == sorted(sizes, reverse=True)
    assert all(a > b for a, b in zip(prices, prices[1:]))
    best = {
        r["p_size"]: r["m"]
        for r in load_table(spark, sf_dir, "part")
        .groupBy("p_size")
        .agg(F.min("p_retailprice").alias("m"))
        .collect()
    }
    assert max(best) == sizes[0]
    expect = [
        s
        for s in sorted(best, reverse=True)
        if all(best[s] < best[s2] for s2 in best if s2 > s)
    ]
    assert sizes == expect


def test_last_touch_attribution_conserves_purchases(spark, sf_dir):
    """Every purchase is attributed exactly once: the channel rollup sums
    to the raw purchase count, channels are real event types (or the
    '(none)' cold-start bucket), and distinct users never exceed
    purchases."""
    from pyspark.sql import functions as F

    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.timeseries_queries import (
        q_last_touch_attribution,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.sources.registry import (
        load_table,
    )

    rows = q_last_touch_attribution(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    n_purch = ev.filter(F.col("event_type") == "purchase").count()
    assert sum(r["n_purchases"] for r in rows) == n_purch
    types = {
        r["event_type"] for r in ev.select("event_type").distinct().collect()
    }
    assert {r["channel"] for r in rows} <= (types - {"purchase"}) | {"(none)"}
    assert all(0 < r["n_users"] <= r["n_purchases"] for r in rows)


def test_dup_source_matrix_counts_match_brute_force_pair(spark, sf_dir):
    """The matrix's top cell must equal an independently computed distinct
    shared-segment count for that pair, and every row is a canonical
    (src_a < src_b) pair with a positive count."""
    from pyspark.sql import functions as F

    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.curation_queries import (
        SEG_TOKENS,
        q_dup_source_matrix,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.sources.registry import (
        load_table,
    )

    rows = q_dup_source_matrix(spark, sf_dir).collect()
    assert rows
    assert all(r["src_a"] < r["src_b"] and r["shared_segments"] > 0 for r in rows)
    top = rows[0]
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.split(F.lower("text"), " +").alias("tk")
    ).withColumn("n", F.size("tk"))
    segs = toks.select(
        "source",
        F.explode(
            F.sequence(F.lit(0), F.col("n") - 1, F.lit(SEG_TOKENS))
        ).alias("s"),
        "tk",
    ).select(
        "source",
        F.md5(
            F.array_join(F.slice("tk", F.col("s") + 1, F.lit(SEG_TOKENS)), " ")
        ).alias("h"),
    )
    ha = segs.filter(F.col("source") == top["src_a"]).select("h").distinct()
    hb = segs.filter(F.col("source") == top["src_b"]).select("h").distinct()
    assert ha.intersect(hb).count() == top["shared_segments"]
