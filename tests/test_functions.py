"""Truth-table unit tests for the scalar-function layer, derived from the
reference's behavior (weather_data_fetcher.py:104-218) — the edge cases
SURVEY.md §5.2.2 calls out: NaN state, 'nan' sentinel, Isabela/Basilan
override, prefix/suffix normalization idempotence, candidate-order wins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_weather_data_pipeline_for_philippine_cities_spark.functions.normalize import (
    candidate_accepted,
    normalize_city_name,
    strip_city_suffix,
)
from real_time_weather_data_pipeline_for_philippine_cities_spark.operators.geocode import (
    match_geocode_candidates,
)


def _norm(spark, name):
    df = spark.createDataFrame([(name,)], "city string")
    return df.select(normalize_city_name(F.col("city")).alias("n")).first().n


def test_normalize_prefixes(spark):
    # wdf.py:145-157: one anchored strip + trim
    assert _norm(spark, "City of Batac") == "Batac"
    assert _norm(spark, "Municipality of Pateros") == "Pateros"
    assert _norm(spark, "Barangay X") == "X"
    assert _norm(spark, "Town of Y") == "Y"
    assert _norm(spark, "Quezon City") == "Quezon City"  # suffix untouched
    # only ONE prefix strip (replace(prefix, '', 1) semantics)
    assert _norm(spark, "City of Municipality of Z") == "Municipality of Z"
    # idempotence on already-normal names
    assert _norm(spark, "Batac") == "Batac"


def test_normalize_prefix_mid_string_not_stripped(spark):
    # anchored: a prefix occurring mid-string must not be removed
    assert _norm(spark, "The City of Manila") == "The City of Manila"


def test_strip_city_suffix(spark):
    df = spark.createDataFrame(
        [("Quezon City",), ("Cebu",), ("City",)], "city string"
    )
    got = [r.s for r in df.select(strip_city_suffix(F.col("city")).alias("s")).collect()]
    # wdf.py:121-124: endswith ' City' → drop 5 chars + strip
    assert got == ["Quezon", "Cebu", "City"]


CANDS_SCHEMA = "query_city string, province_name string, state string, candidate_idx int, lat double, lon double"


def _match(spark, rows):
    df = spark.createDataFrame(rows, CANDS_SCHEMA)
    out = match_geocode_candidates(df, keys=("query_city",))
    return {r.query_city: (r.candidate_idx, r.lat, r.lon) for r in out.collect()}


def test_match_rules_truth_table(spark):
    rows = [
        # R1: null state passes regardless of province (wdf.py:176-180)
        ("a", None, None, 1, 1.0, 1.0),
        # R2: Isabela/Basilan override (wdf.py:183-187)
        ("Isabela", "Isabela", "Basilan Province", 1, 2.0, 2.0),
        # R3a exact case-insensitive (wdf.py:193)
        ("b", "Cebu", "CEBU", 1, 3.0, 3.0),
        # R3b containment (wdf.py:199)
        ("c", "Davao", "Davao del Sur", 1, 4.0, 4.0),
        # R3c Naga + 'nan' sentinel (wdf.py:206-210)
        ("Naga", "Camarines Sur", "nan", 1, 5.0, 5.0),
        # no match: mismatching state, non-special city → dropped (wdf.py:218)
        ("d", "Iloilo", "Palawan", 1, 6.0, 6.0),
        # null province disables R3 but not R2 (wdf.py:211-212)
        ("Isabela2", None, "Somewhere", 1, 7.0, 7.0),
    ]
    got = _match(spark, rows)
    assert got["a"] == (1, 1.0, 1.0)
    assert got["Isabela"] == (1, 2.0, 2.0)
    assert got["b"] == (1, 3.0, 3.0)
    assert got["c"] == (1, 4.0, 4.0)
    assert got["Naga"] == (1, 5.0, 5.0)
    assert "d" not in got
    assert "Isabela2" not in got


def test_match_candidate_order_wins(spark):
    # candidate-major iteration: first candidate (API order) satisfying ANY
    # rule wins, even if a later candidate matches a "stronger" rule
    rows = [
        ("x", "Cebu", "Metro Cebu Area", 2, 9.0, 9.0),   # R3b at idx 2
        ("x", "Cebu", "cebu", 3, 8.0, 8.0),              # R3a at idx 3
        ("x", "Cebu", "Palawan", 1, 7.0, 7.0),           # no rule at idx 1
    ]
    got = _match(spark, rows)
    assert got["x"] == (2, 9.0, 9.0)


def test_match_empty_string_state_is_not_null(spark):
    # '' is NOT the null sentinel: R1 must not fire; R3c only for Naga
    rows = [("y", "Bohol", "", 1, 1.5, 1.5)]
    assert "y" not in _match(spark, rows)
    rows = [("Naga", "Camarines Sur", "", 1, 2.5, 2.5)]
    assert _match(spark, rows)["Naga"] == (1, 2.5, 2.5)


# -- z-order clustering key -------------------------------------------------
def test_morton_key_matches_python_reference_and_is_monotone(spark):
    from real_time_weather_data_pipeline_for_philippine_cities_spark.functions.zorder import (
        morton_key_col,
    )

    def spread_py(x):
        x &= 0x7FFFFFFF
        for s, m in [
            (16, 0x0000FFFF0000FFFF), (8, 0x00FF00FF00FF00FF),
            (4, 0x0F0F0F0F0F0F0F0F), (2, 0x3333333333333333),
            (1, 0x5555555555555555),
        ]:
            x = (x | (x << s)) & m
        return x

    cases = [(0, 0), (1, 0), (0, 1), (3, 5), (2**31 - 1, 2**31 - 1),
             (12345, 67890), (999999999, 123456789)]
    df = spark.createDataFrame(cases, "a long, b long").withColumn(
        "z", morton_key_col("a", "b")
    )
    for r in df.collect():
        want = spread_py(r.a) | (spread_py(r.b) << 1)
        assert r.z == want, (r.a, r.b)
        assert r.z >= 0  # 31-bit dims keep the key positive
    # monotone in each dimension holding the other fixed
    assert spread_py(5) | (spread_py(9) << 1) < spread_py(6) | (spread_py(9) << 1)


def test_zorder_layout_tightens_chunk_bounding_boxes(spark):
    """The point of the key: split the z-sorted table into chunks ("files")
    every chunk is bounded in BOTH dimensions — min/max stats can skip
    chunks for predicates on either column. Row-major chunks span the full
    y width (span 64), so y-predicates skip nothing; z-order chunks of a
    64x64 grid are 16x16 squares."""
    from real_time_weather_data_pipeline_for_philippine_cities_spark.functions.zorder import (
        morton_key_col,
    )

    side = 64
    grid = spark.createDataFrame(
        [(i // side, i % side) for i in range(side * side)], "x long, y long"
    ).withColumn("z", morton_key_col("x", "y"))
    rows = grid.collect()
    chunk = side * side // 16

    def max_span(ordered, dim):
        spans = []
        for i in range(0, len(ordered), chunk):
            c = ordered[i : i + chunk]
            vals = [getattr(r, dim) for r in c]
            spans.append(max(vals) - min(vals) + 1)
        return max(spans)

    rm = sorted(rows, key=lambda r: (r.x, r.y))
    zm = sorted(rows, key=lambda r: r.z)
    assert max_span(rm, "y") == side  # row-major never skips on y
    assert max_span(zm, "y") <= side // 2  # z-order: every chunk y-bounded
    assert max_span(zm, "x") <= side // 2  # ...and x-bounded


def test_attach_quality_features_equals_single_projection(spark):
    """The staged attach (counts -> ratios -> composite; tokenize once per
    row) must be value-identical to the single-projection reference
    quality_features — same fragments over the same integers."""
    from real_time_weather_data_pipeline_for_philippine_cities_spark.functions.text import (
        QUALITY_FEATURE_COLS,
        attach_quality_features,
        quality_features,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    qf = quality_features("text")
    single = docs.select(
        "doc_id", *[qf[n].alias(n) for n in QUALITY_FEATURE_COLS]
    ).orderBy("doc_id")
    staged = (
        attach_quality_features(docs)
        .select("doc_id", *QUALITY_FEATURE_COLS)
        .orderBy("doc_id")
    )
    assert staged.collect() == single.collect()
