"""Property-based tests (SURVEY.md §5.2.4): algebraic laws the operators
must satisfy for arbitrary inputs, via hypothesis.

One shared Spark action per example would be slow; instead each property
generates a batch of rows and runs ONE DataFrame evaluation per hypothesis
example with small, bounded data (max_examples kept low — these guard
laws, not throughput).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from real_time_weather_data_pipeline_for_philippine_cities_spark.functions.normalize import (
    CITY_PREFIXES,
    normalize_city_name,
    strip_city_suffix,
)
from real_time_weather_data_pipeline_for_philippine_cities_spark.operators.relational import (
    dense_ids,
    symmetric_difference,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

name_st = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Zs")), min_size=0, max_size=20
)
key_st = st.tuples(st.integers(0, 5), st.sampled_from(["x", "y", "z", None]))
rows_st = st.lists(key_st, min_size=0, max_size=12)


@given(names=st.lists(name_st, min_size=1, max_size=10))
@SETTINGS
def test_normalize_idempotent(spark, names):
    df = spark.createDataFrame([(n,) for n in names], "city string")
    once = df.select(normalize_city_name(F.col("city")).alias("c"))
    twice = once.select(normalize_city_name(F.col("c")).alias("c"))
    assert [r.c for r in once.collect()] == [r.c for r in twice.collect()]


@given(names=st.lists(name_st, min_size=1, max_size=10), prefix=st.sampled_from(CITY_PREFIXES))
@SETTINGS
def test_normalize_strips_exactly_one_prefix(spark, names, prefix):
    df = spark.createDataFrame([(prefix + n,) for n in names], "city string")
    out = [r.c for r in df.select(normalize_city_name(F.col("city")).alias("c")).collect()]
    # One anchored strip + trim — never the identity on a prefixed name
    # (unless the remainder re-spells a prefix, which trim exposes).
    for orig, stripped in zip(names, out):
        assert not stripped.startswith(prefix) or orig.startswith(prefix)


@given(names=st.lists(name_st, min_size=1, max_size=8))
@SETTINGS
def test_suffix_strip_never_leaves_city_suffix(spark, names):
    df = spark.createDataFrame([(n + " City",) for n in names], "city string")
    out = [r.c for r in df.select(strip_city_suffix(F.col("city")).alias("c")).collect()]
    assert all(not c.endswith(" City") for c in out)


@given(rows=rows_st)
@SETTINGS
def test_diff_self_is_empty(spark, rows):
    df = spark.createDataFrame(rows or [(0, None)], "k int, v string")
    assert symmetric_difference(df, df, ["k", "v"]).isEmpty()


@given(a=rows_st, b=rows_st)
@SETTINGS
def test_diff_is_symmetric(spark, a, b):
    da = spark.createDataFrame(a or [(99, "pad")], "k int, v string")
    db = spark.createDataFrame(b or [(98, "pad")], "k int, v string")
    ab = {
        (r.k, r.v, r.diff_side) for r in symmetric_difference(da, db, ["k", "v"]).collect()
    }
    ba = {
        (r.k, r.v, r.diff_side) for r in symmetric_difference(db, da, ["k", "v"]).collect()
    }
    flip = {"left_only": "right_only", "right_only": "left_only"}
    assert ab == {(k, v, flip[s]) for k, v, s in ba}


@given(rows=st.lists(st.tuples(st.integers(0, 100), st.integers(0, 100)), min_size=1, max_size=15))
@SETTINGS
def test_dense_ids_are_dense_and_deterministic(spark, rows):
    df = spark.createDataFrame(rows, "a int, b int").dropDuplicates()
    out = dense_ids(df, [F.col("a").asc(), F.col("b").asc()], id_col="id")
    ids = sorted(r.id for r in out.collect())
    assert ids == list(range(1, len(ids) + 1))  # dense 1..N, no gaps
    again = dense_ids(df, [F.col("a").asc(), F.col("b").asc()], id_col="id")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


# -- media decoder total robustness ----------------------------------------
# The corrupt-media contract every Arrow kernel relies on: a decoder either
# returns a decoded object or raises ValueError — NEVER any other exception
# (an IndexError/struct.error on adversarial bytes would fail a whole
# corpus-scale stage instead of NULLing one row). Pure-Python property, no
# Spark session involved.
media_blob_st = st.one_of(
    st.binary(max_size=300),
    # bias toward magic-byte prefixes so the format-specific parsers run
    st.binary(max_size=280).map(lambda b: b"P6" + b),
    st.binary(max_size=280).map(lambda b: b"P3" + b),
    st.binary(max_size=280).map(lambda b: b"BM" + b),
    st.binary(max_size=280).map(lambda b: b"RIFF" + b),
    st.binary(max_size=280).map(lambda b: b"RIFF\x00\x01\x00\x00WAVE" + b),
)


@given(blob=media_blob_st)
@settings(max_examples=300, deadline=None)
def test_media_decoders_raise_only_valueerror(blob):
    from real_time_weather_data_pipeline_for_philippine_cities_spark.operators.multimodal import (
        decode_image,
        decode_wav,
        split_ppm_frames,
    )

    for fn in (decode_image, decode_wav, split_ppm_frames):
        try:
            fn(blob)
        except ValueError:
            pass  # the one permitted failure mode


@given(rows=st.lists(st.integers(0, 10_000), min_size=1, max_size=40, unique=True))
@SETTINGS
def test_global_order_positions_equals_single_window_rank(spark, rows):
    """The two-phase bucket-parallel ranking must produce EXACTLY the
    positions a single global row_number would — dense 1..N, ordered by
    (key, tiebreak) — for any id set."""
    from real_time_weather_data_pipeline_for_philippine_cities_spark.operators.relational import (
        global_order_positions,
    )

    df = spark.createDataFrame([(i,) for i in rows], "doc_id long")
    key = F.md5(F.col("doc_id").cast("string"))
    out = global_order_positions(df, key, "doc_id").collect()
    got = {r.doc_id: r.position for r in out}
    expected_order = sorted(
        rows, key=lambda i: (__import__("hashlib").md5(str(i).encode()).hexdigest(), i)
    )
    assert got == {i: p + 1 for p, i in enumerate(expected_order)}


def test_scd2_actions_reconcile_dimension(spark):
    """Applying the emitted MERGE actions to the current dim must
    reproduce the incoming snapshot exactly: keep rows unchanged, close
    the old version of close+insert keys, insert the new version and the
    brand-new keys. Pins that the classification is complete and
    non-overlapping — a miscategorized key breaks set equality."""
    from pyspark.sql import functions as F

    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.catalog import (
        CATALOG,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.base import t

    sf_dir = "/root/testdata/sf0.001"
    actions = CATALOG["scd2_merge_plan"].fn(spark, sf_dir)
    # reconstructed dim = keep rows + the new versions carried on
    # insert / close+insert actions (the action row always carries the
    # incoming attribute values for non-keep rows)
    rebuilt = actions.filter(F.col("action").isin("keep", "insert", "close+insert")).select(
        "key", "segment", "acctbal"
    )
    cust = t(spark, sf_dir, "customer")
    incoming = cust.select(
        F.col("c_custkey").alias("key"),
        F.when(F.col("c_custkey") % 7 == 0, F.lit("RELOCATED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("segment"),
        F.round(
            F.col("c_acctbal")
            + F.when(F.col("c_custkey") % 7 == 0, F.lit(100.0)).otherwise(F.lit(0.0)),
            2,
        ).alias("acctbal"),
    )
    got = sorted(tuple(r) for r in rebuilt.collect())
    want = sorted(tuple(r) for r in incoming.collect())
    assert got == want
    # every action class is present in the fixture
    kinds = {r.action for r in actions.select("action").distinct().collect()}
    assert kinds == {"keep", "insert", "close+insert"}


@given(
    a=st.lists(st.integers(-50, 50), min_size=1, max_size=25),
    b=st.lists(st.integers(-50, 50), min_size=1, max_size=25),
)
@SETTINGS
def test_ks_statistic_equals_brute_force_on_any_samples(spark, a, b):
    """The bucketed integer-arithmetic KS operator must equal the
    textbook max|F1-F2| brute force for ANY two samples — including
    all-ties, single-distinct-value, and disjoint-support inputs the
    events table never exercises."""
    import bisect

    from real_time_weather_data_pipeline_for_philippine_cities_spark.operators.stats import (
        ks_statistic,
    )

    rows = [(float(v), "a") for v in a] + [(float(v), "b") for v in b]
    df = spark.createDataFrame(rows, "value double, tag string")
    got = ks_statistic(
        df, "value", F.col("tag") == "a", F.col("tag") == "b", buckets=4
    ).collect()[0]
    sa, sb = sorted(map(float, a)), sorted(map(float, b))
    ks = max(
        abs(
            bisect.bisect_right(sa, v) * len(sb)
            - bisect.bisect_right(sb, v) * len(sa)
        )
        for v in set(sa) | set(sb)
    ) / (len(sa) * len(sb))
    assert (got.n_a, got.n_b) == (len(a), len(b))
    assert got.ks_stat == ks  # raw passthrough: bit-identical division


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 8), st.integers(-100, 100)),
        min_size=1,
        max_size=30,
    )
)
@SETTINGS
def test_pareto_frontier_operator_equals_brute_force(spark, pts):
    """The aggregate-first skyline must return EXACTLY the non-dominated
    (max x, min y) set a quadratic dominance sweep finds, for any point
    cloud (duplicates, ties, single-x inputs included)."""
    from real_time_weather_data_pipeline_for_philippine_cities_spark.operators.relational import (
        pareto_frontier_max_min,
    )

    df = spark.createDataFrame(
        [(x, float(y)) for x, y in pts], "x int, y double"
    )
    got = [(r.x, r.best_y) for r in pareto_frontier_max_min(df, "x", "y").collect()]
    best = {}
    for x, y in pts:
        best[x] = min(best.get(x, float("inf")), float(y))
    expect = [
        (x, best[x])
        for x in sorted(best, reverse=True)
        if all(best[x] < best[x2] for x2 in best if x2 > x)
    ]
    assert got == expect
