"""Laws for functions/rounding.py — the shared integer-space quantizer.

Three-way agreement on random integer ratios INCLUDING constructed
exact-tie cases (the inputs where raw ``round(a/b, N)`` is
engine-dependent):

  Spark round_div(a, b, N)
    == DuckDB oracle_round_div(a, b, N)
    == Decimal(a) / (b) quantized ROUND_HALF_UP (away from zero)

The Decimal reference is exact rational arithmetic, so this pins the
SEMANTICS, not just cross-engine sameness.
"""

from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from real_time_weather_data_pipeline_for_philippine_cities_spark.functions.rounding import (
    oracle_round_div,
    round_div,
    round_div_expr,
)


def _reference(a: int, b: int, n_dp: int) -> float:
    q = (Decimal(a) / Decimal(b)).quantize(
        Decimal(1).scaleb(-n_dp), rounding=ROUND_HALF_UP
    )
    return float(q)


def _duck(a: int, b: int, n_dp: int) -> float:
    return duckdb.sql(
        f"SELECT {oracle_round_div(str(a), str(b), n_dp)} AS v"
    ).fetchone()[0]


def _spark_batch(spark, pairs: list[tuple[int, int]], n_dp: int) -> list[float]:
    df = spark.createDataFrame(pairs, "a long, b long")
    rows = (
        df.select("a", "b", round_div("a", "b", n_dp).alias("v"))
        .orderBy("a", "b")
        .collect()
    )
    by_key = {(r["a"], r["b"]): r["v"] for r in rows}
    return [by_key[p] for p in pairs]


# -- constructed exact ties: a/b == k + 5*10^-(N+1) exactly ----------------

def _tie_cases(n_dp: int) -> list[tuple[int, int]]:
    """Ratios landing EXACTLY on a rounding half at n_dp decimals:
    a/b = w + (2m+1)/(2*10^n_dp), built with b = c*2*10^n_dp and
    a = c*(w*2*10^n_dp + 2m+1) for scaling factors c (tests that the
    tie survives non-canonical a/b representations), plus negatives."""
    out = []
    base = 2 * 10**n_dp
    for w in (0, 3, 8127):
        for odd in (1, 7, 1251 % base | 1):
            for c in (1, 3, 997):
                a = c * (w * base + odd)
                b = c * base
                out.append((a, b))
                out.append((-a, b))
    return out


@pytest.mark.parametrize("n_dp", [2, 4, 6])
def test_exact_ties_agree_three_ways(spark, n_dp):
    pairs = _tie_cases(n_dp)
    assert pairs, "tie construction produced no cases"
    # confirm they ARE ties in exact arithmetic
    for a, b in pairs:
        frac = (Decimal(a) / Decimal(b)) * (10**n_dp)
        assert abs(frac) % 1 == Decimal("0.5"), (a, b, frac)
    spark_vals = _spark_batch(spark, pairs, n_dp)
    for (a, b), sv in zip(pairs, spark_vals):
        ref = _reference(a, b, n_dp)
        dv = _duck(a, b, n_dp)
        assert sv == ref == dv, (a, b, n_dp, sv, ref, dv)


# -- randomized agreement --------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(
    a=st.integers(min_value=-(10**12), max_value=10**12),
    b=st.integers(min_value=1, max_value=10**9),
    n_dp=st.sampled_from([2, 4, 6]),
)
def test_duckdb_matches_decimal_reference(a, b, n_dp):
    # Faithfulness vs exact Decimal holds while the SCALED result fits
    # 2^53 (see the module docstring boundary — hypothesis found the
    # a=225122093056, b=13, n_dp=6 counterexample at 1.7e16); beyond it
    # the engines still agree with each other (next test) but a double
    # cannot carry the quantization.
    assume(abs(a) * 10**n_dp < b * 2**53)
    assert _duck(a, b, n_dp) == _reference(a, b, n_dp)


@settings(max_examples=100, deadline=None)
@given(
    a=st.integers(min_value=-(2**62), max_value=2**62),
    b=st.integers(min_value=1, max_value=10**6),
    n_dp=st.sampled_from([2, 4, 6]),
)
def test_engines_agree_even_beyond_2_53(spark, a, b, n_dp):
    """Cross-ENGINE agreement has no 2^53 boundary: both run the same
    int->double->divide, so Spark == DuckDB bitwise everywhere in the
    BIGINT-safe domain, including where Decimal faithfulness ends."""
    assume(2 * b * 10**n_dp + b < 2**63)
    # the scaled result must itself fit a BIGINT (documented domain —
    # the breach is LOUD via ANSI overflow, which is the contract)
    assume(abs(a) // b < 2**62 // 10**n_dp)
    got = spark.sql(
        f"SELECT {round_div_expr(str(a), str(b), n_dp)} AS v"
    ).collect()[0][0]
    assert got == _duck(a, b, n_dp)


def test_spark_matches_reference_on_random_grid(spark):
    import random

    rng = random.Random(7)
    pairs = []
    while len(pairs) < 300:
        a, b = rng.randint(-(10**12), 10**12), rng.randint(1, 10**9)
        if abs(a) * 10**6 < b * 2**53:  # Decimal-faithful domain
            pairs.append((a, b))
    for n_dp in (2, 4, 6):
        spark_vals = _spark_batch(spark, pairs, n_dp)
        for (a, b), sv in zip(pairs, spark_vals):
            assert sv == _reference(a, b, n_dp), (a, b, n_dp, sv)


def test_null_and_nonpositive_denominator_yield_null(spark):
    df = spark.createDataFrame(
        [(10, 0), (10, -3), (10, None)], "a long, b long"
    )
    vals = [r["v"] for r in df.select(round_div("a", "b", 4).alias("v")).collect()]
    assert vals == [None, None, None]
    assert duckdb.sql(
        f"SELECT {oracle_round_div('10', '0', 4)} AS v"
    ).fetchone()[0] is None


def test_fragments_share_one_template():
    s = round_div_expr("x", "y", 6)
    d = oracle_round_div("x", "y", 6)
    assert s.replace(" div ", " // ") == d


# -- quantize_double: the generic-double companion -------------------------

from real_time_weather_data_pipeline_for_philippine_cities_spark.functions.rounding import (  # noqa: E402
    oracle_quantize_double,
    quantize_double,
)


def _py_quantize(x: float, n_dp: int) -> float:
    """Python runs the identical IEEE ops, so it is the executable spec."""
    import math

    s = 10.0**n_dp
    if x < 0:
        return -math.floor(-x * s + 0.5) / s
    return math.floor(x * s + 0.5) / s


def _risky_doubles(n_dp: int) -> list[float]:
    """Doubles whose SHORTEST DECIMAL REPR lands on a rounding half at
    n_dp — exactly where round(x, n_dp) is engine-dependent — plus
    ordinary values and negatives."""
    half = 5 * 10.0 ** -(n_dp + 1)
    out = []
    for w in (0.0, 1.0, 3.25, 8127.0):
        for k in (0, 1, 7, 9999):
            v = w + k * 10.0**-n_dp + half
            out.extend([v, -v])
    out.extend([0.0, -0.0, 1.0 / 3.0, 2.0**0.5, -(7.0 / 11.0)])
    return out


@pytest.mark.parametrize("n_dp", [2, 4, 6])
def test_quantize_double_engines_and_spec_agree(spark, n_dp):
    vals = _risky_doubles(n_dp)
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    srows = df.select("x", quantize_double("x", n_dp).alias("v")).collect()
    by_x = {r["x"]: r["v"] for r in srows}
    for v in vals:
        sv = by_x[v]
        dv = duckdb.sql(
            f"SELECT {oracle_quantize_double('x', n_dp)} AS v"
            " FROM (SELECT CAST(? AS DOUBLE) AS x) t",
            params=[v],
        ).fetchone()[0]
        ref = _py_quantize(v, n_dp)
        assert sv == dv == ref, (v, n_dp, sv, dv, ref)


@settings(max_examples=200, deadline=None)
@given(
    x=st.floats(
        min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
    ),
    n_dp=st.sampled_from([2, 4, 6]),
)
def test_quantize_double_duckdb_matches_spec(x, n_dp):
    got = duckdb.sql(
        f"SELECT {oracle_quantize_double('y', n_dp)} AS v"
        " FROM (SELECT CAST(? AS DOUBLE) AS y) t",
        params=[x],
    ).fetchone()[0]
    assert got == _py_quantize(x, n_dp), (x, n_dp, got)


def test_quantize_double_null_propagates(spark):
    df = spark.createDataFrame([(None,)], "x double")
    assert df.select(quantize_double("x", 4).alias("v")).collect()[0]["v"] is None
    assert (
        duckdb.sql(
            f"SELECT {oracle_quantize_double('CAST(NULL AS DOUBLE)', 4)} AS v"
        ).fetchone()[0]
        is None
    )


def test_quantize_fragments_share_one_template():
    assert quantize_double("x", 6) is not None
    from real_time_weather_data_pipeline_for_philippine_cities_spark.functions.rounding import (
        _quantize_fragment,
    )

    assert oracle_quantize_double("x", 6) == _quantize_fragment("x", 6)
