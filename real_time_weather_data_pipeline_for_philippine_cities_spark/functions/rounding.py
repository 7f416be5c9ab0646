"""Cross-engine exact quantization of integer ratios.

The recurring strict-sweep bug class (sf1 caught 5, sf10 caught 2):
``F.round(a / b, N)`` on a raw double. When the true rational ``a/b``
lands exactly on a rounding half at N decimals, Spark rounds the
shortest decimal representation HALF_UP while DuckDB rounds the binary
double (which sits on either side of the decimal midpoint), so the two
engines split. The sites that drifted at sf10 — `pricing_summary`'s
money sums and `unigram_logprob`'s 6-dp score — were fixed by doing the
tie-break in EXACT INTEGER space; this module is that recipe as one
shared, property-tested helper pair for the remaining ratio sites
(BASELINE.md "Tie-margin audit", scheduled round 8).

Semantics: ``round_half_away(a / b, N)`` for integer ``a`` (any sign)
and positive integer ``b``, computed as

    w   = |a| div b,  rem = |a| mod b      -- integer, exact
    r   = w*10^N + (2*rem*10^N + b) div (2*b)
    result = sign(a) * r / 10^N            -- ONE float op, identical
                                           -- in both engines

``div`` is Spark's integer division; DuckDB's ``//`` (floor division —
identical on the non-negative operands the formula produces). The only
floating operation is the final division by a power of ten, performed
on the same integer in both engines — elementwise IEEE ops are
bit-identical.

Half-away-from-zero matches Spark's HALF_UP semantics on the values
these sites produce (positive ratios and signed scores alike), so
replacing ``F.round(a/b, N)`` with ``round_div(a, b, N)`` is
value-preserving everywhere except on the exact halves that were
previously engine-dependent.

Domain: LONG-safe for ANY BIGINT numerator; the denominator must keep
``2*b*10^N + b < 2^63`` — b below ~4.6e14 at 4 dp, ~4.6e12 at 6 dp
(every audited site is a count ratio orders of magnitude inside that),
and the scaled result must itself fit a BIGINT. NULL or non-positive
denominators yield NULL, like plain division (the audited sites all
have b >= 1 by construction).

Faithfulness boundary (hypothesis-found): while ``|a/b|*10^N < 2^53``
the result is the EXACT half-away quantization (pinned against Python
Decimal). Beyond 2^53 the scaled integer is no longer representable in
a double, so the final ``r/10^N`` rounds once more — the two ENGINES
still agree bitwise (both run the identical int→double→divide), but no
double-valued answer could carry the quantization exactly there. All
audited sites are ratios bounded by small statistics (ratios ≤ 1,
logprobs, tf-idf), 6+ orders inside the boundary.

Both fragment builders emit plain ANSI arithmetic from the SAME
template so the Spark plan and the DuckDB oracle cannot drift apart;
the only dialect difference is the integer-division operator.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _fragment(numer_sql: str, denom_sql: str, n_dp: int, intdiv: str) -> str:
    scale = 10**n_dp
    a = f"CAST(({numer_sql}) AS BIGINT)"
    b = f"CAST(({denom_sql}) AS BIGINT)"
    bb = f"(CASE WHEN {b} > 0 THEN {b} END)"
    aa = f"abs({a})"
    # Split |a|/b into whole + rem/b BEFORE scaling so the overflow
    # constraint falls on the DENOMINATOR only (2*rem*10^N + b < 2^63
    # with rem < b), not on the numerator: any BIGINT numerator is safe.
    whole = f"({aa} {intdiv} {bb})"
    rem = f"({aa} % {bb})"
    q = f"({whole} * {scale} + (2 * {rem} * {scale} + {bb}) {intdiv} (2 * {bb}))"
    # 1eN (not "1000000.0"): Spark parses a plain decimal literal as
    # DECIMAL and would return a DECIMAL column; scientific notation is
    # DOUBLE in both engines, keeping the lone float op identical.
    return f"((CASE WHEN {a} < 0 THEN -{q} ELSE {q} END) / 1e{n_dp})"


def round_div_expr(numer_sql: str, denom_sql: str, n_dp: int) -> str:
    """Spark-SQL string form: ``round(numer/denom, n_dp)`` with
    half-away-from-zero ties computed exactly in integer space."""
    return _fragment(numer_sql, denom_sql, n_dp, "div")


def round_div(numer_sql: str, denom_sql: str, n_dp: int) -> Column:
    """Column form of :func:`round_div_expr` (inputs are SQL snippets,
    e.g. column names — the repo's plans build expressions as SQL
    throughout, and a string template keeps the Spark and DuckDB sides
    provably identical)."""
    return F.expr(round_div_expr(numer_sql, denom_sql, n_dp))


def oracle_round_div(numer_sql: str, denom_sql: str, n_dp: int) -> str:
    """The DuckDB twin — same template, ``//`` for integer division."""
    return _fragment(numer_sql, denom_sql, n_dp, "//")


def _quantize_fragment(x_sql: str, n_dp: int) -> str:
    # 0.5e0 / 1eN: scientific notation parses as DOUBLE in both engines
    # (a plain decimal literal would be DECIMAL in Spark).
    x = f"({x_sql})"
    up = f"floor({x} * 1e{n_dp} + 0.5e0)"
    dn = f"-floor(-{x} * 1e{n_dp} + 0.5e0)"
    return f"((CASE WHEN {x} < 0 THEN {dn} ELSE {up} END) / 1e{n_dp})"


def quantize_double(x_sql: str, n_dp: int) -> Column:
    """Engine-identical N-dp quantization for a GENERIC double — the
    companion to :func:`round_div` for values that are not integer ratios
    (histogram bin edges, percentile interpolations). ``round(x, N)`` on
    such a double is engine-dependent exactly when the double's shortest
    decimal representation lands on a rounding half (Spark rounds that
    representation HALF_UP; DuckDB rounds the binary value). This
    template instead computes half-away-from-zero as ``floor(|x|*10^N +
    0.5)`` — multiply, add, floor, negate, divide are all elementwise
    IEEE ops, so given the same input double BOTH engines produce the
    same output double on EVERY input, ties included.

    Semantics note: on the exact-half boundary cases this decides by the
    BINARY value (like DuckDB's round) rather than the shortest decimal
    representation; everywhere else it equals round(x, N). Domain:
    |x|*10^N must fit BIGINT — Spark's floor returns BIGINT and aborts
    loudly (ANSI) beyond it; callers on unbounded columns should gate
    with finite()/finite_pred first (NaN/Inf would abort the same way).
    """
    return F.expr(_quantize_fragment(x_sql, n_dp))


def oracle_quantize_double(x_sql: str, n_dp: int) -> str:
    """DuckDB twin of :func:`quantize_double` — the identical template
    (DuckDB's floor returns DOUBLE, not BIGINT, but below 2^53 the
    integral double and Spark's BIGINT convert to the same double, and at
    or above 2^53 floor is the identity on both engines)."""
    return _quantize_fragment(x_sql, n_dp)


def quantize_domain_guard(x_sql: str, n_dp: int) -> str:
    """Engine-identical domain gate for :func:`quantize_double` on a
    column whose magnitude is NOT structurally bounded: values with
    ``|x| >= 10^(18-N)`` (safely inside the ``|x|*10^N < 2^63`` BIGINT
    box) become NULL on BOTH engines instead of Spark's floor
    ANSI-aborting while DuckDB's DOUBLE floor sails on — one poisoned
    but *finite* huge metric (say 1e300) must not kill the job the
    oracle survives (round-8 advice). The guard text is identical ANSI
    on both dialects, so wrap the snippet before EITHER template.

    Cost contract (round-9 advice): the guard interpolates ``x_sql``
    TWICE (the abs() test and the CASE result), and quantize_double
    nests three more references — six total. Apply it to a NAMED
    column (pre-project the value in a prior select / CTE, as
    percentiles_by_type and winsorized_stats do), never to an
    expensive inline snippet like a fold-based dot product or a raw
    ``percentile(...)`` call, or the expression is evaluated up to six
    times per row on engines that don't dedupe subexpressions."""
    return f"(CASE WHEN abs({x_sql}) < 1e{18 - n_dp} THEN ({x_sql}) END)"
