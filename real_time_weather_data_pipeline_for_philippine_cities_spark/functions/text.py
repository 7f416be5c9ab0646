"""Text-analysis expression layer (SURVEY.md §7.6: beyond-reference
operators for large-scale training-data pipelines).

Everything here is a Catalyst expression builder paired with a DuckDB-SQL
twin (the correctness harness runs both on the same parquet and hash-
compares). No Python UDFs — tokenization, language-ID, quality scoring and
fingerprinting all stay JVM-side inside whole-stage codegen, which is what
makes them viable at 100 TB.

Dialect notes encoded here once:
  * Spark ``split`` ↔ DuckDB ``string_split_regex``;
  * Spark arrays are 0-indexed (`a[i]`), DuckDB lists 1-indexed;
  * Spark ``regexp_replace`` is global by default, DuckDB needs the ``'g'``
    flag;
  * Spark ``aggregate(xs, init, f)`` is a sequential left fold; DuckDB's
    ``list_reduce`` seeds from the first element, so the twin prepends the
    init value to get the identical fold.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import MINHASH_PRIME

#: Tiny per-language stopword profiles for the n-gram/stopword language-ID
#: heuristic. Order of LANG_PRIORITY is the deterministic argmax tiebreak.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "von", "mit"),
    "en": ("the", "a", "and", "of", "to", "in", "is"),
    "es": ("el", "la", "de", "y", "que", "en", "los"),
    "fr": ("le", "la", "et", "les", "des", "est", "dans"),
}
LANG_PRIORITY = ("de", "en", "es", "fr")

#: BPE-ish tokenizer regex: word pieces, digits, isolated punctuation.
TOKEN_RE = "[a-z]+|[0-9]|[^a-z0-9\\s]"


# -- tokens ----------------------------------------------------------------
def tokens(text: Column) -> Column:
    """Whitespace word tokens, lowercased."""
    return F.split(F.lower(text), " +")


def tokens_sql(expr: str) -> str:
    return f"string_split_regex(lower({expr}), ' +')"


# -- token counting --------------------------------------------------------
def token_counts(text: Column) -> dict[str, Column]:
    return {
        "n_ws_tokens": F.size(tokens(text)),
        "n_re_tokens": F.size(F.regexp_extract_all(F.lower(text), F.lit(TOKEN_RE), 0)),
        "n_chars_computed": F.length(text),
    }


def token_counts_sql(expr: str) -> dict[str, str]:
    return {
        "n_ws_tokens": f"len({tokens_sql(expr)})",
        "n_re_tokens": f"len(regexp_extract_all(lower({expr}), '{TOKEN_RE}'))",
        "n_chars_computed": f"length({expr})",
    }


# -- stopword counting -----------------------------------------------------
def _stopword_count(toks: Column, words: tuple[str, ...]) -> Column:
    wl = list(words)
    return F.size(F.filter(toks, lambda t: t.isin(*wl)))


def _stopword_count_sql(toks_expr: str, words: tuple[str, ...]) -> str:
    lit = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    return f"len(list_filter({toks_expr}, t -> list_contains({lit}, t)))"


# -- language ID -----------------------------------------------------------
def lang_scores(text: Column) -> dict[str, Column]:
    toks = tokens(text)
    return {f"score_{lang}": _stopword_count(toks, ws) for lang, ws in STOPWORDS.items()}


def predicted_lang(text: Column) -> Column:
    """Argmax over stopword-profile scores; 0 everywhere → 'unknown';
    ties break by LANG_PRIORITY order (deterministic in both engines)."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    expr = F.when(best == 0, F.lit("unknown"))
    for lang in LANG_PRIORITY:
        expr = expr.when(scores[f"score_{lang}"] == best, F.lit(lang))
    return expr.otherwise(F.lit("unknown"))


def predicted_lang_sql(expr: str) -> str:
    toks = tokens_sql(expr)
    scores = {lang: _stopword_count_sql(toks, ws) for lang, ws in STOPWORDS.items()}
    best = "greatest(" + ", ".join(scores.values()) + ")"
    whens = "".join(
        f" WHEN {scores[lang]} = {best} THEN '{lang}'" for lang in LANG_PRIORITY
    )
    return f"CASE WHEN {best} = 0 THEN 'unknown'{whens} ELSE 'unknown' END"


# -- quality scoring -------------------------------------------------------
def tokens_spark_sql(expr: str) -> str:
    """Spark-SQL text form of :func:`tokens` — needed because the ratio
    features quantize via the shared integer-space template
    (functions/rounding.py), which is a SQL-string builder."""
    return f"split(lower({expr}), ' +')"


def _stopword_count_spark_sql(toks_expr: str, words: tuple[str, ...]) -> str:
    lit = ", ".join(f"'{w}'" for w in words)
    return f"size(filter({toks_expr}, t -> t IN ({lit})))"


def quality_features(text_sql: str = "text") -> dict[str, Column]:
    """Length / punctuation / stopword / type-token-ratio features and a
    composite score — the classic cheap quality filter for web-scale text.

    The three raw ratios are integer ratios quantized at 4 dp through the
    exact integer-space half-away template (tie-margin batch, round 8):
    ``F.round`` on the raw double was a per-landed-half engine lottery —
    e.g. a 32-identical-token doc has ttr = 1/32 = 0.03125, a TRUE half
    at 4 dp that Spark and DuckDB rounded differently. Takes the column's
    SQL text (every caller passes the ``text`` column) because the shared
    template is a string builder by design — the Spark plan and the
    DuckDB twin are provably the same arithmetic.

    nullif guard on n_chars: an EMPTY document has length 0 and ANSI
    division by zero aborts the whole job (weird-content sweep) — NULL
    ratio for a char-less doc is the honest value, mirrored by the twin.
    n_tokens needs no guard: split() never returns an empty array (empty
    text -> ['']). Case-insensitivity via the CHARACTER CLASS, not
    lower(): JVM and utf8proc case-mapping tables disagree on expanding
    characters (unicode fuzz, round 7).
    """
    from .rounding import round_div_expr

    toks = tokens_spark_sql(text_sql)
    n_tokens = f"size({toks})"
    n_chars = f"nullif(length({text_sql}), 0)"
    punct_n = f"length(regexp_replace({text_sql}, '[A-Za-z0-9 ]', ''))"
    ttr = F.expr(round_div_expr(f"size(array_distinct({toks}))", n_tokens, 4))
    stop_ratio = F.expr(
        round_div_expr(_stopword_count_spark_sql(toks, STOPWORDS["en"]), n_tokens, 4)
    )
    punct_ratio = F.expr(round_div_expr(punct_n, n_chars, 4))
    # The composite NEEDS no integer-space treatment: its inputs are exact
    # multiples of 1e-4, so quality*1e5 = 4*T + 4*S + 2*(1e4 - P) is EVEN
    # in 1e-5 units — it can never land on a (odd) rounding half at 4 dp,
    # and the float sum's ~1e-16 error cannot bridge the >= 1e-5 gap to
    # one. Plain round on the identical IEEE doubles is engine-identical.
    quality = F.round(0.4 * ttr + 0.4 * stop_ratio + 0.2 * (1 - punct_ratio), 4)
    return {
        "n_tokens": F.expr(n_tokens),
        "ttr": ttr,
        "stop_ratio": stop_ratio,
        "punct_ratio": punct_ratio,
        "quality": quality,
    }


#: output column names attach_quality_features appends, in order.
QUALITY_FEATURE_COLS = ("n_tokens", "ttr", "stop_ratio", "punct_ratio", "quality")


def attach_quality_features(df, text_sql: str = "text"):
    """Append the quality-feature columns via STAGED projections so the
    tokenize chain evaluates ONCE per row.

    Why not one projection (``quality_features``): the integer-space
    round_div template references its operands ~5x and the composite
    re-embeds all three ratio fragments, and Catalyst's codegen
    subexpression elimination does not cover the higher-order-function
    lambdas inside ``filter``/``array_distinct`` — a single projection
    re-runs split()/lower() per textual reference (measured 1.34x on
    quality_score at sf0.1, round-8 bench scan). Staging computes the
    five integer counts once, the ratios over those named columns, and
    the composite over the named ratios; CollapseProject keeps the
    stages apart because the shared sub-expressions are non-cheap and
    multiply-referenced. Values are identical to ``quality_features``
    by construction (same fragments over the same integers) and pinned
    by tests/test_functions.py.
    """
    from pyspark.sql import functions as _F

    from .rounding import round_div

    toks = tokens_spark_sql(text_sql)
    counts = df.select(
        "*",
        _F.expr(f"size({toks})").alias("__q_nt"),
        _F.expr(f"size(array_distinct({toks}))").alias("__q_nd"),
        _F.expr(_stopword_count_spark_sql(toks, STOPWORDS["en"])).alias("__q_ns"),
        _F.expr(
            f"length(regexp_replace({text_sql}, '[A-Za-z0-9 ]', ''))"
        ).alias("__q_np"),
        _F.expr(f"nullif(length({text_sql}), 0)").alias("__q_nc"),
    )
    ratios = counts.select(
        "*",
        round_div("__q_nd", "__q_nt", 4).alias("ttr"),
        round_div("__q_ns", "__q_nt", 4).alias("stop_ratio"),
        round_div("__q_np", "__q_nc", 4).alias("punct_ratio"),
    )
    return ratios.select(
        "*",
        _F.col("__q_nt").alias("n_tokens"),
        _F.round(
            0.4 * _F.col("ttr")
            + 0.4 * _F.col("stop_ratio")
            + 0.2 * (1 - _F.col("punct_ratio")),
            4,
        ).alias("quality"),
    ).drop("__q_nt", "__q_nd", "__q_ns", "__q_np", "__q_nc")


def quality_features_sql(expr: str) -> dict[str, str]:
    from .rounding import oracle_round_div

    toks = tokens_sql(expr)
    stop = _stopword_count_sql(toks, STOPWORDS["en"])
    ttr = oracle_round_div(f"len(list_distinct({toks}))", f"len({toks})", 4)
    stop_ratio = oracle_round_div(stop, f"len({toks})", 4)
    punct_ratio = oracle_round_div(
        f"length(regexp_replace({expr}, '[A-Za-z0-9 ]', '', 'g'))",
        f"nullif(length({expr}), 0)",
        4,
    )
    return {
        "n_tokens": f"len({toks})",
        "ttr": ttr,
        "stop_ratio": stop_ratio,
        "punct_ratio": punct_ratio,
        "quality": f"round(0.4 * {ttr} + 0.4 * {stop_ratio} + 0.2 * (1 - {punct_ratio}), 4)",
    }


# -- document fingerprint --------------------------------------------------
def fingerprint(text: Column) -> Column:
    """Order-sensitive rolling polynomial hash over token hashes, mod a
    31-bit prime (no bigint overflow under ANSI: acc*31 + h < 2^36+2^28)."""
    hs = F.transform(
        tokens(text),
        lambda tk: F.conv(F.substring(F.md5(tk), 1, 7), 16, 10).cast("long"),
    )
    return F.aggregate(
        hs,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % MINHASH_PRIME,
    )


def fingerprint_sql(expr: str) -> str:
    toks = tokens_sql(expr)
    hs = f"list_transform({toks}, tk -> ('0x' || substring(md5(tk), 1, 7))::BIGINT)"
    # list_reduce seeds from element 1 → prepend the 0 init to mirror
    # Spark's aggregate(hs, 0, f) left fold exactly. The NULL-text CASE
    # mirrors Spark's NULL propagation: aggregate(NULL, ...) is NULL,
    # but DuckDB's list_concat SWALLOWS a NULL list and the fold would
    # return the 0 seed — a missing document must have a missing
    # fingerprint, not fingerprint 0 (degenerate-parity sweep, round 7).
    return (
        f"CASE WHEN {expr} IS NULL THEN NULL ELSE "
        f"list_reduce(list_concat([CAST(0 AS BIGINT)], {hs}),"
        f" (acc, x) -> (acc * 31 + x) % {MINHASH_PRIME}) END"
    )
