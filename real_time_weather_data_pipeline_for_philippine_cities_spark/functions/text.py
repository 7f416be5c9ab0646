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
def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword / type-token-ratio features and a
    composite score — the classic cheap quality filter for web-scale text."""
    toks = tokens(text)
    n_tokens = F.size(toks)
    # nullif guard: an EMPTY document has length 0 and ANSI division by
    # zero aborts the whole job (found by the weird-content sweep,
    # tests/test_empty_inputs.py) — a 100 TB crawl always contains empty
    # docs. NULL ratio for a char-less doc is the honest value; DuckDB
    # twin mirrors with the same nullif. n_tokens needs no guard:
    # split() never returns an empty array (empty text -> ['']).
    n_chars = F.nullif(F.length(text), F.lit(0))
    ttr = F.round(F.size(F.array_distinct(toks)) / n_tokens, 4)
    stop_ratio = F.round(_stopword_count(toks, STOPWORDS["en"]) / n_tokens, 4)
    # Case-insensitivity via the CHARACTER CLASS, not lower(): JVM and
    # utf8proc case-mapping tables disagree on expanding characters
    # (Java lower('İ') is 'i'+combining-dot, DuckDB's is plain 'i'), so
    # a lower()-then-strip ratio silently diverges on unicode corpora
    # (unicode fuzz, round 7). Explicit codepoint ranges are identical
    # in both regex engines; ASCII corpora get the same value as before.
    punct_ratio = F.round(
        F.length(F.regexp_replace(text, "[A-Za-z0-9 ]", "")) / n_chars, 4
    )
    quality = F.round(
        0.4 * ttr + 0.4 * stop_ratio + 0.2 * (1 - punct_ratio), 4
    )
    return {
        "n_tokens": n_tokens,
        "ttr": ttr,
        "stop_ratio": stop_ratio,
        "punct_ratio": punct_ratio,
        "quality": quality,
    }


def quality_features_sql(expr: str) -> dict[str, str]:
    toks = tokens_sql(expr)
    stop = _stopword_count_sql(toks, STOPWORDS["en"])
    return {
        "n_tokens": f"len({toks})",
        "ttr": f"round(len(list_distinct({toks}))::DOUBLE / len({toks}), 4)",
        "stop_ratio": f"round({stop}::DOUBLE / len({toks}), 4)",
        "punct_ratio": (
            f"round(length(regexp_replace({expr}, '[A-Za-z0-9 ]', '', 'g'))::DOUBLE"
            f" / nullif(length({expr}), 0), 4)"
        ),
        "quality": (
            f"round(0.4 * round(len(list_distinct({toks}))::DOUBLE / len({toks}), 4)"
            f" + 0.4 * round({stop}::DOUBLE / len({toks}), 4)"
            f" + 0.2 * (1 - round(length(regexp_replace({expr}, '[A-Za-z0-9 ]', '', 'g'))::DOUBLE"
            f" / nullif(length({expr}), 0), 4)), 4)"
        ),
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
