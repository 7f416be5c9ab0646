"""Corpus-curation queries: inverted index, canonical-copy selection,
PII scanning, embedding quantization.

These extend the LLM-data-pipeline surface (SURVEY.md §7.6) with the
remaining curation steps a pretraining corpus pass runs: build a term
index for retrieval/attribution, pick one canonical copy per duplicate
cluster, scan/redact PII, and int8-quantize embeddings for a compact ANN
index. Every query is pure Catalyst expressions (zero Python in the row
path) with a DuckDB oracle twin.

Cross-engine determinism contracts (see plans/base.py and the
operators/similarity.py fold conventions):
  * ranking ties are resolved via INTEGER key encoding (``v * K - id``),
    never via float comparison or engine-specific argmax;
  * float reductions use the shared sequential ascending fold and are
    rounded to 6 dp on both sides; elementwise IEEE double ops
    (widen/multiply/divide/round) are bit-identical across engines so
    intermediate values need no rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import (
    oracle_quantize_double,
    oracle_round_div,
    quantize_domain_guard,
    quantize_double,
    round_div,
)
from ..functions.text import attach_quality_features, quality_features_sql
from ..operators.similarity import (
    _fold_sum_duck,
    _fold_sum_spark,
    finite_vec_pred,
    finite_vec_sql,
    vec_double_col,
    vec_double_sql,
)
from .base import Q, assert_id_domain, spread, t

#: doc_id / vec_id upper bound used for integer rank-key encoding; testdata
#: ids stay far below this even at the 10x scaled corpus.
ID_CAP = 10_000_000_000
EMB_DIM = 64


# -- inverted index statistics ---------------------------------------------
def q_inverted_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list statistics per term: document frequency, total term
    frequency, and the top document (highest tf, ties -> lowest doc_id).

    The top document comes from ``max(tf * ID_CAP - doc_id)`` — a pure
    integer encoding, so no window, no float argmax, and the whole query
    is two map-combinable groupBys (term,doc) -> (term): the classic
    scan-scaling index build. 100 TB: stopword terms produce hot
    reduce keys for the *count*, which partial aggregation absorbs
    map-side; nothing materializes a posting list wider than one row.
    """
    docs = assert_id_domain(
        spread(t(spark, sf_dir, "documents")),
        "doc_id", ID_CAP, "inverted_index_stats",
    )
    tf = (
        docs.select("doc_id", F.explode(F.split(F.lower("text"), " +")).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    agg = tf.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("total_tf"),
        F.max(F.col("tf") * F.lit(ID_CAP) - F.col("doc_id")).alias("topkey"),
    )
    return agg.select(
        "term",
        "df",
        "total_tf",
        F.expr(f"(topkey + {ID_CAP} - 1) div {ID_CAP}").alias("top_tf"),
        F.expr(
            f"((topkey + {ID_CAP} - 1) div {ID_CAP}) * {ID_CAP} - topkey"
        ).alias("top_doc_id"),
    )


_INVERTED_INDEX_SQL = f"""
WITH tf AS (
  SELECT term, doc_id, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split_regex(lower(text), ' +')) AS term
        FROM documents)
  GROUP BY term, doc_id),
agg AS (
  SELECT term,
         CAST(count(*) AS BIGINT) AS df,
         CAST(sum(tf) AS BIGINT) AS total_tf,
         max(tf * {ID_CAP} - doc_id) AS topkey
  FROM tf GROUP BY term)
SELECT term, df, total_tf,
       CAST((topkey + {ID_CAP} - 1) // {ID_CAP} AS BIGINT) AS top_tf,
       CAST(((topkey + {ID_CAP} - 1) // {ID_CAP}) * {ID_CAP} - topkey
            AS BIGINT) AS top_doc_id
FROM agg
"""


# -- canonical-copy selection within exact-duplicate clusters ---------------
def q_canonical_doc_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every document, the canonical copy of its exact-duplicate
    cluster (same md5(text)): the member with the MOST characters, ties ->
    lowest doc_id — the "keep the richest copy" dedup policy, vs
    dedup_exact's keep-any.

    Shape: ONE exchange on the text hash; group size and winner come from
    count/max windows over the hash partition (cluster sizes are bounded
    by duplication multiplicity, not corpus size), which beats the
    aggregate+join-back form — that shuffles the doc spine twice and
    hashes the text per consumer (collapse-first rule, see
    substring_dup_spans). The integer key ``n_chars * ID_CAP - doc_id``
    makes the winner engine-independent."""
    from pyspark.sql import Window

    docs = assert_id_domain(
        t(spark, sf_dir, "documents"), "doc_id", ID_CAP, "canonical_doc_assign"
    )
    # no text, no cluster: a NULL-text doc has no content hash. The window
    # form would otherwise emit it as its own NULL-keyed group while the
    # oracle's equi-join on h drops it (degenerate-parity sweep, round 7).
    docs = docs.filter(F.col("text").isNotNull())
    keyed = docs.select(
        "doc_id",
        F.md5("text").alias("h"),
        (F.col("n_chars") * F.lit(ID_CAP) - F.col("doc_id")).alias("k"),
    )
    w = Window.partitionBy("h")
    return (
        keyed.withColumn("group_size", F.count(F.lit(1)).over(w))
        .withColumn("winkey", F.max("k").over(w))
        .select(
            "doc_id",
            F.expr(
                f"((winkey + {ID_CAP} - 1) div {ID_CAP}) * {ID_CAP} - winkey"
            ).alias("canonical_doc_id"),
            "group_size",
        )
        .withColumn(
            "is_canonical", (F.col("doc_id") == F.col("canonical_doc_id"))
        )
    )


_CANONICAL_SQL = f"""
WITH keyed AS (
  SELECT doc_id, md5(text) AS h, n_chars * {ID_CAP} - doc_id AS k
  FROM documents WHERE text IS NOT NULL),
groups AS (
  SELECT h, CAST(count(*) AS BIGINT) AS group_size, max(k) AS winkey
  FROM keyed GROUP BY h)
SELECT doc_id,
       CAST(((winkey + {ID_CAP} - 1) // {ID_CAP}) * {ID_CAP} - winkey
            AS BIGINT) AS canonical_doc_id,
       group_size,
       doc_id = CAST(((winkey + {ID_CAP} - 1) // {ID_CAP}) * {ID_CAP} - winkey
                     AS BIGINT) AS is_canonical
FROM keyed JOIN groups USING (h)
"""


# -- PII scan / redaction accounting ---------------------------------------
# Patterns stay inside the regex dialect intersection of Java (Spark) and
# RE2 (DuckDB): character classes, bounded repetition, \\d, word boundary.
# The three categories are DISJOINT by construction (email requires '@',
# which the other two classes exclude; phone requires a leading '+', which
# ipv4 excludes) — what makes the single-pass classification below exact.
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d[\d -]{7,}\d",
}

#: One combined alternation — the only regex that ever touches the full
#: text. Both engines (Java regex / RE2) use leftmost-first alternation
#: with identical greediness, so the match stream is cross-engine exact.
PII_COMBINED = "(?:" + ")|(?:".join(PII_PATTERNS.values()) + ")"


def pii_match_col(text_col: str = "text") -> F.Column:
    """The single combined-alternation scan — the only regex that touches
    the full text. PROJECT it once below the per-category columns (the
    hash-once pattern): inlining it into each count would show 4
    regexp_extract_all in the plan and lean on runtime subexpression
    elimination instead of the plan itself."""
    return F.regexp_extract_all(F.col(text_col), F.lit(PII_COMBINED), F.lit(0))


def pii_columns(ms_col: str = "__pii_ms", len_col: str = "__pii_len") -> dict[str, F.Column]:
    """Per-category match counts plus the redacted length, from the
    pre-projected match array (VERDICT r05 #7 — the former form ran one
    regexp_count per category plus a chained regexp_replace cascade: 6
    full-text regex passes; now ONE, via ``pii_match_col``).

    Semantics: one leftmost-first scan; each non-overlapping match is
    classified by anchored full-match against its (disjoint) category,
    and ``redacted_len = len(text) - Σ len(match)`` — exact because
    single-scan matches never overlap. The per-match classification
    regexes run on match-sized strings (tens of chars), not documents.
    """
    ms = F.col(ms_col)
    cols: dict[str, F.Column] = {}
    for name, pat in PII_PATTERNS.items():
        anchored = f"^(?:{pat})$"
        # the HOF lambda must be unary (PySpark infers arity to decide
        # whether to pass an index); a factory pins this iteration's
        # pattern without a second parameter.
        def _is(pat_anchored: str):
            return lambda m: m.rlike(pat_anchored)

        cols[f"n_{name}"] = F.size(F.filter(ms, _is(anchored))).cast("long")
    cols["redacted_len"] = (
        F.col(len_col)
        - F.aggregate(F.transform(ms, F.length), F.lit(0), lambda a, x: a + x)
    ).cast("long")
    return cols


def pii_sql_exprs(ms_col: str = "ms", len_col: str = "l") -> list[str]:
    """DuckDB twin of ``pii_columns`` — same anchored classification and
    arithmetic redaction length over a pre-projected match array (the twin
    mirrors the project-once structure so its cost is also one scan)."""
    exprs = []
    for name, pat in PII_PATTERNS.items():
        exprs.append(
            f"CAST(len(list_filter({ms_col},"
            f" m -> regexp_full_match(m, '{pat}'))) AS BIGINT) AS n_{name}"
        )
    exprs.append(
        f"CAST({len_col} - coalesce(list_sum(list_transform("
        f"{ms_col}, m -> len(m))), 0) AS BIGINT) AS redacted_len"
    )
    return exprs


def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count + redact PII patterns (email / IPv4 / phone) per document via
    ONE combined-alternation scan projected below the counts (plan-pinned:
    exactly one regexp_extract_all, no replace cascade, no shuffle beyond
    spread). The synthetic corpus is PII-free by construction, so the
    catalog run proves the cross-engine regex-dialect contract while the
    planted-structure test (tests/test_corpus_queries.py) proves detection
    on real matches, Spark AND DuckDB."""
    docs = spread(t(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id",
        F.length("text").alias("__pii_len"),
        pii_match_col("text").alias("__pii_ms"),
    )
    cols = pii_columns()
    return base.select("doc_id", *[c.alias(n) for n, c in cols.items()])


_PII_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, len(text) AS l,
         regexp_extract_all(text, '{PII_COMBINED}') AS ms
  FROM documents)
SELECT doc_id, {", ".join(pii_sql_exprs())}
FROM base
"""


# -- URL / domain accounting ------------------------------------------------
#: Dialect-intersection URL pattern (Java + RE2): non-capturing groups only
#: — a capturing group would change what regexp_extract_all returns.
URL_PATTERN = r"https?://[a-zA-Z0-9.-]+(?:/[^ ]*)?"
_DOMAIN_PATTERN = r"https?://([a-zA-Z0-9.-]+)"


def q_url_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document URL accounting — the web-corpus curation scan that
    feeds domain blocklists and per-domain mixture caps: URL match count
    and distinct lower-cased domain count, pure regexp/array expressions
    (scan-scaling, like the PII scan). The synthetic corpus is URL-free,
    so the catalog run proves the cross-engine regex/array contract on
    the zero lattice; the planted-structure test proves detection and
    domain normalization."""
    docs = spread(t(spark, sf_dir, "documents"))
    urls = F.regexp_extract_all(F.col("text"), F.lit(URL_PATTERN), F.lit(0))
    domains = F.array_distinct(
        F.transform(
            urls, lambda u: F.lower(F.regexp_extract(u, _DOMAIN_PATTERN, 1))
        )
    )
    return docs.select(
        "doc_id",
        F.size(urls).cast("long").alias("n_urls"),
        F.size(domains).cast("long").alias("n_domains"),
    )


_URL_SQL = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{URL_PATTERN}')) AS BIGINT) AS n_urls,
       CAST(len(list_distinct(list_transform(
              regexp_extract_all(text, '{URL_PATTERN}'),
              u -> lower(regexp_extract(u, '{_DOMAIN_PATTERN}', 1)))))
            AS BIGINT) AS n_domains
FROM documents
"""


# -- int8 embedding quantization + reconstruction error --------------------
def q_embedding_quantize_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of each embedding
    (``q_i = round(x_i * 127 / max|x|)``) with reconstruction-error stats —
    the compression step before shipping an ANN index. Elementwise IEEE
    double math is bit-identical across engines (same parquet floats
    widened, same op order), the integer checksum pins the full quantized
    vector, and the float error sums use the shared ascending fold + 6 dp
    rounding. Map-side only: zero shuffles, scan-scaling."""
    emb = t(spark, sf_dir, "embeddings")
    # well-formed-vector ingestion (finite_vec_pred), oracle-mirrored: a
    # single NaN component makes s NaN and the int8 cast an ANSI abort.
    v = emb.filter(finite_vec_pred("embedding", EMB_DIM)).select(
        F.col("vec_id"), vec_double_col("embedding").alias("v")
    ).withColumn("s", F.expr("array_max(transform(v, x -> abs(x)))"))
    # the all-zero vector has no quantization scale (x*127/0 is an Inf
    # cast abort on both engines): undefined by contract, dropped.
    q = v.filter(F.col("s") > 0).withColumn(
        "qv",
        F.expr("transform(v, x -> CAST(round(x * 127.0D / s) AS BIGINT))"),
    )
    err = "zip_with(v, qv, (x, q) -> abs(x - q * s / 127.0D))"
    checksum = (
        f"aggregate(zip_with(qv, sequence(1, {EMB_DIM}), (q, i) -> q * i), "
        "CAST(0 AS BIGINT), (a, x) -> a + x)"
    )
    # pre-project the error folds into NAMED columns, then guarded
    # engine-identical quantize (errors scale with the component
    # magnitude, which is unbounded) — tie-margin audit, final batch.
    return q.select(
        "vec_id",
        F.col("s").alias("scale"),
        F.expr(checksum).alias("q_checksum"),
        F.expr(_fold_sum_spark(err)).alias("_sae"),
        F.expr(f"array_max({err})").alias("_mae"),
    ).select(
        "vec_id",
        "scale",
        "q_checksum",
        quantize_double(quantize_domain_guard("_sae", 6), 6).alias("sum_abs_err"),
        quantize_double(quantize_domain_guard("_mae", 6), 6).alias("max_abs_err"),
    )


_QUANT_ERR_DUCK = (
    "list_transform(range(1, {dim}), i -> abs(v[i] - qv[i] * s / 127.0))"
).format(dim=EMB_DIM + 1)

_QUANTIZE_SQL = f"""
WITH base AS (
  SELECT vec_id, {vec_double_sql('embedding')} AS v
  FROM embeddings WHERE {finite_vec_sql('embedding', EMB_DIM)}),
scaled AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) AS s
  FROM base),
quant AS (
  SELECT vec_id, v, s,
         list_transform(v, x -> CAST(round(x * 127.0 / s) AS BIGINT)) AS qv
  FROM scaled WHERE s > 0),
errs AS (
  SELECT vec_id,
         s AS scale,
         CAST({_fold_sum_duck(f"list_transform(range(1, {EMB_DIM + 1}), i -> qv[i] * i)")}
              AS BIGINT) AS q_checksum,
         {_fold_sum_duck(_QUANT_ERR_DUCK)} AS _sae,
         list_max({_QUANT_ERR_DUCK}) AS _mae
  FROM quant)
SELECT vec_id, scale, q_checksum,
       {oracle_quantize_double(quantize_domain_guard('_sae', 6), 6)} AS sum_abs_err,
       {oracle_quantize_double(quantize_domain_guard('_mae', 6), 6)} AS max_abs_err
FROM errs
"""


# -- mixture resampling to equal per-cell quotas ---------------------------
def q_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance the corpus toward EQUAL (lang, source) cell sizes: each
    cell's acceptance rate is ``min(1, target/count)`` with
    ``target = total div n_cells``, and a document is kept iff its salted
    md5 bucket falls under the rate — the deterministic counterpart of the
    mixture-weighting step a data-mixing stage runs after
    ``mixture_report``.

    All rates are INTEGER basis points (``(target*10000) div n_g``), so
    both engines compute identical thresholds with no float division; the
    hash-bucket keep-set is a pure function of doc_id (rerun/repartition
    stable — the same contract as ``stratified_sample``,
    operators/dedup.py:240). Shape: one map-combined groupBy over the tiny
    cell lattice, a window over that lattice (dozens of rows), and one
    broadcast-sized join back to the doc spine. 100 TB: the only
    corpus-scale pass is the final filter scan."""
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    w = Window.partitionBy()
    cells = (
        docs.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_g"))
        .withColumn("target", F.expr("sum(n_g) OVER () div count(1) OVER ()"))
        .select(
            "lang",
            "source",
            F.when(F.col("n_g") <= F.col("target"), F.lit(10000).cast("long"))
            .otherwise(F.expr("(target * 10000) div n_g"))
            .alias("rate_bp"),
        )
    )
    bucket = F.expr(
        "CAST(conv(substring(md5(concat('mix', CAST(doc_id AS STRING))), 1, 7),"
        " 16, 10) AS LONG) % 10000"
    )
    return (
        docs.join(F.broadcast(cells), ["lang", "source"])
        .where(bucket < F.col("rate_bp"))
        .select("doc_id", "lang", "source", "rate_bp")
    )


_MIXTURE_RESAMPLE_SQL = """
WITH cells AS (
  SELECT lang, source, count(*) AS n_g FROM documents GROUP BY lang, source),
rates AS (
  SELECT lang, source,
         CAST(CASE WHEN n_g <= sum(n_g) OVER () // count(*) OVER ()
                   THEN 10000
                   ELSE ((sum(n_g) OVER () // count(*) OVER ()) * 10000) // n_g
              END AS BIGINT) AS rate_bp
  FROM cells)
SELECT doc_id, lang, source, rate_bp
FROM documents JOIN rates USING (lang, source)
WHERE ('0x' || substring(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT
      % 10000 < rate_bp
"""


# -- quality-filter decision ------------------------------------------------
#: (bit, name) -> the reason a document is dropped. Thresholds compare the
#: 4-dp-rounded features from functions/text.py::quality_features, so the
#: booleans are engine-identical by construction.
QUALITY_RULES: tuple[tuple[int, str], ...] = (
    (0, "too_short"),       # n_tokens < 10
    (1, "too_long"),        # n_tokens > 5000
    (2, "low_ttr"),         # ttr < 0.30
    (3, "low_stopword"),    # stop_ratio < 0.02
    (4, "high_punct"),      # punct_ratio > 0.20
    (5, "bad_tok_len"),     # mean token length outside [2.5, 12]
)


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style keep/drop decision per document with a reason
    bitmask — the actionable form of ``quality_score``: ``keep`` is true
    iff no rule fires, and ``reasons`` says exactly which fired (bit i =
    QUALITY_RULES[i]). Pure map-side codegen expressions, scan-scaling."""
    docs = spread(t(spark, sf_dir, "documents"))
    # staged attach: tokenize once per row (see attach_quality_features).
    # mean_tok_len is an integer ratio (n_chars / n_tokens) quantized at
    # 4 dp through the exact integer-space template (tie-margin batch,
    # round 8) — round() on the raw double was a per-landed-half engine
    # lottery, the class the sf1/sf10 strict sweeps caught 7 times.
    base = attach_quality_features(docs).select(
        "doc_id",
        "n_tokens",
        "ttr",
        "stop_ratio",
        "punct_ratio",
        round_div("n_chars", "n_tokens", 4).alias("mean_tok_len"),
    )
    flags = [
        F.col("n_tokens") < 10,
        F.col("n_tokens") > 5000,
        F.col("ttr") < 0.30,
        F.col("stop_ratio") < 0.02,
        F.col("punct_ratio") > 0.20,
        (F.col("mean_tok_len") < 2.5) | (F.col("mean_tok_len") > 12.0),
    ]
    reasons = None
    for bit, flag in enumerate(flags):
        term = F.when(flag, F.lit(1 << bit)).otherwise(F.lit(0))
        reasons = term if reasons is None else reasons + term
    return base.select(
        "doc_id",
        "n_tokens",
        "mean_tok_len",
        reasons.cast("long").alias("reasons"),
        (reasons == 0).alias("keep"),
    )


_QF = quality_features_sql("text")
_QUALITY_FILTER_SQL = f"""
WITH base AS (
  SELECT doc_id,
         CAST({_QF['n_tokens']} AS BIGINT) AS n_tokens,
         {_QF['ttr']} AS ttr,
         {_QF['stop_ratio']} AS stop_ratio,
         {_QF['punct_ratio']} AS punct_ratio,
         {oracle_round_div('n_chars', _QF['n_tokens'], 4)} AS mean_tok_len
  FROM documents),
scored AS (
  SELECT doc_id, n_tokens, mean_tok_len,
         CAST(  (CASE WHEN n_tokens < 10 THEN 1 ELSE 0 END)
              + (CASE WHEN n_tokens > 5000 THEN 2 ELSE 0 END)
              + (CASE WHEN ttr < 0.30 THEN 4 ELSE 0 END)
              + (CASE WHEN stop_ratio < 0.02 THEN 8 ELSE 0 END)
              + (CASE WHEN punct_ratio > 0.20 THEN 16 ELSE 0 END)
              + (CASE WHEN mean_tok_len < 2.5 OR mean_tok_len > 12.0
                      THEN 32 ELSE 0 END) AS BIGINT) AS reasons
  FROM base)
SELECT doc_id, n_tokens, mean_tok_len, reasons, reasons = 0 AS keep
FROM scored
"""


# -- cross-document repeated substrings ------------------------------------
#: Shingle width for substring-duplication detection: 8 consecutive words
#: at EVERY word position (stride 1 in word space). Stride 1 is what makes
#: the guarantee real: any run of >= 8 shared consecutive words contains an
#: identical shingle in both documents regardless of where the run starts.
#: A fixed-stride character grid (the tempting cheaper variant) silently
#: misses cross-doc runs whose offsets differ by a non-multiple of the
#: stride — alignment is content-defined, not grid-defined.
SHINGLE_WORDS = 8


def q_substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-substring accounting — the shingle-hash
    form of substring-level dedup ('dedup training data at the substring
    level') done distributively: every document explodes into word-level
    8-gram shingles at every position, shingles hash with md5, and a
    shingle instance is SHARED when its hash occurs in >= 2 distinct
    documents. Output per doc: shingle count, shared count, shared ratio
    (4dp) — the per-doc duplication profile a curation pass thresholds on.

    Scale shape: the explode is a x(words-7) row fan-out computed
    map-side (no shuffle); ONE map-combined groupBy collapses the stream
    to (hash, doc, cnt) rows, the cross-doc occurrence count nd is a
    window over the hash key on that already-collapsed relation, and the
    per-doc rollup is a plain groupBy — three exchanges, one scan, no
    join. (The previous join-back encoding re-ran the shingle map stage
    per consumer and shuffled the UNCOLLAPSED window stream a second
    time: measured ~4x slower at sf1 for identical output.) A hot
    stop-phrase hash puts its <= |docs| collapsed rows in one window
    partition — count-only, absorbed.
    """
    docs = spread(t(spark, sf_dir, "documents"))
    # Explode the start index FIRST and hash row-wise: md5/concat_ws then
    # run inside WholeStageCodegen. The tempting one-expression form —
    # transform(sequence(...), i -> md5(...)) — evaluates the lambda body
    # interpreted (HOF closures sit outside codegen) and measures ~4x
    # slower for identical output.
    # no text, no shingles: Spark's concat_ws over a NULL slice collapses
    # to md5('') (one phantom shingle) while the oracle's range over a
    # NULL length unnests to nothing (degenerate-parity sweep, round 7).
    wins = (
        docs.filter(F.col("text").isNotNull())
        .select("doc_id", F.split(F.col("text"), " ").alias("ts"))
        .select(
            "doc_id",
            "ts",
            F.explode(
                F.sequence(
                    F.lit(1), F.greatest(F.lit(1), F.size("ts") - (SHINGLE_WORDS - 1))
                )
            ).alias("i"),
        )
        .select(
            "doc_id",
            F.md5(F.concat_ws(" ", F.expr(f"slice(ts, i, {SHINGLE_WORDS})"))).alias("h"),
        )
    )
    from pyspark.sql import Window

    pairs = wins.groupBy("h", "doc_id").agg(F.count(F.lit(1)).alias("cnt"))
    nd = pairs.withColumn(
        "nd", F.count(F.lit(1)).over(Window.partitionBy("h"))
    )
    return (
        nd.groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_windows"),
            F.sum(F.when(F.col("nd") >= 2, F.col("cnt")).otherwise(0)).alias(
                "n_shared"
            ),
        )
        .select(
            "doc_id",
            "n_windows",
            "n_shared",
            # integer ratio -> exact integer-space 4-dp quantization
            # (tie-margin batch, round 8; 1/32-style true halves split
            # the engines under plain round-on-double)
            round_div("n_shared", "n_windows", 4).alias("shared_ratio"),
        )
    )


# DuckDB twin: 1-based inclusive list slice ts[s : s+7] == Spark
# slice(toks, s, 8) (both clamp short tails; docs under 8 words produce
# exactly one whole-doc shingle on each engine).
_SUBSTR_DUP_SQL = f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
  WHERE text IS NOT NULL),
wins AS (
  SELECT doc_id,
         unnest(list_transform(
           range(1, greatest(1, len(ts) - {SHINGLE_WORDS - 1}) + 1),
           s -> md5(list_aggregate(
                  ts[CAST(s AS INTEGER):CAST(s + {SHINGLE_WORDS - 1} AS INTEGER)],
                  'string_agg', ' ')))) AS h
  FROM tok),
hash_docs AS (
  SELECT h, count(*) AS nd
  FROM (SELECT DISTINCT h, doc_id FROM wins) GROUP BY h)
SELECT w.doc_id,
       count(*) AS n_windows,
       CAST(sum(CASE WHEN hd.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       {oracle_round_div('sum(CASE WHEN hd.nd >= 2 THEN 1 ELSE 0 END)',
                         'count(*)', 4)} AS shared_ratio
FROM wins w JOIN hash_docs hd USING (h)
GROUP BY w.doc_id
"""


# -- training shard assignment ----------------------------------------------
N_SHARDS = 8


def q_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document to one of N training shards and report the
    per-shard balance: round-robin over the deterministic md5 permutation
    (``global_order_positions`` — 256 bucket-parallel windows, no global
    sort), so shards are near-balanced in BOTH doc count and token mass
    without any bin-packing pass, stable under reruns/repartitioning, and
    any engine with md5 reproduces the same assignment. The per-shard
    aggregate is the balance report a shard-writer would log before
    emitting N output files."""
    from ..operators.relational import global_order_positions

    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    pos = global_order_positions(
        docs,
        key=F.md5(F.concat(F.lit("shard"), F.col("doc_id").cast("string"))),
        tiebreak="doc_id",
        pos_col="pos",
    )
    return (
        pos.withColumn("shard_id", (F.col("pos") - 1) % N_SHARDS)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_chars").cast("long")).alias("n_chars_total"),
        )
    )


_SHARDS_SQL = f"""
WITH p AS (
  SELECT doc_id, n_chars,
         row_number() OVER (ORDER BY md5('shard' || CAST(doc_id AS VARCHAR)),
                            doc_id) AS pos
  FROM documents)
SELECT (pos - 1) % {N_SHARDS} AS shard_id, count(*) AS n_docs,
       CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS n_chars_total
FROM p GROUP BY 1
"""


# -- vocabulary coverage / OOV rate -----------------------------------------
VOCAB_SIZE = 100


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus's top-V
    words — the tokenizer-coverage metric a pretraining mixture tracks
    (high OOV => the doc's token distribution diverges from the corpus).

    Scale shape: the top-V cut is orderBy+limit, which Spark executes as
    TakeOrderedAndProject (per-partition top-V merged on the driver —
    V rows of driver state, NO global sort of the word-frequency table);
    the vocab is then a bounded broadcast and the OOV accounting is one
    map-combined groupBy per doc. Ties at the V-th slot break by word
    ascending on both engines. spread() before the tokenize: the explode
    chain otherwise runs at single-file scan parallelism (measured
    2.1 s → 1.0 s at sf1)."""
    docs = spread(t(spark, sf_dir, "documents").select("doc_id", "text"))
    words = docs.select("doc_id", F.explode(F.split(F.lower("text"), " +")).alias("w"))
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("w").asc())
        .limit(VOCAB_SIZE)
        .select("w", F.lit(1).alias("in_vocab"))
    )
    return (
        words.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            # integer ratio -> exact 4-dp quantization (tie-margin batch)
            round_div("n_oov", "n_tokens", 4).alias("oov_rate"),
        )
    )


_VOCAB_SQL = f"""
WITH words AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), ' +')) AS w FROM documents),
vocab AS (
  SELECT w FROM (SELECT w, count(*) AS cnt FROM words GROUP BY w
                 ORDER BY cnt DESC, w ASC LIMIT {VOCAB_SIZE}))
SELECT doc_id, count(*) AS n_tokens,
       CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       {oracle_round_div('sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END)',
                         'count(*)', 4)} AS oov_rate
FROM words LEFT JOIN vocab v USING (w)
GROUP BY doc_id
"""


# -- curriculum binning: per-language length quartiles ----------------------
def q_curriculum_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each document a 1..4 curriculum bin by its length quartile
    WITHIN its language. The naive encoding — ``ntile(4) OVER (PARTITION BY
    lang ORDER BY ...)`` — serializes each language's whole corpus through
    one window task; instead the quartile boundaries are aggregated onto a
    per-language lattice (rows = |langs|, map-combined percentile),
    broadcast back, and the bin is a map-side comparison — scan-scaling at
    any corpus size. Boundaries are rounded to 4dp on both engines so the
    comparisons agree bitwise."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    bounds = docs.groupBy("lang").agg(
        F.expr(
            "transform(percentile(n_chars, array(0.25, 0.5, 0.75)), x -> round(x, 4))"
        ).alias("qs")
    )
    return docs.join(F.broadcast(bounds), "lang").select(
        "doc_id",
        "lang",
        "n_chars",
        (
            F.lit(1)
            + (F.col("n_chars") > F.col("qs")[0]).cast("long")
            + (F.col("n_chars") > F.col("qs")[1]).cast("long")
            + (F.col("n_chars") > F.col("qs")[2]).cast("long")
        ).alias("curriculum_bin"),
    )


_CURRICULUM_SQL = """
WITH b AS (
  SELECT lang, round(quantile_cont(n_chars, 0.25), 4) AS q1,
         round(quantile_cont(n_chars, 0.5), 4) AS q2,
         round(quantile_cont(n_chars, 0.75), 4) AS q3
  FROM documents GROUP BY lang)
SELECT doc_id, d.lang, n_chars,
       1 + CAST(n_chars > q1 AS BIGINT) + CAST(n_chars > q2 AS BIGINT)
         + CAST(n_chars > q3 AS BIGINT) AS curriculum_bin
FROM documents d JOIN b USING (lang)
"""


# -- weighted systematic sampling: token-budget subsample -------------------
SAMPLE_K = 150


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pick ~150 documents with probability proportional to length
    (n_chars) — the deterministic token-budget subsample. The operator's
    bucket-lattice cumsum replaces the oracle's single global window, so
    the Spark side holds at corpus scale; see
    operators/dedup.py::weighted_systematic_sample."""
    from ..operators.dedup import weighted_systematic_sample

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "source", "n_chars")
    return weighted_systematic_sample(docs, weight_col="n_chars", k=SAMPLE_K)


def _weighted_sample_sql() -> str:
    from ..operators.dedup import weighted_systematic_sample_sql

    return weighted_systematic_sample_sql(
        "(SELECT doc_id, lang, source, n_chars FROM documents)",
        weight_col="n_chars",
        k=SAMPLE_K,
    )


# -- per-doc unigram Shannon entropy ----------------------------------------
def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc Shannon entropy of the unigram distribution — the
    low-diversity / template-spam quality signal that repetition_score
    (3-gram repeats, llm_queries.py) does not capture: a doc cycling two
    tokens has near-zero entropy but can still have many distinct 3-grams.

    H = ln(n) - sum(c*ln c)/n over per-doc token counts, so the float
    reduction runs over ~vocab-size terms per doc and is rounded to 6 dp on
    both engines (base.py rounding policy; counts themselves are exact
    integers). Plan: explode -> two map-combined groupBys, both keyed by
    doc_id, so the second agg reuses the first's hash partitioning — one
    shuffle of (doc_id, token) pairs is the whole cost, scan-scaling at
    100 TB."""
    docs = spread(t(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " +")).alias("tok")
    )
    cnt = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    # pre-project H into a NAMED column, then engine-identical quantize
    # (no guard: H is bounded by ln(n_tokens) << 1e14) — tie-margin
    # audit, final batch.
    return cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_unique"),
        (
            F.log(F.sum("c")) - F.sum(F.col("c") * F.log("c")) / F.sum("c")
        ).alias("_h"),
    ).select(
        "doc_id",
        "n_tokens",
        "n_unique",
        quantize_double("_h", 6).alias("token_entropy"),
    )


_TOKEN_ENTROPY_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), ' +')) AS tok
  FROM documents),
cnt AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok),
h AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_unique,
         ln(sum(c)) - sum(c * ln(c)) / sum(c) AS _h
  FROM cnt GROUP BY doc_id)
SELECT doc_id, n_tokens, n_unique,
       {oracle_quantize_double('_h', 6)} AS token_entropy
FROM h
"""


# -- corpus novelty curve (new-shingle fraction per doc) ---------------------
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction of each doc's distinct 3-gram shingles never seen in any
    earlier doc (doc_id = arrival order) — the corpus-growth/novelty-decay
    accounting a curation pass runs to decide when more of a source stops
    adding new content.

    Shares the dedup ops' 28-bit shingle hashing (operators/dedup.py), so
    "same shingle" is byte-identical with the near-dup family. Plan: one
    shuffle on the shingle hash for the min-doc_id window, one map-combined
    groupBy on doc_id. first_seen is an exact integer min — no float
    tie-break — so the curve is deterministic cross-engine."""
    from pyspark.sql import Window

    from ..operators import dedup as D

    docs = spread(t(spark, sf_dir, "documents"))
    sh = (
        docs.select("doc_id", F.split(F.lower("text"), " +").alias("t"))
        .filter(F.size("t") >= 3)
        .select("doc_id", F.explode(D.shingle_hash_expr("t", 3)).alias("h"))
    )
    firsts = sh.withColumn(
        "first_seen", F.min("doc_id").over(Window.partitionBy("h"))
    )
    agg = firsts.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum((F.col("first_seen") == F.col("doc_id")).cast("bigint")).alias(
            "n_new"
        ),
    )
    return agg.withColumn(
        # integer ratio -> exact 6-dp quantization (tie-margin batch)
        "novelty", round_div("n_new", "n_shingles", 6)
    )


def _ngram_novelty_sql() -> str:
    from ..operators.dedup import shingle_hash_sql

    return f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(text), ' +') AS t FROM documents),
sh AS (
  SELECT doc_id, unnest({shingle_hash_sql('t', 3)}) AS h
  FROM toks WHERE len(t) >= 3),
w AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY h) AS first_seen FROM sh)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN first_seen = doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new,
       {oracle_round_div('sum(CASE WHEN first_seen = doc_id THEN 1 ELSE 0 END)',
                         'count(*)', 6)} AS novelty
FROM w GROUP BY doc_id
"""


ENTRIES: dict[str, Q] = {
    "training_shards": Q(
        q_training_shards, _SHARDS_SQL, "round-robin shard balance report"
    ),
    "token_entropy": Q(
        q_token_entropy, _TOKEN_ENTROPY_SQL, "per-doc unigram Shannon entropy"
    ),
    "ngram_novelty": Q(
        q_ngram_novelty, _ngram_novelty_sql(), "new-shingle novelty curve per doc"
    ),
    "vocab_coverage": Q(
        q_vocab_coverage, _VOCAB_SQL, "top-V vocabulary coverage / OOV rate"
    ),
    "curriculum_bins": Q(
        q_curriculum_bins, _CURRICULUM_SQL, "per-language length-quartile bins"
    ),
    "weighted_doc_sample": Q(
        q_weighted_sample, _weighted_sample_sql(), "length-weighted systematic sample"
    ),
    "inverted_index_stats": Q(
        q_inverted_index_stats, _INVERTED_INDEX_SQL, "posting-list stats per term"
    ),
    "canonical_doc_assign": Q(
        q_canonical_doc_assign, _CANONICAL_SQL, "richest-copy canonical selection"
    ),
    "pii_scan": Q(q_pii_scan, _PII_SQL, "PII counts + redacted length"),
    "embedding_quantize_error": Q(
        q_embedding_quantize_error, _QUANTIZE_SQL, "int8 quantization + error stats"
    ),
    "mixture_resample": Q(
        q_mixture_resample,
        _MIXTURE_RESAMPLE_SQL,
        "deterministic rebalance to equal mixture cells",
    ),
    "quality_filter": Q(
        q_quality_filter, _QUALITY_FILTER_SQL, "keep/drop decision + reason bitmask"
    ),
    "substring_dup_spans": Q(
        q_substring_dup_spans,
        _SUBSTR_DUP_SQL,
        "windowed rolling-hash substring-dup accounting",
    ),
    "url_domain_stats": Q(
        q_url_domain_stats, _URL_SQL, "URL match + distinct-domain accounting"
    ),
}
