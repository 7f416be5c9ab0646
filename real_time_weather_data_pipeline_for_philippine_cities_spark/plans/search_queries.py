"""Keyword-search catalog entries (SURVEY.md §7.6 — beyond-reference
training-data operators: corpus retrieval/ranking).

BM25 with the RATIONAL idf variant: idf = (N - df + 0.5) / (df + 0.5),
unlogged — the same cross-engine-determinism policy as tfidf_top_terms
(llm_queries.py): every input to the score is an exact integer (tf, dl,
df, N, Σdl), so both engines evaluate the identical IEEE expression tree
and produce bit-identical doubles before the final 6dp rounding. The
unlogged idf is a monotone transform of Robertson's log form per term;
the summed score differs from textbook BM25 but is a fixed, documented
scoring function — determinism across engines is worth more here than
log-shaped saturation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import oracle_quantize_double, quantize_double
from ..functions.text import tokens, tokens_sql
from .base import Q, spread, t

#: The fixed keyword query (terms present in the synthetic corpus).
BM25_TERMS: tuple[str, ...] = ("spark", "window", "hash", "stream")
BM25_K1 = 1.2
BM25_K1P1 = 2.2  # literal, NOT K1+1.0: FP constant-fold could differ by 1 ulp
BM25_B = 0.75
BM25_TOP_K = 20


def _eq(term: str):
    # single-arg closure: a 2-arg lambda would be read by the HOF binder as
    # (element, index) and silently compare tokens to positions.
    return lambda x: x == term


def q_bm25_keyword_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents by BM25 against a fixed 4-term keyword query.

    Scale shape: documents is tokenized ONCE — the per-doc features
    (doc_id, dl, tf per term: ~40 bytes/row) go through an explicit
    repartition exchange that BOTH consumers reuse (the 1-row corpus
    stats aggregate and the scoring branch), so the text scan + tokenize
    never runs twice. The stats row (N, Σdl, df per term) broadcasts back
    in-flow — no driver collect. Final cut is TakeOrderedAndProject
    (per-partition top-k), never a global sort.

    spread() before the tokenize: the per-term array filters otherwise run
    inside the scan stage at single-file split parallelism — measured
    3.8 s → 1.7 s at sf1. The feat repartition stays: it is the reused
    exchange both consumers read, holding tokenize at exactly one pass.
    """
    docs = spread(t(spark, sf_dir, "documents"))
    toks = tokens(F.col("text"))
    feat = docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("dl"),
        *[
            F.size(F.filter(toks, _eq(term))).cast("bigint").alias(f"tf_{term}")
            for term in BM25_TERMS
        ],
    ).repartition(F.col("doc_id"))
    stats = feat.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{term}") > 0).cast("bigint")).alias(f"df_{term}")
            for term in BM25_TERMS
        ],
    )
    scored = feat.join(F.broadcast(stats))
    avgdl = F.col("sum_dl") / F.col("n_docs")  # exact-int division → double
    score = None
    for term in BM25_TERMS:
        tf = F.col(f"tf_{term}").cast("double")
        df_ = F.col(f"df_{term}").cast("double")
        idf = (F.col("n_docs") - df_ + 0.5) / (df_ + 0.5)
        denom = tf + BM25_K1 * (0.25 + BM25_B * (F.col("dl") / avgdl))
        contrib = idf * (tf * BM25_K1P1) / denom
        score = contrib if score is None else score + contrib
    # NAMED score column then engine-identical quantize (no guard: BM25
    # contributions are bounded rationals) — tie-margin audit, final
    # batch. Threshold and ranking run on the QUANTIZED value, as before.
    return (
        scored.withColumn("_score", score)
        .withColumn("bm25", quantize_double("_score", 6))
        .filter(F.col("bm25") > 0.0)
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(BM25_TOP_K)
        .select("doc_id", "dl", "bm25")
    )


def _bm25_sql() -> str:
    toks = tokens_sql("text")
    tf_cols = ",\n         ".join(
        f"CAST(len(list_filter({toks}, x -> x = '{term}')) AS BIGINT)"
        f" AS tf_{term}"
        for term in BM25_TERMS
    )
    df_cols = ",\n         ".join(
        f"CAST(sum(CASE WHEN tf_{term} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS df_{term}"
        for term in BM25_TERMS
    )
    # Expression tree mirrors the Spark side token-for-token: same
    # association, same literals, same cast points.
    contribs = [
        f"((s.n_docs - CAST(df_{term} AS DOUBLE) + 0.5)"
        f" / (CAST(df_{term} AS DOUBLE) + 0.5))"
        f" * (CAST(tf_{term} AS DOUBLE) * {BM25_K1P1})"
        f" / (CAST(tf_{term} AS DOUBLE)"
        f" + {BM25_K1} * (0.25 + {BM25_B} * (f.dl / (s.sum_dl / s.n_docs))))"
        for term in BM25_TERMS
    ]
    score = " + ".join(contribs)
    return f"""
WITH feat AS (
  SELECT doc_id,
         CAST(len({toks}) AS BIGINT) AS dl,
         {tf_cols}
  FROM documents),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS sum_dl,
         {df_cols}
  FROM feat),
raw AS (
  SELECT f.doc_id, f.dl, {score} AS _score
  FROM feat f, stats s),
scored AS (
  SELECT doc_id, dl, {oracle_quantize_double('_score', 6)} AS bm25
  FROM raw)
SELECT doc_id, dl, bm25 FROM scored WHERE bm25 > 0.0
ORDER BY bm25 DESC, doc_id ASC LIMIT {BM25_TOP_K}
"""


ENTRIES: dict[str, Q] = {
    "bm25_keyword_topk": Q(
        q_bm25_keyword_topk, _bm25_sql(), "BM25 (rational idf) keyword top-k"
    ),
}
