"""Benchmark decontamination: flag training documents sharing word
n-grams with a held-out benchmark set (SURVEY.md §7.6 family — a
first-class LLM-training-data operation: evaluation contamination is
detected by exactly this n-gram-overlap sweep).

Spark shape: one map-side shingle pass over the corpus, the benchmark's
distinct shingle set broadcast (a benchmark is bounded by definition —
thousands of documents — regardless of corpus scale), one keyed
equi-join + per-doc count. Nothing quadratic; corpus side is
scan-scaling, which is what a 100 TB decontamination sweep needs.

The 28-bit md5 shingle hashes are shared with the dedup operators
(operators/dedup.py::shingle_hash_expr), so the DuckDB oracle reproduces
them bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_hash_expr, shingle_hash_sql


def benchmark_overlap(
    docs: DataFrame,
    bench_pred: Column,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per non-benchmark document: how many of its distinct word
    ``n``-gram shingles appear anywhere in the benchmark split
    (``bench_pred`` selects benchmark rows), plus a ``contaminated``
    flag. Documents shorter than ``n`` tokens carry zero shingles and are
    never contaminated."""
    from pyspark import StorageLevel

    src = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.lower(F.col(text_col)), " +").alias("t"),
        bench_pred.alias("is_bench"),
    )
    # Spread small-file scans so the md5 shingle pass parallelizes
    # (single-partition parquet otherwise runs it in one task) — but only
    # when the input is actually under-parallel: at scale the scan already
    # arrives in thousands of files and an unconditional repartition
    # would be a free-standing full shuffle of the corpus. Probe via
    # inputFiles() (analyzed-plan metadata), not .rdd, which would force
    # physical planning of the subtree — same contract as plans.base.spread.
    sc = docs.sparkSession.sparkContext
    try:
        n_files = len(docs.inputFiles())
    except Exception:  # non-file leaf (in-memory relation): spread it
        n_files = 0
    if n_files < sc.defaultParallelism:
        src = src.repartition(F.col("doc_id"))
    base = (
        src.select(
            "doc_id",
            "is_bench",
            F.when(F.size("t") >= n, shingle_hash_expr("t", n))
            .otherwise(F.expr("CAST(array() AS ARRAY<BIGINT>)"))
            .alias("hs"),
        )
        # Three consumers (benchmark set, overlap join, doc spine) — an
        # un-persisted stage re-inlines the md5 shingling into each
        # (measured 36 s → ~3 s at sf0.1).
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bench_sh = (
        base.filter(F.col("is_bench")).select(F.explode("hs").alias("h")).distinct()
    )
    corpus = base.filter(~F.col("is_bench"))
    overlap = (
        corpus.select("doc_id", F.explode("hs").alias("h"))
        .join(F.broadcast(bench_sh), "h")
        # hs is per-doc distinct already, so count(*) == distinct overlap
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        corpus.select("doc_id")
        .join(overlap, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def benchmark_overlap_sql(
    bench_pred_sql: str,
    n: int = 8,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         string_split_regex(lower({text_col}), ' +') AS t,
         ({bench_pred_sql}) AS is_bench
  FROM {table}),
sh AS (
  SELECT doc_id, is_bench,
         CASE WHEN len(t) >= {n} THEN {shingle_hash_sql('t', n)}
              ELSE CAST([] AS BIGINT[]) END AS hs
  FROM toks),
bench AS (
  SELECT DISTINCT unnest(hs) AS h FROM sh WHERE is_bench),
corpus AS (
  SELECT doc_id, unnest(hs) AS h FROM sh WHERE NOT is_bench),
ov AS (
  SELECT doc_id, count(*) AS n_overlap
  FROM corpus JOIN bench USING (h) GROUP BY doc_id)
SELECT s.doc_id,
       coalesce(ov.n_overlap, 0) AS n_overlap,
       coalesce(ov.n_overlap, 0) > 0 AS contaminated
FROM sh s LEFT JOIN ov ON s.doc_id = ov.doc_id
WHERE NOT s.is_bench
"""
