"""Streaming benchmark-decontamination gate (SURVEY.md §7.6 family).

The batch sweep (operators/decontam.py::benchmark_overlap) flags
training documents sharing word 8-grams with a held-out benchmark. A
real crawl-ingest pipeline runs this check AT INGEST — a contaminated
document should never reach the training store in the first place —
which is this module: the benchmark shingle set is computed ONCE from
the static benchmark split (a benchmark is bounded by definition, so
the set broadcasts), then every micro-batch is shingled map-side,
joined against the broadcast set, and split into a clean sink and a
flagged sink with per-doc overlap counts. Nothing stateful: given the
fixed benchmark set the gate is a pure per-document function, so
streaming output == batch output on the same rows (pinned by
tests/test_streaming_parity.py::test_parity_stream_decontam).

Scale shape: the only shuffle per epoch is the per-doc overlap count's
groupBy (keyed on doc_id, map-combined); the benchmark side never
reshuffles — identical to the batch operator's 100 TB shape. Shingle
hashes are the shared 28-bit md5 scheme (operators/dedup.py), so the
flagged output is bit-compatible with the batch sweep and the DuckDB
oracle family.

Exactly-once per epoch comes from the streaming checkpoint + wholesale
epoch replay, same as the other foreachBatch gates (streaming/dq.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import shingle_hash_expr


def benchmark_shingle_set(
    bench_docs: DataFrame, n: int = 8, text_col: str = "text"
) -> DataFrame:
    """Distinct word-``n``-gram shingle hashes of the benchmark split —
    one column ``h``. Compute once and ``.persist()`` (the caller owns
    the lifecycle); every epoch broadcasts it into the overlap join.
    Documents shorter than ``n`` tokens contribute nothing."""
    toks = bench_docs.select(
        F.split(F.lower(F.col(text_col)), " +").alias("t")
    )
    return (
        toks.filter(F.size("t") >= n)
        .select(F.explode(shingle_hash_expr("t", n)).alias("h"))
        .distinct()
    )


def foreach_batch_decontam(
    bench_sh: DataFrame,
    clean_path: str,
    flagged_path: str,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Callable[[DataFrame, int], None]:
    """Build the epoch function: each incoming document is shingled and
    checked against the broadcast benchmark set; rows with zero overlap
    are appended to ``clean_path`` with their original columns, the rest
    to ``flagged_path`` with an extra ``n_overlap`` column (flagged rows
    are quarantined WITH evidence, never dropped silently — same posture
    as the dq gate)."""

    def run(batch_df: DataFrame, epoch_id: int) -> None:
        shingled = batch_df.withColumn(
            "__t", F.split(F.lower(F.col(text_col)), " +")
        ).withColumn(
            "__hs",
            F.when(F.size("__t") >= n, shingle_hash_expr("__t", n)).otherwise(
                F.expr("CAST(array() AS ARRAY<BIGINT>)")
            ),
        )
        # Two consumers (overlap count, clean/flagged split) — persist so
        # the md5 shingle pass runs once per epoch, same rationale as the
        # batch operator's persist.
        shingled = shingled.persist()
        try:
            overlap = (
                shingled.select(id_col, F.explode("__hs").alias("h"))
                .join(F.broadcast(bench_sh), "h")
                .groupBy(id_col)
                .agg(F.count(F.lit(1)).alias("n_overlap"))
            )
            scored = (
                shingled.drop("__t", "__hs")
                .join(overlap, id_col, "left")
                .withColumn("n_overlap", F.coalesce("n_overlap", F.lit(0)))
                .persist()
            )
            try:
                (
                    scored.filter(F.col("n_overlap") == 0)
                    .drop("n_overlap")
                    .write.mode("append")
                    .parquet(clean_path)
                )
                (
                    scored.filter(F.col("n_overlap") > 0)
                    .write.mode("append")
                    .parquet(flagged_path)
                )
            finally:
                scored.unpersist()
        finally:
            shingled.unpersist()

    return run
