"""Streaming NEAR-duplicate detection — the in-flight counterpart of the
batch MinHash-LSH operator (operators/dedup.py): incoming documents are
checked against a persistent signature store of everything ingested so
far, per micro-batch, with exact-jaccard verification of the LSH
candidates.

Architecture (foreachBatch, same lambda shape as streaming/dedup.py):

  * the STORE is two append-only parquet tables under one root —
    ``bands/`` (doc_id, band_key: the LSH index) and ``sigs/``
    (doc_id, hs: the distinct shingle-hash set, kept for verification);
  * each epoch computes the batch's shingle hashes / minhash signature /
    band keys with the SAME expressions the batch operator uses (imported,
    not re-implemented — stream and batch agree on identity by
    construction);
  * candidates = batch bands equi-joined to store bands on band_key
    (the keyed-join 100 TB shape — no pairwise scan), plus within-batch
    band collisions so two near-dups arriving in one epoch are caught;
  * candidates verify with exact jaccard over the stored shingle sets
    (array_intersect/array_union — pure Catalyst), threshold-filtered,
    and appended to ``matches/``;
  * finally the batch's own bands+sigs append to the store.

State is the store, not executor memory: restart-safe (foreachBatch +
checkpoint gives effectively-once appends per epoch id), and the store is
a plain parquet table a nightly batch ``minhash_lsh_pairs`` pass can
re-verify wholesale — streaming recall with batch authority. At 100 TB
the store join is the same banded equi-join the batch path runs; the
per-epoch cost scales with batch size x store hit rate, not store size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import band_keys_col, minhash_sig_col, shingle_hash_expr


def _signatures(
    docs: DataFrame, n: int, k: int, bands: int, id_col: str, text_col: str
) -> DataFrame:
    """(doc_id, hs, band_key) rows for a (micro-)batch — one row per band,
    via the batch operator's own hashing expressions."""
    rows_per_band = k // bands
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.split(F.lower(F.col(text_col)), " +").alias("t"),
        )
        .filter(F.size("t") >= n)
        .withColumn("hs", shingle_hash_expr("t", n))
        .withColumn("sig", minhash_sig_col(F.col("hs"), k))
        .select(
            "doc_id",
            "hs",
            F.explode(band_keys_col(F.col("sig"), bands, rows_per_band)).alias(
                "band_key"
            ),
        )
    )


def _verified_pairs(cand: DataFrame, threshold: float) -> DataFrame:
    """Exact jaccard over the stored shingle sets; candidates below the
    threshold are band-collision noise and drop here."""
    return (
        cand.withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("hs_a", "hs_b"))
                / F.size(F.array_union("hs_a", "hs_b")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_id_a", "doc_id_b", "jaccard")
    )


def neardup_epoch_fn(
    spark: SparkSession,
    store_root: str,
    matches_path: str,
    n: int = 3,
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """foreachBatch body: emit verified near-dup pairs for the epoch, then
    fold the epoch's signatures into the store."""
    bands_path = os.path.join(store_root, "bands")
    sigs_path = os.path.join(store_root, "sigs")

    def epoch(batch_df: DataFrame, epoch_id: int) -> None:
        sig_rows = _signatures(batch_df, n, k, bands, id_col, text_col)
        # two consumers (match join + store append) of a pandas-free but
        # md5-heavy stage: persist per epoch, release before returning
        sig_rows = sig_rows.persist()
        try:
            batch_bands = sig_rows.select("doc_id", "hs", "band_key")
            pair_sets = []
            if os.path.isdir(bands_path):
                store_bands = spark.read.parquet(bands_path)
                store_sigs = spark.read.parquet(sigs_path)
                # store doc vs new doc: candidate on shared band key
                hist = (
                    batch_bands.alias("new")
                    .join(store_bands.alias("old"), "band_key")
                    .select(
                        F.col("old.doc_id").alias("doc_id_a"),
                        F.col("new.doc_id").alias("doc_id_b"),
                        F.col("new.hs").alias("hs_b"),
                    )
                    .distinct()
                    .join(
                        store_sigs.select(
                            F.col("doc_id").alias("doc_id_a"), F.col("hs").alias("hs_a")
                        ),
                        "doc_id_a",
                    )
                )
                pair_sets.append(_verified_pairs(hist, threshold))
            # within-batch collisions (a < b orders the pair once)
            intra = (
                batch_bands.alias("a")
                .join(batch_bands.alias("b"), "band_key")
                .filter(F.col("a.doc_id") < F.col("b.doc_id"))
                .select(
                    F.col("a.doc_id").alias("doc_id_a"),
                    F.col("b.doc_id").alias("doc_id_b"),
                    F.col("a.hs").alias("hs_a"),
                    F.col("b.hs").alias("hs_b"),
                )
                .distinct()
            )
            pair_sets.append(_verified_pairs(intra, threshold))
            matches = pair_sets[0]
            for p in pair_sets[1:]:
                matches = matches.unionByName(p)
            matches.distinct().write.mode("append").parquet(matches_path)
            # fold the epoch into the store LAST: a replayed epoch re-joins
            # against the pre-epoch store and re-appends the same rows
            # (duplicate matches collapse downstream; parquet appends are
            # the simple, restart-tolerant store for this local shape —
            # a real deployment would use a transactional table format)
            batch_bands.select("doc_id", "band_key").write.mode("append").parquet(
                bands_path
            )
            sig_rows.select("doc_id", "hs").dropDuplicates(["doc_id"]).write.mode(
                "append"
            ).parquet(sigs_path)
        finally:
            sig_rows.unpersist()

    return epoch
