"""Streaming exact deduplication — the in-flight counterpart of the batch
``dedup_exact`` operator (operators/dedup.py:34).

A continuously-ingested corpus (crawl snapshots, log shipping) wants
duplicates dropped AT INGEST, not in a nightly batch pass.
``dropDuplicatesWithinWatermark`` keeps one row per key among all rows
whose event time falls within the watermark horizon of the first-seen row
— and, critically for scale, EVICTS key state once the watermark passes,
so state is bounded by (keys arriving within the delay window), not by
corpus size. Plain ``dropDuplicates`` on a stream never evicts: at 100 TB
of ingest its state store is the corpus itself, which is the difference
between a viable operator and an OOM.

Exactly-once contract: duplicates separated by MORE than the watermark
delay re-emit (their state was evicted) — acceptable for near-real-time
dedup, and the downstream batch ``dedup_exact``/``canonical_doc_assign``
pass remains the end-of-day authority. The two layers together are the
standard lambda shape for corpus dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    df: DataFrame,
    key_cols: tuple[str, ...],
    event_time_col: str,
    delay: str = "1 hour",
) -> DataFrame:
    """Keep the first-seen row per key within the watermark horizon.

    On a streaming DataFrame this is state-store backed and evicting; on a
    batch DataFrame it degrades to plain ``dropDuplicates`` (Spark rejects
    ``dropDuplicatesWithinWatermark`` outside streaming — in batch the
    whole input is visible, so exact dedup IS the within-watermark
    semantics with an infinite horizon).
    """
    if not df.isStreaming:
        return df.dropDuplicates(list(key_cols))
    out = df.withWatermark(event_time_col, delay)
    return out.dropDuplicatesWithinWatermark(list(key_cols))


def content_keyed(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the md5 content key used by the batch exact-dedup operator so
    stream and batch dedup agree on identity."""
    return docs.withColumn("content_hash", F.md5(text_col))
