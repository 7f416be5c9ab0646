"""Streaming mixture-drift monitor — the in-flight counterpart of the
batch ``mixture_drift`` query (plans/curation_queries.py): every
micro-batch's language profile is compared against a persistent BASE
profile, and the per-epoch KL drift report is appended to a parquet
table an alerting job can watch.

Architecture (foreachBatch, same lambda shape as streaming/neardup.py):

  * the base profile is a tiny parquet table ``(lang, n_base)`` written
    once from the curated corpus (``write_base_profile``) — the frozen
    reference mixture;
  * each epoch reduces the batch to ``(lang, n_inc)`` counts (bounded
    key space — partial aggregation does the work map-side), full-outer
    joins the profile so a language missing on either side still reports,
    and runs ``kl_drift_from_counts`` — the SAME smoothing/quantization/
    rounding code the batch query uses, so stream and batch agree by
    construction;
  * the stamped report appends per epoch; foreachBatch + checkpoint give
    effectively-once appends, so a replayed epoch overwrites nothing and
    duplicates nothing new.

At 100 TB the per-epoch cost is one map-combined count over the batch
plus a language-cardinality join — independent of corpus size; the
profile read is constant-size.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.curation_queries import kl_drift_from_counts


def write_base_profile(docs: DataFrame, profile_path: str) -> None:
    """Freeze the reference mixture: (lang, n_base) counts of the curated
    corpus. Overwrite semantics — re-freezing replaces the profile."""
    (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_base"))
        .write.mode("overwrite")
        .parquet(profile_path)
    )


def foreach_batch_drift(
    profile_path: str, report_path: str
) -> Callable[[DataFrame, int], None]:
    """Epoch function: KL drift of this micro-batch vs the base profile,
    appended to ``report_path`` stamped with the epoch id."""

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        inc = batch_df.groupBy("lang").agg(F.count(F.lit(1)).alias("n_inc"))
        base = spark.read.parquet(profile_path)
        per = inc.join(base, "lang", "full_outer").select(
            "lang",
            F.coalesce("n_inc", F.lit(0)).cast("long").alias("n_inc"),
            F.coalesce("n_base", F.lit(0)).cast("long").alias("n_base"),
        )
        (
            kl_drift_from_counts(per)
            .withColumn("epoch_id", F.lit(epoch_id))
            .write.mode("append")
            .parquet(report_path)
        )

    return fn


# -- numeric KS drift gate ---------------------------------------------------
def write_reference_distribution(
    df: DataFrame, value_col: str, ref_path: str
) -> None:
    """Freeze the reference NUMERIC distribution as collapsed
    ``(value, n_ref)`` counts. For an unbounded continuous domain,
    quantize ``value_col`` before freezing (the KS over quantized values
    bounds the true KS within one bin mass); the synthetic feeds here
    have bounded distinct values so raw counts are exact."""
    (
        df.groupBy(F.col(value_col).alias("value"))
        .agg(F.count(F.lit(1)).alias("n_ref"))
        .write.mode("overwrite")
        .parquet(ref_path)
    )


def foreach_batch_ks_drift(
    ref_path: str, report_path: str, value_col: str = "value"
) -> Callable[[DataFrame, int], None]:
    """Epoch function: exact two-sample KS statistic of this micro-batch's
    ``value_col`` distribution vs the frozen reference, appended to
    ``report_path`` stamped with the epoch id — the numeric companion of
    the categorical KL gate above, sharing the batch catalog's own KS
    core (operators/stats.ks_from_counts) so stream and batch agree by
    construction.

    Per-epoch cost: one map-combined count collapse over the batch plus a
    distinct-value-sized join against the constant reference — independent
    of corpus size."""
    from ..operators.stats import ks_from_counts

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        inc = (
            batch_df.filter(F.col(value_col).isNotNull())
            .groupBy(F.col(value_col).alias("value"))
            .agg(F.count(F.lit(1)).alias("n_inc"))
        )
        ref = spark.read.parquet(ref_path)
        per = inc.join(ref, "value", "full_outer").select(
            "value",
            F.coalesce("n_inc", F.lit(0)).cast("long").alias("n1"),
            F.coalesce("n_ref", F.lit(0)).cast("long").alias("n2"),
        )
        (
            ks_from_counts(per, "value")
            .withColumnRenamed("n_a", "n_batch")
            .withColumnRenamed("n_b", "n_ref")
            .withColumn("epoch_id", F.lit(epoch_id))
            .write.mode("append")
            .parquet(report_path)
        )

    return fn
