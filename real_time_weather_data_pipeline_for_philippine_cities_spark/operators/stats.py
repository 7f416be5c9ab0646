"""Distribution-comparison statistics as reusable operators.

The engine's drift gates come in two flavors: count-based mixture drift
(streaming/drift.py, plans/curation_queries.py) and the numeric
two-sample Kolmogorov–Smirnov statistic here. The KS core is shared by
the catalog query (plans/profiling_queries.py::q_ks_drift) and the
hypothesis property suite, which checks it against a driver-side brute
force on arbitrary generated samples.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


#: Bucket count for the parallel cumulative sums.
KS_BUCKETS = 64


def ks_statistic(
    df: DataFrame,
    value_col: str,
    is_a: Column,
    is_b: Column,
    buckets: int = KS_BUCKETS,
) -> DataFrame:
    """Exact two-sample KS statistic between the rows matching ``is_a``
    and those matching ``is_b`` (1-row result: ks_stat, n_a, n_b).

    Exactness without float accumulation: KS = max |F1 - F2| is computed
    as max |c1*nb - c2*na| over exact BIGINT cumulative counts, divided
    ONCE by na*nb at the end — both engines take the max of identical
    integers and perform one identical double division.

    Scale shape: the value stream first COLLAPSES to one row per
    distinct value (map-combined groupBy) — ties handled exactly, not by
    sort order — then the cumulative counts run as ``buckets``
    range-bucketed windows plus one tiny window over the bucket-totals
    lattice (the weighted_doc_sample pattern), never a single
    global-order window over the corpus. The 1-row bounds/totals ride in
    as broadcasts.
    """
    collapsed = df.groupBy(value_col).agg(
        F.sum(F.when(is_a, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(is_b, 1).otherwise(0)).alias("n2"),
    )
    return ks_from_counts(collapsed, value_col, buckets)


def ks_from_counts(
    collapsed: DataFrame, value_col: str, buckets: int = KS_BUCKETS
) -> DataFrame:
    """KS statistic from an already-collapsed ``(value, n1, n2)`` count
    relation — the reuse point for the streaming gate
    (streaming/drift.py), whose per-epoch counts join a frozen reference
    distribution instead of tagging rows. Same integer-exact,
    bucket-parallel core as ``ks_statistic`` (which calls this)."""
    # NOTE (r11, examined and left alone): collapsed feeds three branches
    # and the executed plan re-runs the count-collapse per reference (4
    # scans, 0 reused exchanges) — but persisting it measured 2.2-2.3x
    # SLOWER at BOTH SFs (interleaved A/B): the collapse is one
    # map-combined pass whose duplicates overlap inside a single job,
    # and the cache write serializes the three branches.
    bounds = collapsed.agg(
        F.min(value_col).alias("lo"),
        F.max(value_col).alias("hi"),
        F.sum("n1").alias("na"),
        F.sum("n2").alias("nb"),
    )
    # degenerate single-distinct-value input: hi == lo would make the bin
    # width 0 (ANSI divide-by-zero); any positive width puts the one value
    # in bucket 0.
    w = F.when(
        F.col("hi") > F.col("lo"), (F.col("hi") - F.col("lo")) / buckets
    ).otherwise(F.lit(1.0))
    binned = collapsed.crossJoin(F.broadcast(bounds)).select(
        value_col,
        "n1",
        "n2",
        "na",
        "nb",
        F.least(
            F.floor((F.col(value_col) - F.col("lo")) / w).cast("int"),
            F.lit(buckets - 1),
        ).alias("b"),
    )
    in_bucket = Window.partitionBy("b").orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = binned.select(
        "b",
        "na",
        "nb",
        F.sum("n1").over(in_bucket).alias("c1"),
        F.sum("n2").over(in_bucket).alias("c2"),
    )
    totals = binned.groupBy("b").agg(
        F.sum("n1").alias("t1"), F.sum("n2").alias("t2")
    )
    prior = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "b",
        F.coalesce(F.sum("t1").over(prior), F.lit(0)).alias("o1"),
        F.coalesce(F.sum("t2").over(prior), F.lit(0)).alias("o2"),
    )
    d = cum.join(F.broadcast(offsets), "b").select(
        "na",
        "nb",
        F.abs(
            (F.col("c1") + F.col("o1")) * F.col("nb")
            - (F.col("c2") + F.col("o2")) * F.col("na")
        ).alias("d_int"),
    )
    # KS is undefined when either sample is empty (na*nb == 0, e.g. a
    # micro-batch with no non-null values) -> NULL, not a divide error.
    # The statistic passes through RAW (no rounding): the single division
    # of identical exact integers is bit-identical cross-engine, whereas
    # round() on a raw division can diverge on shortest-decimal
    # half-cases (the cheapest_supplier_per_part lesson).
    return d.groupBy("na", "nb").agg(F.max("d_int").alias("m")).select(
        F.when(
            F.col("na") * F.col("nb") > 0,
            F.col("m").cast("double") / (F.col("na") * F.col("nb")),
        ).alias("ks_stat"),
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
    )
