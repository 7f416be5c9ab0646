"""Streaming data-quality gate (SURVEY.md §2.9 + §7.6 profiling family).

The batch constraint report (plans/profiling_queries.py::q_dq_checks) run
as a per-epoch publish gate: every micro-batch is split into clean rows
(forwarded to the sink) and violating rows (quarantined, never dropped
silently), with a per-epoch per-check violation count appended to a
machine-readable report table. The reference's equivalent is the ad-hoc
malformed-geocode drop (weather_data_fetcher.py:150-170) — which loses the
rows AND the count; this keeps both.

Scale shape: predicates are pure Catalyst expressions evaluated in one
map pass; the flagged batch is persisted once and feeds three consumers
(clean sink, quarantine sink, 1-row-per-check report aggregate) without
re-reading the source. Exactly-once per epoch comes from the streaming
checkpoint + wholesale epoch replay, same as the other foreachBatch ops.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def foreach_batch_dq_gate(
    violation_preds: dict[str, Column],
    clean_path: str,
    quarantine_path: str,
    report_path: str,
) -> Callable[[DataFrame, int], None]:
    """Build the epoch function: rows matching ANY violation predicate go
    to quarantine; the rest to the clean sink; counts per check to the
    report. Predicate columns must be boolean; nulls count as violations
    (an unevaluable constraint is a failed constraint — same posture as
    the batch dq_checks' explicit range predicates)."""
    if not violation_preds:
        raise ValueError("dq gate needs at least one violation predicate")

    names = list(violation_preds)

    def run(batch_df: DataFrame, epoch_id: int) -> None:
        flagged = batch_df
        for name in names:
            flagged = flagged.withColumn(
                f"__dq_{name}",
                F.coalesce(violation_preds[name].cast("boolean"), F.lit(True)),
            )
        any_bad = reduce(
            lambda a, b: a | b, [F.col(f"__dq_{n}") for n in names]
        )
        flagged = flagged.withColumn("__dq_bad", any_bad).persist()
        try:
            drop_cols = ["__dq_bad"] + [f"__dq_{n}" for n in names]
            (
                flagged.filter(~F.col("__dq_bad"))
                .drop(*drop_cols)
                .write.mode("append")
                .parquet(clean_path)
            )
            (
                flagged.filter(F.col("__dq_bad"))
                .drop("__dq_bad")
                .write.mode("append")
                .parquet(quarantine_path)
            )
            report = flagged.agg(
                *[
                    F.sum(F.col(f"__dq_{n}").cast("bigint")).alias(n)
                    for n in names
                ]
            ).selectExpr(
                f"stack({len(names)}, "
                + ", ".join(f"'{n}', {n}" for n in names)
                + ") AS (check_name, n_violations)"
            ).withColumn("epoch_id", F.lit(epoch_id))
            report.write.mode("append").parquet(report_path)
        finally:
            flagged.unpersist()

    return run
