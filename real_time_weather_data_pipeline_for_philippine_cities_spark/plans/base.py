"""Shared plumbing for the query catalog.

Every catalog entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame``
with (usually) a DuckDB-runnable ANSI SQL oracle. The driver hash-compares
them column-name-sorted and order-insensitive, so both sides must agree on
output column NAMES and on float formatting — hence the rounding policy:

  * every aggregated float is ``round(x, 2..6)`` on BOTH sides (cross-engine
    summation-order ulp drift would otherwise break the value hash);
  * raw pass-through columns are left untouched (bit-identical parquet);
  * timestamps rely on the UTC session timezone pinned in session.tune().
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tune
from ..sources.registry import load_table


@dataclass(frozen=True)
class Q:
    """One catalog entry: Spark plan + DuckDB oracle twin."""

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # None => non-SQL-expressible; driver does rows-only
    doc: str = ""


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a testdata table with runtime tuning applied to the session."""
    tune(spark)
    return load_table(spark, sf_dir, name)


def assert_id_domain(df: DataFrame, col: str, cap: int, what: str) -> DataFrame:
    """In-plan id-domain guard for the packed integer argmax encodings
    (``value * CAP - id``): an id outside ``[0, CAP)`` does not overflow
    — it silently mis-ranks, the worst failure class at scale (found by
    the 2^61-key robustness probe; the packed-ADD idioms already fail
    loudly via ANSI overflow). The guard costs one comparison per row
    and keeps the breach LOUD: re-key with ``operators.relational
    dense_ids`` before these encodings when the natural id domain grows
    past the cap.

    Same kept-filter ``assert_true`` pattern as the SCD2 key guard; the
    plan-shape suite pins that ``raise_error`` survives optimization."""
    guard = F.assert_true(
        (F.col(col) >= 0) & (F.col(col) < F.lit(cap)),
        F.lit(
            f"{what}: {col} outside the packed-key domain [0, {cap}) — "
            "re-key with dense_ids before packed argmax encodings"
        ),
    )
    return df.filter(guard.isNull())


def finite(col) -> "F.Column":
    """Non-finite metric guard: NaN / ±Inf → NULL (missing), finite values
    pass through unchanged.

    The 100 TB metric contract (degenerate-parity sweep, round 7): one
    corrupted sensor reading must neither ABORT the job — under ANSI both
    engines raise on ``CAST(round(NaN * 1e6) AS BIGINT)``, so a single
    NaN row killed every integer-micro aggregation — nor silently poison
    ordinal statistics with engine-defined NaN placement (Spark and
    DuckDB disagree on where NaN sorts inside percentile/median). NULL is
    the one representation both engines' aggregates already skip
    identically, and it mirrors the reference's pandas semantics, where
    NaN IS the missing-value sentinel (weather_data_fetcher.py:206,362).

    SQL twin fragment: ``CASE WHEN isfinite(value) THEN value END``
    (see FINITE_SQL)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(~F.isnan(c) & (F.abs(c) != F.lit(float("inf"))), c)


def finite_sql(expr: str) -> str:
    """DuckDB twin of ``finite()`` — keep both engines' guards textually
    paired so the contract cannot drift one-sided."""
    return f"CASE WHEN isfinite({expr}) THEN {expr} END"


def finite_spark_sql(expr: str) -> str:
    """Spark-SQL TEXT form of ``finite()`` for string-built expressions
    (the round_div/oracle_round_div templates take SQL snippets). Spark
    has no isfinite(); the NaN/Inf checks match finite() exactly."""
    return (
        f"(CASE WHEN NOT isnan({expr}) AND abs({expr}) <> "
        f"CAST('Infinity' AS DOUBLE) THEN {expr} END)"
    )


def finite_pred(col) -> "F.Column":
    """Row-filter form of the ``finite()`` contract: present AND finite.
    NULL propagates to NULL through both comparisons, so NULLs drop too —
    the DuckDB twin is simply ``WHERE isfinite(col)`` (NULL → NULL →
    filtered), keeping the qualifying sets identical."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNotNull() & ~F.isnan(c) & (F.abs(c) != F.lit(float("inf")))


def spread(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Hash-repartition an under-parallel scan before expression-heavy
    map work.

    Single-file parquet written with one row group cannot be split, so a
    50k-row `documents` scan otherwise runs its md5/HOF chain in ONE task
    (measured 24.5 s single-task vs ~2 s spread, simhash at sf≈1). The
    shuffle is conditional: at real scale the scan already arrives in
    thousands of files and this is a no-op — the same contract as the
    decontamination operator's conditional repartition.

    The probe is ``df.inputFiles()`` (analyzed-plan metadata only), NOT
    ``df.rdd.getNumPartitions()``: the rdd probe forces physical planning
    of the subtree on every call. File count under-counts splits of few
    huge row-grouped files — in that regime the hash shuffle is still the
    right call before expression-heavy map work, so erring toward
    repartition is safe; with ≥ defaultParallelism files it is a no-op
    exactly as before."""
    sc = df.sparkSession.sparkContext
    try:
        n_files = len(df.inputFiles())
    except Exception:  # non-file leaf (in-memory relation): spread it
        n_files = 0
    if n_files < sc.defaultParallelism:
        return df.repartition(F.col(key))
    return df
