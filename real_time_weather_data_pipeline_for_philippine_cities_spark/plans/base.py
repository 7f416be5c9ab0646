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
