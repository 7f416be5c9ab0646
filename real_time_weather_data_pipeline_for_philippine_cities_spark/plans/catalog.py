"""Aggregated query catalog: every implemented operator from SURVEY.md §2
(and the §7.6 beyond-reference LLM-data-pipeline operators) appears here as
a named entry with a Spark callable and, where SQL-expressible, a DuckDB
oracle twin. ``__spark_entry__.py`` re-exports these to the driver.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from .base import Q
from . import relational_queries

CATALOG: dict[str, Q] = {}
CATALOG.update(relational_queries.ENTRIES)

# All plan modules ship in-tree: an import failure is a real bug and must
# be loud — a silent skip would shrink the driver's query contract.
for _mod_name in ("function_queries", "llm_queries", "composite_queries", "timeseries_queries"):
    from importlib import import_module

    _mod = import_module(f"{__package__}.{_mod_name}")
    CATALOG.update(_mod.ENTRIES)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in CATALOG.items() if q.oracle is not None}
