"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the package
``real_time_weather_data_pipeline_for_philippine_cities_spark`` (see
SURVEY.md for the blueprint); this module just adapts it to the contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.catalog import (
    CATALOG,
    oracle_sql as _oracle_sql,
    queries as _queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Latest observation per key joined to its dimensions — the reference's
    'latest weather per location ⋈ province' shape (SURVEY.md §7.1).
    """
    return CATALOG["flagship_latest_obs"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return _oracle_sql()
