"""Mirror of the driver's correctness gate: run every catalog query in
Spark AND its DuckDB oracle on the same parquet, compare row count, column
names, and order-insensitive values (floats rounded inside the queries
themselves — see plans/base.py rounding policy).
"""

from __future__ import annotations

import decimal
import math

import duckdb
import pytest

from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.catalog import CATALOG
from real_time_weather_data_pipeline_for_philippine_cities_spark.sources.registry import TABLES


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    # Wrap in a tagged tuple so rows mixing None/float/str stay sortable.
    if v is None:
        return (0, "")
    if isinstance(v, float):
        if math.isnan(v):
            return (1, "NaN")
        return (2, round(v, 9))
    if isinstance(v, (int, bool, decimal.Decimal)):
        return (2, round(float(v), 9))
    return (3, str(v))


def _norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in idx) for r in rows)


SQL_BACKED = sorted(name for name, q in CATALOG.items() if q.oracle is not None)


@pytest.mark.parametrize("name", SQL_BACKED)
def test_matches_duckdb_oracle(spark, sf_dir, name):
    q = CATALOG[name]
    sdf = q.fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    # release per-query persisted stages (LSH signatures, edge lists) so
    # 127 parametrized runs on one session don't accumulate cached storage
    spark.catalog.clearCache()

    con = _duck(sf_dir)
    res = con.execute(q.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    ns, nd = _norm_rows(spark_cols, spark_rows), _norm_rows(duck_cols, duck_rows)
    mismatches = [(a, b) for a, b in zip(ns, nd) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"


def test_every_query_has_catalog_doc():
    for name, q in CATALOG.items():
        assert callable(q.fn), name
