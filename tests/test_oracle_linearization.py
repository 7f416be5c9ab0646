"""The linearized (prefix-filtered) DuckDB twins must lose NOTHING vs the
brute-force twins — this is the proof link that lets the sf1 strict sweep
use the affordable linearized oracles (VERDICT r05 #1) while the
brute-force forms remain the independent small-SF ground truth.

Both queries run in DuckDB itself (no Spark involved), so this pins the
SQL-vs-SQL equivalence; Spark-vs-oracle parity is the strict sweep's job.
"""

from __future__ import annotations

import duckdb
import pytest

from real_time_weather_data_pipeline_for_philippine_cities_spark.operators.dedup import (
    allpairs_jaccard_sql,
    allpairs_jaccard_sql_brute,
    ngram_jaccard_sql,
    ngram_jaccard_sql_brute,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    return c


def _rows(con, sql):
    return sorted(con.execute(sql).fetchall())


def test_allpairs_linearized_equals_brute(con):
    brute = _rows(con, allpairs_jaccard_sql_brute())
    linear = _rows(con, allpairs_jaccard_sql())
    assert brute  # non-degenerate corpus: the dup family produces pairs
    assert linear == brute


def test_ngram_linearized_equals_brute(con):
    brute = _rows(con, ngram_jaccard_sql_brute())
    linear = _rows(con, ngram_jaccard_sql())
    assert brute
    assert linear == brute


def test_linearized_at_lower_threshold_too(con):
    """The pigeonhole prefix bound depends on t — check a second, looser
    threshold so the ceil() edge (prefix length changes) is exercised."""
    brute = _rows(con, allpairs_jaccard_sql_brute(threshold=0.5))
    linear = _rows(con, allpairs_jaccard_sql(threshold=0.5))
    assert len(brute) >= len(_rows(con, allpairs_jaccard_sql_brute()))
    assert linear == brute
