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


def test_ngram_linearized_equals_brute_lower_threshold(con):
    """±1-bucket blocking composed with the prefix filter at a looser
    threshold (longer prefixes, more candidates) — the composition must
    stay lossless, not just the default point."""
    brute = _rows(con, ngram_jaccard_sql_brute(threshold=0.5))
    linear = _rows(con, ngram_jaccard_sql(threshold=0.5))
    assert len(brute) >= len(_rows(con, ngram_jaccard_sql_brute()))
    assert linear == brute


def test_linearized_on_planted_adversarial_docs(tmp_path):
    """Planted structure the synthetic corpus lacks: exact dups, a
    one-word edit (high jaccard, not 1.0), shared rare shingles below
    threshold, and a doc whose every shingle is globally common (prefix =
    commonest shingles — the pigeonhole bound's worst case)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    common = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, common),
        (2, common),  # exact dup of 1
        (3, common.replace("lazy", "sleepy")),  # near dup of 1/2
        (4, "totally different content words here nothing shared at all"),
        (5, "the quick brown cat naps under the busy dog again and again"),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    for t in (0.5, 0.7, 0.9):
        brute = sorted(c.execute(allpairs_jaccard_sql_brute(threshold=t)).fetchall())
        linear = sorted(c.execute(allpairs_jaccard_sql(threshold=t)).fetchall())
        assert linear == brute, t
        nb = sorted(c.execute(ngram_jaccard_sql_brute(threshold=t)).fetchall())
        nl = sorted(c.execute(ngram_jaccard_sql(threshold=t)).fetchall())
        assert nl == nb, t
    # sanity: the exact dup is found at the default threshold; the
    # one-word edit (3 changed shingles of ~10 → jaccard ≈ 0.54) at 0.5
    found = {(a, b) for a, b, _ in c.execute(allpairs_jaccard_sql()).fetchall()}
    assert (1, 2) in found
    loose = {(a, b) for a, b, _ in c.execute(allpairs_jaccard_sql(threshold=0.5)).fetchall()}
    assert (1, 3) in loose and (2, 3) in loose


# -- round-8 sf10 exclusion retirements -------------------------------------

@pytest.fixture(scope="module")
def con_li():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{SF_DIR}/lineitem.parquet'")
    c.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    return c


def test_triangles_linearized_equals_selfjoin(con_li):
    """The basket-list pair comprehension (the sf10-affordable oracle)
    must produce the identical census as the textbook li2 x li2 self-join
    (which spilled past free disk at sf10)."""
    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.subquery_queries import (
        _TRIANGLES_SQL,
        _TRIANGLES_SQL_BRUTE,
    )

    brute = _rows(con_li, _TRIANGLES_SQL_BRUTE)
    linear = _rows(con_li, _TRIANGLES_SQL)
    assert brute and any(r[1] > 0 for r in brute)  # non-degenerate graph
    assert linear == brute


def test_multimodal_rowlocal_histogram_equals_unnest(con_li):
    """The row-local list_aggregate histogram (the sf10-affordable oracle)
    must be bitwise-identical to the per-byte unnest form (which OOM'd
    DuckDB at sf10), including the empty-text entropy-0.0 and NULL-text
    NULL-features rows."""
    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.composite_queries import (
        _MULTIMODAL_SQL,
        _MULTIMODAL_SQL_BRUTE,
    )

    brute = _rows(con_li, _MULTIMODAL_SQL_BRUTE)
    linear = _rows(con_li, _MULTIMODAL_SQL)
    assert brute
    assert linear == brute


def test_multimodal_rowlocal_histogram_degenerate_texts():
    """Empty / whitespace / unicode / NULL texts through BOTH multimodal
    oracle forms — the shapes the weird-content fixture carries."""
    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.composite_queries import (
        _MULTIMODAL_SQL,
        _MULTIMODAL_SQL_BRUTE,
    )

    c = duckdb.connect()
    c.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(1, ''), (2, '   '), (3, NULL), (4, 'aaaa'), "
        "(5, '\U0001f600 éè中文'), (6, chr(10) || chr(10))"
        ") t(doc_id, text)"
    )
    brute = _rows(c, _MULTIMODAL_SQL_BRUTE)
    linear = _rows(c, _MULTIMODAL_SQL)
    assert len(brute) == 6
    assert linear == brute
