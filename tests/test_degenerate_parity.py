"""Bitwise oracle PARITY on the degenerate-input fixtures — the layer the
survive-only sweeps cannot see (a query can run fine on both engines and
silently return DIFFERENT answers on an empty slice, an all-NULL row, a
NaN metric, or a duplicated natural key).

First run of this sweep (round 7) found, and the engine/oracles fixed:
  * one NaN metric row ANSI-aborted every integer-micro aggregation on
    BOTH engines (hidden from the survive sweeps because .count() let
    Catalyst prune the poisoned cast) → the finite()/finite_pred metric
    contract (plans/base.py);
  * NaN embedding vectors: DuckDB orders NaN above +Inf while Spark's NaN
    comparisons return false, so `cos >= threshold` silently disagreed →
    the finite_vec_pred well-formed-vector contract (operators/similarity);
  * NULL-semantics mirrors: null-skipping concat_ws dedup keys, '' as the
    empty string_agg identity, NULL text → no fingerprint / no dedup
    cluster / no shingles, NULL media → NULL features, unknown revenue →
    unrankable, DQ violation counts are total integers.

Two DOCUMENTED divergence classes remain, asserted EXACTLY below:
  * GROUPING_LATTICE_ON_EMPTY — Spark's Expand-based cube/rollup emits
    NO grand-total row on empty input; ANSI SQL (and DuckDB) emits the
    () grouping-set row. Engine-defined; confined to 0-row inputs.
  * DUP_ID_AMBIGUOUS — id-keyed operators whose contract assumes unique
    upstream identity (like PACKED_KEY_DOMAIN assumes bounded ids): on
    duplicated natural keys the SQL twin's joins multiply where the
    engine's per-row kernels / first-match semantics do not. A re-crawl
    corpus must be identity-resolved before these operators; the dedup
    operators themselves (exact/minhash/simhash/ngram) ARE dup-safe and
    stay in the parity gate.
"""

import duckdb
import pytest

# Whole-catalog parity sweeps (~100-140 s each): excluded from the
# default run via pytest.ini so `pytest tests/` fits the driver's verify
# time box (r10 verdict item 1); run with `pytest -m slow`.
pytestmark = pytest.mark.slow

from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.catalog import (
    CATALOG,
)
from real_time_weather_data_pipeline_for_philippine_cities_spark.sources.registry import (
    TABLES,
)
from tests.test_empty_inputs import (  # noqa: F401  (pytest fixtures)
    PACKED_KEY_DOMAIN,
    UNIQUE_KEY_GUARDED,
    dup_sf_dir,
    empty_sf_dir,
    extreme_sf_dir,
    null_sf_dir,
    weird_sf_dir,
)

# Spark cube/rollup/grouping-sets emit nothing on empty input (the Expand
# node has no rows to expand); ANSI emits the () grand-total row.
GROUPING_LATTICE_ON_EMPTY = {
    "cube_event_stats",
    "rollup_revenue",
    "grouping_sets_mix",
}

# Outputs undefined across engines when natural keys are duplicated:
#   ivf_cosine_topk      — duplicate vec_ids collapse differently in the
#                          probe ranking's tie-breaks
#   pagerank_dup_graph   — duplicate doc_ids multiply edges through the
#                          oracle's joins; the engine's grouped edge list
#                          collapses them
#   shingle_containment  — the oracle's per-pair join counts each copy
#                          (containment > 1.0 on tripled rows — nonsense
#                          that only unique ids preclude)
#   multimodal_features  — per-ROW Arrow kernel vs the oracle's
#                          GROUP BY doc_id byte histogram (copies merge)
#   weather_pipeline_e2e — duplicated city codes break the dim identity
#                          the reference pipeline assumes
DUP_ID_AMBIGUOUS = {
    "ivf_cosine_topk",
    "pagerank_dup_graph",
    "shingle_containment",
    "multimodal_features",
    "weather_pipeline_e2e",
}


def _parity(spark, sf_dir, exclude=frozenset()):
    from tools.strict_check import check_one

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet/*.parquet'"
        )
    failures = {}
    for name, q in sorted(CATALOG.items()):
        if q.oracle is None or name in exclude:
            continue
        try:
            entry = check_one(name, spark, con, sf_dir)
            if not entry["ok"]:
                failures[name] = str(entry["detail"])[:250]
        except Exception as exc:
            failures[name] = f"compare crash {type(exc).__name__}: {exc}"[:250]
        finally:
            spark.catalog.clearCache()
    con.close()
    return failures


def test_parity_on_empty_tables(spark, empty_sf_dir):
    failures = _parity(spark, empty_sf_dir)
    undocumented = {
        k: v for k, v in failures.items() if k not in GROUPING_LATTICE_ON_EMPTY
    }
    assert not undocumented, undocumented
    # the documented gap must be EXACTLY the missing grand-total row
    for name in sorted(GROUPING_LATTICE_ON_EMPTY):
        assert failures.get(name) == "rows 0/1", (name, failures.get(name))


def test_parity_on_all_null_rows(spark, null_sf_dir):
    failures = _parity(spark, null_sf_dir, exclude=GROUPING_LATTICE_ON_EMPTY)
    assert not failures, failures


def test_parity_on_weird_content(spark, weird_sf_dir):
    assert not _parity(spark, weird_sf_dir), "weird-content parity"


def test_parity_on_duplicated_rows(spark, dup_sf_dir):
    failures = _parity(
        spark, dup_sf_dir, exclude=DUP_ID_AMBIGUOUS | UNIQUE_KEY_GUARDED
    )
    assert not failures, failures


def test_parity_on_2e61_keys(spark, extreme_sf_dir):
    assert not _parity(spark, extreme_sf_dir, exclude=PACKED_KEY_DOMAIN)
