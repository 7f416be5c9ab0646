"""Aggregated query catalog: every implemented operator from SURVEY.md §2
(and the §7.6 beyond-reference LLM-data-pipeline operators) appears here as
a named entry with a Spark callable and, where SQL-expressible, a DuckDB
oracle twin. ``__spark_entry__.py`` re-exports these to the driver.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from .base import Q
from . import relational_queries

CATALOG: dict[str, Q] = {}
CATALOG.update(relational_queries.ENTRIES)

# All plan modules ship in-tree: an import failure is a real bug and must
# be loud — a silent skip would shrink the driver's query contract.
for _mod_name in (
    "function_queries",
    "llm_queries",
    "composite_queries",
    "timeseries_queries",
    "corpus_queries",
    "curation_queries",
    "subquery_queries",
    "search_queries",
    "profiling_queries",
    "warehouse_queries",
):
    from importlib import import_module

    _mod = import_module(f"{__package__}.{_mod_name}")
    CATALOG.update(_mod.ENTRIES)

# The correctness driver records rows for exactly the FIRST 50 entries of
# queries(), so catalog order is the proof window. The order is COMPUTED
# from the driver's own CORRECTNESS_r*.json artifacts rather than
# hand-rotated lists (which went stale between rounds): queries that were
# never driver-checked or whose most recent driver row was red sort first,
# then greens by oldest last-green round, so the stalest proof always
# rotates back into the window. ``_PLAN_CHANGED`` force-fronts queries
# whose plan was edited this round — a green row for the OLD plan proves
# nothing about the new one, and the artifact files can't see the diff.
_PLAN_CHANGED: list[str] = [
    # round 8, tie-margin batch: every inventoried round-on-raw-ratio site
    # (BASELINE.md "Tie-margin audit") now quantizes through the exact
    # integer-space template (functions/rounding.py round_div), and the
    # generic-double histogram edges through the new IEEE-identical
    # quantize_double template. quality_features' three ratios moved to
    # the same template, which textually changes every consumer.
    "quality_filter",
    "quality_score",
    "token_budget_select",
    "curation_funnel",
    "substring_dup_spans",
    "vocab_coverage",
    "ngram_novelty",
    "mixture_drift",
    "dataset_split",
    "rare_category_collapse",
    "tfidf_top_terms",
    "numeric_histogram",
    "shingle_containment",
    "small_qty_avg_yearly",
    "incremental_near_dup",
    # round 8, finite() money contract: the weird-content sweep now
    # carries NaN/Inf money rows; these 8 aborted on
    # CAST(round(NaN*100) AS BIGINT) (or floor(NaN)) and now treat
    # non-finite money as missing on both engines. pricing_summary also
    # carries three tie-margin ratio conversions (sum_disc_price,
    # avg_qty, avg_disc).
    "pricing_summary",
    "promo_revenue_share",
    "revenue_gini",
    "rollup_revenue",
    "salted_skew_join_agg",
    "significant_part_types",
    "top_revenue_supplier",
    "project_rename_cast",
    # + the two whose fixture rows happened to be predicate-excluded but
    # carry the identical abort pattern — guarded proactively:
    "nation_trade_volume",
    "disjunctive_brand_revenue",
    # round 8, advice: ann_lsh_topk's Spark ingestion now applies the dim
    # constraint its oracle always had (a finite ragged vector could
    # previously reach top-k via bucket 0 Spark-side only).
    "ann_lsh_cosine",
    # NOT force-fronted, deliberately: part_basket_triangles and
    # multimodal_features changed ORACLE-side only this round (the sf10
    # retirement rewrites — linearized basket pairs / row-local byte
    # histogram); old-vs-new oracle equality is pinned in DuckDB itself by
    # tests/test_oracle_linearization.py and the new twins are
    # strict-proven at HEAD, so their window slots go to the rotation.
    # Likewise the four dim-less finite_vec
    # consumers (embedding_cosine_topk, near_dup_embeddings,
    # embedding_norm_outliers, embedding_decontam) gained the size>0
    # clause on BOTH engines this round — value-identical on any corpus
    # without zero-length vectors, re-proven bitwise in the committed
    # strict sweeps at HEAD and exercised by the degenerate fixtures
    # (which carry empty vectors). Their driver rows are r7; the four
    # window slots this frees complete the r4 stale rotation, the round-8
    # verdict's item 2. The rotation auto-fronts them next round.
]


def _proof_green(rec: dict) -> bool:
    """A driver row counts as proof only if every check it ran passed."""
    return bool(
        rec.get("err") is None
        and rec.get("rows_match")
        and rec.get("schema_match") is not False
        and rec.get("hash_match") is not False
    )


def _load_correctness_rounds(root: Path) -> list[tuple[int, dict]]:
    rounds: list[tuple[int, dict]] = []
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path.name)
        if not m:
            continue
        try:
            data = json.loads(path.read_text())
        except (OSError, json.JSONDecodeError):
            continue  # a corrupt artifact must not break query loading
        if isinstance(data, dict):
            rounds.append((int(m.group(1)), data))
    return rounds


def proof_sort_key(
    name: str,
    rounds: list[tuple[int, dict]],
    plan_changed: tuple[str, ...] = (),
) -> tuple[int, int, str]:
    """Ordering key: smaller sorts earlier (= more urgent to re-prove).

    Tier 0: plan changed this round (old proof void).
    Tier 1: never driver-checked, or the latest driver row was red.
    Tier 2: green — ordered by last-green round, oldest (stalest) first.
    Name is the deterministic tie-break throughout.
    """
    if name in plan_changed:
        return (0, 0, name)
    last_checked = 0
    last_green = 0
    for rnd, data in rounds:
        if name in data:
            if rnd > last_checked:
                last_checked = rnd
            if _proof_green(data[name]) and rnd > last_green:
                last_green = rnd
    if last_checked == 0 or last_green < last_checked:
        return (1, 0, name)
    return (2, last_green, name)


def _ordered(catalog: dict[str, Q]) -> dict[str, Q]:
    missing = [n for n in _PLAN_CHANGED if n not in catalog]
    if missing:  # a renamed/removed query must fail loudly, not silently reorder
        raise KeyError(f"plan-changed names absent from catalog: {missing}")
    root = Path(__file__).resolve().parents[2]
    rounds = _load_correctness_rounds(root)
    changed = tuple(_PLAN_CHANGED)
    names = sorted(catalog, key=lambda n: proof_sort_key(n, rounds, changed))
    return {n: catalog[n] for n in names}


CATALOG = _ordered(CATALOG)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in CATALOG.items() if q.oracle is not None}
