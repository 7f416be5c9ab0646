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
    # round 10, tie-margin FINAL batch + round-9-advice guards: the last
    # 28 risky-latent F.round sites through the exact-integer round_div /
    # IEEE-identical quantize_double templates (domain-guarded where the
    # magnitude is unbounded), the nrm > 0 zero-vector gate on every
    # cosine surface, and quantize_domain_guard on the unbounded
    # percentile/mean quantize sites. Oracle twins moved in the same
    # diffs; every name below is a query whose PLAN text changed.
    "embedding_cosine_topk",     # nrm > 0 gate (both twins)
    "ann_lsh_cosine",            # nrm > 0 gate
    "ann_lsh_multitable",        # nrm > 0 gate
    "near_dup_embeddings",       # oracle nrm > 0 + NULL-gated quantize
    "percentiles_by_type",       # guard + named-column pre-projection
    "mad_outliers",              # guard + named-column pre-projection
    "winsorized_stats",          # guard on bounds and means
    "asof_join",                 # value @4dp -> guarded quantize
    "day_over_day_change",       # pct_change -> round_div
    "event_value_outliers",      # mean -> round_div, std -> quantize
    "ewma_per_user",             # fold -> named col + guarded quantize
    "resample_interpolate",      # 4 interp rounds -> 1 guarded quantize
    "market_share_by_year",      # cents ratio -> round_div
    "event_transitions",         # share -> round_div
    "revenue_gini",              # ratio -> named cols + quantize
    "zipf_slope",                # fit -> named cols + quantize
    "embedding_quantize_error",  # err folds -> guarded quantize
    "token_entropy",             # H -> named col + quantize
    "embedding_norm_outliers",   # mean -> round_div, std -> quantize
    "bigram_pmi",                # pmi -> named col + quantize
    "geocode_candidate_match",   # synth lat/lon -> guarded quantize
    "quantile_sketch",           # rel-err -> guarded quantize
    "daily_minmax",              # min/max/avg -> guarded quantize
    "bm25_keyword_topk",         # score -> named col + quantize
    "above_cust_avg_orders",     # 1.3*avg -> exact round_div threshold
]

# (Earlier rounds' force-front lists lived here; superseded each round —
# the per-round sets are recorded in BASELINE.md and git history.)


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
