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
    # round 7: fuzzy probe fan-out parametrized to defaultParallelism
    # (was a literal 32 — identical plan on this host, but the operator
    # internals moved: round-6 verdict #3) and the rebuilt local relation
    # now derives the probe column's type from the probe schema (round-6
    # advice). Cheap re-proof.
    "fuzzy_name_match",
    # round 7: bounded_key_cutoff drops NULL keys before the top-k and
    # raises on duplicate keys at the cap boundary (round-6 advice) — the
    # probe job feeding this entry's `<= cutoff` bound changed.
    "near_dup_embeddings",
    # round 7: scd2_apply_write's promote rewritten from read-and-rewrite
    # to O(1) directory renames (round-6 verdict #4) + remote-scheme
    # rejection (round-6 advice). The merge plan itself is unchanged, but
    # re-prove the catalog entry under the reworked module.
    "scd2_apply",
    # round 7: the sf10 strict sweep caught pricing_summary's raw-double
    # money sums drifting a last cent at ~54M rows/group — both money
    # aggregates and avg_disc now accumulate exact integer units (cents /
    # 1e-4 units), oracle mirrored; hourly_window_agg's sum_value got the
    # identical fix preemptively (same class, one decade of headroom).
    "pricing_summary",
    "hourly_window_agg",
    # round 7: NULL-robustness sweep — the injectable fetchers now mirror
    # the reference's no-result geocode path ({} instead of crashing on a
    # NULL name), and near_dup's pairing excludes NULL vectors up front
    # (the SQL twin's threshold predicate already dropped them). Outputs
    # bitwise-identical on real data at sf0.01/sf1; re-proof is free —
    # this entry was already in the stale-rotation window.
    "weather_pipeline_e2e",
    # round 7: weird-content sweep — empty documents crashed the quality
    # ratio expressions under ANSI (length 0 divisor; nullif guard added
    # on BOTH engines), and ragged/NaN embedding vectors crashed the
    # Arrow cosine kernels (per-length sub-blocks now mirror the SQL
    # twin's NULL-dot drop). Values identical on real data, but these
    # plans/oracles changed textually:
    "quality_score",
    "quality_filter",
    "token_budget_select",
    "curation_funnel",
    "embedding_decontam",
    # round 7: the 2^61-key probe showed the packed argmax encodings
    # (value*ID_CAP - id) silently MIS-RANK when ids exceed the cap —
    # the worst failure class. In-plan assert_id_domain guards added
    # (plans/base.py): breach now raises with a dense_ids re-key hint.
    "inverted_index_stats",
    "canonical_doc_assign",
    # round 7: the sf10 sweep also caught unigram_logprob rounding a raw
    # double division at a true half-case (-8.1276605 split across
    # engines at the 6th decimal) — final quantization now happens in
    # exact integer space (half-away-from-zero integer division), oracle
    # mirrored.
    "unigram_logprob",
    # round 7, temporal-extremes sweep: every epoch-seconds conversion
    # rewritten to an exact integer floor on BOTH engines.
    # unix_timestamp truncates toward zero (a -1 µs timestamp bucketed
    # to 0 instead of -1) and the oracles' floor(epoch(ts)) double loses
    # microseconds at year-9999 magnitude (.999999 rounds into the NEXT
    # second). Now: Spark CAST(ts AS LONG) (true micros floorDiv) /
    # DuckDB epoch(date_trunc('second', ts)) (exact integer < 2^53),
    # with pmod/div for the resample bucket quotient.
    "epoch_roundtrip",
    "resample_interpolate",
    "trailing_hour_stats",
    # round 7, degenerate-parity sweep (bitwise oracle parity on the
    # empty/all-NULL/weird/dup/2^61 fixtures — the survive-only sweeps'
    # .count() probe let Catalyst PRUNE poisoned expressions, hiding
    # that one NaN metric row ANSI-aborted every micro-quantization
    # under real materialization). Two shared contracts landed:
    # finite()/finite_pred (non-finite metric = missing, plans/base.py)
    # across the events.value surface, and finite_vec_pred (well-formed
    # vector = full-dim + all-finite, operators/similarity.py) across
    # the embedding-geometry surface; plus per-query NULL-semantics
    # mirrors (null-skip concat_ws dedup key, '' string_agg identity,
    # NULL-text -> no fingerprint/cluster/shingles, NULL media -> NULL
    # features, unknown revenue unrankable, violation counts total).
    "sessionize_events",
    "cube_event_stats",
    "percentiles_by_type",
    "moving_avg_7d",
    "event_value_outliers",
    "mad_outliers",
    "quantile_sketch",
    "winsorized_stats",
    "numeric_histogram",
    "dq_checks",
    "embedding_cosine_topk",
    "ann_lsh_cosine",
    "ivf_cosine_topk",
    "embedding_quantize_error",
    "embedding_norm_outliers",
    "doc_fingerprint",
    "dedup_exact",
    "types_per_user_stragg",
    "substring_dup_spans",
    "revenue_gini",
    "multimodal_features",
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
