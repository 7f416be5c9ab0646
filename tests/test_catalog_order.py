"""Proof-window rotation: the driver verifies only the first 50 catalog
entries, so the ordering function must put the stalest proof first —
computed from the CORRECTNESS_r*.json artifacts, not hand-rotated lists
(VERDICT r03 #2)."""

from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.catalog import (
    CATALOG,
    _PLAN_CHANGED,
    proof_sort_key,
)

GREEN = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
RED = {"rows_match": False, "schema_match": True, "hash_match": False, "err": None}
ERR = {"rows_match": False, "schema_match": False, "hash_match": False, "err": "boom"}


def _order(names, rounds, changed=()):
    return sorted(names, key=lambda n: proof_sort_key(n, rounds, changed))


def test_never_checked_and_red_sort_before_green():
    rounds = [
        (1, {"a": GREEN, "b": GREEN, "c": RED}),
        (2, {"a": GREEN, "c": RED}),
    ]
    # d never checked; c red at its latest check; b green but stale (r1);
    # a green and fresh (r2).
    assert _order(["a", "b", "c", "d"], rounds) == ["c", "d", "b", "a"]


def test_stalest_green_rotates_first():
    rounds = [
        (1, {"x": GREEN, "y": GREEN}),
        (2, {"y": GREEN}),
        (3, {"z": GREEN}),
    ]
    assert _order(["x", "y", "z"], rounds) == ["x", "y", "z"]


def test_red_after_green_voids_carryover():
    # green in r1 but red at the most recent check → urgent tier.
    rounds = [(1, {"q": GREEN}), (2, {"q": RED}), (1, {"ok": GREEN})]
    assert _order(["q", "ok"], rounds) == ["q", "ok"]
    assert proof_sort_key("q", rounds)[0] == 1


def test_driver_error_counts_as_unproven():
    rounds = [(1, {"q": ERR})]
    assert proof_sort_key("q", rounds)[0] == 1


def test_plan_changed_force_fronts_even_fresh_green():
    rounds = [(3, {"hot": GREEN, "other": GREEN}), (1, {"stale": GREEN})]
    assert _order(["hot", "other", "stale"], rounds, changed=("hot",)) == [
        "hot",
        "stale",
        "other",
    ]


def test_never_green_sorts_before_every_green():
    """The core invariant (VERDICT r04 #8): an entry with NO green driver
    row ever must sort before EVERY entry that has one, whatever rounds
    exist — tier 1 < tier 2 by construction; assert it black-box."""
    rounds = [
        (1, {"g_old": GREEN}),
        (2, {"g_mid": GREEN, "r_latest": GREEN}),
        (3, {"g_new": GREEN, "r_latest": RED}),
    ]
    greens = ["g_old", "g_mid", "g_new"]
    for never in ["unchecked", "r_latest"]:
        for g in greens:
            assert proof_sort_key(never, rounds) < proof_sort_key(g, rounds)


def test_order_is_deterministic_given_artifacts():
    rounds = [(1, {"a": GREEN, "b": RED}), (2, {"c": GREEN})]
    names = ["c", "a", "b", "d"]
    first = _order(names, rounds, changed=("a",))
    for _ in range(5):
        assert _order(list(reversed(names)), rounds, changed=("a",)) == first


def test_live_catalog_window_holds_plan_changed_and_no_stale_tail():
    names = list(CATALOG)
    window, tail = names[:50], names[50:]
    for changed in _PLAN_CHANGED:
        assert changed in window
    # No tail entry may be more proof-stale than any window entry: the
    # window is exactly the 50 smallest sort keys (sorted() guarantees it,
    # but pin it against future manual reordering of CATALOG).
    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.catalog import (
        _load_correctness_rounds,
    )
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    rounds = _load_correctness_rounds(root)
    changed = tuple(_PLAN_CHANGED)
    worst_window = max(proof_sort_key(n, rounds, changed) for n in window)
    best_tail = min(proof_sort_key(n, rounds, changed) for n in tail)
    assert worst_window <= best_tail
