"""Structural input caps for bounded-budget operators (round-5 advice,
hardened in round 6: the cap must be LOUD, and checking it must not pay a
second pass).

``bounded_key_cutoff`` makes the cap a single bounded top-k job: it fetches
the ``cap + 1`` smallest key values (TakeOrderedAndProject — never a full
sort or scan of the input), applies the excess policy, and returns the
largest admitted key. The caller then bounds its plan with a plain
``col <= cutoff`` filter — which reaches the parquet scan as a pushed
predicate, strictly better than an orderBy+limit subplan — or builds a
local relation from the fetched values directly. One job total; the old
shape (eager probe count + a second in-plan top-k) computed the bound
twice (round-6 review finding).

Key contract (round-6 advice): the ``col <= cutoff`` filter only agrees
with the admitted-values list when the keys are NON-NULL and UNIQUE —
NULLs sort first in the top-k (consuming cap budget) yet compare NULL in
the filter (excluded), and a duplicate at the cutoff admits more rows than
the budget. So the probe drops NULL keys up front (mirroring the filter's
semantics) and RAISES on any duplicate among the fetched keys — the only
duplicates that could distort the bound are at or below the cutoff, which
is exactly the window the probe fetched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bounded_key_cutoff(
    df: DataFrame, key_col: str, cap: int, on_excess: str, what: str
):
    """Returns ``(cutoff, values)``: the largest admitted key (or None if
    the input is under the cap — no filter needed) and the admitted key
    values themselves (``≤ cap`` of them, ascending, non-null, unique —
    NULL keys are ignored, duplicate keys raise; see module docstring).

    ``on_excess='error'`` (the library default) raises when the cap would
    bind; ``'truncate'`` warns and admits the ``cap`` smallest keys — the
    explicit opt-in used by verification-budget catalog entries whose
    oracles mirror the same LIMIT. Never silent.
    """
    if on_excess not in ("error", "truncate"):
        raise ValueError(f"on_excess must be 'error' or 'truncate': {on_excess!r}")
    rows = (
        df.select(F.col(key_col).alias("k"))
        # NULL keys would consume cap budget here yet never pass the
        # caller's `col <= cutoff` filter — exclude them from the budget
        # the same way the filter does.
        .filter(F.col("k").isNotNull())
        .orderBy(F.col("k").asc())
        .limit(cap + 1)
        .collect()
    )
    values = [r["k"] for r in rows]
    if len(set(values)) != len(values):
        raise ValueError(
            f"{what}: duplicate {key_col} values at/below the cap boundary — "
            "a `<= cutoff` bound would admit more than the budgeted rows; "
            "pass a deduplicated (unique-key) relation"
        )
    if len(values) > cap:
        msg = (
            f"{what}: input exceeds the structural cap ({cap}); "
            f"only the {cap} smallest {key_col} values are considered"
        )
        if on_excess == "error":
            raise ValueError(msg + " — pass on_excess='truncate' to accept")
        import warnings

        warnings.warn(msg, stacklevel=3)
        values = values[:cap]
        return values[-1], values
    return None, values
