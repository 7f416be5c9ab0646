"""Enforcement of the F.round decidable-safe ledger (tools/round_audit.py).

Every ``F.round(`` site in the package must carry an explicit
classification; a new un-audited site — or a ledger rule that no longer
matches anything (stale after a conversion) — fails here. This is the
regression gate the round-8 verdict asked for: no round-on-raw-ratio can
enter the codebase without being either converted to the shared
integer-space/IEEE templates or explicitly inventoried.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from round_audit import audit  # noqa: E402


def test_every_round_site_is_classified_and_no_dead_rules():
    classified, unclassified, dead, miscounted = audit()
    assert not unclassified, f"un-audited F.round sites: {unclassified}"
    assert not dead, f"ledger rules matching nothing (stale): {dead}"
    # a rule matching MORE sites than it declares means a new site
    # silently inherited a neighbor's class (round-8 advice)
    assert not miscounted, f"rules with unexpected match counts: {miscounted}"
    # the inventory exists and covers the expected scale of the codebase
    assert len(classified) > 50


def test_converted_sites_do_not_reappear():
    """The tie-margin batch converted these expressions to the shared
    templates; none of them may come back as a raw F.round."""
    classified, _u, _d, _m = audit()
    calls = [c for _r, _l, c, _cls, _n in classified]
    for banned in (
        'F.round(F.col("n_chars")',        # mean_tok_len
        'F.round(F.col("n_shared")',       # shared_ratio
        'F.round(F.col("n_oov")',          # oov_rate
        'F.round(F.col("n_new")',          # novelty
        'F.round(F.avg("l_quantity")',     # pricing avg_qty
        'F.round(F.col("tf")*F.col("n_docs")',  # tfidf
        # round-9 batch
        'F.round(dot_col(',                # cosine top-k family
        'F.round(F.percent_rank()',        # window_rank_suite
        'F.round(F.avg("c_acctbal")',      # cold_customer threshold
        'F.round(F.expr("percentile(value, 0.5)")',   # percentiles/MAD
        'F.round(F.expr("percentile(fanout, 0.99)")', # skew profile
    ):
        assert not any(banned in c for c in calls), banned
