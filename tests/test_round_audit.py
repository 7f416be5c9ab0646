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
    # (33 sites after the round-10 batch emptied the risky-latent class —
    # what remains is exactly the decidable-safe families)
    assert len(classified) > 30
    # the risky-latent class is retired for good: a new risky site must
    # surface as UNCLASSIFIED (asserted above), never as a quiet re-entry
    assert not any(cls == "risky-latent" for _r, _l, _c, cls, _n in classified)


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
        # round-10 batch (the final one — risky-latent is now empty)
        'F.round(F.expr(_fold_sum_spark(err))',       # quantize error
        'F.round(1.3*F.avg("o_totalprice")',          # above_cust_avg
        'F.round("mean",6)',                          # value/norm outliers
        'F.round("std",6)',
        'F.round(score,6)',                           # bm25
        'F.round(slope,4)',                           # zipf fit
        'F.round(F.min("value"),2)',                  # daily_minmax
        'F.round(F.col("obs_val"),6)',                # resample interp
        'F.round("value",4)',                         # asof value
        'F.lag("n_events").over(w)/F.lag',            # pct_change ratio
    ):
        assert not any(banned in c for c in calls), banned
