"""Noise-normalized comparison of two bench.py artifacts.

Host contention on this box inflates ALL queries by a roughly uniform
factor run-to-run (BASELINE.md noise notes: same-binary totals spread
85-95 s at sf0.1). Comparing raw per-query times therefore reports
phantom regressions. This tool divides that factor out: it estimates the
host factor as the MEDIAN per-query ratio over the queries common to both
runs, then reports only queries whose ratio deviates from that median by
more than a threshold — i.e. plan-level changes, not host weather.

Usage: python tools/bench_compare.py OLD.json NEW.json [--threshold 1.3]
Exit code: number of normalized regressions (0 = clean).
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys


def compare(old: dict, new: dict, threshold: float) -> dict:
    oq, nq = old["queries"], new["queries"]
    common = {k: (oq[k], nq[k]) for k in oq.keys() & nq.keys()}
    # ignore sub-50ms queries: their ratios are dominated by fixed overhead
    ratios = [n / o for o, n in common.values() if o >= 0.05]
    host_factor = statistics.median(ratios) if ratios else 1.0
    regressions, improvements = [], []
    for name, (o, n) in sorted(common.items()):
        if o < 0.05:
            continue
        norm = (n / o) / host_factor
        if norm > threshold:
            regressions.append({"query": name, "old": o, "new": n, "norm_ratio": round(norm, 2)})
        elif norm < 1 / threshold:
            improvements.append({"query": name, "old": o, "new": n, "norm_ratio": round(norm, 2)})
    return {
        "host_factor": round(host_factor, 3),
        "n_common": len(common),
        "only_in_new": sorted(nq.keys() - oq.keys()),
        "only_in_old": sorted(oq.keys() - nq.keys()),
        "regressions": sorted(regressions, key=lambda r: -r["norm_ratio"]),
        "improvements": sorted(improvements, key=lambda r: r["norm_ratio"]),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.3)
    args = ap.parse_args()
    with open(args.old) as f:
        old = json.load(f)
    with open(args.new) as f:
        new = json.load(f)
    result = compare(old, new, args.threshold)
    print(json.dumps(result, indent=2))
    return len(result["regressions"])


if __name__ == "__main__":
    sys.exit(main())
