"""Run the sf1 strict sweep: EVERY oracle-paired catalog query,
strict-compared (values bitwise, dtype kinds) against its DuckDB twin at
bench_data/sf1 — 10x the canonical sf0.01 proof scale.

Round 6 (VERDICT r05 #1) retired the former ORACLE_QUADRATIC exclusion
list: the all-pairs twins were linearized with the Spark side's own
lossless rarest-prefix candidate generation (brute == linearized pinned in
DuckDB by tests/test_oracle_linearization.py), the iterative-CTE twins
(pagerank, ivf) got AS MATERIALIZED hints so DuckDB stops re-inlining the
expensive pair/assignment subqueries per reference, and the exact-pairs
baselines were already structurally capped (EXACT_PAIRS_CAP). Measured sf1
oracle times: all ≤ 50 s except ivf_cosine_topk (~150 s, the 16×64-dim
assignment fold over 20k vectors — inherent to a full-index oracle).

Usage:  python tools/sf1_sweep.py          # prints the strict_check cmd
        python tools/sf1_sweep.py --run    # executes it (~30-40 min)
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: retired round 6 — kept empty so a future genuinely-infeasible twin has
#: an explicit, documented place to live rather than a silent skip.
ORACLE_QUADRATIC: set[str] = set()


def names() -> list[str]:
    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.catalog import CATALOG

    return sorted(
        n
        for n, q in CATALOG.items()
        if q.oracle is not None and n not in ORACLE_QUADRATIC
    )


def main() -> None:
    ns = names()
    # with no exclusions the sweep IS the full catalog: invoke the no-args
    # form so strict_check writes the STRICT_sf1.json artifact (it refuses
    # to write one for partial runs).
    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.catalog import (
        CATALOG,
    )

    full = len(ns) == sum(1 for q in CATALOG.values() if q.oracle is not None)
    cmd = [sys.executable, "tools/strict_check.py", *([] if full else ns)]
    env = {
        **os.environ,
        "STRICT_SF_DIR": os.environ.get(
            "STRICT_SF_DIR", os.path.join(os.getcwd(), "bench_data/sf1")
        ),
        "SPARK_DRIVER_MEM": os.environ.get("SPARK_DRIVER_MEM", "48g"),
    }
    print(f"{len(ns)} queries; STRICT_SF_DIR={env['STRICT_SF_DIR']}")
    if "--run" in sys.argv:
        raise SystemExit(subprocess.call(cmd, env=env))
    print("STRICT_SF_DIR=... python", " ".join(cmd[1:]))


if __name__ == "__main__":
    main()
