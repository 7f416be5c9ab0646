"""Run the sf1 strict sweep: every catalog query whose DuckDB oracle is
sub-quadratic, strict-compared (values bitwise, dtype kinds) against the
oracle at bench_data/sf1 — 10x the canonical sf0.01 proof scale.

The exclusions are the exactness-baseline entries whose ORACLES are
quadratic (all-pairs similarity, iterative-graph recursive CTEs): DuckDB
needs tens of CPU-minutes each at sf1, so they stay proven at sf0.01 and
are separately value-verified at sf1 where feasible (the near-dup /
containment pair-set equality checks recorded in BASELINE.md).

Usage:  python tools/sf1_sweep.py          # prints the strict_check cmd
        python tools/sf1_sweep.py --run    # executes it (1-2 h)
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: oracle-quadratic entries excluded from the sf1 sweep (sf0.01-proven).
ORACLE_QUADRATIC = {
    "dedup_allpairs_jaccard",
    "dedup_ngram_jaccard",
    "near_dup_embeddings",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_cluster_assign",
    "pagerank_dup_graph",
    "part_basket_triangles",
    "incremental_near_dup",
    "ann_lsh_cosine",
    "ivf_cosine_topk",
    "embedding_cosine_topk",
    "embedding_decontam",
    "decontaminate_overlap",
}


def names() -> list[str]:
    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.catalog import CATALOG

    return sorted(
        n
        for n, q in CATALOG.items()
        if q.oracle is not None and n not in ORACLE_QUADRATIC
    )


def main() -> None:
    ns = names()
    cmd = [sys.executable, "tools/strict_check.py", *ns]
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
