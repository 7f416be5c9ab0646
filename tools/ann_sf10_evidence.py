"""sf10 evidence for ann_lsh_multitable (round-8 verdict item 5).

The multi-table oracle is the one documented sf10 exclusion (its DuckDB
twin measures 451.6 s at sf1 and exceeds the 1800 s box at sf10), so the
flagship scale path had no proof above sf1. This tool produces
ENGINE-SIDE evidence at sf10 that is *provably sound* rather than
oracle-compared, using two structural facts:

  1. table 0 of the multi-table index IS the single-table plane set
     (operators/similarity.lsh_planes: table 0 keeps the historical
     naming), so the L-table candidate pool is a SUPERSET of the
     single-table pool — per query, the r-th best multi-table cosine must
     dominate the r-th best single-table cosine for every rank r;
  2. the exact operator scores the full corpus, so its r-th best cosine
     dominates ANY bucketed variant's r-th best.

Together: exact >= multitable >= single-table, per (query, rank) — a
bitwise-checkable sandwich with zero tolerance, plus measured recall@k of
the multi-table result against the exact top-k (the number the "ANN is
the scale path" claim needs at this decade).

Writes ANN_SF10.json:
  {sf_dir, n_vectors, n_queries, k, n_tables,
   sandwich_violations: 0, pairs_checked,
   recall_multi, recall_single,
   candidate_superset_ok, single_pairs, multi_pairs,
   wall_sec: {exact, single, multi}}

Usage: python tools/ann_sf10_evidence.py [sf_dir]   (default bench_data/sf10)
Exit code: number of violated invariants.
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 3          # the catalog entry's k
N_TABLES = 8   # the catalog entry's L
N_PLANES = 6
DIM = 64


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.getcwd(), "bench_data", "sf10"
    )
    from pyspark.sql import functions as F

    from real_time_weather_data_pipeline_for_philippine_cities_spark.operators import (
        similarity as S,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.base import t
    from real_time_weather_data_pipeline_for_philippine_cities_spark.session import (
        get_spark,
    )

    spark = get_spark("ann-sf10-evidence")
    spark.sparkContext.setLogLevel("ERROR")
    emb = t(spark, sf_dir, "embeddings")
    n_vectors = emb.count()
    pred = F.col("vid") < 10  # the catalog entry's query set

    def ranked(df):
        out = {}
        for r in df.collect():
            out[(r["query_id"], r["rank"])] = (r["cos_sim"], r["neighbor_id"])
        return out

    t0 = time.time()
    exact = ranked(S.cosine_topk(emb, pred, k=K))
    t_exact = round(time.time() - t0, 1)
    t0 = time.time()
    single = ranked(S.ann_lsh_topk(emb, pred, n_planes=N_PLANES, dim=DIM, k=K))
    t_single = round(time.time() - t0, 1)
    t0 = time.time()
    multi = ranked(
        S.ann_lsh_topk(
            emb, pred, n_planes=N_PLANES, dim=DIM, k=K, n_tables=N_TABLES
        )
    )
    t_multi = round(time.time() - t0, 1)

    violations = []
    checked = 0
    for key, (cos_m, _nb) in multi.items():
        checked += 1
        if key in exact and exact[key][0] < cos_m:
            violations.append(("exact>=multi", key, exact[key][0], cos_m))
        if key in single and cos_m < single[key][0]:
            violations.append(("multi>=single", key, cos_m, single[key][0]))
    # every single-table rank must exist in multi (superset pool implies
    # at least as many candidates per query)
    for key in single:
        checked += 1
        if key not in multi:
            violations.append(("multi-rank-missing", key, None, None))

    def topk_sets(r):
        out = defaultdict(set)
        for (q, _rk), (_c, nb) in r.items():
            out[q].add(nb)
        return out

    ex_s, mu_s, si_s = topk_sets(exact), topk_sets(multi), topk_sets(single)
    rec = lambda a: sum(len(ex_s[q] & a.get(q, set())) for q in ex_s) / max(
        1, sum(len(ex_s[q]) for q in ex_s)
    )

    # candidate-pool superset (the test_ann_recall invariant, at sf10):
    big_k = 10**9
    single_pairs = {
        (r["query_id"], r["neighbor_id"])
        for r in S.ann_lsh_topk(emb, pred, k=big_k, n_tables=1).collect()
    }
    multi_pairs = {
        (r["query_id"], r["neighbor_id"])
        for r in S.ann_lsh_topk(emb, pred, k=big_k, n_tables=N_TABLES).collect()
    }
    superset_ok = bool(single_pairs) and single_pairs <= multi_pairs
    if not superset_ok:
        violations.append(("candidate-superset", None, len(single_pairs), len(multi_pairs)))

    payload = {
        "sf_dir": sf_dir,
        "n_vectors": n_vectors,
        "n_queries": len(ex_s),
        "k": K,
        "n_tables": N_TABLES,
        "sandwich_violations": len(violations),
        "violations": violations[:10],
        "pairs_checked": checked,
        "recall_multi": round(rec(mu_s), 4),
        "recall_single": round(rec(si_s), 4),
        "candidate_superset_ok": superset_ok,
        "single_pairs": len(single_pairs),
        "multi_pairs": len(multi_pairs),
        "wall_sec": {"exact": t_exact, "single": t_single, "multi": t_multi},
    }
    out = os.path.join(os.getcwd(), "ANN_SF10.json")
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))
    return len(violations)


if __name__ == "__main__":
    sys.exit(main())
