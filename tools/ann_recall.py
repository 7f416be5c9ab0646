"""ANN quality at scale (round-7 verdict #6): recall@k of the two
approximate-nearest-neighbor paths (LSH hyperplane buckets, IVF frozen
index) against the brute-force cosine top-k ground truth, at a real SF.

The catalog's ann entries are proven CORRECT (they match their own DuckDB
twins bitwise — the bucketing is deterministic), but correctness of the
approximation says nothing about its QUALITY: "ANN is the 100 TB path"
needs a measured recall number at a scale where buckets are actually
populated. This tool measures it; BASELINE.md records it; a floor is
asserted by tests/test_ann_recall.py.

recall@k = |ANN top-k ∩ brute top-k| / k, averaged over the query set
(vec_id % 97 == 0 — a deterministic ~1% sample, ~206 queries at sf1's
20k-vector corpus, far wider than the catalog entries' 10-query window).
Both sides use the identical (cos_sim DESC, neighbor_id ASC) tie order, so
the compared sets are deterministic.

Usage: python tools/ann_recall.py [sf_dir]   (default bench_data/sf1)
Prints one JSON line: {"sf_dir": ..., "n_queries": N,
  "lsh": {"recall@3": r, "recall@10": r}, "ivf": {...}}
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

QUERY_MOD = 97
KS = (3, 10)


def _topk_sets(df, kmax: int) -> dict[int, dict[int, set]]:
    """{k: {query_id: set(neighbor_id with rank<=k)}} from a ranked frame."""
    rows = df.filter(F.col("rank") <= kmax).collect()
    out: dict[int, dict[int, set]] = {k: defaultdict(set) for k in KS}
    for r in rows:
        for k in KS:
            if r["rank"] <= k:
                out[k][r["query_id"]].add(r["neighbor_id"])
    return out


def _recall(truth: dict[int, dict[int, set]], approx: dict[int, dict[int, set]]):
    res = {}
    for k in KS:
        t, a = truth[k], approx[k]
        # denominator is the TRUE set size (ties at the boundary keep it k
        # whenever the corpus has >= k neighbors)
        num = sum(len(t[q] & a.get(q, set())) for q in t)
        den = sum(len(t[q]) for q in t)
        res[f"recall@{k}"] = round(num / den, 4) if den else None
    return res


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "bench_data", "sf1")
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    from real_time_weather_data_pipeline_for_philippine_cities_spark import (
        operators,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.operators import (
        similarity as S,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.base import t
    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.ivf_index import (
        FROZEN_CENTROIDS,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.llm_queries import (
        EMB_DIM,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.session import (
        get_spark,
    )

    spark = get_spark("ann-recall")
    spark.sparkContext.setLogLevel("ERROR")
    emb = t(spark, sf_dir, "embeddings")
    pred = F.pmod(F.col("vid"), F.lit(QUERY_MOD)) == 0
    kmax = max(KS)

    import time

    t0 = time.monotonic()
    truth = _topk_sets(S.cosine_topk(emb, pred, k=kmax), kmax)
    brute_sec = round(time.monotonic() - t0, 2)
    n_queries = len(truth[max(KS)])
    _ = operators  # keep the package import explicit for tooling

    results = {}
    for n_tables in (1, 8, 16):
        t0 = time.monotonic()
        got = _topk_sets(
            S.ann_lsh_topk(
                emb, pred, n_planes=6, dim=EMB_DIM, k=kmax, n_tables=n_tables
            ),
            kmax,
        )
        results[f"lsh_L{n_tables}"] = {
            "n_planes": 6, "n_tables": n_tables,
            "expected_cand_frac": round(
                1 - (1 - 2 ** -6) ** n_tables, 4
            ),  # ~L/2^b for small L
            "wall_sec": round(time.monotonic() - t0, 2),
            **_recall(truth, got),
        }
        print(f"lsh L={n_tables}: {results[f'lsh_L{n_tables}']}", flush=True)
    for n_probe in (2, 4, 8):
        t0 = time.monotonic()
        got = _topk_sets(
            S.ivf_topk(
                emb, pred, n_probe=n_probe, k=kmax, centroids=FROZEN_CENTROIDS
            ),
            kmax,
        )
        results[f"ivf_p{n_probe}"] = {
            "n_probe": n_probe, "n_centroids": len(FROZEN_CENTROIDS),
            "cand_frac": round(n_probe / len(FROZEN_CENTROIDS), 4),
            "wall_sec": round(time.monotonic() - t0, 2),
            **_recall(truth, got),
        }
        print(f"ivf p={n_probe}: {results[f'ivf_p{n_probe}']}", flush=True)

    payload = {
        "sf_dir": sf_dir,
        "n_queries": n_queries,
        "query_pred": f"vec_id % {QUERY_MOD} == 0",
        "brute_sec": brute_sec,
        "configs": results,
    }
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
