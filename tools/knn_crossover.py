"""Measure the exact-vs-LSH crossover for the corpus-scale kNN JOIN.

Round-9 verdict ("what's wrong" #3): at sf10 with the catalog's 10-query
set, blocked-exact brute cost 5.1 s vs 31.1 s for multi-table LSH — the
bucketed path's win regime (query set ≈ corpus, i.e. the kNN self-join)
was asserted from asymptotics but never measured. This tool measures it:
every one of the sf10 corpus's 200k vectors is a query, k=3.

* exact: operators/knn.knn_join_exact — block-pair replication, one
  numpy pass per block pair; work is EXACTLY n²·d multiply-adds.
* lsh:   operators/knn.knn_join_lsh — per-(table, bucket) kernels; work
  is Σ|bucket|²·d ≈ n²·L/2^b.

Also records recall@k of the LSH answer against the exact answer (the
price of the speedup — this is the quality/cost point, not free lunch).

Writes KNN_CROSSOVER.json at the repo root. Usage:
    python tools/knn_crossover.py [sf_dir] [n_planes] [n_tables]
Defaults: bench_data/sf10, 12 planes, 4 tables.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

os.environ.setdefault("SPARK_DRIVER_MEM", "48g")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "bench_data", "sf10")
    n_planes = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    n_tables = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    k = 3

    from real_time_weather_data_pipeline_for_philippine_cities_spark.operators.knn import (
        knn_join_exact,
        knn_join_lsh,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.session import (
        get_spark,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.sources.registry import (
        load_table,
    )

    spark = get_spark("knn-crossover")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    print(f"corpus: {n} vectors from {sf_dir}", flush=True)

    t0 = time.monotonic()
    exact = knn_join_exact(emb, k=k, n_blocks=32).collect()
    exact_wall = round(time.monotonic() - t0, 1)
    print(f"exact kNN join: {len(exact)} rows in {exact_wall}s", flush=True)

    t0 = time.monotonic()
    approx = knn_join_lsh(
        emb, k=k, n_planes=n_planes, n_tables=n_tables
    ).collect()
    lsh_wall = round(time.monotonic() - t0, 1)
    print(f"LSH kNN join (b={n_planes}, L={n_tables}): "
          f"{len(approx)} rows in {lsh_wall}s", flush=True)

    truth: dict[int, set[int]] = {}
    for r in exact:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(
        1 for r in approx if r.neighbor_id in truth.get(r.query_id, set())
    )
    total = sum(len(v) for v in truth.values())
    recall = round(hits / total, 4) if total else None
    covered = round(len({r.query_id for r in approx}) / max(len(truth), 1), 4)

    out = {
        "sf_dir": sf_dir,
        "n_vectors": n,
        "k": k,
        "exact": {"wall_sec": exact_wall, "rows": len(exact), "n_blocks": 32},
        "lsh": {
            "wall_sec": lsh_wall,
            "rows": len(approx),
            "n_planes": n_planes,
            "n_tables": n_tables,
        },
        "speedup": round(exact_wall / lsh_wall, 2) if lsh_wall else None,
        "recall_at_k": recall,
        "query_coverage": covered,
        "loadavg_start": os.getloadavg()[0],
    }
    path = os.path.join(ROOT, "KNN_CROSSOVER.json")
    json.dump(out, open(path, "w"), indent=1)
    print(json.dumps(out), flush=True)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
