"""Heavy-cohort scale probe: sf1 → sf10 (one decade) wall-clock scaling
exponents (VERDICT r05 #3).

For each heavy catalog query, runs the Spark plan at bench_data/sf1 and
bench_data/sf10 (min of 2 interleaved reps per SF, full-result count()
probe) and reports the per-query scaling exponent
``log10(t_sf10 / t_sf1)`` — 1.0 = perfectly linear in data size, < 1 =
sub-linear (fixed overheads amortizing), > 1 = super-linear (a scale
hazard: candidate blowup, skewed key, memory pressure).

The 100 TB claims rest on these exponents holding through the decade
where shuffle sizes stop fitting in page cache; record the JSON line in
BASELINE.md.

Usage: python tools/sf10_probe.py [query ...]   (default: the heavy cohort)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVY_COHORT = [
    "pagerank_dup_graph",
    "dedup_cluster_assign",
    "dedup_allpairs_jaccard",
    "dedup_ngram_jaccard",
    "substring_dup_spans",
    "part_basket_triangles",
    "shingle_containment",
    "dedup_minhash_lsh",
    "tfidf_top_terms",  # scan-bound control: its exponent calibrates the host
]

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(ROOT, "bench_data", "sf1")
SF10 = os.path.join(ROOT, "bench_data", "sf10")


def main() -> None:
    names = sys.argv[1:] or HEAVY_COHORT
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.catalog import (
        CATALOG,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.session import (
        get_spark,
    )

    spark = get_spark("sf10-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str, sf_dir: str) -> tuple[float, int]:
        t0 = time.monotonic()
        n = CATALOG[name].fn(spark, sf_dir).count()
        return time.monotonic() - t0, n

    times: dict[str, dict[str, list[float]]] = {n: {"sf1": [], "sf10": []} for n in names}
    rows: dict[str, dict[str, int]] = {n: {} for n in names}
    for _rep in range(2):  # interleaved (host-noise discipline)
        for n in names:
            for sf, d in (("sf1", SF1), ("sf10", SF10)):
                t, c = run(n, d)
                times[n][sf].append(t)
                rows[n][sf] = c
                print(f"{n} {sf} rep: {t:.1f}s ({c} rows)", flush=True)

    out = {}
    for n in names:
        t1, t10 = min(times[n]["sf1"]), min(times[n]["sf10"])
        out[n] = {
            "sf1_sec": round(t1, 2),
            "sf10_sec": round(t10, 2),
            "rows_sf1": rows[n]["sf1"],
            "rows_sf10": rows[n]["sf10"],
            "exponent": round(math.log10(t10 / t1), 3) if t1 > 0 else None,
        }
    try:
        load = round(os.getloadavg()[0], 2)
    except OSError:
        load = None
    print(json.dumps({"metric": "sf10_scale_probe", "loadavg": load, "queries": out}))


if __name__ == "__main__":
    main()
