"""Executed-plan evidence that AQE skew-split fires on a ShuffledHashJoin
(r10 verdict item 5: the SHJ session confs change the join strategy for
exactly the skew-prone band joins, and the guide cautions that skew-split
coverage for SHJ differs by Spark version — so prove it on THIS version).

Reuses skew_experiment.py's planted hot key (half of all rows on key 0,
thresholds lowered so a ~40 MB hot partition triggers the same rewrite a
multi-GB one triggers at the 256 MB default). Two variants:

  * hinted  — shuffle_hash hint (the experiment's shape)
  * planner — no hint, the repo's default session confs
              (preferSortMergeJoin=false + AQE localmap threshold)

For each, runs the join and dumps the EXECUTED (isFinalPlan=true) plan to
plans/r11/skew_shj_<variant>.txt, then greps it for the join node and the
AQEShuffleRead skew markers. Prints one JSON line with the findings.

Usage: python tools/skew_shj_plan.py [n_rows]   (default 10_000_000)
"""

from __future__ import annotations

import json
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from skew_experiment import build_dim, build_fact  # noqa: E402

from real_time_weather_data_pipeline_for_philippine_cities_spark.session import (  # noqa: E402
    get_spark,
)

OUT = Path(__file__).resolve().parent.parent / "plans" / "r11"


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark("skew-shj-plan")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    fact = build_fact(spark, n_rows).persist()
    dim = build_dim(spark).persist()
    fact.count(), dim.count()

    results = {}
    for variant in ("hinted", "planner"):
        d = dim.hint("shuffle_hash") if variant == "hinted" else dim
        # the experiment's probe: keeps v/w (and the wide pad via a length
        # sum) live through the join so pruning cannot shrink the hot
        # partition below the (lowered) skew threshold
        joined = (
            fact.join(d, "k")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum((F.col("v") * 100).cast("long")).alias("sv"),
                F.sum((F.col("w") * 100).cast("long")).alias("sw"),
                F.sum(F.length("pad")).alias("sp"),
            )
        )
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        (OUT / f"skew_shj_{variant}.txt").write_text(plan)
        skew_reads = len(re.findall(r"AQEShuffleRead.*skewed|isSkew=true|skewed=true", plan))
        results[variant] = {
            "final": "isFinalPlan=true" in plan,
            "shj": "ShuffledHashJoin" in plan,
            "smj": "SortMergeJoin" in plan,
            "skew_markers": skew_reads,
            # per-partition split counts show up as e.g. "2 skewed partitions"
            "skew_lines": [
                ln.strip()[:120]
                for ln in plan.splitlines()
                if "kew" in ln and "AQEShuffleRead" in ln
            ][:4],
        }
    print(json.dumps({"n_rows": n_rows, "results": results,
                      "loadavg": round(os.getloadavg()[0], 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
