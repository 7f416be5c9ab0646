"""AQE skew-join vs manual salting on a PLANTED hot key (VERDICT r05 #6).

Builds a synthetic skewed fact (half of all rows on one join key) large
enough that the hot post-shuffle partition crosses the (lowered) AQE skew
thresholds, joins it to a 10k-row dim through a SHUFFLE join (broadcast
would sidestep the pathology — at 100 TB the dim side often exceeds the
broadcast threshold anyway), and times three plans:

  * aqe_skew   — plain join, spark.sql.adaptive.skewJoin.enabled=true
  * no_skew    — plain join, skewJoin disabled (the straw man: one reducer
                 owns the hot key)
  * salted     — operators.skew.salted_join, n_salt=16, AQE skew off

Thresholds are lowered (8 MB skewed / 2 MB advisory) so the experiment's
~40 MB hot partition triggers the same rewrite a multi-GB partition
triggers at the 256 MB default on a real cluster — the mechanism under
test is identical.

All three must produce identical aggregates (asserted). Prints one JSON
line; run twice interleaved and min-reduce to de-noise. The conclusion is
recorded in BASELINE.md; the AQE-split mechanics are pinned by
tests/test_skew_aqe.py.

Usage: python tools/skew_experiment.py [n_rows]   (default 20_000_000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real_time_weather_data_pipeline_for_philippine_cities_spark.operators.skew import (
    salted_join,
)
from real_time_weather_data_pipeline_for_philippine_cities_spark.session import get_spark

N_KEYS = 10_000
HOT_SHARE = 0.5  # fraction of fact rows landing on key 0


def build_fact(spark, n_rows: int):
    """Half the rows on key 0, the rest uniform over N_KEYS — deterministic
    (id-derived, no RNG) and wide enough that a hot partition has real
    bytes behind it."""
    return spark.range(n_rows).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.col("id"), F.lit(N_KEYS)))
        .cast("long")
        .alias("k"),
        (F.col("id") * 37 % 1000).cast("double").alias("v"),
        F.concat(F.lit("payload_"), F.col("id")).alias("pad"),
    )


def build_dim(spark):
    return spark.range(N_KEYS).select(
        F.col("id").alias("k"), (F.col("id") % 97).cast("double").alias("w")
    )


def probe(df):
    """Aggregate that forces the join and is order-insensitive-exact."""
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("v") * 100).cast("long")).alias("sv"),
        F.sum((F.col("w") * 100).cast("long")).alias("sw"),
    ).collect()[0]


def run_variant(spark, name: str, fact, dim) -> tuple[float, tuple]:
    skew_on = name == "aqe_skew"
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
    if name == "salted":
        joined = salted_join(fact, dim, on=["k"], n_salt=16, force_shuffle=True)
    else:
        joined = fact.join(dim.hint("shuffle_hash"), "k")
    t0 = time.monotonic()
    row = probe(joined)
    return round(time.monotonic() - t0, 2), (row["n"], row["sv"], row["sw"])


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark("skew-experiment")
    spark.sparkContext.setLogLevel("ERROR")
    # lowered skew thresholds: scale the 256MB-default mechanism down to
    # the experiment's partition sizes (see module docstring)
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    fact = build_fact(spark, n_rows).persist()
    dim = build_dim(spark).persist()
    fact.count(), dim.count()  # materialize outside the timed region

    names = ["aqe_skew", "no_skew", "salted"]
    times: dict[str, list[float]] = {n: [] for n in names}
    values = set()
    for _rep in range(2):  # interleaved min-of-2 (host-noise discipline)
        for n in names:
            t, v = run_variant(spark, n, fact, dim)
            times[n].append(t)
            values.add(v)
    assert len(values) == 1, f"variants disagree: {values}"
    try:
        load = round(os.getloadavg()[0], 2)
    except OSError:
        load = None
    print(
        json.dumps(
            {
                "metric": "skew_join_experiment",
                "n_rows": n_rows,
                "hot_share": HOT_SHARE,
                "times_sec": {n: min(ts) for n, ts in times.items()},
                "raw": times,
                "loadavg": load,
            }
        )
    )


if __name__ == "__main__":
    main()
