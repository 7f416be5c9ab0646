"""Interleaved A/B of one runtime conf over a query list, single process.

Usage:
    python tools/conf_ab.py CONF_KEY A_VALUE B_VALUE [--reps N] q [q ...]

Each rep runs every query twice — once under A, once under B, back to
back — so a host-noise window inflates both arms almost equally. Prints
per-query {A_min, B_min, ratio} and the total ratio.

NOTE: CATALOG[name].fn(...) is called INSIDE the timed, conf-applied
window — deliberately. Operators run eager localCheckpoint jobs at
DataFrame-construction time, so construction must stay inside the
interval (and after the conf set) or checkpoint work would be timed
under the wrong arm. Do not hoist query construction out of the loop.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.catalog import (  # noqa: E402
    CATALOG,
)
from real_time_weather_data_pipeline_for_philippine_cities_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    key, a_val, b_val = sys.argv[1:4]
    rest = sys.argv[4:]
    reps = 3
    names: list[str] = []
    i = 0
    while i < len(rest):
        if rest[i] == "--reps":
            reps = int(rest[i + 1])
            i += 2
        else:
            names.append(rest[i])
            i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("rtw-conf-ab")
    spark.sparkContext.setLogLevel("ERROR")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    force(CATALOG["flagship_latest_obs"].fn(spark, sf_dir))
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _warm_py(x):  # type: ignore[no-untyped-def]
        import numpy as np  # noqa: F401

        return x * 1.0

    force(spark.range(0, 32, 1, 32).select(_warm_py("id")))

    t: dict[str, dict[str, list[float]]] = {
        n: {"A": [], "B": []} for n in names
    }
    for _ in range(reps):
        for name in names:
            for arm, val in (("A", a_val), ("B", b_val)):
                spark.conf.set(key, val)
                t0 = time.perf_counter()
                force(CATALOG[name].fn(spark, sf_dir))
                t[name][arm].append(time.perf_counter() - t0)
                spark.catalog.clearCache()
    spark.conf.unset(key)
    out = {}
    ta = tb = 0.0
    for n in names:
        a, b = min(t[n]["A"]), min(t[n]["B"])
        ta += a
        tb += b
        out[n] = {"A_min": round(a, 3), "B_min": round(b, 3), "B/A": round(b / a, 3)}
    print(
        json.dumps(
            {
                "conf": key,
                "A": a_val,
                "B": b_val,
                "queries": out,
                "total_A": round(ta, 3),
                "total_B": round(tb, 3),
                "total_B/A": round(tb / ta, 3),
                "loadavg": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
