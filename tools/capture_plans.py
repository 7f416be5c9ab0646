"""Capture .explain("formatted") for every catalog query into plans/r10/.

Usage:
    python tools/capture_plans.py before [query ...]   # -> plans/r10/<q>_before.txt
    python tools/capture_plans.py after  [query ...]   # -> plans/r10/<q>_after.txt

With no query names, captures the whole catalog. Also emits a one-line
shape summary per query (Exchange count, join strategies, Python-eval
nodes, scans without pushed filters) to plans/r10/_shape_<tag>.tsv so a
regression in plan shape is greppable without reading 155 files.
"""

from __future__ import annotations

import os
import re
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.catalog import (  # noqa: E402
    CATALOG,
)
from real_time_weather_data_pipeline_for_philippine_cities_spark.session import (  # noqa: E402
    get_spark,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = Path(__file__).resolve().parent.parent / "plans" / os.environ.get(
    "SPARK_GRAFT_PLANS_TAG", "r11"
)


def shape_summary(plan: str) -> dict[str, object]:
    # formatted-mode detail headers: "(N) OperatorName [codegen id : M]"
    ops = re.findall(r"^\(\d+\) ([A-Za-z]+)", plan, re.M)

    def n(*names: str) -> int:
        return sum(ops.count(x) for x in names)

    return {
        "exchanges": n("Exchange"),
        "rr_exchanges": len(re.findall(r"RoundRobinPartitioning", plan)),
        "repart_by_col": len(re.findall(r"REPARTITION_BY_COL", plan)),
        "bcast_exchanges": n("BroadcastExchange"),
        "smj": n("SortMergeJoin"),
        "shj": n("ShuffledHashJoin"),
        "bhj": n("BroadcastHashJoin"),
        "bnlj": n("BroadcastNestedLoopJoin"),
        "cartesian": n("CartesianProduct"),
        "py_eval": n("BatchEvalPython", "ArrowEvalPython"),
        "arrow_map": n("MapInPandas", "FlatMapGroupsInPandas", "MapInArrow"),
        "sorts": n("Sort"),
        "windows": n("Window", "WindowGroupLimit"),
        "scans": len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)),
        "unfiltered_scans": len(re.findall(r"PushedFilters: \[\]", plan)),
    }


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or sorted(CATALOG)
    OUT.mkdir(parents=True, exist_ok=True)
    spark = get_spark("rtw-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name in names:
        try:
            df = CATALOG[name].fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # capture must not die on one query
            plan = f"ERROR: {type(ex).__name__}: {ex}"
        (OUT / f"{name}_{tag}.txt").write_text(plan)
        s = shape_summary(plan)
        rows.append((name, s))
        print(name, s, flush=True)
    with open(OUT / f"_shape_{tag}.tsv", "w") as f:
        keys = list(rows[0][1].keys()) if rows else []
        f.write("query\t" + "\t".join(keys) + "\n")
        for name, s in rows:
            f.write(name + "\t" + "\t".join(str(s[k]) for k in keys) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
