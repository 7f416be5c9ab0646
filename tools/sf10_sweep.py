"""Strict sweep at sf10 (round-7 verdict #2): every catalog query whose
DuckDB twin is AFFORDABLE at bench_data/sf10 (60 M lineitem, ~10 GB
uncompressed), bitwise-compared exactly like STRICT.json / STRICT_sf1.json.

Why another decade: the sf1 sweep caught bug classes sf0.01 could not see
(last-cent double summation, seconds-vs-microseconds boundaries, a
percentile ulp trap); sf10 is where int32/cents-past-2^31 overflow-class
bugs live.

Protocol (two phases, one artifact):
  1. TRIAGE — each oracle runs alone in a DuckDB-only subprocess
     (tools/time_oracle.py) under a wall-clock time box
     (SF10_ORACLE_TIMEBOX, default 180 s). A twin that exceeds the box or
     dies (OOM) is EXCLUDED, with the measured evidence recorded — a
     documented, per-query exclusion list, never a silent skip.
  2. STRICT — the affordable cohort runs through the exact
     strict_check.check_one compare (values bitwise, dtype kinds) at
     bench_data/sf10.

Writes STRICT_sf10.json:
  {sf_dir, n, fail, queries: {name: {ok, rows, detail, oracle_sec}},
   excluded: {name: reason}, timebox_sec}

Usage: python tools/sf10_sweep.py [--triage-only]
       python tools/sf10_sweep.py --recheck q1 [q2 ...]
(full sweep is an hours-scale run: launch in tmux, not a timeout-bounded
shell. --recheck re-runs just the named queries through the identical
strict compare and updates their rows in STRICT_sf10.json — the re-proof
path after fixing a failure the sweep caught.)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF10 = os.path.join(ROOT, "bench_data", "sf10")
TIMEBOX = float(os.environ.get("SF10_ORACLE_TIMEBOX", "180"))
TRIAGE_CACHE = os.path.join(ROOT, "bench_data", "sf10_oracle_triage.json")


def triage(names: list[str]) -> dict[str, dict]:
    """Per-oracle DuckDB wall time under the time box, one subprocess per
    query so a runaway twin can be killed without poisoning the rest.
    Results are cached (bench_data/sf10_oracle_triage.json) so a sweep
    re-run after a Spark-side fix does not re-pay the triage."""
    cache: dict[str, dict] = {}
    if os.path.exists(TRIAGE_CACHE):
        cache = json.load(open(TRIAGE_CACHE))
    out: dict[str, dict] = {}
    for i, name in enumerate(names):
        if name in cache and cache[name].get("timebox") == TIMEBOX:
            out[name] = cache[name]
            continue
        t0 = time.monotonic()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(ROOT, "tools", "time_oracle.py"),
                 name, SF10],
                capture_output=True, text=True, timeout=TIMEBOX,
            )
            dt = time.monotonic() - t0
            if proc.returncode == 0:
                rows, secs = proc.stdout.split()[-2:]
                out[name] = {"ok": True, "sec": float(secs),
                             "rows": int(rows), "timebox": TIMEBOX}
            else:
                tail = (proc.stderr or proc.stdout).strip().splitlines()[-1:]
                out[name] = {"ok": False, "sec": round(dt, 1),
                             "reason": f"oracle error: {' '.join(tail)[:200]}",
                             "timebox": TIMEBOX}
        except subprocess.TimeoutExpired:
            out[name] = {"ok": False, "sec": TIMEBOX,
                         "reason": f"oracle exceeded the {TIMEBOX:.0f}s time box",
                         "timebox": TIMEBOX}
        print(f"[triage {i+1}/{len(names)}] {name}: "
              f"{out[name].get('sec')}s {'OK' if out[name]['ok'] else out[name]['reason']}",
              flush=True)
        cache[name] = out[name]
        json.dump(cache, open(TRIAGE_CACHE, "w"), indent=0)
    return out


def recheck(names: list[str]) -> int:
    """Re-run the strict compare for just ``names`` and update their rows
    in STRICT_sf10.json (fail count recomputed). Used after fixing a
    failure the full sweep caught — same compare, same artifact."""
    import duckdb

    from real_time_weather_data_pipeline_for_philippine_cities_spark.session import (
        get_spark,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.sources.registry import (
        TABLES,
    )
    from tools.strict_check import check_one

    out = os.path.join(ROOT, "STRICT_sf10.json")
    art = json.load(open(out))
    spark = get_spark("sf10-recheck")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF10}/{t}.parquet'")
    for name in names:
        t0 = time.monotonic()
        entry = check_one(name, spark, con, SF10)
        entry["wall_sec"] = round(time.monotonic() - t0, 1)
        entry["rechecked"] = True
        old = art["queries"].get(name, {})
        entry["oracle_sec"] = old.get("oracle_sec")
        art["queries"][name] = entry
        print(f"{name}: {'OK' if entry['ok'] else 'FAIL ' + str(entry['detail'])} "
              f"({entry['rows']} rows, {entry['wall_sec']}s)", flush=True)
        spark.catalog.clearCache()
    art["n"] = len(art["queries"])  # a recheck may ADD a new catalog entry
    art["fail"] = sum(1 for e in art["queries"].values() if not e["ok"])
    json.dump(art, open(out, "w"), indent=0)
    print(f"updated {out}: {art['n']} queries, {art['fail']} failing")
    return art["fail"]


def retire(names: list[str]) -> int:
    """Attempt to move ``names`` from the artifact's ``excluded`` map into
    the strict-compared cohort, under the CURRENT time box (set
    SF10_ORACLE_TIMEBOX higher than the sweep default to give a formerly
    unaffordable twin more room). Each name is re-triaged in a subprocess
    first; only twins that actually finish run the strict compare. A twin
    that still cannot finish keeps its exclusion, with the reason updated
    to the new measured evidence — raising the box can only shrink the
    exclusion list, never hide a failure."""
    import duckdb

    from real_time_weather_data_pipeline_for_philippine_cities_spark.session import (
        get_spark,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.sources.registry import (
        TABLES,
    )
    from tools.strict_check import check_one

    out = os.path.join(ROOT, "STRICT_sf10.json")
    art = json.load(open(out))
    tri = triage(names)
    runnable = [n for n in names if tri[n]["ok"]]
    for n in names:
        if not tri[n]["ok"]:
            art["excluded"][n] = f"{tri[n]['reason']} (box {TIMEBOX:.0f}s)"
            print(f"{n}: still excluded — {art['excluded'][n]}", flush=True)
    if runnable:
        spark = get_spark("sf10-retire")
        spark.sparkContext.setLogLevel("ERROR")
        con = duckdb.connect()
        con.execute("SET temp_directory='/tmp/duckdb_spill'")
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF10}/{t}.parquet'")
        for name in runnable:
            t0 = time.monotonic()
            entry = check_one(name, spark, con, SF10)
            entry["wall_sec"] = round(time.monotonic() - t0, 1)
            entry["oracle_sec"] = tri[name]["sec"]
            entry["retired_timebox"] = TIMEBOX
            art["queries"][name] = entry
            art["excluded"].pop(name, None)
            print(f"{name}: {'OK' if entry['ok'] else 'FAIL ' + str(entry['detail'])} "
                  f"({entry['rows']} rows, {entry['wall_sec']}s)", flush=True)
            spark.catalog.clearCache()
    art["n"] = len(art["queries"])
    art["fail"] = sum(1 for e in art["queries"].values() if not e["ok"])
    json.dump(art, open(out, "w"), indent=0)
    print(f"updated {out}: {art['n']} queries, {art['fail']} failing, "
          f"{len(art['excluded'])} excluded", flush=True)
    return art["fail"]


def main() -> int:
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    if "--recheck" in sys.argv:
        return recheck(sys.argv[sys.argv.index("--recheck") + 1:])
    if "--retire" in sys.argv:
        return retire(sys.argv[sys.argv.index("--retire") + 1:])
    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.catalog import (
        CATALOG,
    )

    names = sorted(n for n, q in CATALOG.items() if q.oracle is not None)
    tri = triage(names)
    runnable = [n for n in names if tri[n]["ok"]]
    excluded = {n: tri[n]["reason"] for n in names if not tri[n]["ok"]}
    print(f"triage: {len(runnable)} affordable, {len(excluded)} excluded "
          f"(box {TIMEBOX:.0f}s): {sorted(excluded)}", flush=True)
    if "--triage-only" in sys.argv:
        return 0

    import duckdb

    from real_time_weather_data_pipeline_for_philippine_cities_spark.session import (
        get_spark,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.sources.registry import (
        TABLES,
    )
    from tools.strict_check import check_one

    spark = get_spark("sf10-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF10}/{t}.parquet'")

    fail = 0
    report: dict[str, dict] = {}
    for i, name in enumerate(runnable):
        t0 = time.monotonic()
        try:
            entry = check_one(name, spark, con, SF10)
        except Exception as exc:  # a sweep must report, not abort
            entry = {"ok": False, "rows": None,
                     "detail": f"exception: {type(exc).__name__}: {exc}"[:300]}
        entry["oracle_sec"] = tri[name]["sec"]
        entry["wall_sec"] = round(time.monotonic() - t0, 1)
        report[name] = entry
        if not entry["ok"]:
            fail += 1
        print(f"[{i+1}/{len(runnable)}] {name}: "
              f"{'OK' if entry['ok'] else 'FAIL ' + str(entry['detail'])} "
              f"({entry['rows']} rows, {entry['wall_sec']}s)", flush=True)
        spark.catalog.clearCache()

    out = os.path.join(ROOT, "STRICT_sf10.json")
    json.dump(
        {"sf_dir": SF10, "n": len(report), "fail": fail,
         "timebox_sec": TIMEBOX, "queries": report, "excluded": excluded},
        open(out, "w"), indent=0,
    )
    print(f"wrote {out}: {len(report)} queries, {fail} failing, "
          f"{len(excluded)} excluded", flush=True)
    return fail


if __name__ == "__main__":
    sys.exit(main())
