"""Sweep #6: temporal extremes — every catalog query vs the timestamps a
100 TB corpus actually contains (zeroed epochs, pre-1970 logs, corrupted
far-future values, pre-Gregorian parse artifacts, sub-second boundaries).

Two layers, both catalog-wide:
  1. SURVIVE — every query executes (the empty/null/weird sweeps' bar);
  2. PARITY — every oracle-paired query strict-compares against its
     DuckDB twin ON the extreme data, the first sweep to demand bitwise
     cross-engine agreement on degenerate inputs.

First run caught one real engine divergence and one harness gap:
  * ``unix_timestamp`` truncates toward zero while the oracles'
    ``floor(epoch(ts))`` floors through a DOUBLE — so a -1 µs timestamp
    bucketed to second 0 vs -1, and 9999-12-31 23:59:59.999999 bucketed
    to ...799 vs ...800 (the double's resolution at year-9999 magnitude
    rounds .999999 into the next second). Three epoch-conversion sites
    (epoch_roundtrip, resample_interpolate, trailing_hour_stats) were
    rewritten to the exact integer floor on BOTH engines:
    ``CAST(ts AS LONG)`` / ``epoch(date_trunc('second', ts))``.
  * the strict harness's dtype layer (toPandas) died on timestamps
    outside Arrow's ns domain (pre-1677/post-2262); it now falls back to
    schema-derived dtype kinds (tools/strict_check.py).

Fixture domain: extreme MAX timestamps are capped per table so query
OUTPUTS stay within Python's datetime domain (year <= 9999) — orders
feeds +30d date arithmetic, events feeds +1h window ends. Extreme event
rows get fresh single-event user_ids: a year-1..9999 span on one user
would make the gap-fill grid queries generate astronomically long
per-user grids on both engines (a real 100 TB concern, but a capacity
one — this sweep probes VALUE semantics).
"""

import os
from datetime import datetime

import duckdb
import pytest

# Whole-catalog degenerate sweeps: excluded from the default run via
# pytest.ini so `pytest tests/` fits the driver's verify time box (r10
# verdict item 1); run with `pytest -m slow`.
pytestmark = pytest.mark.slow

from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.catalog import (
    CATALOG,
)
from real_time_weather_data_pipeline_for_philippine_cities_spark.sources.registry import (
    TABLES,
    load_table,
)

SRC = "/root/testdata/sf0.001"

TS_COL = {"events": "ts", "orders": "o_orderdate", "lineitem": "l_shipdate"}

# Max extreme per table: every downstream OUTPUT must stay Python-visible
# (year <= 9999) or the value compare itself becomes undecidable.
MAX_TS = {
    "events": datetime(9999, 12, 30, 23, 59, 59, 999999),
    "orders": datetime(9999, 11, 30, 23, 59, 59, 999999),
    "lineitem": datetime(9999, 11, 30, 23, 59, 59, 999999),
}


def _extremes(maxts: datetime) -> list[datetime]:
    return [
        datetime(1, 1, 1, 0, 0, 0),                  # proleptic minimum
        datetime(1582, 10, 4, 23, 59, 59),           # eve of Gregorian switch
        datetime(1582, 10, 10, 12, 0, 0),            # nonexistent in hybrid cal.
        datetime(1901, 12, 13, 20, 45, 52),          # int32-seconds minimum
        datetime(1970, 1, 1, 0, 0, 0),               # epoch 0
        datetime(2038, 1, 19, 3, 14, 8),             # int32-seconds rollover
        maxts,                                       # .999999 at max magnitude
        datetime(1969, 12, 31, 23, 59, 59, 999999),  # -1 µs
    ]


@pytest.fixture(scope="session")
def tsx_sf_dir(spark, tmp_path_factory):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    dst = str(tmp_path_factory.mktemp("sf_tsx"))
    for t in TABLES:
        df = load_table(spark, SRC, t).limit(30)
        tscol = TS_COL.get(t)
        if tscol:
            exts = _extremes(MAX_TS[t])
            keycol = df.columns[0]
            extra = df.limit(len(exts)).withColumn(
                "__rn", F.row_number().over(Window.orderBy(keycol))
            )
            lit_ts = F.element_at(F.array(*[F.lit(d) for d in exts]), F.col("__rn"))
            extra = extra.withColumn(tscol, lit_ts).withColumn(
                keycol, F.col(keycol) + F.lit(900000)
            )
            if t == "events":
                # one UNIQUE user per extreme row (template rows share
                # user_ids, and a single user spanning year 1..9999 makes
                # the gap-fill grids ~14.6 M buckets long on both engines)
                extra = extra.withColumn(
                    "user_id", F.col("__rn").cast("long") + F.lit(900000)
                )
            df = df.unionByName(extra.drop("__rn"))
        # CORRECTED: write the proleptic values as-is (Spark's default
        # EXCEPTION mode refuses pre-1582 timestamps); DuckDB reads
        # proleptic micros identically.
        df.coalesce(1).write.mode("overwrite").option(
            "datetimeRebaseMode", "CORRECTED"
        ).parquet(os.path.join(dst, f"{t}.parquet"))
    return dst


def test_every_catalog_query_survives_temporal_extremes(spark, tsx_sf_dir):
    failures = {}
    for name, q in sorted(CATALOG.items()):
        try:
            # noop sink: materialize every column (count() lets Catalyst
            # prune poisoned expressions — see test_empty_inputs._sweep)
            q.fn(spark, tsx_sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:
            failures[name] = f"{type(exc).__name__}: {exc}"[:200]
        finally:
            spark.catalog.clearCache()
    assert not failures, failures


def test_oracle_parity_holds_on_temporal_extremes(spark, tsx_sf_dir):
    """Bitwise Spark↔DuckDB agreement on the extreme data for every
    oracle-paired query — the layer that caught the truncate-vs-floor
    and double-epoch divergences a survive-only sweep cannot see."""
    from tools.strict_check import check_one

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{tsx_sf_dir}/{t}.parquet/*.parquet'"
        )
    failures = {}
    for name, q in sorted(CATALOG.items()):
        if q.oracle is None:
            continue
        try:
            entry = check_one(name, spark, con, tsx_sf_dir)
            if not entry["ok"]:
                failures[name] = str(entry["detail"])[:300]
        except Exception as exc:
            failures[name] = f"compare crash {type(exc).__name__}: {exc}"[:300]
        finally:
            spark.catalog.clearCache()
    assert not failures, failures
