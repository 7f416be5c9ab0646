"""Time one catalog oracle in DuckDB against a given sf dir.

Usage: python tools/time_oracle.py <query_name> [sf_dir]
Prints: <name> <rows> <seconds>  (or raises). Used to decide which of the
sf1-sweep exclusions are actually feasible as-is vs need a linearized twin.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.catalog import (
    CATALOG,
)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "bench_data/sf1"
    con = duckdb.connect()
    # An in-memory connection has no temp_directory, so any oracle whose
    # intermediates exceed RAM dies with an OOM instead of spilling (the
    # sf10 multimodal twin unnests ~1e9 byte-rows). Timing an oracle that
    # is ALLOWED to spill is the honest affordability test — production
    # DuckDB always has a disk to spill to.
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    sql = CATALOG[name].oracle
    t0 = time.monotonic()
    n = len(con.execute(sql).fetchall())
    print(name, n, round(time.monotonic() - t0, 1), flush=True)


if __name__ == "__main__":
    main()
