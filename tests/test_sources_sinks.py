"""Sources (S1 landed JSON) and sinks (K1-K4) — including the physical
property that motivates the fact-table layout: date-partition pruning."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from real_time_weather_data_pipeline_for_philippine_cities_spark.sinks import (
    append_observations,
    overwrite_locations_dim,
    write_snapshot,
)
from real_time_weather_data_pipeline_for_philippine_cities_spark.sources.json_landing import (
    PSGC_CITY_SCHEMA,
    read_landed_json,
)


def test_landed_json_keeps_code_strings(spark, tmp_path):
    landing = tmp_path / "psgc" / "cities"
    landing.mkdir(parents=True)
    payload = [
        {"code": "012805000", "name": "City of Batac", "oldName": None,
         "isCapital": False, "provinceCode": "012800000",
         "districtCode": "", "regionCode": "010000000",
         "islandGroupCode": "luzon", "psgc10DigitCode": "0102805000"},
        {"code": "133901000", "name": "Tondo", "oldName": "Tondo I/II",
         "isCapital": False, "provinceCode": "133900000",
         "districtCode": "133900000", "regionCode": "130000000",
         "islandGroupCode": "luzon", "psgc10DigitCode": "1333901000"},
    ]
    (landing / "snap1.json").write_text(json.dumps(payload))
    df = read_landed_json(spark, str(landing), PSGC_CITY_SCHEMA)
    rows = {r["code"]: r for r in df.collect()}
    # Leading zeros survive: schema declared, never inferred.
    assert set(rows) == {"012805000", "133901000"}
    assert rows["012805000"]["psgc10DigitCode"] == "0102805000"
    assert rows["133901000"]["oldName"] == "Tondo I/II"
    assert df.schema["code"].dataType.simpleString() == "string"


def test_dim_overwrite_replaces(spark, tmp_path):
    path = str(tmp_path / "locations")
    v1 = spark.createDataFrame([(1, "Batac"), (2, "Tondo")], "location_id int, location_name string")
    v2 = spark.createDataFrame([(1, "Batac")], "location_id int, location_name string")
    overwrite_locations_dim(v1, path)
    overwrite_locations_dim(v2, path)
    assert spark.read.parquet(path).count() == 1  # truncate-and-load, not append


def test_observations_append_partitioned_and_pruned(spark, tmp_path):
    path = str(tmp_path / "obs")
    obs = spark.createDataFrame(
        [(1, 21.5, "2024-12-01 03:00:00"), (2, 22.0, "2024-12-02 03:00:00")],
        "location_id int, temperature_c double, data_datetime string",
    ).withColumn("data_datetime", F.to_timestamp("data_datetime"))
    append_observations(obs, path)
    append_observations(obs, path)  # append-only: no clobber
    back = spark.read.parquet(path)
    assert back.count() == 4

    pruned = back.filter(F.col("obs_date") == "2024-12-01")
    assert pruned.count() == 2
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # The date predicate must be a partition filter, not a row filter.
    assert "PartitionFilters: [isnotnull(obs_date" in plan


def test_snapshot_roundtrip(spark, tmp_path):
    path = str(tmp_path / "snapshot")
    snap = spark.createDataFrame(
        [("012805000", "Batac", 18.05, 120.56)],
        "code_city string, name string, latitude double, longitude double",
    )
    write_snapshot(snap, path)
    again = spark.read.parquet(path)
    assert [tuple(r) for r in again.collect()] == [("012805000", "Batac", 18.05, 120.56)]
