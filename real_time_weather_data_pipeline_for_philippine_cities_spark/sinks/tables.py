"""Warehouse sinks (SURVEY.md §2.2 K1-K4), Spark-first.

The reference's MSSQL star schema becomes parquet tables:

  K1  CREATE TABLE IF NOT EXISTS (wdf.py:50-102)  → ensure_tables(): DDL
      over parquet locations, idempotent.
  K2  truncate-and-load dim (wdf.py:220-256)      → overwrite_locations_dim:
      one distributed overwrite replaces DELETE + reseed + row loop.
  K3  append fact insert (wdf.py:296-330)         → append_observations:
      partitioned by observation date so time-range queries prune
      partitions — the single most important physical decision for an
      append-only 100 TB fact table (SURVEY.md §4.2).
  K4  snapshot write (wdf.py:365,426)             → write_snapshot: plain
      parquet overwrite; the xlsx dtype-roundtrip trick is dropped
      (unnecessary under a real schema system, SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Locations dimension DDL columns (wdf.py:62-69).
LOCATIONS_DDL_COLUMNS = (
    ("location_id", "INT"),
    ("location_name", "STRING"),
    ("province_name", "STRING"),
    ("latitude", "DOUBLE"),
    ("longitude", "DOUBLE"),
    ("inserted_at", "TIMESTAMP"),
)

#: WeatherData fact DDL columns, 21 cols exactly as wdf.py:75-97 (types per
#: SURVEY.md §1.2 mapping; obs_date added as the partition column).
OBSERVATIONS_DDL_COLUMNS = (
    ("weather_id", "BIGINT"),
    ("location_id", "INT"),
    ("location_name", "STRING"),
    ("province_name", "STRING"),
    ("weather_main", "STRING"),
    ("weather_description", "STRING"),
    ("temperature_c", "DOUBLE"),
    ("feels_like_c", "DOUBLE"),
    ("temp_min_c", "DOUBLE"),
    ("temp_max_c", "DOUBLE"),
    ("pressure_hpa", "INT"),
    ("humidity_percent", "INT"),
    ("wind_speed_mps", "DOUBLE"),
    ("wind_direction_deg", "INT"),
    ("visibility_m", "INT"),
    ("cloudiness_percent", "INT"),
    ("rain_1h_mm", "DOUBLE"),
    ("sunrise", "TIMESTAMP"),
    ("sunset", "TIMESTAMP"),
    ("data_datetime", "TIMESTAMP"),
    ("inserted_at", "TIMESTAMP"),
)


def _ddl(cols: tuple[tuple[str, str], ...]) -> str:
    return ", ".join(f"{n} {t}" for n, t in cols)


def ensure_tables(spark: SparkSession, base_path: str) -> None:
    """K1: idempotent DDL for dim + fact over parquet locations.

    The fact table is declared PARTITIONED BY (obs_date) so every engine
    reading the catalog entry prunes date ranges at planning time.
    """
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS locations ({_ddl(LOCATIONS_DDL_COLUMNS)}) "
        f"USING parquet LOCATION '{base_path}/locations'"
    )
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS weather_observations "
        f"({_ddl(OBSERVATIONS_DDL_COLUMNS)}, obs_date DATE) "
        f"USING parquet PARTITIONED BY (obs_date) "
        f"LOCATION '{base_path}/weather_observations'"
    )


def overwrite_locations_dim(dim: DataFrame, path: str) -> None:
    """K2: the truncate-and-load refresh as one distributed overwrite."""
    dim.write.mode("overwrite").parquet(path)


def append_observations(
    obs: DataFrame,
    path: str,
    event_time_col: str = "data_datetime",
    partition_col: str = "obs_date",
) -> None:
    """K3: append-only fact write, partitioned by observation date.

    Date partitioning + parquet min/max stats give partition pruning for
    the analytics layer's time-window queries (`WHERE data_datetime
    BETWEEN ...` scans only the touched dates).
    """
    (
        obs.withColumn(partition_col, F.to_date(F.col(event_time_col)))
        .write.mode("append")
        .partitionBy(partition_col)
        .parquet(path)
    )


def write_snapshot(snapshot: DataFrame, path: str) -> None:
    """K4: overwrite the location snapshot (the xlsx successor)."""
    snapshot.write.mode("overwrite").parquet(path)
