"""File-landed JSON API snapshots (SURVEY.md §2.1 S1-S3).

The reference fetches PSGC / geocode / weather JSON straight into pandas
(weather_data_fetcher.py:40-48, 132-143, 258-264). Distributed ingestion
lands each API response as JSON files in a dated directory and reads them
with an EXPLICIT schema — never inference, because PSGC codes are
zero-padded digit strings ('012805000') that inference would corrupt into
integers (SURVEY.md §1.2/§1.3). The same schemas drive the streaming
reader (streaming/ingest.py) over the identical landing layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

#: PSGC cities payload (fields per all_locations.xlsx header row and
#: weather_data_fetcher.py:350-362).
PSGC_CITY_SCHEMA = StructType(
    [
        StructField("code", StringType()),
        StructField("name", StringType()),
        StructField("oldName", StringType()),
        StructField("isCapital", BooleanType()),
        StructField("provinceCode", StringType()),
        StructField("districtCode", StringType()),
        StructField("regionCode", StringType()),
        StructField("islandGroupCode", StringType()),
        StructField("psgc10DigitCode", StringType()),
    ]
)

#: PSGC provinces payload (wdf.py:351-355).
PSGC_PROVINCE_SCHEMA = StructType(
    [
        StructField("code", StringType()),
        StructField("name", StringType()),
        StructField("regionCode", StringType()),
        StructField("islandGroupCode", StringType()),
        StructField("psgc10DigitCode", StringType()),
    ]
)

#: Geocode candidate payload (wdf.py:173-177): one row per candidate.
GEOCODE_CANDIDATE_SCHEMA = StructType(
    [
        StructField("query_city", StringType()),
        StructField("name", StringType()),
        StructField("lat", DoubleType()),
        StructField("lon", DoubleType()),
        StructField("state", StringType()),
        StructField("country", StringType()),
    ]
)


def read_landed_json(
    spark: SparkSession,
    path: str,
    schema: StructType,
    multiline: bool = True,
) -> DataFrame:
    """Batch scan of a landing directory with a declared schema.

    ``multiLine=True`` because API snapshots land as JSON arrays (one file
    per fetch), not JSONL. `mode=FAILFAST` — a malformed landing file is a
    pipeline bug, not a row to silently null out.
    """
    return (
        spark.read.schema(schema)
        .option("multiLine", multiline)
        .option("mode", "FAILFAST")
        .json(path)
    )
