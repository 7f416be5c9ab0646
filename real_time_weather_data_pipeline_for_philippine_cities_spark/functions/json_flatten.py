"""Typed flattening of the nested weather payload (SURVEY.md §2.8 F9-F10).

The reference navigates the OpenWeatherMap JSON dict-by-dict with .get()
defaults (weather_data_fetcher.py:267-281). Here the payload is a typed
struct column (parsed once with from_json) and the flattening is pure
column selection — nullable struct fields give the .get(None) semantics,
coalesce gives the rain default 0 (wdf.py:278).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: FIXTURES.md A5 — the payload contract (all optional pieces nullable).
WEATHER_SCHEMA = StructType(
    [
        StructField(
            "weather",
            ArrayType(
                StructType(
                    [
                        StructField("main", StringType()),
                        StructField("description", StringType()),
                    ]
                )
            ),
        ),
        StructField(
            "main",
            StructType(
                [
                    StructField("temp", DoubleType()),
                    StructField("feels_like", DoubleType()),
                    StructField("temp_min", DoubleType()),
                    StructField("temp_max", DoubleType()),
                    StructField("pressure", IntegerType()),
                    StructField("humidity", IntegerType()),
                ]
            ),
        ),
        StructField(
            "wind",
            StructType(
                [
                    StructField("speed", DoubleType()),
                    StructField("deg", IntegerType()),
                ]
            ),
        ),
        StructField("clouds", StructType([StructField("all", IntegerType())])),
        StructField("visibility", IntegerType()),
        StructField("rain", StructType([StructField("1h", DoubleType())])),
        StructField(
            "sys",
            StructType(
                [
                    StructField("sunrise", LongType()),
                    StructField("sunset", LongType()),
                ]
            ),
        ),
    ]
)


def parse_weather_json(raw: Column) -> Column:
    return F.from_json(raw, WEATHER_SCHEMA)


def flatten_weather(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """payload struct → the 16 scalar observation columns of the fact table
    (weather_data_fetcher.py:267-281; DDL wdf.py:75-97). Epochs convert via
    timestamp_seconds under the session's pinned UTC (vs the reference's
    machine-local fromtimestamp — SURVEY.md §7.7.4)."""
    p = F.col(payload_col)
    return df.select(
        *[c for c in df.columns if c != payload_col],
        p["weather"][0]["main"].alias("weather_main"),
        p["weather"][0]["description"].alias("weather_description"),
        p["main"]["temp"].alias("temperature_c"),
        p["main"]["feels_like"].alias("feels_like_c"),
        p["main"]["temp_min"].alias("temp_min_c"),
        p["main"]["temp_max"].alias("temp_max_c"),
        p["main"]["pressure"].alias("pressure_hpa"),
        p["main"]["humidity"].alias("humidity_percent"),
        p["wind"]["speed"].alias("wind_speed_mps"),
        p["wind"]["deg"].alias("wind_direction_deg"),           # optional → null
        p["visibility"].alias("visibility_m"),                   # optional → null
        F.coalesce(p["rain"]["1h"], F.lit(0.0)).alias("rain_1h_mm"),  # default 0
        p["clouds"]["all"].alias("cloudiness_percent"),          # optional → null
        F.timestamp_seconds(p["sys"]["sunrise"]).alias("sunrise"),
        F.timestamp_seconds(p["sys"]["sunset"]).alias("sunset"),
    )
