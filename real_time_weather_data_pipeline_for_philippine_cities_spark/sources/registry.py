"""Testdata table registry.

The driver provides deterministic parquet tables (TESTDATA.md) at
``/root/testdata/sf{0.001,0.01,0.1}``. We always read parquet directly —
columnar, splittable, predicate-pushdown-friendly — and never infer schemas
from text formats (SURVEY.md §1.3: PSGC-style code columns would be
corrupted by inference; parquet carries its own schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

#: All tables the driver generates (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


#: Columns stored as TIMESTAMP(NANOS) in the driver parquet. Spark rejects
#: nano timestamps natively, so session.tune() sets
#: ``spark.sql.legacy.parquet.nanosAsLong`` and we convert here —
#: truncating ns → µs exactly like DuckDB reads the same files.
_NANO_TS_COLS = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANO_TS_COLS.get(name, ()):
        field = df.schema[col]
        if isinstance(field.dataType, LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
        elif isinstance(field.dataType, TimestampNTZType):
            # micros-NTZ parquet (e.g. DuckDB-written scale-up corpora):
            # the session timezone is UTC-pinned, so the cast is identity.
            df = df.withColumn(col, F.col(col).cast(TimestampType()))
        elif not isinstance(field.dataType, TimestampType):
            raise TypeError(f"{name}.{col}: unexpected type {field.dataType}")
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    use = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in use}
