"""JDBC warehouse sink — the reference's real target re-expressed on
Spark's JDBC data source.

The reference writes to MSSQL through an ``mssql+pyodbc`` SQLAlchemy
engine built from env vars (wdf.py:25-29, 340-344) and uses per-row
INSERTs inside a Python loop (wdf.py:296-330). Here the same three write
shapes are distributed:

  K2  truncate-and-load dim  -> ``write_dim_jdbc``: mode=overwrite with
      ``truncate=true`` — TRUNCATE + bulk load preserves DDL/indexes/
      grants, semantically the reference's DELETE + reseed + insert loop
      (wdf.py:228-256) without the loop.
  K3  append fact            -> ``append_fact_jdbc``: mode=append with
      executor-side batched INSERTs (``batchsize``), ``numPartitions``
      capping concurrent connections (each task holds one).
  S5  point/range read       -> ``read_jdbc``: partitioned range scan
      (partitionColumn/bounds) so a big table arrives in parallel; Spark
      pushes filters down as WHERE clauses to the database.

Parquet stays the primary warehouse (SURVEY.md §2.2 — tables.py); this
module closes the RDBMS fidelity path. It is driver-agnostic: the MSSQL
option builder mirrors the reference's connection string, and any JDBC
driver on the classpath works (tests use Spark's bundled embedded Derby).

100 TB notes: a JDBC RDBMS is the *edge* of the pipeline (dims, serving
tables), never the 100 TB fact store — ``numPartitions`` exists precisely
because a thousand executors opening a thousand connections is a DB
outage, not a write strategy. Keep dims small, facts in parquet, and use
this sink for the final bounded publish step.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

#: The MSSQL JDBC driver class (the Spark-side analogue of the reference's
#: ``driver={DB_DRIVER}`` pyodbc parameter, wdf.py:342).
MSSQL_DRIVER = "com.microsoft.sqlserver.jdbc.SQLServerDriver"


def _flag(v) -> str:
    """Normalize the reference's env-var truthiness ('yes'/'no', wdf.py:28-29)
    and Python bools to the JDBC 'true'/'false' form."""
    if isinstance(v, str):
        return "true" if v.strip().lower() in ("yes", "true", "1") else "false"
    return "true" if v else "false"


def mssql_jdbc_options(
    server: str,
    database: str,
    *,
    trusted_connection="yes",
    trust_server_certificate="yes",
    driver: str = MSSQL_DRIVER,
) -> dict[str, str]:
    """Build Spark JDBC options mirroring the reference's connection string
    ``mssql+pyodbc://{server}/{db}?driver=...&Trusted_Connection=...&
    TrustServerCertificate=...`` (wdf.py:340-344)."""
    url = (
        f"jdbc:sqlserver://{server};databaseName={database};"
        f"integratedSecurity={_flag(trusted_connection)};"
        f"trustServerCertificate={_flag(trust_server_certificate)}"
    )
    return {"url": url, "driver": driver}


def has_jdbc_driver(spark: SparkSession, driver_class: str) -> bool:
    """True iff ``driver_class`` is loadable on the JVM classpath. The
    container has no MSSQL jar, so callers gate on this instead of failing
    deep inside a write with a raw ClassNotFoundException."""
    try:
        spark._jvm.java.lang.Class.forName(driver_class)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def _require_driver(df_or_spark, options: dict[str, str]) -> None:
    spark = (
        df_or_spark if isinstance(df_or_spark, SparkSession) else df_or_spark.sparkSession
    )
    drv = options.get("driver", "")
    if drv and not has_jdbc_driver(spark, drv):
        raise RuntimeError(
            f"JDBC driver {drv!r} not on the Spark classpath; add the jar via "
            "spark.jars (e.g. mssql-jdbc) or choose a bundled driver"
        )


def write_dim_jdbc(
    df: DataFrame,
    table: str,
    options: dict[str, str],
    *,
    num_partitions: int = 8,
) -> None:
    """K2: truncate-and-load a dimension table (reference: DELETE + reseed
    + per-row insert, wdf.py:228-256). ``truncate=true`` keeps the DDL in
    place; Spark falls back to DROP+CREATE where the dialect cannot
    truncate. Dims are small by definition — coalesce down so the DB sees
    few writers."""
    _require_driver(df, options)
    (
        df.coalesce(num_partitions)
        .write.format("jdbc")
        .options(**options)
        .option("dbtable", table)
        .option("truncate", "true")
        .mode("overwrite")
        .save()
    )


def append_fact_jdbc(
    df: DataFrame,
    table: str,
    options: dict[str, str],
    *,
    batchsize: int = 10_000,
    num_partitions: int = 32,
) -> None:
    """K3: append fact rows (reference: one INSERT per row per city inside
    the fetch loop, wdf.py:296-330). Batched executor-side INSERTs;
    ``num_partitions`` caps concurrent DB connections."""
    _require_driver(df, options)
    out = df
    if df.rdd.getNumPartitions() > num_partitions:
        out = df.coalesce(num_partitions)
    (
        out.write.format("jdbc")
        .options(**options)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode("append")
        .save()
    )


def read_jdbc(
    spark: SparkSession,
    table: str,
    options: dict[str, str],
    *,
    partition_column: Optional[str] = None,
    lower_bound: Optional[int] = None,
    upper_bound: Optional[int] = None,
    num_partitions: int = 8,
) -> DataFrame:
    """Read a JDBC table; with ``partition_column`` + bounds the scan is
    split into ``num_partitions`` parallel range queries, and Spark pushes
    projections/filters down into the generated SQL."""
    _require_driver(spark, options)
    r = spark.read.format("jdbc").options(**options).option("dbtable", table)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound and upper_bound")
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return r.load()
