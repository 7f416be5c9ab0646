"""JDBC sink tests (pkg/sinks/jdbc.py).

The MSSQL option builder is checked against the reference's connection
string shape (wdf.py:340-344); the actual write/read path runs end-to-end
against Spark's bundled embedded Derby — a real JDBC database, so
truncate-and-load, batched append, and partitioned read are exercised for
real, not mocked. The MSSQL driver itself is absent from the container,
which is exactly what the driver-gating test asserts.
"""

from __future__ import annotations

import pytest

from real_time_weather_data_pipeline_for_philippine_cities_spark.sinks.jdbc import (
    MSSQL_DRIVER,
    append_fact_jdbc,
    has_jdbc_driver,
    mssql_jdbc_options,
    read_jdbc,
    write_dim_jdbc,
)

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_opts(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "wh"
    return {"url": f"jdbc:derby:{db};create=true", "driver": DERBY_DRIVER}


@pytest.fixture(scope="module")
def derby(tmp_path_factory):
    return _derby_opts(tmp_path_factory)


def test_mssql_options_mirror_reference_connection_string():
    opts = mssql_jdbc_options(
        "db.host", "WeatherDB", trusted_connection="yes", trust_server_certificate="no"
    )
    assert opts["driver"] == MSSQL_DRIVER
    assert opts["url"] == (
        "jdbc:sqlserver://db.host;databaseName=WeatherDB;"
        "integratedSecurity=true;trustServerCertificate=false"
    )


def test_missing_driver_fails_loud(spark):
    assert not has_jdbc_driver(spark, MSSQL_DRIVER)  # container has no MSSQL jar
    df = spark.range(1)
    with pytest.raises(RuntimeError, match="not on the Spark classpath"):
        write_dim_jdbc(df, "dbo.Locations", mssql_jdbc_options("h", "d"))


def test_dim_truncate_load_round_trip(spark, derby):
    assert has_jdbc_driver(spark, DERBY_DRIVER)
    dim1 = spark.createDataFrame(
        [(1, "Manila"), (2, "Cebu")], "location_id INT, location_name STRING"
    )
    write_dim_jdbc(dim1, "locations", derby, num_partitions=2)
    # truncate-and-load: second write REPLACES, never appends
    dim2 = spark.createDataFrame(
        [(3, "Davao")], "location_id INT, location_name STRING"
    )
    write_dim_jdbc(dim2, "locations", derby, num_partitions=1)
    back = read_jdbc(spark, "locations", derby)
    assert [tuple(r) for r in back.collect()] == [(3, "Davao")]


def test_fact_append_and_partitioned_read(spark, derby):
    fact = spark.range(0, 100).selectExpr(
        "CAST(id AS INT) AS weather_id", "CAST(id % 7 AS DOUBLE) AS temperature_c"
    )
    write_dim_jdbc(fact.limit(0), "obs", derby, num_partitions=1)  # DDL via empty load
    append_fact_jdbc(fact, "obs", derby, batchsize=16, num_partitions=4)
    append_fact_jdbc(fact.limit(10), "obs", derby, batchsize=16, num_partitions=4)

    back = read_jdbc(
        spark,
        "obs",
        derby,
        partition_column="weather_id",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4  # genuinely a parallel range scan
    assert back.count() == 110
    assert back.where("weather_id < 10").count() == 20  # appended twice


def test_streaming_jdbc_append_exactly_once_on_replay(spark, derby, tmp_path):
    """Lambda completeness: the streaming shell lands epochs in the RDBMS
    through the same batched JDBC writer as the batch path, and a replayed
    epoch (same epoch_id re-delivered after a simulated crash) is skipped
    via the table's epoch high-water mark — no double inserts."""
    import json

    from real_time_weather_data_pipeline_for_philippine_cities_spark.streaming.ingest import (
        foreach_batch_jdbc,
        run_available_now,
        stream_observations,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.sinks.jdbc import (
        read_jdbc,
    )
    from pyspark.sql.types import (
        DoubleType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    schema = StructType([
        StructField("city", StringType()),
        StructField("data_datetime", TimestampType()),
        StructField("temp", DoubleType()),
    ])
    rows = [
        {"city": "a", "data_datetime": "2024-12-01T00:00:00", "temp": 25.0},
        {"city": "b", "data_datetime": "2024-12-01T01:00:00", "temp": 26.5},
    ]
    with open(landing / "b1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    epoch_fn = foreach_batch_jdbc("obs_stream", derby, num_partitions=2)
    stream = stream_observations(spark, str(landing), schema)
    q = run_available_now(stream, epoch_fn, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = read_jdbc(spark, "obs_stream", derby).collect()
    assert len(got) == 2
    epoch0 = {r.epoch_id for r in got}
    assert epoch0 == {0}

    # simulated post-crash replay of the SAME epoch: must be a no-op
    batch = spark.createDataFrame(
        [("a", None, 25.0), ("b", None, 26.5)], schema
    )
    epoch_fn(batch, 0)
    assert read_jdbc(spark, "obs_stream", derby).count() == 2

    # a genuinely new epoch still lands
    epoch_fn(batch, 1)
    assert read_jdbc(spark, "obs_stream", derby).count() == 4
