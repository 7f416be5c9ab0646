"""The engine's SQL entry point: every table registers as a view and plain
``spark.sql`` answers the same queries the DataFrame catalog does — a user
of the reference who writes SQL can switch without learning the API."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_weather_data_pipeline_for_philippine_cities_spark.sources.registry import (
    TABLES,
    load_table,
)


def _register(spark, sf_dir):
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def test_sql_matches_dataframe_results(spark, sf_dir):
    _register(spark, sf_dir)
    sql = spark.sql("""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """)
    df = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    assert sorted(map(tuple, sql.collect())) == sorted(map(tuple, df.collect()))


def test_sql_join_and_window(spark, sf_dir):
    _register(spark, sf_dir)
    rows = spark.sql("""
        SELECT user_id, event_id FROM (
          SELECT user_id, event_id,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) WHERE rn = 1
    """).collect()
    assert len(rows) == spark.sql("SELECT count(DISTINCT user_id) AS n FROM events").collect()[0].n


def test_sql_ddl_and_insert_roundtrip(spark, tmp_path):
    # K1 DDL surface through SQL, write + read back.
    loc = str(tmp_path / "sqltab")
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS sql_obs (location_id INT, temp DOUBLE) "
        f"USING parquet LOCATION '{loc}'"
    )
    try:
        spark.sql("INSERT INTO sql_obs VALUES (1, 28.5), (2, 30.1)")
        got = spark.sql("SELECT * FROM sql_obs ORDER BY location_id").collect()
        assert [(r.location_id, r.temp) for r in got] == [(1, 28.5), (2, 30.1)]
    finally:
        spark.sql("DROP TABLE IF EXISTS sql_obs")
