"""Time-series + advanced-aggregate catalog entries: as-of join,
gap sessionization, rollup subtotals, exact percentiles.

None of these exist in the reference (its analytics layer is vaporware —
README.md:4, SURVEY.md §2.5); they are declared capabilities of the
rebuild's observation-log model, each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.timeseries import asof_join_backward, session_stats
from .base import Q, t


# -- as-of join: latest event value at-or-before each order date -----------
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    events = t(spark, sf_dir, "events").filter(F.col("value").isNotNull()).select(
        "user_id", "ts", F.round("value", 4).alias("value")
    )
    out = asof_join_backward(
        orders, events, key="o_custkey", left_ts="o_orderdate",
        right_ts="ts", value_cols=["value"], right_key="user_id",
    )
    return out.select("o_orderkey", "o_custkey", "o_orderdate", "asof_ts", "asof_value")


_ASOF_SQL = """
WITH ev AS (
  SELECT user_id, ts, max(round(value, 4)) AS value
  FROM events WHERE value IS NOT NULL GROUP BY user_id, ts)
SELECT o_orderkey, o_custkey, o_orderdate,
       ev.ts AS asof_ts, ev.value AS asof_value
FROM orders ASOF LEFT JOIN ev
  ON o_custkey = ev.user_id AND ev.ts <= o_orderdate
"""


# -- gap-based sessionization ----------------------------------------------
SESSION_GAP_S = 6 * 3600


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    return session_stats(ev, key="user_id", ts="ts", gap_seconds=SESSION_GAP_S,
                         value_col="value", order_tiebreak=["event_id"])


_SESSIONIZE_SQL = f"""
WITH ordered AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > {SESSION_GAP_S}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
sessioned AS (
  SELECT user_id, ts, value,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                           ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM ordered)
SELECT user_id, session_seq,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM sessioned GROUP BY user_id, session_seq
"""


# -- rollup subtotals -------------------------------------------------------
def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    joined = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"),
                "o_totalprice")
    )
    return joined.rollup("region_name", "nation_name").agg(
        F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


_ROLLUP_SQL = """
SELECT r_name AS region_name, n_name AS nation_name,
       round(sum(o_totalprice), 2) AS total_revenue,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP (region_name, nation_name)
"""


# -- exact interpolated percentiles ----------------------------------------
def q_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )


_PERCENTILES_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4)  AS p50,
       round(quantile_cont(value, 0.95), 4) AS p95,
       round(quantile_cont(value, 0.99), 4) AS p99
FROM events WHERE value IS NOT NULL
GROUP BY event_type
"""


ENTRIES: dict[str, Q] = {
    "asof_join": Q(q_asof_join, _ASOF_SQL, "backward as-of join, one shuffle"),
    "sessionize_events": Q(q_sessionize_events, _SESSIONIZE_SQL, "gap sessionization"),
    "rollup_revenue": Q(q_rollup_revenue, _ROLLUP_SQL, "rollup subtotals"),
    "percentiles_by_type": Q(q_percentiles_by_type, _PERCENTILES_SQL, "exact percentiles"),
}
