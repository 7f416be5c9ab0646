"""Data-profiling / data-quality catalog entries.

The reference script trusts its inputs (weather_data_fetcher.py drops
malformed geocodes ad hoc, wdf.py:150-170); a pipeline feeding a 100 TB
corpus can't — it needs machine-checkable table profiles and constraint
reports as first-class queries. Both queries here are single-pass,
map-combinable aggregates (count/min/max/distinct), so they scan-scale:
no windows, no joins except the keyed FK probes in the DQ report.

Float caveat encoded once: profile min/max are raw parquet values
(bit-identical across engines); only computed RATES are rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import Q, t

#: Profiled columns of `events`: (name, is_numeric)
_PROFILE_COLS = (
    ("event_id", True),
    ("user_id", True),
    ("event_type", False),
    ("value", True),
    ("props", False),
)


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-format profile of the events table: per column null count,
    exact distinct count, and typed min/max (numeric columns in min_num/
    max_num, string columns in min_str/max_str — NEVER doubles rendered
    as strings: the engines' float-to-text shortest-representation rules
    differ, raw parquet doubles are bit-identical).

    Shape: one PRUNED single-column scan per profiled column (parquet is
    columnar, so five single-column scans read the same bytes as one
    five-column scan), each feeding a partial-aggregated hash distinct +
    a min/max/null aggregate, unioned long-format. This deliberately
    AVOIDS the single-pass ``agg(count_distinct×5, min, max, ...)`` form:
    mixed distinct + string-buffered min/max forces Spark's
    multi-distinct Expand (6× row multiplication) into SortAggregate —
    measured 2-4x slower on identical results at sf0.1. At 100 TB you'd
    swap exact distincts for approx_count_distinct — the exact form IS
    the oracle-checkable twin of that sketch
    (tests/test_approx_sketches.py covers the error bounds)."""
    ev = t(spark, sf_dir, "events")
    parts = []
    for c, num in _PROFILE_COLS:
        base = ev.select(c)
        stats = base.agg(
            F.sum(F.col(c).isNull().cast("bigint")).alias("n_nulls"),
            F.min(F.col(c).cast("double") if num else F.col(c)).alias("mn"),
            F.max(F.col(c).cast("double") if num else F.col(c)).alias("mx"),
        )
        # two-level exact distinct: partial-agg'd groupBy, then a 1-row
        # count — stays on the HashAggregate codegen path.
        dist = base.distinct().agg(F.count(F.col(c)).alias("n_distinct"))
        if num:
            mm = [
                F.col("mn").alias("min_num"),
                F.col("mx").alias("max_num"),
                F.lit(None).cast("string").alias("min_str"),
                F.lit(None).cast("string").alias("max_str"),
            ]
        else:
            mm = [
                F.lit(None).cast("double").alias("min_num"),
                F.lit(None).cast("double").alias("max_num"),
                F.col("mn").alias("min_str"),
                F.col("mx").alias("max_str"),
            ]
        parts.append(
            # 1-row × 1-row broadcast join (BNLJ degenerate case —
            # whitelisted in tests/test_plan_shape.py NON_EQUI_OK).
            stats.join(F.broadcast(dist)).select(
                F.lit(c).alias("column_name"), "n_nulls", "n_distinct", *mm
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def _profile_sql() -> str:
    selects = []
    for c, num in _PROFILE_COLS:
        if num:
            mm = (
                f" CAST(min({c}) AS DOUBLE) AS min_num,"
                f" CAST(max({c}) AS DOUBLE) AS max_num,"
                " CAST(NULL AS VARCHAR) AS min_str,"
                " CAST(NULL AS VARCHAR) AS max_str"
            )
        else:
            mm = (
                " CAST(NULL AS DOUBLE) AS min_num,"
                " CAST(NULL AS DOUBLE) AS max_num,"
                f" min({c}) AS min_str,"
                f" max({c}) AS max_str"
            )
        selects.append(
            f"SELECT '{c}' AS column_name,"
            f" CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,"
            f" CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,"
            + mm
            + " FROM events"
        )
    return "\nUNION ALL\n".join(selects)


def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint report over the star schema: FK orphan counts, key
    uniqueness violations, domain-range violations — the publish gate a
    truncate-and-load pipeline (reference K2/K3) should run before the
    swap. Output: (check_name, n_violations), one row per check.

    Shapes: each FK probe is a LEFT ANTI equi-join (one keyed shuffle,
    anti side partial-counted); uniqueness is a keyed groupBy HAVING;
    range checks are pure scan predicates. The union of tiny 1-row
    aggregates costs nothing."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    ev = t(spark, sf_dir, "events")

    orphan_li = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit("lineitem_orphan_orderkey").alias("check_name"), "n_violations")
    )
    orphan_orders = (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit("orders_orphan_custkey").alias("check_name"), "n_violations")
    )
    dup_events = (
        ev.groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit("events_dup_event_id").alias("check_name"), "n_violations")
    )
    neg_price = (
        li.agg(
            F.sum((F.col("l_extendedprice") <= 0.0).cast("bigint")).alias(
                "n_violations"
            )
        ).select(F.lit("lineitem_nonpositive_price").alias("check_name"), "n_violations")
    )
    bad_discount = (
        li.agg(
            F.sum(
                ((F.col("l_discount") < 0.0) | (F.col("l_discount") > 0.5)).cast(
                    "bigint"
                )
            ).alias("n_violations")
        ).select(F.lit("lineitem_discount_range").alias("check_name"), "n_violations")
    )
    return orphan_li.union(orphan_orders).union(dup_events).union(neg_price).union(
        bad_discount
    )


_DQ_SQL = """
SELECT 'lineitem_orphan_orderkey' AS check_name,
       CAST(count(*) AS BIGINT) AS n_violations
FROM lineitem l WHERE NOT EXISTS
  (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'orders_orphan_custkey',
       CAST(count(*) AS BIGINT)
FROM orders o WHERE NOT EXISTS
  (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'events_dup_event_id', CAST(count(*) AS BIGINT)
FROM (SELECT event_id FROM events GROUP BY event_id HAVING count(*) > 1)
UNION ALL
SELECT 'lineitem_nonpositive_price',
       CAST(sum(CASE WHEN l_extendedprice <= 0.0 THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'lineitem_discount_range',
       CAST(sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.5
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
"""


ENTRIES: dict[str, Q] = {
    "table_profile": Q(
        q_table_profile, _profile_sql(), "per-column null/distinct/min/max profile"
    ),
    "dq_checks": Q(q_dq_checks, _DQ_SQL, "FK orphans / dup keys / range violations"),
}
