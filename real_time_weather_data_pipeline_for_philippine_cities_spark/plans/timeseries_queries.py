"""Time-series + advanced-aggregate catalog entries: as-of join,
gap sessionization, rollup subtotals, exact percentiles.

None of these exist in the reference (its analytics layer is vaporware —
README.md:4, SURVEY.md §2.5); they are declared capabilities of the
rebuild's observation-log model, each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import (
    oracle_quantize_double,
    oracle_round_div,
    quantize_domain_guard,
    quantize_double,
    round_div,
)
from ..operators.rangejoin import point_in_interval_join
from ..operators.timeseries import asof_join_backward, session_stats
from .base import Q, finite, finite_pred, finite_sql, t


# -- as-of join: latest event value at-or-before each order date -----------
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    # raw-double 4dp: engine-identical quantize template, domain-guarded
    # (value is unbounded-magnitude) — tie-margin audit, final batch.
    events = t(spark, sf_dir, "events").filter(F.col("value").isNotNull()).select(
        "user_id",
        "ts",
        quantize_double(quantize_domain_guard("value", 4), 4).alias("value"),
    )
    out = asof_join_backward(
        orders, events, key="o_custkey", left_ts="o_orderdate",
        right_ts="ts", value_cols=["value"], right_key="user_id",
    )
    return out.select("o_orderkey", "o_custkey", "o_orderdate", "asof_ts", "asof_value")


_ASOF_SQL = f"""
WITH ev AS (
  SELECT user_id, ts,
         max({oracle_quantize_double(quantize_domain_guard('value', 4), 4)})
           AS value
  FROM events WHERE value IS NOT NULL GROUP BY user_id, ts)
SELECT o_orderkey, o_custkey, o_orderdate,
       ev.ts AS asof_ts, ev.value AS asof_value
FROM orders ASOF LEFT JOIN ev
  ON o_custkey = ev.user_id AND ev.ts <= o_orderdate
"""


# -- gap-based sessionization ----------------------------------------------
SESSION_GAP_S = 6 * 3600


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # finite(): a NaN/Inf metric must not abort the session sum (ANSI
    # CAST_OVERFLOW on both engines) — non-finite = missing, rows stay.
    ev = t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", finite("value").alias("value")
    )
    return session_stats(ev, key="user_id", ts="ts", gap_seconds=SESSION_GAP_S,
                         value_col="value", order_tiebreak=["event_id"])


_SESSIONIZE_SQL = f"""
WITH ordered AS (
  SELECT user_id, ts, event_id,
         CASE WHEN isfinite(value) THEN value END AS value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                   > {SESSION_GAP_S * 1_000_000}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
sessioned AS (
  SELECT user_id, ts, value,
         -- CAST: DuckDB's windowed sum() yields HUGEINT, which would leak
         -- through the GROUP BY into the driver's type-sensitive value hash
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC,
                                event_id ASC ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS session_seq
  FROM ordered)
SELECT user_id, session_seq,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
FROM sessioned GROUP BY user_id, session_seq
"""


# -- rollup subtotals -------------------------------------------------------
def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    # Broadcast only the bounded dims (nation/region); customer scales
    # with the fact side, so its strategy is AQE's call.
    joined = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"),
                "o_totalprice")
    )
    # exact integer cents before summation (same sf1 last-cent drift fix
    # as revenue_by_nation).
    # finite() money contract (round-8 money sweep): non-finite price is
    # missing, never a CAST abort.
    return joined.rollup("region_name", "nation_name").agg(
        (F.sum(F.round(finite("o_totalprice") * 100).cast("bigint")) / 100.0).alias(
            "total_revenue"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )


_ROLLUP_SQL = f"""
SELECT r_name AS region_name, n_name AS nation_name,
       sum(CAST(round(({finite_sql('o_totalprice')}) * 100) AS BIGINT)) / 100.0
         AS total_revenue,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP (region_name, nation_name)
"""


# -- grouping sets (cube) ---------------------------------------------------
def q_cube_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, day-of-week): all four grouping combinations
    in one pass — the full grouping-sets lattice (rollup covers the
    hierarchical subset)."""
    ev = t(spark, sf_dir, "events").filter(finite_pred("value"))
    return (
        ev.withColumn("dow", F.dayofweek("ts").cast("long"))
        .cube("event_type", "dow")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # integer-cents: order-independent across engines (values are 2dp)
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias(
                "sum_value"
            ),
        )
    )


_CUBE_SQL = """
SELECT event_type, dow, count(*) AS n_events,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
FROM (SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS dow, value
      FROM events WHERE isfinite(value))
GROUP BY CUBE (event_type, dow)
"""


# -- exact interpolated percentiles ----------------------------------------
def q_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    # finite_pred: Spark and DuckDB place NaN differently inside ordinal
    # statistics — non-finite values are missing by contract.
    ev = t(spark, sf_dir, "events").filter(finite_pred("value"))
    # interpolated percentiles are generic doubles: quantize through the
    # engine-identical half-away template, not F.round (tie-margin audit).
    # Aggregate FIRST into named columns, then guard+quantize: `value` is
    # unbounded-magnitude, so without quantize_domain_guard one huge-but-
    # finite row (1e300 passes isfinite) makes Spark's floor→BIGINT
    # ANSI-abort while DuckDB's DOUBLE floor returns a value (round-9
    # advice); the named-column pre-projection keeps the guard's double
    # interpolation of x_sql from re-evaluating the percentile.
    return (
        ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("_p50"),
            F.expr("percentile(value, 0.95)").alias("_p95"),
            F.expr("percentile(value, 0.99)").alias("_p99"),
        )
        .select(
            "event_type",
            quantize_double(quantize_domain_guard("_p50", 4), 4).alias("p50"),
            quantize_double(quantize_domain_guard("_p95", 4), 4).alias("p95"),
            quantize_double(quantize_domain_guard("_p99", 4), 4).alias("p99"),
        )
    )


_PERCENTILES_SQL = f"""
WITH agg AS (
  SELECT event_type,
         quantile_cont(value, 0.5)  AS _p50,
         quantile_cont(value, 0.95) AS _p95,
         quantile_cont(value, 0.99) AS _p99
  FROM events WHERE isfinite(value)
  GROUP BY event_type)
SELECT event_type,
       {oracle_quantize_double(quantize_domain_guard('_p50', 4), 4)} AS p50,
       {oracle_quantize_double(quantize_domain_guard('_p95', 4), 4)} AS p95,
       {oracle_quantize_double(quantize_domain_guard('_p99', 4), 4)} AS p99
FROM agg
"""


# -- moving average over a 7-day window frame ------------------------------
def q_moving_avg_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events").filter(finite_pred("value"))
    # Integer-cents arithmetic for the windowed average: averaging 2dp
    # doubles lands exactly on .xx5 boundaries where Spark (BigDecimal
    # string-repr HALF_UP) and DuckDB (numeric std::round) disagree.
    # Summing exact BIGINT cents and dividing once is boundary-free: .5
    # cases are exactly representable and both engines round them away
    # from zero.
    daily = ev.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("day_cents")
    ).withColumn("day_sum", F.col("day_cents") / 100.0)
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("day").asc())
        .rowsBetween(-6, Window.currentRow)
    )
    ma_cents = F.round(
        F.sum("day_cents").over(w) / F.count(F.lit(1)).over(w)
    ).cast("long")
    return daily.select(
        "day",
        "event_type",
        "day_sum",
        (ma_cents / 100.0).alias("ma7"),
        F.count(F.lit(1)).over(w).alias("n_days_in_window"),
    )


_MOVING_AVG_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS day_sum,
         sum(CAST(round(value * 100) AS BIGINT)) AS day_cents
  FROM events WHERE isfinite(value) GROUP BY 1, 2)
SELECT day, event_type, day_sum,
       CAST(round(sum(day_cents) OVER w::DOUBLE / count(*) OVER w) AS BIGINT)
         / 100.0 AS ma7,
       count(*) OVER w AS n_days_in_window
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY day ASC
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


# -- day-over-day deltas via lag -------------------------------------------
def q_day_over_day_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w = Window.orderBy(F.col("day").asc())
    # pct_change is a pure integer ratio ((n - prev) * 100 / prev): the
    # exact-integer round_div template ends the engine-dependent tie
    # behavior of round() on the ratio double (tie-margin audit).
    return daily.withColumn("prev", F.lag("n_events").over(w)).select(
        "day",
        "n_events",
        (F.col("n_events") - F.col("prev")).alias("delta"),
        round_div("(n_events - prev) * 100", "prev", 2).alias("pct_change"),
    )


_DOD_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, count(*) AS n_events FROM events GROUP BY 1),
lagged AS (
  SELECT day, n_events, lag(n_events) OVER (ORDER BY day ASC) AS prev
  FROM daily)
SELECT day, n_events,
       n_events - prev AS delta,
       {oracle_round_div('(n_events - prev) * 100', 'prev', 2)} AS pct_change
FROM lagged
"""


# -- pivot: wide per-type daily counts -------------------------------------
EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


def q_pivot_daily_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() with an EXPLICIT value list — at scale, pivot
    without values triggers an extra distinct pass over the data; the
    explicit list keeps it single-pass and the schema stable."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
    )


_PIVOT_SQL = f"""
SELECT CAST(ts AS DATE) AS day,
       {", ".join(f"count(*) FILTER (WHERE event_type = '{t}') AS {t}" for t in EVENT_TYPES)}
FROM events GROUP BY 1
"""


# -- ordered string aggregation --------------------------------------------
def q_types_per_user_stragg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-distinct string agg: array_sort(collect_set) + array_join is
    the deterministic Spark encoding of DuckDB's
    string_agg(DISTINCT ... ORDER BY ...)."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("types_seen"),
        F.count(F.lit(1)).alias("n_events"),
    )


_STRAGG_SQL = """
SELECT user_id,
       -- coalesce: zero non-null types must be '' (the engine's
       -- array_join(collect_set) identity), not NULL (string_agg's)
       coalesce(string_agg(DISTINCT event_type, ',' ORDER BY event_type ASC),
                '') AS types_seen,
       count(*) AS n_events
FROM events GROUP BY user_id
"""


# -- unpivot (melt) back to long form --------------------------------------
def q_unpivot_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT: the wide per-day event-count matrix melted back to long
    (day, event_type, n) — the inverse of the pivot query and the missing
    half of the reshape surface. Uses the native ``DataFrame.unpivot``
    (Spark's UNPIVOT clause); zero-filled before melting so both engines
    agree on rows (UNPIVOT drops NULL cells by default in DuckDB while
    Spark keeps them — zero-fill removes the divergence). Map-side
    reshape; the only shuffle is the upstream pivot aggregate.
    """
    wide = q_pivot_daily_event_counts(spark, sf_dir)
    return wide.unpivot(
        ids=["day"],
        values=list(EVENT_TYPES),
        variableColumnName="event_type",
        valueColumnName="n",
    )


_UNPIVOT_SQL = f"""
WITH wide AS (
  SELECT CAST(ts AS DATE) AS day,
         {", ".join(f"count(*) FILTER (WHERE event_type = '{t}') AS {t}" for t in EVENT_TYPES)}
  FROM events GROUP BY 1)
UNPIVOT wide ON {", ".join(EVENT_TYPES)} INTO NAME event_type VALUE n
"""


# -- per-type robust value outliers ----------------------------------------
def q_event_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value statistics with a deterministic 3-sigma
    outlier count — the monitoring pass that catches a broken emitter
    (values suddenly 100x) before its events pollute downstream rollups.
    Same integer-quantized-moment contract as embedding_norm_outliers:
    values quantize to exact BIGINT cents, every aggregate is an exact
    integer sum, so mean/std/threshold are bit-identical doubles on both
    engines and the outlier COUNT itself is deterministic. Shapes: one
    scan, one bounded-key groupBy, a tiny stats join back, a second
    bounded groupBy — all map-combinable.
    """
    ev = t(spark, sf_dir, "events").filter(finite_pred("value"))
    cents = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    stats = (
        cents.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("vc").alias("sv"),
            F.sum(F.col("vc") * F.col("vc")).alias("sq"),
        )
        .select(
            "event_type",
            "n",
            "sv",
            (F.col("sv").cast("double") / 100 / F.col("n")).alias("mean"),
            F.sqrt(
                F.greatest(
                    F.col("sq").cast("double") / 1e4 / F.col("n")
                    - (F.col("sv").cast("double") / 100 / F.col("n"))
                    * (F.col("sv").cast("double") / 100 / F.col("n")),
                    F.lit(0.0),
                )
            ).alias("std"),
        )
    )
    outl = (
        cents.join(stats, "event_type")
        .filter(F.abs(F.col("vc") / 100 - F.col("mean")) > 3 * F.col("std"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_outliers"))
    )
    # reported mean = sv/(100n) through the exact-integer round_div
    # template; std is a generic sqrt-moment double -> guarded quantize
    # on the NAMED column (tie-margin audit, final batch).
    return stats.join(outl, "event_type", "left").select(
        "event_type",
        "n",
        round_div("sv", "100 * n", 6).alias("mean_value"),
        quantize_double(quantize_domain_guard("std", 6), 6).alias("std_value"),
        F.coalesce("n_outliers", F.lit(0).cast("long")).alias("n_outliers"),
    )


_EVENT_OUTLIERS_SQL = f"""
WITH cents AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc
  FROM events WHERE isfinite(value)),
st AS (
  SELECT event_type, count(*) AS n, CAST(sum(vc) AS BIGINT) AS svi,
         CAST(sum(vc) AS DOUBLE) AS sv, CAST(sum(vc * vc) AS DOUBLE) AS sq
  FROM cents GROUP BY event_type),
st2 AS (
  SELECT event_type, n, svi, sv / 100 / n AS mean,
         sqrt(greatest(sq / 1e4 / n - (sv / 100 / n) * (sv / 100 / n), 0.0))
           AS std
  FROM st),
o AS (
  SELECT c.event_type, count(*) AS n_outliers
  FROM cents c JOIN st2 USING (event_type)
  WHERE abs(vc / 100 - mean) > 3 * std
  GROUP BY c.event_type)
SELECT event_type, n,
       {oracle_round_div('svi', '100 * n', 6)} AS mean_value,
       {oracle_quantize_double(quantize_domain_guard('std', 6), 6)} AS std_value,
       CAST(coalesce(n_outliers, 0) AS BIGINT) AS n_outliers
FROM st2 LEFT JOIN o USING (event_type)
"""


#: EWMA decay: 1/4 is exactly representable in binary, so every fold step
#: is an exact IEEE double op — identical on both engines in sequence.
EWMA_ALPHA = 0.25


def q_ewma_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of ``value`` per user, folded
    in strict event-time order (ts, event_id) and reported at the last
    event — the classic online smoothing/monitoring statistic
    (``ewma_i = α·v_i + (1-α)·ewma_{i-1}``, seeded from the first value).

    EWMA is inherently sequential, so the declarative encoding is a
    per-key ordered fold: ``array_sort(collect_list(struct))`` fixes the
    order inside the aggregate, then ``aggregate(...)`` runs the
    recurrence as a deterministic left fold — the same contract DuckDB's
    ``list(value ORDER BY ...)`` + ``list_reduce`` expresses, so both
    engines walk identical doubles in identical order. One shuffle on
    user_id; per-task memory is bounded by the largest single key's
    history (the per-key state bound every sequential-stat operator has —
    the streaming twin is ``streaming/stateful.py::running_totals``,
    which carries the same recurrence as incremental state instead of a
    collected array). 100 TB: for unbounded histories you'd window the
    fold per epoch and chain epoch-final states — the recurrence is
    associative over segment compositions ``(scale, offset)`` — but the
    catalog entry keeps the direct form.
    """
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    a, b = EWMA_ALPHA, 1.0 - EWMA_ALPHA
    per = ev.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(ts, event_id, value))),"
            " x -> x.value)"
        ).alias("seq")
    )
    # pre-project the fold into a NAMED column, then guarded quantize:
    # the EWMA is a generic unbounded double, and the guard/quantize
    # templates reference their input multiple times (cost contract on
    # quantize_domain_guard) — tie-margin audit, final batch.
    return per.select(
        "user_id",
        F.size("seq").cast("long").alias("n_events"),
        F.expr(
            f"aggregate(seq, CAST(NULL AS DOUBLE), (acc, x) -> "
            f"CASE WHEN acc IS NULL THEN x ELSE {a} * x + {b} * acc END)"
        ).alias("_ewma"),
    ).select(
        "user_id",
        "n_events",
        quantize_double(quantize_domain_guard("_ewma", 6), 6).alias("ewma"),
    )


_EWMA_SQL = f"""
WITH seqs AS (
  SELECT user_id, list(value ORDER BY ts, event_id) AS seq
  FROM events WHERE value IS NOT NULL GROUP BY user_id),
folded AS (
  SELECT user_id, CAST(len(seq) AS BIGINT) AS n_events,
         list_reduce(seq, (acc, x) -> {EWMA_ALPHA} * x + {1.0 - EWMA_ALPHA} * acc)
           AS _ewma
  FROM seqs)
SELECT user_id, n_events,
       {oracle_quantize_double(quantize_domain_guard('_ewma', 6), 6)} AS ewma
FROM folded
"""


# -- binned range join: in-transit inventory per calendar day ---------------
# Transit window length is 2..14 days (2 * l_linenumber, l_linenumber in
# 1..7); a 16-day bin keeps interval replication at <= 2 bins per row while
# each bin still sees only ~2 weeks of shipments.
TRANSIT_BIN_DAYS = 16


def q_range_join_transit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (NO equi key): order dates vs shipment transit
    intervals ``[l_shipdate, l_shipdate + 2*l_linenumber days]``. Naive
    Spark gives BroadcastNestedLoopJoin — O(|dates| x |lineitem|); the
    operator's bin blocking turns it into a hash equi-join on the 16-day
    bin, which is what survives both sides scaling (the oracle is DuckDB's
    native IEJoin on the same predicate)."""
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_shipdate").cast("date").alias("ship"),
        F.date_add(
            F.col("l_shipdate").cast("date"), (F.col("l_linenumber") * 2).cast("int")
        ).alias("arrive"),
        "l_quantity",
    )
    pts = (
        t(spark, sf_dir, "orders")
        .select(F.col("o_orderdate").cast("date").alias("day"))
        .distinct()
    )
    joined = point_in_interval_join(
        pts, li, point_col="day", start_col="ship", end_col="arrive",
        bin_days=TRANSIT_BIN_DAYS,
    )
    return joined.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_in_transit"),
        F.sum(F.col("l_quantity").cast("long")).alias("qty_in_transit"),
    )


_RANGE_JOIN_SQL = """
WITH iv AS (
  SELECT CAST(l_shipdate AS DATE) AS ship,
         CAST(l_shipdate AS DATE) + 2*l_linenumber AS arrive,
         l_quantity
  FROM lineitem),
pts AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS day FROM orders)
SELECT day, count(*) AS n_in_transit,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_in_transit
FROM pts JOIN iv ON day BETWEEN ship AND arrive
GROUP BY day
"""


# -- ordered funnel: view -> click -> purchase ------------------------------
FUNNEL_WINDOW = "INTERVAL 24 HOUR"


def q_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered funnel per user with a 24 h conversion window per
    step: earliest view, earliest click within 24 h AFTER that view,
    earliest purchase within 24 h AFTER that click; stage = how deep the
    user got. Three keyed groupBys + left joins, all shuffles on user_id
    with map-combined mins — no window over the event stream, no per-user
    event sorting, so the plan is the same at 100 TB (sequence
    pattern-matching via per-stage conditional minima, not MATCH_RECOGNIZE
    state machines)."""
    ev = t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    # NOTE (r11, examined and left alone): v/c are re-evaluated per
    # reference (6 scans, 0 reused exchanges) but persisting them
    # measured 1.48x slower at sf0.1 / 1.22x at sf1 (interleaved A/B) —
    # each duplicate pass is a pruned pushed-filter scan + map-combined
    # min that overlaps in one job; the cache is a barrier.
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("t_view"))
            & (F.col("ts") <= F.col("t_view") + F.expr(FUNNEL_WINDOW))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("t_click"))
            & (F.col("ts") <= F.col("t_click") + F.expr(FUNNEL_WINDOW))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c.select("user_id", "t_click"), "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            (
                F.lit(1)
                + F.col("t_click").isNotNull().cast("long")
                + F.col("t_purchase").isNotNull().cast("long")
            ).alias("funnel_stage"),
        )
    )


_FUNNEL_SQL = f"""
WITH v AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT e.user_id, min(ts) AS t_click FROM events e JOIN v USING (user_id)
  WHERE event_type = 'click' AND ts > t_view
    AND ts <= t_view + {FUNNEL_WINDOW} GROUP BY e.user_id),
p AS (
  SELECT e.user_id, min(ts) AS t_purchase FROM events e JOIN c USING (user_id)
  WHERE event_type = 'purchase' AND ts > t_click
    AND ts <= t_click + {FUNNEL_WINDOW} GROUP BY e.user_id)
SELECT v.user_id, t_view, t_click, t_purchase,
       1 + CAST(t_click IS NOT NULL AS BIGINT)
         + CAST(t_purchase IS NOT NULL AS BIGINT) AS funnel_stage
FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
"""


# -- retention cohorts ------------------------------------------------------
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort-retention triangle: users grouped by first-active
    day, counted on each later active day offset. Two keyed shuffles
    (distinct user-days; first-day mins) + one join on user_id; the output
    lattice is |days|² — bounded by the calendar, not the corpus."""
    ev = t(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    first = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(first, "user_id")
        .withColumn("day_offset", F.datediff("day", "cohort_day").cast("long"))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


_RETENTION_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
first AS (
  SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id)
SELECT cohort_day, CAST(datediff('day', cohort_day, day) AS BIGINT) AS day_offset,
       count(*) AS n_active
FROM days JOIN first USING (user_id)
GROUP BY cohort_day, day_offset
"""


# -- z-order clustering key -------------------------------------------------
def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton clustering key over (user_id, event day): the sort key whose
    range-partitioned layout makes per-file min/max stats selective for
    predicates on EITHER dimension (functions/zorder.py — Delta OPTIMIZE
    ZORDER's primitive). Map-only projection; the layout write it feeds is
    repartitionByRange(zkey) + sortWithinPartitions. The clustering win is
    measured in tests/test_functions.py (per-chunk bounding-box area vs an
    unclustered layout)."""
    from ..functions.zorder import morton_key_col

    ev = t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_date(F.to_date("ts")).cast("long").alias("day")
    )
    return ev.withColumn("zkey", morton_key_col("user_id", "day"))


def _zorder_oracle() -> str:
    from ..functions.zorder import morton_key_sql

    return f"""
SELECT event_id, user_id,
       CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day,
       {morton_key_sql("user_id", "datediff('day', DATE '1970-01-01', CAST(ts AS DATE))")} AS zkey
FROM events
"""


# -- INTERSECT set op -------------------------------------------------------
def q_active_buyer_keys_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keys appearing on BOTH sides: users with purchase events ∩ customers
    holding orders — INTERSECT (distinct semantics), the set op the
    reference's symmetric difference never needed."""
    ev = t(spark, sf_dir, "events")
    orders = t(spark, sf_dir, "orders")
    buyers = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("key")
    )
    holders = orders.select(F.col("o_custkey").alias("key"))
    return buyers.intersect(holders)


_INTERSECT_SQL = """
SELECT user_id AS key FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT o_custkey AS key FROM orders
"""


# -- gap-fill resampling + linear interpolation -----------------------------
RESAMPLE_BUCKET_S = 21600  # 6-hour buckets


def q_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize each user's event stream onto a 6-hour grid and linearly
    interpolate the gaps — the resample/gap-fill primitive every telemetry
    pipeline needs (the reference ingests on a fixed cadence and never has
    to fill; SURVEY.md §7.6 generalizes to irregular streams).

    Shapes at scale: one keyed groupBy onto (user, bucket), then ONE
    window pass over the OBSERVED buckets only — gap rows are generated
    afterwards, map-side, by exploding ``sequence(b, next_b - 1)`` per
    observed row (never corpus x corpus; a gap row's neighbors are the
    generating row's own forward fold and the next row's backward fold,
    so no grid join and no second pass over the filled grid — the r4
    grid-join formulation shuffled the exploded grid AND re-aggregated
    the span; this one is 2 shuffles total). Forward/backward IGNORE
    NULLS folds and the lead() all share one sort (same partition/order
    spec → one Window node). Determinism: bucket means are integer-micro
    sums over exact ints; the interpolation ratio is a quotient of
    bucket-index ints — both engines evaluate the identical IEEE tree
    before the 6dp rounding.
    """
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    # Bucket index = floor(epoch_seconds / bucket) computed ENTIRELY in
    # integer space: CAST(ts AS LONG) is the exact micros floorDiv (where
    # unix_timestamp truncates toward zero and mis-buckets pre-1970
    # sub-second timestamps), and the pmod/div pair makes the quotient a
    # true floor for negative seconds (`div` alone truncates). Caught by
    # the temporal-extremes sweep (round 7).
    obs = (
        ev.select(
            "user_id",
            F.expr(
                f"(CAST(ts AS LONG) - pmod(CAST(ts AS LONG), {RESAMPLE_BUCKET_S}))"
                f" div {RESAMPLE_BUCKET_S}"
            ).alias("b"),
            F.round(finite("value") * 1000000).cast("bigint").alias("micro"),
        )
        .groupBy("user_id", "b")
        .agg(
            ((F.sum("micro") / F.count(F.lit(1))) / 1000000.0).alias("mean_val")
        )
    )
    w = Window.partitionBy("user_id").orderBy("b")
    w_fwd = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_bwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    obs_b = F.when(F.col("mean_val").isNotNull(), F.col("b"))
    # Per observed bucket: its own forward/backward non-null folds (these
    # are exactly what the old grid row at this bucket saw), plus the NEXT
    # observed bucket's backward fold — which is what every generated gap
    # row strictly between the two buckets saw.
    folded = obs.select(
        "user_id",
        "b",
        "mean_val",
        F.last("mean_val", ignorenulls=True).over(w_fwd).alias("fwd_val"),
        F.last(obs_b, ignorenulls=True).over(w_fwd).alias("fwd_b"),
        F.first("mean_val", ignorenulls=True).over(w_bwd).alias("bwd_val"),
        F.first(obs_b, ignorenulls=True).over(w_bwd).alias("bwd_b"),
    )
    # lead() of the folds: a second Window op over the SAME spec — the
    # input is already partitioned and sorted, so no extra exchange/sort.
    chained = folded.select(
        "*",
        F.lead("b").over(w).alias("lead_b"),
        F.lead("bwd_val").over(w).alias("lead_bwd_val"),
        F.lead("bwd_b").over(w).alias("lead_bwd_b"),
    )
    filled = chained.select(
        "user_id",
        F.explode(F.expr("sequence(b, coalesce(lead_b - 1, b))")).alias("bb"),
        "b",
        "mean_val",
        "fwd_val",
        "fwd_b",
        "bwd_val",
        "bwd_b",
        "lead_bwd_val",
        "lead_bwd_b",
    ).select(
        "user_id",
        F.col("bb").alias("b"),
        F.when(F.col("bb") == F.col("b"), F.col("mean_val")).alias("obs_val"),
        F.col("fwd_val").alias("prev_val"),
        F.col("fwd_b").alias("prev_b"),
        F.when(F.col("bb") == F.col("b"), F.col("bwd_val"))
        .otherwise(F.col("lead_bwd_val"))
        .alias("next_val"),
        F.when(F.col("bb") == F.col("b"), F.col("bwd_b"))
        .otherwise(F.col("lead_bwd_b"))
        .alias("next_b"),
    )
    ratio = (F.col("b") - F.col("prev_b")).cast("double") / (
        F.col("next_b") - F.col("prev_b")
    ).cast("double")
    # CASE first, quantize ONCE on the named result: collapsing the four
    # per-branch F.round sites into one guarded engine-identical quantize
    # is value-identical (the CASE picks a branch, then rounds) and ends
    # this query's tie-margin exposure (audit, final batch).
    value_raw = (
        F.when(F.col("obs_val").isNotNull(), F.col("obs_val"))
        .when(F.col("prev_val").isNull(), F.col("next_val"))
        .when(F.col("next_val").isNull(), F.col("prev_val"))
        .otherwise(
            F.col("prev_val") + (F.col("next_val") - F.col("prev_val")) * ratio
        )
    )
    src = (
        F.when(F.col("obs_val").isNotNull(), F.lit("observed"))
        .when(
            F.col("prev_val").isNull() | F.col("next_val").isNull(), F.lit("edge")
        )
        .otherwise(F.lit("interpolated"))
    )
    return filled.select(
        "user_id",
        F.timestamp_seconds(F.col("b") * RESAMPLE_BUCKET_S).alias("bucket_ts"),
        value_raw.alias("_vraw"),
        src.alias("src"),
    ).select(
        "user_id",
        "bucket_ts",
        quantize_double(quantize_domain_guard("_vraw", 6), 6).alias(
            "value_filled"
        ),
        "src",
    )


_RESAMPLE_SQL = f"""
WITH sec AS (
  -- exact integer floor of epoch seconds, then floor-division by the
  -- bucket width in integer space (// truncates, so shift the numerator
  -- down to the bucket boundary first) — mirrors the Spark side's
  -- CAST(ts AS LONG) + pmod/div pair (temporal-extremes sweep, round 7)
  SELECT user_id,
         CASE WHEN isfinite(value) THEN value END AS value,
         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS s
  FROM events),
obs AS (
  SELECT user_id,
         (s - ((s % {RESAMPLE_BUCKET_S}) + {RESAMPLE_BUCKET_S})
                % {RESAMPLE_BUCKET_S}) // {RESAMPLE_BUCKET_S} AS b,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_micro,
         CAST(count(*) AS BIGINT) AS cnt
  FROM sec GROUP BY 1, 2),
span AS (SELECT user_id, min(b) AS b0, max(b) AS b1 FROM obs GROUP BY 1),
grid AS (SELECT user_id, unnest(generate_series(b0, b1)) AS b FROM span),
marked AS (
  SELECT g.user_id, g.b, (o.sum_micro / o.cnt) / 1000000.0 AS obs_val
  FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.b = g.b),
filled AS (
  SELECT user_id, b, obs_val,
    last_value(obs_val IGNORE NULLS) OVER w_fwd AS prev_val,
    last_value(CASE WHEN obs_val IS NOT NULL THEN b END IGNORE NULLS)
      OVER w_fwd AS prev_b,
    first_value(obs_val IGNORE NULLS) OVER w_bwd AS next_val,
    first_value(CASE WHEN obs_val IS NOT NULL THEN b END IGNORE NULLS)
      OVER w_bwd AS next_b
  FROM marked
  WINDOW
    w_fwd AS (PARTITION BY user_id ORDER BY b
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_bwd AS (PARTITION BY user_id ORDER BY b
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
raw AS (
  SELECT user_id, b, obs_val, prev_val, next_val,
         CASE WHEN obs_val IS NOT NULL THEN obs_val
              WHEN prev_val IS NULL THEN next_val
              WHEN next_val IS NULL THEN prev_val
              ELSE prev_val + (next_val - prev_val)
                   * (CAST(b - prev_b AS DOUBLE)
                      / CAST(next_b - prev_b AS DOUBLE)) END AS _vraw
  FROM filled)
SELECT user_id,
       make_timestamp(b * {RESAMPLE_BUCKET_S} * 1000000) AS bucket_ts,
       {oracle_quantize_double(quantize_domain_guard('_vraw', 6), 6)}
         AS value_filled,
       CASE WHEN obs_val IS NOT NULL THEN 'observed'
            WHEN prev_val IS NULL OR next_val IS NULL THEN 'edge'
            ELSE 'interpolated' END AS src
FROM raw
"""


# -- trailing RANGE-frame window over raw event time ------------------------
TRAIL_RANGE_S = 3600  # 1-hour trailing interval


def q_trailing_hour_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: that user's value sum and event count over the trailing
    hour — a RANGE frame over event time, not a ROWS frame (moving_avg_7d
    covers ROWS over pre-aggregated days; this is the interval-frame
    surface where peers are chosen by KEY DISTANCE, so rows landing in
    the same second share one frame regardless of physical order).

    Cross-engine determinism: the ordering key is integer epoch-seconds
    computed as the exact micros floor — CAST(ts AS LONG) here, never
    ``unix_timestamp`` (which truncates toward zero, so a pre-1970
    sub-second timestamp lands one bucket high), and never the engines'
    fractional ``epoch()`` double (whose resolution at year-9999
    magnitude rounds .999999 into the next second; temporal-extremes
    sweep, round 7). Values are summed as integer micro-units, and the
    frame is [key-3600, key] on exact BIGINTs. One shuffle on user_id.
    """
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events").filter(finite_pred("value"))
    keyed = ev.select(
        "event_id",
        "user_id",
        F.col("ts").cast("long").alias("sec"),
        F.round(F.col("value") * 1000000).cast("bigint").alias("micro"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-TRAIL_RANGE_S, Window.currentRow)
    )
    return keyed.select(
        "event_id",
        "user_id",
        "sec",
        (F.sum("micro").over(w) / 1000000.0).alias("trail_sum"),
        F.count(F.lit(1)).over(w).alias("trail_cnt"),
    )


_TRAILING_SQL = f"""
SELECT event_id, user_id, sec,
       CAST(sum(micro) OVER w AS BIGINT) / 1000000.0 AS trail_sum,
       CAST(count(*) OVER w AS BIGINT) AS trail_cnt
FROM (
  SELECT event_id, user_id,
         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec,
         CAST(round(value * 1000000) AS BIGINT) AS micro
  FROM events WHERE isfinite(value))
WINDOW w AS (PARTITION BY user_id ORDER BY sec
             RANGE BETWEEN {TRAIL_RANGE_S} PRECEDING AND CURRENT ROW)
"""


# -- gaps-and-islands: consecutive-day activity streaks ----------------------
def q_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user consecutive-active-day streaks via the gaps-and-islands
    date-minus-row_number trick: within a user, consecutive calendar days
    share (epoch_day - row_number), so one groupBy on that island key turns
    runs into rows — no self-join, no iterative pass.

    This is the streak/retention shape sessionize_events (gap-threshold on
    raw event timestamps) does not cover: islands are defined on the
    DISTINCT day grid, so duplicate events per day cannot split or extend a
    run. Plan: the map-side-combined distinct on (user, day) collapses raw
    events to the day grid BEFORE anything shuffles on user_id alone, so
    the second exchange carries at most |users| x |calendar| rows; the
    window and BOTH stacked groupBys then pipeline on that one user_id
    partitioning (hash(user) satisfies clustering on (user, grp)) with
    zero further exchanges. Per-user day counts are bounded by the
    calendar, so no skew at 100 TB."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    isl = days.withColumn(
        "grp",
        F.unix_date(F.col("d")) - F.row_number().over(Window.partitionBy("user_id").orderBy("d")),
    )
    streaks = isl.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("len"))
    return streaks.groupBy("user_id").agg(
        F.sum("len").alias("n_active_days"),
        F.max("len").alias("max_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
    )


_ISLANDS_SQL = """
WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
isl AS (
  SELECT user_id,
         datediff('day', DATE '1970-01-01', d)
           - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
  FROM days),
streaks AS (
  SELECT user_id, grp, count(*) AS len FROM isl GROUP BY user_id, grp)
SELECT user_id,
       CAST(sum(len) AS BIGINT) AS n_active_days,
       CAST(max(len) AS BIGINT) AS max_streak,
       CAST(count(*) AS BIGINT) AS n_streaks
FROM streaks GROUP BY user_id
"""


# -- robust (median/MAD) outlier detection -----------------------------------
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier count per event type — the
    contamination-resistant twin of event_value_outliers' mean/stddev
    3-sigma rule (a single extreme value shifts mean AND inflates stddev;
    the median and MAD ignore it).

    Exact interpolated percentile on both engines (the proven
    percentile ≡ quantile_cont pairing from percentiles_by_type), each
    median rounded to 6 dp BEFORE reuse so interpolation ulp drift cannot
    flip a threshold comparison downstream. The 1.4826 sigma-consistency
    product is written with identical left-association on both sides.
    Plan: two grouped aggregates over the pruned 2-column scan, each
    result broadcast back — event_type cardinality is tiny, so the big
    side never shuffles."""
    ev = (
        t(spark, sf_dir, "events")
        .filter(finite_pred("value"))
        .select("event_type", "value")
    )
    # unbounded-magnitude medians: aggregate into a named column, then
    # guard+quantize (see q_percentiles_by_type — same round-9 advice).
    med = (
        ev.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("_med"))
        .select(
            "event_type",
            quantize_double(quantize_domain_guard("_med", 6), 6).alias("med"),
        )
    )
    # NOTE (r11, examined and left alone): med/dev are re-evaluated per
    # consumer (4 scans) but materializing med + persisting dev measured
    # 1.07x (sf0.1) / 1.13x (sf1) SLOWER — the percentile re-aggregation
    # is cheaper than the corpus-scale cache it would avoid.
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("value") - F.col("med"))
    )
    mad = (
        dev.groupBy("event_type")
        .agg(F.expr("percentile(ad, 0.5)").alias("_mad"))
        .select(
            "event_type",
            quantize_double(quantize_domain_guard("_mad", 6), 6).alias("mad"),
        )
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                (
                    F.col("ad") > F.lit(3) * F.lit(1.4826) * F.col("mad")
                ).cast("bigint")
            ).alias("n_outliers"),
        )
    )


_MAD_SQL = f"""
WITH ev AS (SELECT event_type, value FROM events WHERE isfinite(value)),
med0 AS (SELECT event_type, quantile_cont(value, 0.5) AS _med
         FROM ev GROUP BY event_type),
med AS (SELECT event_type,
               {oracle_quantize_double(quantize_domain_guard('_med', 6), 6)} AS med
        FROM med0),
dev AS (SELECT e.event_type, m.med, abs(e.value - m.med) AS ad
        FROM ev e JOIN med m USING (event_type)),
mad0 AS (SELECT event_type, quantile_cont(ad, 0.5) AS _mad
         FROM dev GROUP BY event_type),
mad AS (SELECT event_type,
               {oracle_quantize_double(quantize_domain_guard('_mad', 6), 6)} AS mad
        FROM mad0)
SELECT d.event_type, d.med, m.mad,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN d.ad > 3 * 1.4826 * m.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type, d.med, m.mad
"""


def q_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase is credited to the user's
    most recent PRIOR non-purchase event type ('(none)' for cold
    purchases), rolled up to purchases + distinct purchasers per channel.

    Shape: one window partitioned by user (single shuffle on user_id)
    whose frame is a running last_value(IGNORE NULLS) ending at the
    previous row — a streaming frame, so state per user is one string
    regardless of history length — then a 5-group map-combined rollup.
    The as-of semantics cost no join at all (contrast asof_join, which
    attributes across TABLES; this one attributes within one ordered
    stream). Ties broken by event_id so both engines walk one order.
    """
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("channel", prior)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("channel", F.lit("(none)")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("n_purchases"), "channel")
    )


_LAST_TOUCH_SQL = """
WITH tagged AS (
  SELECT user_id, event_type,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
  FROM events)
SELECT coalesce(channel, '(none)') AS channel,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM tagged WHERE event_type = 'purchase'
GROUP BY 1
ORDER BY n_purchases DESC, channel
"""


ENTRIES: dict[str, Q] = {
    "last_touch_attribution": Q(
        q_last_touch_attribution,
        _LAST_TOUCH_SQL,
        "last-touch channel attribution via running IGNORE-NULLS frame",
    ),
    "trailing_hour_stats": Q(
        q_trailing_hour_stats,
        _TRAILING_SQL,
        "trailing 1h RANGE-frame window per user over raw event time",
    ),
    "resample_interpolate": Q(
        q_resample_interpolate,
        _RESAMPLE_SQL,
        "6h gap-fill resampling + linear interpolation per key",
    ),
    "asof_join": Q(q_asof_join, _ASOF_SQL, "backward as-of join, one shuffle"),
    "range_join_transit": Q(
        q_range_join_transit, _RANGE_JOIN_SQL, "binned point-in-interval range join"
    ),
    "zorder_key": Q(q_zorder_key, _zorder_oracle(), "Morton clustering key"),
    "funnel_stages": Q(
        q_funnel_stages, _FUNNEL_SQL, "ordered view->click->purchase funnel"
    ),
    "retention_cohorts": Q(
        q_retention_cohorts, _RETENTION_SQL, "first-active cohort retention triangle"
    ),
    "sessionize_events": Q(q_sessionize_events, _SESSIONIZE_SQL, "gap sessionization"),
    "rollup_revenue": Q(q_rollup_revenue, _ROLLUP_SQL, "rollup subtotals"),
    "percentiles_by_type": Q(q_percentiles_by_type, _PERCENTILES_SQL, "exact percentiles"),
    "cube_event_stats": Q(q_cube_event_stats, _CUBE_SQL, "CUBE grouping lattice"),
    "moving_avg_7d": Q(q_moving_avg_7d, _MOVING_AVG_SQL, "7-day window-frame MA"),
    "day_over_day_change": Q(q_day_over_day_change, _DOD_SQL, "lag deltas"),
    "active_buyer_keys_intersect": Q(
        q_active_buyer_keys_intersect, _INTERSECT_SQL, "INTERSECT set op"
    ),
    "pivot_daily_event_counts": Q(
        q_pivot_daily_event_counts, _PIVOT_SQL, "explicit-values pivot"
    ),
    "types_per_user_stragg": Q(
        q_types_per_user_stragg, _STRAGG_SQL, "ordered string agg"
    ),
    "ewma_per_user": Q(
        q_ewma_per_user, _EWMA_SQL, "event-time-ordered EWMA fold per user"
    ),
    "unpivot_daily_counts": Q(
        q_unpivot_daily_counts, _UNPIVOT_SQL, "UNPIVOT/melt of the daily pivot"
    ),
    "event_value_outliers": Q(
        q_event_value_outliers,
        _EVENT_OUTLIERS_SQL,
        "per-type value stats + deterministic 3-sigma outlier count",
    ),
    "activity_islands": Q(
        q_activity_islands,
        _ISLANDS_SQL,
        "gaps-and-islands consecutive-day streaks per user",
    ),
    "mad_outliers": Q(
        q_mad_outliers,
        _MAD_SQL,
        "median/MAD robust outlier count per event type",
    ),
}
