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

from ..functions.rounding import (
    oracle_quantize_double,
    oracle_round_div,
    quantize_domain_guard,
    quantize_double,
    round_div,
)
from .base import Q, finite, finite_pred, t

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
    # when/otherwise, not sum(cast(cond)): a NULL column value makes the
    # comparison NULL, and summing NULLs reports the CHECK itself as NULL
    # instead of an integer count (degenerate-parity sweep, round 7).
    neg_price = (
        li.agg(
            F.sum(F.when(F.col("l_extendedprice") <= 0.0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_violations")
        ).select(F.lit("lineitem_nonpositive_price").alias("check_name"), "n_violations")
    )
    bad_discount = (
        li.agg(
            F.sum(
                F.when(
                    (F.col("l_discount") < 0.0) | (F.col("l_discount") > 0.5), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_violations")
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


# Canonical sketch width lives in functions/hashing.py (single source of
# truth shared with streaming/cardinality.py — see its KMV_R docstring).
from ..functions.hashing import KMV_R  # noqa: E402


def q_kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day distinct-user estimate from a K-minimum-values-style sketch
    (R independent hash minima per group) vs the exact count — the
    mergeable cardinality sketch a 100 TB profiler uses where exact
    COUNT(DISTINCT) would shuffle every distinct pair.

    One md5 per input row (hash28), then the R minima come from the dedup
    family's integer minhash permutations (a*h+b mod P) — 32 modular
    multiplies are ~5x cheaper than 32 md5s (measured at sf0.1), and the
    sketch stays portable because the (a,b) constants are inlined
    identically into the oracle. No explode either: the sketch is R min()
    aggregates side by side, so one map-side-combined groupBy carries at
    most R BIGINTs per group per map partition regardless of input rows —
    the row you'd persist to merge sketches across shards is literally the
    aggregate's schema.

    Estimator: the min of n uniforms on [0, P) has mean ~P/(n+1), so with
    S the exact BIGINT sum of the R minima, n_est = R*P/S - 1. The sketch
    is duplicate-insensitive by construction (min absorbs repeats).
    Determinism: S is an order-independent integer sum; the only float ops
    are one division and one subtraction on exact integers, bit-identical
    cross-engine. The exact COUNT(DISTINCT) column is the accuracy
    report, not part of the sketch path."""
    from ..functions.hashing import (
        kmv_estimate_col,
        kmv_hash_col,
        kmv_minima_aggs,
        kmv_sum_col,
    )
    from .base import spread

    ev = spread(t(spark, sf_dir, "events"), "event_id").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    mins = ev.select("day", kmv_hash_col("user_id")).groupBy("day").agg(
        *kmv_minima_aggs(KMV_R)
    )
    # kmv_s is the sketch's exact integer digest — consumers comparing
    # sketches across shards/engines compare it without any float ops;
    # n_est / rel_err pass the raw doubles through unrounded (elementwise
    # IEEE ops on identical integers are bit-identical; round-on-raw-
    # division is the forbidden half-case pattern).
    est = mins.select(
        "day",
        kmv_sum_col(KMV_R).alias("kmv_s"),
        kmv_estimate_col(KMV_R).alias("n_est"),
    )
    exact = ev.groupBy("day").agg(F.countDistinct("user_id").alias("n_exact"))
    return (
        est.join(exact, "day")
        .select("day", "n_exact", "kmv_s", "n_est")
        .withColumn(
            "rel_err",
            F.abs(F.col("n_est") - F.col("n_exact")) / F.col("n_exact"),
        )
    )


def _kmv_sql() -> str:
    from ..functions.hashing import MINHASH_PRIME, minhash_coefficients

    coeffs = minhash_coefficients(KMV_R)
    min_cols = ",\n         ".join(
        f"min((h0 * {a} + {b}) % {MINHASH_PRIME}) AS m{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    s_expr = " + ".join(f"m{i}" for i in range(KMV_R))
    return f"""
WITH base AS (
  SELECT CAST(ts AS DATE) AS day,
         ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 7))::BIGINT AS h0
  FROM events),
mins AS (
  SELECT day,
         {min_cols}
  FROM base GROUP BY day),
est AS (SELECT day, {s_expr} AS s FROM mins),
ex AS (SELECT CAST(ts AS DATE) AS day, count(DISTINCT user_id) AS n_exact
       FROM events GROUP BY day),
j AS (
  SELECT day, n_exact, s,
         {KMV_R} * CAST({MINHASH_PRIME} AS DOUBLE)
           / CAST(s AS DOUBLE) - 1 AS n_est
  FROM est JOIN ex USING (day))
SELECT day, n_exact, CAST(s AS BIGINT) AS kmv_s, n_est,
       abs(n_est - n_exact) / n_exact AS rel_err
FROM j
"""


# -- mergeable quantile sketch ------------------------------------------------
#: bottom-K sample size per group (the sketch's accuracy knob).
QSKETCH_K = 256
#: survivor-count safety margin for the threshold prefilter.
QSKETCH_MARGIN = 8
#: 2^60 — the hash60 value range.
_H60_RANGE = 1152921504606846976


def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quantile estimates from a deterministic bottom-K-by-hash
    sample — the mergeable quantile sketch a 100 TB profiler uses where an
    exact per-group percentile would sort every row.

    The sample is the K rows with the smallest hash60(event_id) per group:
    a uniform (hash-random) but fully deterministic sample, and MERGEABLE
    by construction — bottom-K of a union is the bottom-K of the parts'
    bottom-Ks, so shard sketches combine losslessly (same min-wise algebra
    as the KMV sketch above). Quantile q is then the ceil(q*k)-th order
    statistic of the sample.

    Scale shape: a threshold PREFILTER (h <= 2^60 div n * K*MARGIN, exact
    integer arithmetic off a broadcast 5-row count lattice) drops ~all
    rows map-side, so the per-group ranking windows see ~K*MARGIN
    survivors instead of the corpus — the windows are bounded by
    construction, never corpus-sized. Groups smaller than K*MARGIN pass
    everything (threshold >= 2^60) and the sketch degrades to exact.
    The accuracy report joins the exact interpolated median (Spark
    percentile == DuckDB quantile_cont, proven bitwise by mad_outliers).
    """
    from pyspark.sql import Window

    from ..functions.hashing import hash60
    from .base import spread

    ev = (
        spread(t(spark, sf_dir, "events"), "event_id")
        .filter(finite_pred("value"))
        .select("event_type", "event_id", "value")
    )
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    # thr ~ 2^60 * K*MARGIN / n, computed as 2^60 div (n div K*MARGIN) so
    # the arithmetic never exceeds 2^60 (no bigint overflow under ANSI);
    # groups with n <= K*MARGIN divide by 1 and pass every row.
    thr = counts.withColumn(
        "thr",
        F.expr(
            f"{_H60_RANGE}L div greatest(1L, n div {QSKETCH_K * QSKETCH_MARGIN}L)"
        ),
    )
    surv = (
        ev.withColumn("h", hash60(F.col("event_id").cast("string")))
        .join(F.broadcast(thr), "event_type")
        .filter(F.col("h") <= F.col("thr"))
    )
    w1 = Window.partitionBy("event_type").orderBy("h", "event_id")
    samp = (
        surv.withColumn("rk", F.row_number().over(w1))
        .filter(F.col("rk") <= QSKETCH_K)
    )
    w2 = Window.partitionBy("event_type").orderBy("value", "event_id")
    wk = Window.partitionBy("event_type")
    s2 = samp.withColumn("r2", F.row_number().over(w2)).withColumn(
        "k", F.count(F.lit(1)).over(wk)
    )

    def stat(q: float, name: str):
        return F.max(
            F.when(
                F.col("r2") == F.ceil(F.lit(q) * F.col("k")), F.col("value")
            )
        ).alias(name)

    sk = s2.groupBy("event_type").agg(
        F.max("k").cast("bigint").alias("sample_k"),
        stat(0.5, "p50_est"),
        stat(0.9, "p90_est"),
        stat(0.99, "p99_est"),
    )
    exact = ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("_p50x")
    )
    # NAMED relative-error column, then guarded engine-identical quantize
    # (a near-zero exact median makes the ratio unbounded) — tie-margin
    # audit, final batch.
    return (
        sk.join(F.broadcast(counts), "event_type")
        .join(F.broadcast(exact), "event_type")
        .select(
            "event_type",
            "n",
            "sample_k",
            "p50_est",
            "p90_est",
            "p99_est",
            (F.abs(F.col("p50_est") - F.col("_p50x")) / F.abs("_p50x")).alias(
                "_rel"
            ),
        )
        .select(
            "event_type",
            "n",
            "sample_k",
            "p50_est",
            "p90_est",
            "p99_est",
            quantize_double(quantize_domain_guard("_rel", 4), 4).alias(
                "p50_rel_err"
            ),
        )
        .orderBy("event_type")
    )


_QSKETCH_SQL = f"""
WITH fin AS (
  SELECT event_type, event_id, value FROM events WHERE isfinite(value)),
counts AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM fin GROUP BY 1),
base AS (
  SELECT e.event_type, e.event_id, e.value,
         ('0x' || substring(md5(CAST(e.event_id AS VARCHAR)), 1, 15))::BIGINT
           AS h
  FROM fin e),
surv AS (
  SELECT b.* FROM base b JOIN counts c USING (event_type)
  WHERE b.h <= {_H60_RANGE} // greatest(1, c.n // {QSKETCH_K * QSKETCH_MARGIN})),
samp AS (
  SELECT * FROM (
    SELECT event_type, event_id, value,
           row_number() OVER (PARTITION BY event_type ORDER BY h, event_id)
             AS rk
    FROM surv) WHERE rk <= {QSKETCH_K}),
s2 AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id)
           AS r2,
         count(*) OVER (PARTITION BY event_type) AS k
  FROM samp),
sk AS (
  SELECT event_type, CAST(max(k) AS BIGINT) AS sample_k,
         max(CASE WHEN r2 = ceil(0.5 * k) THEN value END) AS p50_est,
         max(CASE WHEN r2 = ceil(0.9 * k) THEN value END) AS p90_est,
         max(CASE WHEN r2 = ceil(0.99 * k) THEN value END) AS p99_est
  FROM s2 GROUP BY 1),
ex AS (SELECT event_type, quantile_cont(value, 0.5) AS p50x
       FROM fin GROUP BY 1),
rel AS (
  SELECT sk.event_type, c.n, sk.sample_k, sk.p50_est, sk.p90_est, sk.p99_est,
         abs(sk.p50_est - ex.p50x) / abs(ex.p50x) AS _rel
  FROM sk JOIN counts c USING (event_type) JOIN ex USING (event_type))
SELECT event_type, n, sample_k, p50_est, p90_est, p99_est,
       {oracle_quantize_double(quantize_domain_guard('_rel', 4), 4)}
         AS p50_rel_err
FROM rel ORDER BY event_type
"""


# -- mergeable count-min frequency sketch -------------------------------------
#: count-min depth (independent hash rows) — the failure-probability knob.
CM_D = 4
#: count-min width (buckets per row) — the overestimate knob: expected
#: collision mass per bucket is n_rows / CM_W.
CM_W = 1024
#: heavy hitters reported (exact top-N probes for the accuracy readout).
CM_TOPN = 20
#: coefficient-family seed — disjoint from the KMV family's default so the
#: two sketches never share a permutation.
CM_SEED = 97


def q_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-frequency estimates from a count-min sketch vs the
    exact counts for the top-N heaviest users — the mergeable frequency
    sketch a 100 TB profiler uses where an exact per-item count table
    would itself be corpus-sized. Completes the mergeable-sketch family
    (KMV cardinality, bottom-K quantiles, count-min frequencies).

    Sketch build: one md5 per input row (hash28), then CM_D bucket ids
    from the dedup family's integer permutations ((a*h+b) mod P mod W —
    same portable arithmetic as the KMV sketch, disjoint seed family).
    The posexplode multiplies rows CM_D x MAP-SIDE ONLY: the groupBy
    partial-aggregates to at most CM_D*CM_W counter rows per map
    partition, so the shuffle carries a bounded sketch (<= 4096 rows),
    never the corpus. Counters are additive, hence shard-mergeable by
    construction, and small enough to broadcast to the probe join.

    Estimate: for each probe item, min over the CM_D counters it hashes
    to — never an underestimate (every counter >= the item's true count),
    so `cm_over = n_cm - n_exact >= 0` is an invariant the tests pin.
    Probes are the exact top-CM_TOPN users (deterministic cut: count
    DESC, user_id), making the entry its own accuracy report.

    Determinism: counters and minima are exact BIGINT arithmetic — no
    floats anywhere — and both the top-N cut and the output order carry
    total tie-breaks."""
    from ..functions.hashing import MINHASH_PRIME, hash28, minhash_coefficients
    from .base import spread

    coeffs = minhash_coefficients(CM_D, seed=CM_SEED)
    ev = spread(t(spark, sf_dir, "events"), "event_id").select("user_id")

    def buckets(h0: str):
        return F.array(
            *[(F.col(h0) * a + b) % MINHASH_PRIME % CM_W for a, b in coeffs]
        )

    hashed = ev.select(hash28(F.col("user_id").cast("string")).alias("cm_h0"))
    counters = (
        hashed.select(F.posexplode(buckets("cm_h0")).alias("seed", "bucket"))
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_exact"))
    probes = exact.orderBy(F.col("n_exact").desc(), "user_id").limit(CM_TOPN)
    probed = probes.select(
        "user_id",
        "n_exact",
        hash28(F.col("user_id").cast("string")).alias("cm_h0"),
    ).select(
        "user_id", "n_exact", F.posexplode(buckets("cm_h0")).alias("seed", "bucket")
    )
    est = (
        probed.join(F.broadcast(counters), ["seed", "bucket"])
        .groupBy("user_id")
        .agg(F.max("n_exact").alias("n_exact"), F.min("c").alias("n_cm"))
    )
    return est.select(
        "user_id",
        "n_exact",
        "n_cm",
        (F.col("n_cm") - F.col("n_exact")).alias("cm_over"),
    ).orderBy(F.col("n_exact").desc(), "user_id")


def _countmin_sql() -> str:
    from ..functions.hashing import MINHASH_PRIME, minhash_coefficients

    coeffs = minhash_coefficients(CM_D, seed=CM_SEED)
    seed_rows = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(coeffs))
    return f"""
WITH seeds(seed, a, b) AS (VALUES {seed_rows}),
base AS (
  SELECT ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 7))::BIGINT AS h0
  FROM events),
counters AS (
  SELECT s.seed, ((b.h0 * s.a + s.b) % {MINHASH_PRIME}) % {CM_W} AS bucket,
         CAST(count(*) AS BIGINT) AS c
  FROM base b CROSS JOIN seeds s
  GROUP BY 1, 2),
exact AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_exact
  FROM events GROUP BY 1),
probes AS (
  SELECT user_id, n_exact,
         ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 7))::BIGINT AS h0
  FROM exact ORDER BY n_exact DESC, user_id LIMIT {CM_TOPN}),
probed AS (
  SELECT p.user_id, p.n_exact,
         s.seed, ((p.h0 * s.a + s.b) % {MINHASH_PRIME}) % {CM_W} AS bucket
  FROM probes p CROSS JOIN seeds s),
est AS (
  SELECT p.user_id, max(p.n_exact) AS n_exact, min(c.c) AS n_cm
  FROM probed p JOIN counters c USING (seed, bucket)
  GROUP BY 1)
SELECT user_id, n_exact, n_cm, n_cm - n_exact AS cm_over
FROM est ORDER BY n_exact DESC, user_id
"""


#: Equal-width histogram bin count (numeric_histogram).
HIST_BINS = 20

#: Join keys profiled by join_key_skew_profile: (label, table, column).
SKEW_KEYS = (
    ("events.user_id", "events", "user_id"),
    ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
    ("lineitem.l_partkey", "lineitem", "l_partkey"),
)


def q_join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fan-out profile of the catalog's three hottest join keys — the
    report a 100 TB planner reads BEFORE picking join strategies: a key
    whose max fan-out dwarfs its mean (skew_ratio) needs salting or AQE
    skew splitting (operators/skew.py); one whose p99 is tame can shuffle
    plain. skew_ratio is max_fanout * n_keys / n_rows computed as an
    integer product over exact counts, divided once — bit-identical
    cross-engine.

    Shape per key: one map-combined groupBy (the per-key counts) + a
    1-row rollup of those counts; the three 1-row branches are unioned.
    Nothing joins and nothing collects — at any scale this is three
    count-shaped aggregations.
    """
    outs = []
    for label, tbl, col in SKEW_KEYS:
        cnts = (
            t(spark, sf_dir, tbl)
            .groupBy(col)
            .agg(F.count(F.lit(1)).alias("fanout"))
        )
        outs.append(
            cnts.agg(
                F.count(F.lit(1)).alias("n_keys"),
                F.sum("fanout").alias("n_rows"),
                F.max("fanout").alias("max_fanout"),
                quantize_double("percentile(fanout, 0.99)", 4).alias("p99_fanout"),
            ).select(
                F.lit(label).alias("join_key"),
                "n_keys",
                "n_rows",
                "max_fanout",
                "p99_fanout",
                round_div("max_fanout * n_keys", "n_rows", 4).alias("skew_ratio"),
            )
        )
    df = outs[0]
    for o in outs[1:]:
        df = df.unionByName(o)
    return df.orderBy("join_key")


def _skew_profile_sql() -> str:
    parts = []
    for label, tbl, col in SKEW_KEYS:
        parts.append(f"""
SELECT '{label}' AS join_key,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(fanout) AS BIGINT) AS n_rows,
       max(fanout) AS max_fanout,
       {oracle_quantize_double('quantile_cont(fanout, 0.99)', 4)} AS p99_fanout,
       {oracle_round_div('max(fanout) * count(*)', 'sum(fanout)', 4)}
         AS skew_ratio
FROM (SELECT CAST(count(*) AS BIGINT) AS fanout FROM {tbl} GROUP BY {col})""")
    return " UNION ALL ".join(parts) + "\nORDER BY join_key"


def q_numeric_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width 20-bin histogram of events.value — the mergeable
    distribution profile that complements table_profile's min/max and the
    quantile sketch (bin counts from different shards ADD, so a 100 TB
    profile is a per-shard groupBy + a 20-row merge).

    Two passes by necessity (bounds, then counts), but the first collapses
    to ONE broadcast row: the bin index is floor((v-min)/width) clamped to
    the last bin, computed identically on both engines from the same raw
    parquet doubles (identical subtraction/division/floor → identical
    bins, no epsilon games). The count pass is a single map-combined
    20-group aggregate; empty bins are materialized by joining the counts
    onto a sequence() bin spine so the histogram shape is total.
    """
    ev = t(spark, sf_dir, "events").filter(finite_pred("value"))
    bounds = ev.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    # constant-valued input: hi == lo would make the bin width 0 (ANSI
    # divide-by-zero); any positive width bins the one value at 0 — the
    # same guard as operators/stats.ks_from_counts, mirrored in the
    # oracle.
    w = F.when(
        F.col("hi") > F.col("lo"), (F.col("hi") - F.col("lo")) / HIST_BINS
    ).otherwise(F.lit(1.0))
    binned = (
        ev.crossJoin(F.broadcast(bounds))
        .select(
            F.least(
                F.floor((F.col("value") - F.col("lo")) / w).cast("int"),
                F.lit(HIST_BINS - 1),
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spine = (
        bounds.select(
            F.explode(F.sequence(F.lit(0), F.lit(HIST_BINS - 1))).alias("bin"),
            "lo",
            "hi",
        )
        .select(
            "bin",
            # generic-double edges -> engine-identical half-away template
            # (tie-margin batch, round 8: round() on a raw double whose
            # shortest repr lands on a half is a per-engine coin flip).
            # Domain-gated: a finite-but-huge metric (1e300) would ANSI-
            # abort Spark's floor while DuckDB sails on — out-of-box
            # edges are NULL on both engines instead (round-8 advice).
            quantize_double(
                quantize_domain_guard(f"lo + bin * (hi - lo) / {HIST_BINS}", 6), 6
            ).alias("bin_lo"),
            quantize_double(
                quantize_domain_guard(
                    f"lo + (bin + 1) * (hi - lo) / {HIST_BINS}", 6
                ),
                6,
            ).alias("bin_hi"),
        )
    )
    return (
        spine.join(binned, "bin", "left")
        .select(
            "bin",
            "bin_lo",
            "bin_hi",
            F.coalesce("n", F.lit(0)).alias("n"),
        )
        .orderBy("bin")
    )


_NUMERIC_HISTOGRAM_SQL = f"""
WITH b AS (
  SELECT min(value) AS lo, max(value) AS hi
  FROM events WHERE isfinite(value)),
binned AS (
  SELECT least(CAST(floor((value - lo) / (CASE WHEN hi > lo THEN (hi - lo) / {HIST_BINS} ELSE 1.0 END)) AS INT),
               {HIST_BINS - 1}) AS bin,
         CAST(count(*) AS BIGINT) AS n
  FROM events CROSS JOIN b WHERE isfinite(value)
  GROUP BY 1),
spine AS (
  SELECT unnest(generate_series(0, {HIST_BINS - 1})) AS bin, lo, hi FROM b)
SELECT s.bin,
       {oracle_quantize_double(quantize_domain_guard(f's.lo + s.bin * (s.hi - s.lo) / {HIST_BINS}', 6), 6)} AS bin_lo,
       {oracle_quantize_double(quantize_domain_guard(f's.lo + (s.bin + 1) * (s.hi - s.lo) / {HIST_BINS}', 6), 6)} AS bin_hi,
       coalesce(c.n, 0) AS n
FROM spine s LEFT JOIN binned c USING (bin)
ORDER BY s.bin
"""


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the 'click' and
    'view' value distributions — the numeric-drift gate that catches a
    shifted feature distribution mixture_drift's count-based report
    cannot see.

    The integer-exact, bucket-parallel KS core lives in
    ``operators/stats.ks_statistic`` (see its docstring for the
    exactness and scale arguments); this entry binds it to the events
    table and is hypothesis-property-tested against a driver-side brute
    force on arbitrary samples.
    """
    from ..operators.stats import ks_statistic

    ev = (
        t(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull()
            & F.col("event_type").isin("click", "view")
        )
        .select("value", "event_type")
    )
    return ks_statistic(
        ev,
        "value",
        F.col("event_type") == "click",
        F.col("event_type") == "view",
    )


_KS_DRIFT_SQL = """
WITH collapsed AS (
  SELECT value,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS n1,
         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS n2
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('click', 'view')
  GROUP BY value),
tot AS (
  SELECT CAST(sum(n1) AS BIGINT) AS na, CAST(sum(n2) AS BIGINT) AS nb
  FROM collapsed),
cum AS (
  SELECT sum(n1) OVER (ORDER BY value) AS c1,
         sum(n2) OVER (ORDER BY value) AS c2
  FROM collapsed)
SELECT CAST(max(abs(c1 * nb - c2 * na)) AS DOUBLE) / (na * nb)
         AS ks_stat,
       na AS n_a, nb AS n_b
FROM cum CROSS JOIN tot
GROUP BY na, nb
"""


def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-type value statistics: the p01/p99 clamped mean the
    robust-feature pipeline reports next to mad_outliers' detection view
    (a handful of sensor spikes should not move a feature's centroid).

    Two passes: the per-type percentile bounds collapse to one row per
    type (bounded key space) and ride back in as a BROADCAST join; the
    clamp is an elementwise least/greatest (bit-identical IEEE ops), and
    the only float reductions — raw vs winsorized mean — are rounded on
    both engines. clipped_n is an exact integer count of affected rows.
    """
    ev = t(spark, sf_dir, "events").filter(finite_pred("value"))
    # bounds are ROUNDED (6dp) before the clamp on BOTH engines: the
    # engines' percentile interpolation can differ by one ulp, and a
    # bound one ulp below a heavily-tied data value silently flips every
    # tie at that value into the clipped count (caught by the sf1 strict
    # sweep: 227.40999999999997 vs 227.41 moved 10 rows).
    # Aggregate into named columns, then guard+quantize: `value` is
    # unbounded-magnitude, so the bounds and means need
    # quantize_domain_guard (one huge-but-finite row would ANSI-abort
    # Spark's floor→BIGINT while the DuckDB twin's DOUBLE floor
    # survives — round-9 advice, same treatment as the histogram edges).
    bounds = (
        ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.01)").alias("_p01"),
            F.expr("percentile(value, 0.99)").alias("_p99"),
        )
        .select(
            "event_type",
            quantize_double(quantize_domain_guard("_p01", 6), 6).alias("p01"),
            quantize_double(quantize_domain_guard("_p99", 6), 6).alias("p99"),
        )
    )
    clamped = ev.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "value",
        F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99")).alias(
            "wvalue"
        ),
    )
    return (
        clamped.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("value") != F.col("wvalue")).cast("long")).alias(
                "clipped_n"
            ),
            F.avg("value").alias("_rm"),
            F.avg("wvalue").alias("_wm"),
        )
        .select(
            "event_type",
            "n",
            "clipped_n",
            quantize_double(quantize_domain_guard("_rm", 4), 4).alias("raw_mean"),
            quantize_double(quantize_domain_guard("_wm", 4), 4).alias(
                "winsorized_mean"
            ),
        )
        .orderBy("event_type")
    )


_WINSORIZED_SQL = f"""
WITH b0 AS (
  SELECT event_type,
         quantile_cont(value, 0.01) AS _p01,
         quantile_cont(value, 0.99) AS _p99
  FROM events WHERE isfinite(value) GROUP BY 1),
b AS (
  SELECT event_type,
         {oracle_quantize_double(quantize_domain_guard('_p01', 6), 6)} AS p01,
         {oracle_quantize_double(quantize_domain_guard('_p99', 6), 6)} AS p99
  FROM b0),
c AS (
  SELECT e.event_type, e.value,
         least(greatest(e.value, b.p01), b.p99) AS wvalue
  FROM events e JOIN b USING (event_type)
  WHERE isfinite(e.value)),
g AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN value <> wvalue THEN 1 ELSE 0 END) AS BIGINT)
           AS clipped_n,
         avg(value) AS _rm,
         avg(wvalue) AS _wm
  FROM c GROUP BY 1)
SELECT event_type, n, clipped_n,
       {oracle_quantize_double(quantize_domain_guard('_rm', 4), 4)} AS raw_mean,
       {oracle_quantize_double(quantize_domain_guard('_wm', 4), 4)} AS winsorized_mean
FROM g ORDER BY 1
"""


def q_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-set union/intersection/Jaccard estimates from two merged
    KMV sketches vs the exact answers — the theta-sketch-style set algebra
    a 100 TB profiler uses to answer "how many users did BOTH X and Y"
    without shuffling user sets: each shard keeps R minima per set, and
    the union sketch is the ELEMENTWISE MIN of the two sketches (computed
    here as ``least(a_i, b_i)``, which is exactly the cross-shard merge
    operation — so this query doubles as the mergeability proof).

    Sets: purchasers (A) vs clickers (B) of the events table. One md5 per
    row, then 2R conditional min() aggregates side by side in ONE
    map-combined global pass — the sketch state is 2R BIGINTs total.
    Estimator per set: n = R*P/S - 1 with S the exact integer sum of
    minima; intersection by inclusion-exclusion (clamped at 0), Jaccard
    as their ratio. All sums are order-independent integers, so the few
    float ops are bit-identical cross-engine. The exact columns (one
    groupBy(user_id) membership pass) are the accuracy report, not part
    of the sketch path."""
    from ..functions.hashing import (
        KMV_R,
        MINHASH_PRIME,
        kmv_hash_col,
        minhash_coefficients,
    )

    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select("user_id", "event_type")
    )
    h = ev.select("event_type", kmv_hash_col("user_id"))
    coeffs = minhash_coefficients(KMV_R)
    perm = [(F.col("kmv_h0") * a + b) % MINHASH_PRIME for a, b in coeffs]
    is_a = F.col("event_type") == "purchase"
    mins = h.agg(
        *[F.min(F.when(is_a, p)).alias(f"a{i}") for i, p in enumerate(perm)],
        *[F.min(F.when(~is_a, p)).alias(f"b{i}") for i, p in enumerate(perm)],
    )
    sa = F.expr(" + ".join(f"a{i}" for i in range(KMV_R)))
    sb = F.expr(" + ".join(f"b{i}" for i in range(KMV_R)))
    su = F.expr(" + ".join(f"least(a{i}, b{i})" for i in range(KMV_R)))
    rp = F.lit(KMV_R) * F.lit(float(MINHASH_PRIME))
    # s_a/s_b/s_union are the sketches' exact integer digests (the
    # cross-shard/cross-engine comparison currency); the estimates pass
    # the raw doubles through UNROUNDED — each is a fixed-order chain of
    # elementwise IEEE ops on identical integers, bit-identical across
    # engines, whereas round-on-raw-division lands on half-cases where
    # engine rounding modes diverge (round-5 advice).
    est = mins.select(
        sa.cast("long").alias("s_a"),
        sb.cast("long").alias("s_b"),
        su.cast("long").alias("s_union"),
        (rp / sa - 1).alias("ra"),
        (rp / sb - 1).alias("rb"),
        (rp / su - 1).alias("ru"),
    ).select(
        "s_a",
        "s_b",
        "s_union",
        F.col("ra").alias("n_a_est"),
        F.col("rb").alias("n_b_est"),
        F.col("ru").alias("n_union_est"),
        F.greatest(F.col("ra") + F.col("rb") - F.col("ru"), F.lit(0.0))
        .alias("n_inter_est"),
        F.least(
            F.greatest(F.col("ra") + F.col("rb") - F.col("ru"), F.lit(0.0))
            / F.col("ru"),
            F.lit(1.0),
        ).alias("jaccard_est"),
    )
    membership = ev.groupBy("user_id").agg(
        F.max(is_a.cast("int")).alias("in_a"),
        F.max((~is_a).cast("int")).alias("in_b"),
    )
    exact = membership.agg(
        F.sum("in_a").alias("n_a_exact"),
        F.sum("in_b").alias("n_b_exact"),
        F.count(F.lit(1)).alias("n_union_exact"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_inter_exact"),
    )
    return exact.crossJoin(est).select(
        "n_a_exact",
        "n_b_exact",
        "n_union_exact",
        "n_inter_exact",
        "s_a",
        "s_b",
        "s_union",
        "n_a_est",
        "n_b_est",
        "n_union_est",
        "n_inter_est",
        "jaccard_est",
    )


def _kmv_set_ops_sql() -> str:
    from ..functions.hashing import KMV_R, MINHASH_PRIME, minhash_coefficients

    coeffs = minhash_coefficients(KMV_R)
    a_cols = ",\n         ".join(
        f"min(CASE WHEN event_type = 'purchase'"
        f" THEN (h0 * {a} + {b}) % {MINHASH_PRIME} END) AS a{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    b_cols = ",\n         ".join(
        f"min(CASE WHEN event_type = 'click'"
        f" THEN (h0 * {a} + {b}) % {MINHASH_PRIME} END) AS b{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    sa = " + ".join(f"a{i}" for i in range(KMV_R))
    sb = " + ".join(f"b{i}" for i in range(KMV_R))
    su = " + ".join(f"least(a{i}, b{i})" for i in range(KMV_R))
    rp = f"{KMV_R} * CAST({MINHASH_PRIME} AS DOUBLE)"
    return f"""
WITH base AS (
  SELECT event_type,
         ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 7))::BIGINT AS h0
  FROM events WHERE event_type IN ('purchase', 'click')),
mins AS (
  SELECT {a_cols},
         {b_cols}
  FROM base),
raw AS (
  SELECT CAST(({sa}) AS BIGINT) AS s_a,
         CAST(({sb}) AS BIGINT) AS s_b,
         CAST(({su}) AS BIGINT) AS s_union,
         {rp} / ({sa}) - 1 AS ra,
         {rp} / ({sb}) - 1 AS rb,
         {rp} / ({su}) - 1 AS ru
  FROM mins),
est AS (
  SELECT s_a, s_b, s_union,
         ra AS n_a_est, rb AS n_b_est,
         ru AS n_union_est,
         greatest(ra + rb - ru, 0.0) AS n_inter_est,
         least(greatest(ra + rb - ru, 0.0) / ru, 1.0) AS jaccard_est
  FROM raw),
membership AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS in_b
  FROM events WHERE event_type IN ('purchase', 'click') GROUP BY 1),
exact AS (
  SELECT CAST(sum(in_a) AS BIGINT) AS n_a_exact,
         CAST(sum(in_b) AS BIGINT) AS n_b_exact,
         CAST(count(*) AS BIGINT) AS n_union_exact,
         CAST(sum(in_a * in_b) AS BIGINT) AS n_inter_exact
  FROM membership)
SELECT n_a_exact, n_b_exact, n_union_exact, n_inter_exact,
       s_a, s_b, s_union,
       n_a_est, n_b_est, n_union_est, n_inter_est, jaccard_est
FROM exact CROSS JOIN est
"""


ENTRIES: dict[str, Q] = {
    "table_profile": Q(
        q_table_profile, _profile_sql(), "per-column null/distinct/min/max profile"
    ),
    "dq_checks": Q(q_dq_checks, _DQ_SQL, "FK orphans / dup keys / range violations"),
    "kmv_distinct_sketch": Q(
        q_kmv_distinct_sketch,
        _kmv_sql(),
        "mergeable R-minima cardinality sketch vs exact",
    ),
    "quantile_sketch": Q(
        q_quantile_sketch,
        _QSKETCH_SQL,
        "mergeable bottom-K-by-hash quantile sketch vs exact median",
    ),
    "countmin_heavy_hitters": Q(
        q_countmin_heavy_hitters,
        _countmin_sql(),
        "mergeable count-min frequency sketch vs exact top-N",
    ),
    "kmv_set_ops": Q(
        q_kmv_set_ops,
        _kmv_set_ops_sql(),
        "merged-KMV set union/intersection/Jaccard estimates vs exact",
    ),
    "numeric_histogram": Q(
        q_numeric_histogram,
        _NUMERIC_HISTOGRAM_SQL,
        "mergeable equal-width 20-bin histogram with total bin spine",
    ),
    "join_key_skew_profile": Q(
        q_join_key_skew_profile,
        _skew_profile_sql(),
        "fan-out / skew-ratio planner report for the hot join keys",
    ),
    "ks_drift": Q(
        q_ks_drift,
        _KS_DRIFT_SQL,
        "exact two-sample KS drift statistic (integer cumulative counts)",
    ),
    "winsorized_stats": Q(
        q_winsorized_stats,
        _WINSORIZED_SQL,
        "p01/p99-clamped robust means per type (broadcast bounds)",
    ),
}
