"""Scalar-function catalog entries (SURVEY.md §2.8, F1-F12).

Each query exercises a function-family on testdata, with the transformation
synthesized in-query where the raw tables lack the trigger shapes (e.g. we
build 'City of X' names from nation so the prefix-strip actually fires) —
both engines run the identical synthesis, so the oracle still checks the
function semantics end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.normalize import (
    _PREFIX_RE,
    candidate_accepted,
    candidate_accepted_sql,
    normalize_city_name,
    strip_city_suffix,
)
from ..functions.rounding import (
    oracle_quantize_double,
    quantize_domain_guard,
    quantize_double,
)
from ..operators.geocode import match_geocode_candidates
from .base import Q, t


# -- F1/F2: prefix/suffix normalization ------------------------------------
def q_normalize_city_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = t(spark, sf_dir, "nation")
    raw = nation.select(
        "n_nationkey",
        F.when(F.col("n_nationkey") % 4 == 0, F.concat(F.lit("City of "), F.col("n_name")))
        .when(F.col("n_nationkey") % 4 == 1, F.concat(F.lit("Municipality of "), F.col("n_name")))
        .when(F.col("n_nationkey") % 4 == 2, F.concat(F.col("n_name"), F.lit(" City")))
        .otherwise(F.col("n_name"))
        .alias("raw_name"),
    )
    return raw.select(
        "n_nationkey",
        "raw_name",
        normalize_city_name(F.col("raw_name")).alias("normalized"),
        strip_city_suffix(F.col("raw_name")).alias("suffix_stripped"),
    )


_NORMALIZE_SQL = f"""
WITH raw AS (
  SELECT n_nationkey,
         CASE WHEN n_nationkey % 4 = 0 THEN 'City of ' || n_name
              WHEN n_nationkey % 4 = 1 THEN 'Municipality of ' || n_name
              WHEN n_nationkey % 4 = 2 THEN n_name || ' City'
              ELSE n_name END AS raw_name
  FROM nation)
SELECT n_nationkey, raw_name,
       trim(regexp_replace(raw_name, '{_PREFIX_RE}', '')) AS normalized,
       CASE WHEN raw_name LIKE '% City'
            THEN trim(substring(raw_name, 1, length(raw_name) - 5))
            ELSE raw_name END AS suffix_stripped
FROM raw
"""


# -- F3/F4: case-insensitive equality / containment ------------------------
def q_case_insensitive_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        (F.lower(F.col("lang")) == "en").alias("is_en"),
        F.lower(F.col("text")).contains("spark").alias("mentions_spark"),
    ).filter(F.col("mentions_spark"))


_CI_MATCH_SQL = """
SELECT doc_id, lang,
       lower(lang) = 'en' AS is_en,
       position('spark' IN lower(text)) > 0 AS mentions_spark
FROM documents
WHERE position('spark' IN lower(text)) > 0
"""


# -- F5/J4/W2 compound: the geocode matcher on synthesized candidates ------
def _synth_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate table in the A4 fixture shape (FIXTURES.md), synthesized
    from events so every rule branch (R1, R2, R3a-c) fires on real rows."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select(
        "user_id",
        "event_id",
        F.row_number().over(w).alias("candidate_idx"),
        F.when(F.col("user_id") % 7 == 0, F.lit("Isabela"))
        .when(F.col("user_id") % 7 == 1, F.lit("Naga"))
        .otherwise(F.concat(F.lit("city_"), F.col("user_id").cast("string")))
        .alias("query_city"),
        F.when(F.col("user_id") % 3 == 0, F.lit("Camarines Sur"))
        .when(F.col("user_id") % 3 == 1, F.upper(F.col("event_type")))
        .otherwise(F.lit(None).cast("string"))
        .alias("province_name"),
        F.when(F.col("value") < 10, F.lit(None).cast("string"))
        .when(F.col("value") < 30, F.lit("Basilan Province"))
        .when(F.col("value") < 60, F.col("event_type"))
        .when(F.col("value") < 80, F.lit("nan"))
        .otherwise(F.concat(F.col("event_type"), F.lit(" extra")))
        .alias("state"),
        # raw-double 2dp synth coords: engine-identical guarded quantize
        # (cheap column snippets, so inline is fine) — tie-margin audit.
        quantize_double(quantize_domain_guard("value", 2), 2).alias("lat"),
        quantize_double(quantize_domain_guard("value * 2", 2), 2).alias("lon"),
    )


_SYNTH_SQL = f"""
  SELECT user_id, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts ASC, event_id ASC) AS candidate_idx,
         CASE WHEN user_id % 7 = 0 THEN 'Isabela'
              WHEN user_id % 7 = 1 THEN 'Naga'
              ELSE 'city_' || user_id END AS query_city,
         CASE WHEN user_id % 3 = 0 THEN 'Camarines Sur'
              WHEN user_id % 3 = 1 THEN upper(event_type) END AS province_name,
         CASE WHEN value < 10 THEN NULL
              WHEN value < 30 THEN 'Basilan Province'
              WHEN value < 60 THEN event_type
              WHEN value < 80 THEN 'nan'
              ELSE event_type || ' extra' END AS state,
         {oracle_quantize_double(quantize_domain_guard('value', 2), 2)} AS lat,
         {oracle_quantize_double(quantize_domain_guard('value * 2', 2), 2)} AS lon
  FROM events
"""


def q_geocode_candidate_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    cands = _synth_candidates(spark, sf_dir)
    return match_geocode_candidates(cands, keys=("user_id",)).select(
        "user_id", "candidate_idx", "query_city", "province_name", "state", "lat", "lon"
    )


_GEOCODE_MATCH_SQL = f"""
WITH cand AS ({_SYNTH_SQL}),
accepted AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY candidate_idx ASC) AS rn
  FROM cand
  WHERE {candidate_accepted_sql('query_city', 'province_name', 'state')}
)
SELECT user_id, candidate_idx, query_city, province_name, state, lat, lon
FROM accepted WHERE rn = 1
"""


# -- F6: coalesce fallback cascade -----------------------------------------
def q_coalesce_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.coalesce(
            F.when(F.col("value") > 50, F.col("value")),
            F.get_json_object("props", "$.k").cast("double"),
            F.lit(-1.0),
        ).alias("resolved"),
    )


_COALESCE_SQL = """
SELECT event_id,
       coalesce(CASE WHEN value > 50 THEN value END,
                CAST(json_extract_string(props, '$.k') AS DOUBLE),
                -1.0) AS resolved
FROM events
"""


# -- F9/F10: JSON extraction with optional-key defaults --------------------
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.coalesce(F.get_json_object("props", "$.k").cast("long"), F.lit(0)).alias("prop_k"),
        F.coalesce(F.get_json_object("props", "$.missing").cast("long"), F.lit(0)).alias(
            "prop_missing"
        ),
    )


_JSON_SQL = """
SELECT event_id, event_type,
       coalesce(CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS prop_k,
       coalesce(CAST(json_extract_string(props, '$.missing') AS BIGINT), 0) AS prop_missing
FROM events
"""


# -- F7/F8: epoch↔timestamp ------------------------------------------------
def q_epoch_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch seconds must be the exact FLOOR of the timestamp, computed in
    integer space on both engines (temporal-extremes sweep, round 7):
    ``unix_timestamp`` truncates toward zero, so -1 µs maps to 0 instead
    of -1 on pre-1970 sub-second timestamps, and the old oracle's
    ``floor(epoch(ts))`` goes through a double whose resolution at
    year-9999 magnitude rounds .999999 up to the NEXT second. Spark's
    ``CAST(ts AS LONG)`` is a true floorDiv of the internal micros;
    DuckDB's ``epoch(date_trunc('second', ts))`` floors calendar-wise
    first, so the double only ever carries an exact integer < 2^53."""
    ev = t(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    return ev.select(
        "event_id",
        sec.alias("epoch_s"),
        F.timestamp_seconds(sec).alias("ts_sec"),
    )


_EPOCH_SQL = """
SELECT event_id,
       CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS epoch_s,
       date_trunc('second', ts) AS ts_sec
FROM events
"""


# -- F7 family: date parts + arithmetic ------------------------------------
def q_date_parts_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.dayofmonth(d).alias("order_day"),
        F.date_add(d, 30).alias("plus_30d"),
        F.date_trunc("month", d).cast("date").alias("month_start"),
    )


_DATE_SQL = """
SELECT o_orderkey,
       year(o_orderdate)  AS order_year,
       month(o_orderdate) AS order_month,
       day(o_orderdate)   AS order_day,
       CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus_30d,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
FROM orders
"""


# -- fuzzy name matching via edit distance ---------------------------------
def q_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein-based candidate matching via operators.geocode
    .fuzzy_best_match: for each probe customer name, the closest supplier
    name within edit distance 10, ties broken by name. Both engines
    implement identical Levenshtein. The caller's semantic filter
    (c_custkey ≤ 200, the geocode-batch diff) is backstopped by the
    operator's own FUZZY_PROBE_CAP bound — the broadcast cross join is
    safe by construction even if this filter drifts; the oracle applies
    the identical cap."""
    from ..operators.geocode import fuzzy_best_match

    cust = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 200)
        .select(F.col("c_name").alias("query_name"))
    )
    supp = t(spark, sf_dir, "supplier").select(F.col("s_name").alias("cand_name"))
    return fuzzy_best_match(cust, supp, "query_name", "cand_name", max_dist=10)


def _fuzzy_sql() -> str:
    from ..operators.geocode import FUZZY_PROBE_CAP

    return f"""
WITH probe AS (
  SELECT DISTINCT c_name AS query_name FROM customer WHERE c_custkey <= 200
  ORDER BY query_name ASC LIMIT {FUZZY_PROBE_CAP}),
scored AS (
  SELECT p.query_name, s.cand_name,
         levenshtein(lower(p.query_name), lower(s.cand_name)) AS edit_dist
  FROM probe p
  CROSS JOIN (SELECT DISTINCT s_name AS cand_name FROM supplier) s
  WHERE levenshtein(lower(p.query_name), lower(s.cand_name)) <= 10)
SELECT query_name, cand_name, edit_dist FROM (
  SELECT query_name, cand_name, edit_dist,
         row_number() OVER (PARTITION BY query_name
                            ORDER BY edit_dist ASC, cand_name ASC) AS rn
  FROM scored) WHERE rn = 1
"""


_FUZZY_SQL = _fuzzy_sql()


# -- distinct-count analytics ----------------------------------------------
def q_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.countDistinct("user_id").alias("distinct_users"),
        F.countDistinct("event_type").alias("distinct_types"),
        F.count(F.lit(1)).alias("n_events"),
    )


_DISTINCT_SQL = """
SELECT CAST(ts AS DATE) AS day,
       count(DISTINCT user_id) AS distinct_users,
       count(DISTINCT event_type) AS distinct_types,
       count(*) AS n_events
FROM events GROUP BY 1
"""


ENTRIES: dict[str, Q] = {
    "normalize_city_names": Q(q_normalize_city_names, _NORMALIZE_SQL, "F1/F2"),
    "case_insensitive_match": Q(q_case_insensitive_match, _CI_MATCH_SQL, "F3/F4"),
    "geocode_candidate_match": Q(q_geocode_candidate_match, _GEOCODE_MATCH_SQL, "F5/J4/W2"),
    "coalesce_cascade": Q(q_coalesce_cascade, _COALESCE_SQL, "F6"),
    "json_extract": Q(q_json_extract, _JSON_SQL, "F9/F10"),
    "epoch_roundtrip": Q(q_epoch_roundtrip, _EPOCH_SQL, "F7/F8"),
    "date_parts_arith": Q(q_date_parts_arith, _DATE_SQL, "F7 date family"),
    "fuzzy_name_match": Q(q_fuzzy_name_match, _FUZZY_SQL, "levenshtein best-match"),
    "distinct_users_daily": Q(q_distinct_users_daily, _DISTINCT_SQL, "distinct aggregates"),
}
