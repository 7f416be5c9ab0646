"""Semantic tests for the round-5 analytics additions: unigram entropy,
n-gram novelty curve, gaps-and-islands streaks, median/MAD outliers, the
KMV-style distinct sketch, argmin/ratio-to-total decorrelations, and the
co-purchase triangle census.

Each query already has a DuckDB oracle (tests/test_oracle_parity.py); the
tests here check what parity can't: hand-built inputs with known answers
(tie-breaks, duplicate-insensitivity, robustness laws) and INDEPENDENT
pure-Python oracles for the graph/robust-stats math.
"""

from __future__ import annotations

import datetime
import itertools
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.corpus_queries import (
    q_ngram_novelty,
    q_token_entropy,
)
from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.profiling_queries import (
    q_kmv_distinct_sketch,
)
from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.subquery_queries import (
    MIN_SUPPORT,
    q_cheapest_supplier_per_part,
    q_dominant_part_supplier,
    q_part_basket_triangles,
)
from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.timeseries_queries import (
    q_activity_islands,
    q_mad_outliers,
)


# ---------------------------------------------------------------- writers
def _write_docs(path, texts):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["s"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(path / "documents.parquet"),
    )
    return str(path)


def _write_events(path, rows):
    """rows: list of (user_id, ts_datetime, event_type, value)."""
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([r[3] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(path / "events.parquet"),
    )
    return str(path)


def _write_lineitem(path, rows):
    """rows: list of (orderkey, partkey, suppkey, quantity, extendedprice)."""
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
                "l_suppkey": pa.array([r[2] for r in rows], pa.int64()),
                "l_quantity": pa.array([float(r[3]) for r in rows], pa.float64()),
                "l_extendedprice": pa.array(
                    [float(r[4]) for r in rows], pa.float64()
                ),
            }
        ),
        str(path / "lineitem.parquet"),
    )


def _write_part(path, keys):
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(keys, pa.int64()),
                "p_name": pa.array([f"part {k}" for k in keys], pa.string()),
            }
        ),
        str(path / "part.parquet"),
    )


def _write_supplier(path, keys):
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(keys, pa.int64()),
                "s_name": pa.array([f"supp {k}" for k in keys], pa.string()),
            }
        ),
        str(path / "supplier.parquet"),
    )


# ------------------------------------------------------------ token entropy
def test_token_entropy_extremes(spark, tmp_path):
    d = tmp_path / "ent"
    d.mkdir()
    _write_docs(d, ["a a a a", "a b c d"])
    rows = {r["doc_id"]: r for r in q_token_entropy(spark, str(d)).collect()}
    assert rows[0]["n_tokens"] == 4 and rows[0]["n_unique"] == 1
    assert rows[0]["token_entropy"] == 0.0
    assert rows[1]["n_unique"] == 4
    assert rows[1]["token_entropy"] == round(math.log(4), 6)


# ------------------------------------------------------------ novelty curve
def test_ngram_novelty_duplicate_doc_contributes_nothing(spark, tmp_path):
    d = tmp_path / "nov"
    d.mkdir()
    t0 = "alpha beta gamma delta epsilon"
    _write_docs(d, [t0, t0, "zeta eta theta iota"])
    rows = {r["doc_id"]: r for r in q_ngram_novelty(spark, str(d)).collect()}
    # first arrival owns every shingle; the exact copy owns none
    assert rows[0]["novelty"] == 1.0
    assert rows[1]["n_new"] == 0 and rows[1]["novelty"] == 0.0
    # disjoint vocabulary doc is all-new regardless of position
    assert rows[2]["novelty"] == 1.0
    assert rows[0]["n_shingles"] == 3  # 5 tokens -> 3 trigrams, all distinct


# ------------------------------------------------------- gaps-and-islands
def test_activity_islands_known_streaks(spark, tmp_path):
    d = tmp_path / "isl"
    d.mkdir()

    def day(n, h=0):
        return datetime.datetime(2024, 1, n, h, 30, 0)

    rows = []
    # user 1: runs [1-3], [5-6], [9]; day 2 has TWO events (must not split)
    for n in (1, 2, 2, 3, 5, 6, 9):
        rows.append((1, day(n, h=len(rows) % 24), "click", 1.0))
    # user 2: single active day
    rows.append((2, day(20), "view", 1.0))
    _write_events(d, rows)
    out = {r["user_id"]: r for r in q_activity_islands(spark, str(d)).collect()}
    assert out[1]["n_active_days"] == 6
    assert out[1]["max_streak"] == 3
    assert out[1]["n_streaks"] == 3
    assert out[2]["n_active_days"] == out[2]["max_streak"] == out[2]["n_streaks"] == 1


# ------------------------------------------------------------ median / MAD
def test_mad_outliers_python_oracle(spark, sf_dir):
    out = {r["event_type"]: r for r in q_mad_outliers(spark, sf_dir).collect()}
    pdf = pd.read_parquet(f"{sf_dir}/events.parquet")[["event_type", "value"]]
    pdf = pdf[pdf.value.notna()]
    for et, grp in pdf.groupby("event_type"):
        med = round(float(np.percentile(grp.value, 50)), 6)
        ad = np.abs(grp.value - med)
        mad = round(float(np.percentile(ad, 50)), 6)
        r = out[et]
        assert r["med"] == med and r["mad"] == mad
        assert r["n_events"] == len(grp)
        assert r["n_outliers"] == int((ad > 3 * 1.4826 * mad).sum())


def test_mad_flags_single_extreme_exactly(spark, tmp_path):
    d = tmp_path / "mad"
    d.mkdir()
    base = [10.0, 11.0, 12.0, 13.0, 14.0, 15.0, 16.0, 1e9]
    _write_events(
        d,
        [(i, datetime.datetime(2024, 1, 1 + i % 5), "t", v) for i, v in enumerate(base)],
    )
    (r,) = q_mad_outliers(spark, str(d)).collect()
    # med 13.5, mad 2.0: the 1e9 point moves the median by only 0.5 and the
    # MAD not at all beyond one step — the robustness law — and is the ONLY
    # deviation above 3 * 1.4826 * mad.
    assert r["med"] == 13.5 and r["mad"] == 2.0
    assert r["n_outliers"] == 1


# ------------------------------------------------------------- KMV sketch
def test_kmv_sketch_duplicate_insensitive(spark, tmp_path, sf_dir):
    base = {r["day"]: r for r in q_kmv_distinct_sketch(spark, sf_dir).collect()}
    # rewrite the same events DOUBLED (every row twice, fresh event_ids):
    # min-hash minima — and therefore every estimate — must be unchanged
    pdf = pd.read_parquet(f"{sf_dir}/events.parquet")
    doubled = pd.concat([pdf, pdf], ignore_index=True)
    doubled["event_id"] = range(len(doubled))
    d = tmp_path / "kmv"
    d.mkdir()
    doubled.to_parquet(str(d / "events.parquet"))
    dup = {r["day"]: r for r in q_kmv_distinct_sketch(spark, str(d)).collect()}
    assert set(base) == set(dup)
    for day in base:
        assert base[day]["n_est"] == dup[day]["n_est"]
        assert base[day]["n_exact"] == dup[day]["n_exact"]
    # loose accuracy envelope for R=32 minima (rel err ~ 1/sqrt(32) ≈ 18%)
    assert all(r["rel_err"] < 0.75 for r in base.values())


# ------------------------------------------------- argmin tie-break (Q2ish)
def test_cheapest_supplier_tie_breaks_to_min_suppkey(spark, tmp_path):
    d = tmp_path / "cheap"
    d.mkdir()
    _write_lineitem(
        d,
        [
            (100, 1, 7, 2, 10.0),  # unit 5.0
            (101, 1, 3, 4, 20.0),  # unit 5.0 (tie) -> suppkey 3 wins
            (102, 1, 9, 1, 100.0),
            (103, 2, 9, 5, 10.0),  # unit 2.0, sole supplier
        ],
    )
    _write_part(d, [1, 2])
    out = {
        r["p_partkey"]: r
        for r in q_cheapest_supplier_per_part(spark, str(d)).collect()
    }
    assert out[1]["best_supp"] == 3 and out[1]["min_unit_price"] == 5.0
    assert out[2]["best_supp"] == 9 and out[2]["min_unit_price"] == 2.0
    assert out[1]["p_name"] == "part 1"


# ------------------------------------------- ratio-to-total dominance (Q20ish)
def test_dominant_supplier_threshold_is_exact(spark, tmp_path):
    d = tmp_path / "dom"
    d.mkdir()
    rows = []
    # part 1: supplier 1 ships 10, suppliers 2-4 ship 1 each:
    #   10 * 4 = 40 > 3 * 13 = 39  -> dominated
    rows += [(1, 1, 1, 10, 1.0)] + [(o, 1, s, 1, 1.0) for o, s in ((2, 2), (3, 3), (4, 4))]
    # part 2: supplier 1 ships 9, suppliers 2-4 ship 1 each:
    #   9 * 4 = 36 > 3 * 12 = 36 is FALSE -> boundary excluded
    rows += [(5, 2, 1, 9, 1.0)] + [(o, 2, s, 1, 1.0) for o, s in ((6, 2), (7, 3), (8, 4))]
    _write_lineitem(d, rows)
    _write_supplier(d, [1, 2, 3, 4])
    out = q_dominant_part_supplier(spark, str(d)).collect()
    assert len(out) == 1
    (r,) = out
    assert r["s_suppkey"] == 1 and r["n_parts_dominated"] == 1
    assert r["dominated_qty"] == 10 and r["s_name"] == "supp 1"


# ------------------------------------------------------- triangle census
def test_part_basket_triangles_python_oracle(spark, sf_dir):
    out = {r["metric"]: r["n_value"] for r in q_part_basket_triangles(spark, sf_dir).collect()}
    pdf = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
    support: dict[tuple[int, int], set[int]] = {}
    for ok, grp in pdf.groupby("l_orderkey"):
        parts = sorted(set(grp.l_partkey))  # testdata baskets are all small
        for x, y in itertools.combinations(parts, 2):
            support.setdefault((x, y), set()).add(ok)
    edges = {e for e, s in support.items() if len(s) >= MIN_SUPPORT}
    nodes = {n for e in edges for n in e}
    higher: dict[int, set[int]] = {}
    for x, y in edges:
        higher.setdefault(x, set()).add(y)
    tri = sum(len(higher.get(x, set()) & higher.get(y, set())) for x, y in edges)
    assert out["n_nodes"] == len(nodes)
    assert out["n_edges"] == len(edges)
    assert out["n_triangles"] == tri


def test_triangle_census_counts_each_triangle_once(spark, tmp_path):
    d = tmp_path / "tri"
    d.mkdir()
    rows = []
    # K4 on parts 1-4: every pair co-ordered in 2 distinct orders -> 4 nodes,
    # 6 edges, C(4,3)=4 triangles. Each "order" is one full basket.
    for o in (1, 2):
        rows += [(o, p, 1, 1, 1.0) for p in (1, 2, 3, 4)]
    # a pair below support (single co-order) must NOT create an edge
    rows += [(3, 5, 1, 1, 1.0), (3, 6, 1, 1, 1.0)]
    _write_lineitem(d, rows)
    out = {r["metric"]: r["n_value"] for r in q_part_basket_triangles(spark, str(d)).collect()}
    assert out == {"n_nodes": 4, "n_edges": 6, "n_triangles": 4}


# ------------------------------------------------------- corpus-law props
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
_text_st = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]), min_size=1, max_size=40
).map(" ".join)
_corpus_st = st.lists(_text_st, min_size=1, max_size=10)

_example_no = [0]


def _pdir(tmp_path):
    _example_no[0] += 1
    d = tmp_path / f"p{_example_no[0]}"
    d.mkdir()
    return d


@given(texts=_corpus_st)
@_SETTINGS
def test_entropy_bounded_by_log_vocab(spark, tmp_path, texts):
    """0 <= H <= ln(n_unique) (uniform distribution maximizes entropy),
    and token accounting must be exact."""
    d = _pdir(tmp_path)
    _write_docs(d, texts)
    for r in q_token_entropy(spark, str(d)).collect():
        toks = texts[r["doc_id"]].split()
        assert r["n_tokens"] == len(toks)
        assert r["n_unique"] == len(set(toks))
        assert -1e-9 <= r["token_entropy"] <= round(math.log(r["n_unique"]), 6) + 1e-9


@given(texts=_corpus_st)
@_SETTINGS
def test_novelty_conservation_law(spark, tmp_path, texts):
    """Every distinct corpus shingle is new exactly once: sum(n_new) over
    docs == |distinct shingles corpus-wide|, and doc 0 is always all-new."""
    d = _pdir(tmp_path)
    _write_docs(d, texts)
    rows = q_ngram_novelty(spark, str(d)).collect()
    shingles = set()
    for t in texts:
        w = t.split()
        shingles |= {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
    assert sum(r["n_new"] for r in rows) == len(shingles)
    by_id = {r["doc_id"]: r for r in rows}
    first = min(by_id) if by_id else None
    if first is not None:
        assert by_id[first]["novelty"] == 1.0


def test_kmv_sketch_is_mergeable(spark, sf_dir):
    """THE scale property: sketches built per shard merge by min-of-mins
    into exactly the sketch of the union — so per-day minima computed over
    arbitrary partitions of the data reproduce the global estimate."""
    from pyspark.sql import functions as F

    from real_time_weather_data_pipeline_for_philippine_cities_spark.functions.hashing import (
        kmv_estimate_col,
        kmv_hash_col,
        kmv_minima_aggs,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.sources.registry import (
        load_table,
    )

    R = 8
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id", (F.col("event_id") % 3).alias("shard")
    )
    hashed = ev.select("day", "shard", kmv_hash_col("user_id"))
    global_mins = hashed.groupBy("day").agg(*kmv_minima_aggs(R))
    per_shard = hashed.groupBy("day", "shard").agg(*kmv_minima_aggs(R))
    merged = per_shard.groupBy("day").agg(
        *[F.min(f"m{i}").alias(f"m{i}") for i in range(R)]
    )
    g = {r["day"]: tuple(r[f"m{i}"] for i in range(R)) for r in global_mins.collect()}
    m = {r["day"]: tuple(r[f"m{i}"] for i in range(R)) for r in merged.collect()}
    assert g == m
    # and therefore the estimates agree too
    ge = {r["day"]: r["e"] for r in global_mins.select("day", kmv_estimate_col(R).alias("e")).collect()}
    me = {r["day"]: r["e"] for r in merged.select("day", kmv_estimate_col(R).alias("e")).collect()}
    assert ge == me


def test_bench_compare_normalizes_host_factor():
    """A uniform 1.2x slowdown is host weather, not a regression; a single
    query at 3x on top of it IS one — and sub-50ms queries are ignored."""
    from tools.bench_compare import compare

    old = {"queries": {"a": 1.0, "b": 2.0, "c": 0.5, "tiny": 0.01, "gone": 1.0}}
    new = {
        "queries": {
            "a": 1.2,
            "b": 2.4,
            "c": 0.5 * 1.2 * 3,  # real 3x regression under the same weather
            "tiny": 0.04,  # 4x but under the 50ms floor: ignored
            "fresh": 9.9,
        }
    }
    r = compare(old, new, threshold=1.3)
    assert abs(r["host_factor"] - 1.2) < 0.01
    assert [x["query"] for x in r["regressions"]] == ["c"]
    assert r["only_in_new"] == ["fresh"] and r["only_in_old"] == ["gone"]
    assert not r["improvements"]


# --------------------------------------------------- count-min sketch
def test_countmin_never_underestimates_and_is_mergeable(spark, sf_dir):
    """The two defining count-min properties. Soundness: every counter an
    item hashes to counts AT LEAST that item's rows, so min-over-rows can
    never underestimate (cm_over >= 0). Mergeability: counters are plain
    additive counts, so per-shard sketches sum cell-wise into exactly the
    union's sketch — the property that lets a 100 TB build run per shard."""
    from pyspark.sql import functions as F

    from real_time_weather_data_pipeline_for_philippine_cities_spark.functions.hashing import (
        MINHASH_PRIME,
        hash28,
        minhash_coefficients,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.profiling_queries import (
        CM_D,
        CM_SEED,
        CM_W,
        q_countmin_heavy_hitters,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.sources.registry import (
        load_table,
    )

    rows = q_countmin_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) >= 1
    for r in rows:
        assert r["cm_over"] >= 0, r
        assert r["n_cm"] == r["n_exact"] + r["cm_over"]
    # the probe cut is the exact top-N: counts arrive non-increasing
    exacts = [r["n_exact"] for r in rows]
    assert exacts == sorted(exacts, reverse=True)

    # mergeability: shard the input 3 ways, build per-shard counters,
    # sum cell-wise, compare to the global sketch
    coeffs = minhash_coefficients(CM_D, seed=CM_SEED)
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("event_id") % 3).alias("shard"),
        hash28(F.col("user_id").cast("string")).alias("h0"),
    )
    b = ev.select(
        "shard",
        F.posexplode(
            F.array(*[(F.col("h0") * a + b_) % MINHASH_PRIME % CM_W for a, b_ in coeffs])
        ).alias("seed", "bucket"),
    )
    global_c = {
        (r["seed"], r["bucket"]): r["c"]
        for r in b.groupBy("seed", "bucket").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    merged = {
        (r["seed"], r["bucket"]): r["c"]
        for r in (
            b.groupBy("shard", "seed", "bucket")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("seed", "bucket")
            .agg(F.sum("c").alias("c"))
            .collect()
        )
    }
    assert global_c == merged
