"""Property-based laws for the curation-wave queries (hypothesis over
generated word-soup corpora): bounds and monotonicity that must hold for
ARBITRARY inputs, not just the shipped testdata.

Each example materializes a tiny parquet corpus (the queries read
(spark, sf_dir)) and runs one evaluation; max_examples stays small —
these guard laws, not throughput.
"""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.curation_queries import (
    DOMAIN_CAP,
    q_curation_funnel,
    q_domain_cap_sample,
    q_segment_dup_fraction,
    q_unigram_logprob,
)

SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

#: word-soup documents: 1-40 tokens from a 6-word alphabet
text_st = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]), min_size=1, max_size=40
).map(" ".join)
corpus_st = st.lists(text_st, min_size=1, max_size=12)


def _write(path, texts, sources=None, id_offset=0):
    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(
                    [id_offset + i for i in range(n)], pa.int64()
                ),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(sources or ["s"] * n, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(path / "documents.parquet"),
    )
    return str(path)


_example_no = [0]


def _dir(tmp_path):
    _example_no[0] += 1
    d = tmp_path / f"ex{_example_no[0]}"
    d.mkdir()
    return d


@given(texts=corpus_st)
@SETTINGS
def test_segment_dup_fraction_bounds_and_full_dup_law(spark, tmp_path, texts):
    d = _dir(tmp_path)
    # corpus + an exact copy of every doc (shifted ids): EVERY segment now
    # occurs in >= 2 docs, so dup_fraction must be exactly 1.0 everywhere
    _write(d, texts + texts, id_offset=0)
    rows = q_segment_dup_fraction(spark, str(d)).collect()
    assert len(rows) == 2 * len(texts)
    for r in rows:
        assert 0 <= r["dup_segments"] <= r["n_segments"]
        assert r["dup_fraction"] == 1.0


@given(
    texts=corpus_st,
    sources=st.lists(st.sampled_from(["a", "b"]), min_size=12, max_size=12),
)
@SETTINGS
def test_domain_cap_keeps_min_of_cap_and_count(spark, tmp_path, texts, sources):
    d = _dir(tmp_path)
    srcs = sources[: len(texts)]
    _write(d, texts, sources=srcs)
    kept = q_domain_cap_sample(spark, str(d)).collect()
    per = {}
    for r in kept:
        per[r["source"]] = per.get(r["source"], 0) + 1
    for s in set(srcs):
        assert per.get(s, 0) == min(DOMAIN_CAP, srcs.count(s))


@given(texts=corpus_st)
@SETTINGS
def test_unigram_logprob_bounds(spark, tmp_path, texts):
    d = _dir(tmp_path)
    _write(d, texts)
    rows = q_unigram_logprob(spark, str(d)).collect()
    n_total = sum(len(t.split()) for t in texts)
    lower = -math.log(n_total) - 1e-5  # p(term) >= 1/N, minus quantization
    for r in rows:
        assert lower <= r["avg_logprob"] <= 0.0


@given(texts=corpus_st)
@SETTINGS
def test_curation_funnel_stage_monotonicity(spark, tmp_path, texts):
    d = _dir(tmp_path)
    _write(d, texts)
    r = q_curation_funnel(spark, str(d)).collect()[0]
    assert r["n_total"] >= r["n_quality"] >= r["n_unique"] >= r["n_capped"]
    assert r["tok_total"] >= r["tok_quality"] >= r["tok_unique"] >= r["tok_capped"]
    assert r["n_total"] == len(texts)


def test_dataset_split_exhaustive_disjoint_and_shares(spark, sf_dir):
    """Every document lands in exactly one split (counts conserve), and
    per-language shares sum to 1 within rounding."""
    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.curation_queries import (
        q_dataset_split,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.base import t

    rows = q_dataset_split(spark, sf_dir).collect()
    n_docs_total = t(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs_total
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        assert abs(sum(r["lang_share"] for r in rs) - 1.0) < 1e-5, lang
        assert len({r["split"] for r in rs}) == len(rs)  # disjoint strata


def test_bigram_pmi_scores_verify_against_raw_counts(spark, sf_dir):
    """Every returned pair meets the count floor, PMI arrives
    non-increasing, and the top pair's score recomputes exactly from
    independently counted unigram/bigram/corpus totals."""
    import math

    from pyspark.sql import functions as F

    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.curation_queries import (
        PMI_MIN_COUNT,
        q_bigram_pmi,
    )
    from real_time_weather_data_pipeline_for_philippine_cities_spark.sources.registry import (
        load_table,
    )

    rows = q_bigram_pmi(spark, sf_dir).collect()
    assert rows
    assert all(r["c_ab"] >= PMI_MIN_COUNT for r in rows)
    pmis = [r["pmi"] for r in rows]
    assert pmis == sorted(pmis, reverse=True)

    top = rows[0]
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(F.split(F.lower("text"), " +").alias("tk"))
        .select(F.filter("tk", lambda x: x != "").alias("tk"))
    )
    uni = toks.select(F.explode("tk").alias("w")).groupBy("w").count()
    n1 = uni.agg(F.sum("count")).collect()[0][0]
    c_a = uni.filter(F.col("w") == top["w1"]).collect()[0]["count"]
    c_b = uni.filter(F.col("w") == top["w2"]).collect()[0]["count"]
    big = toks.select(
        F.explode(
            F.zip_with(
                F.slice("tk", 1, F.size("tk") - 1),
                F.slice("tk", 2, F.size("tk") - 1),
                lambda x, y: F.concat_ws("\x00", x, y),
            )
        ).alias("p")
    ).filter(F.col("p") == f"{top['w1']}\x00{top['w2']}")
    # n2_tot counts the full bigram mass, mirroring the query
    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.curation_queries import (
        q_bigram_pmi as _q,  # noqa: F401 (import kept for parity clarity)
    )
    assert big.count() == top["c_ab"]
    # recompute with the query's own n2_tot definition
    # N2 = ALL bigram occurrences (the query normalizes by the full
    # bigram mass, not the floor survivors)
    pairs = toks.filter(F.size("tk") >= 2).select(
        F.explode(F.sequence(F.lit(1), F.size("tk") - 1)).alias("i"), "tk"
    ).select(
        F.element_at("tk", F.col("i")).alias("w1"),
        F.element_at("tk", F.col("i") + 1).alias("w2"),
    ).groupBy("w1", "w2").count()
    n2 = pairs.agg(F.sum("count")).collect()[0][0]
    expect = round(math.log((top["c_ab"] * n1 * n1) / (n2 * c_a * c_b)), 4)
    assert abs(top["pmi"] - expect) < 1e-9
