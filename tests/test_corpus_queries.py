"""Planted-structure tests for the corpus-curation queries
(plans/corpus_queries.py).

The synthetic testdata corpus is PII-free word-soup with unique texts, so
the catalog/oracle runs there prove cross-engine determinism but not
*detection*. These tests plant the structure each query claims to find —
PII strings, exact-duplicate clusters, a doc-unique top term, a known
quantization vector — in tiny parquet corpora and assert the query sees
it.
"""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.corpus_queries import (
    q_canonical_doc_assign,
    q_embedding_quantize_error,
    q_inverted_index_stats,
    q_mixture_resample,
    q_pii_scan,
    q_quality_filter,
    q_substring_dup_spans,
)


def _write_docs(path, rows):
    """rows: list of (doc_id, text). Schema mirrors the driver's documents
    table; lang/source are irrelevant to these queries but kept for shape."""
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array(["test"] * len(rows), pa.string()),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        str(path / "documents.parquet"),
    )
    return str(path)


def test_pii_scan_detects_planted_pii(spark, tmp_path):
    sf = _write_docs(
        tmp_path,
        [
            (1, "contact alice@example.com or bob.smith+x@mail.co today"),
            (2, "server at 10.0.0.1 and backup 192.168.1.254 online"),
            (3, "call +1 555 123-4567 now"),
            (4, "clean document with no sensitive content at all"),
            (5, "mixed: eve@corp.io from 8.8.8.8 dialing +44 20 7946 0958"),
        ],
    )
    got = {r["doc_id"]: r.asDict() for r in q_pii_scan(spark, sf).collect()}
    assert got[1]["n_email"] == 2 and got[1]["n_ipv4"] == 0
    assert got[2]["n_ipv4"] == 2
    assert got[3]["n_phone"] == 1
    assert got[4] == {"doc_id": 4, "n_email": 0, "n_ipv4": 0, "n_phone": 0,
                      "redacted_len": len("clean document with no sensitive content at all")}
    assert got[5]["n_email"] == 1 and got[5]["n_ipv4"] == 1 and got[5]["n_phone"] == 1
    # redaction removes exactly the matched spans
    assert got[1]["redacted_len"] == len("contact  or  today")
    assert got[3]["redacted_len"] == len("call  now")

    # the DuckDB twin must agree on PLANTED pii too, not just the pii-free
    # synthetic corpus the strict gate sees (single-pass classification is
    # a round-6 rewrite — pin detection parity on real matches)
    import duckdb

    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.corpus_queries import (
        _PII_SQL,
    )

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    oracle = {r[0]: r for r in con.execute(_PII_SQL).fetchall()}
    for doc_id, row in got.items():
        assert oracle[doc_id] == (
            doc_id,
            row["n_email"],
            row["n_ipv4"],
            row["n_phone"],
            row["redacted_len"],
        ), doc_id


def test_canonical_doc_assign_keeps_richest_copy(spark, tmp_path):
    # cluster A: identical text -> same md5 -> same n_chars, tie broken by
    # LOWEST doc_id; cluster B: single doc is its own canonical.
    sf = _write_docs(
        tmp_path,
        [
            (10, "same exact duplicated body"),
            (11, "same exact duplicated body"),
            (12, "same exact duplicated body"),
            (20, "a unique singleton document"),
        ],
    )
    rows = {r["doc_id"]: r.asDict() for r in q_canonical_doc_assign(spark, sf).collect()}
    for d in (10, 11, 12):
        assert rows[d]["canonical_doc_id"] == 10
        assert rows[d]["group_size"] == 3
        assert rows[d]["is_canonical"] == (d == 10)
    assert rows[20]["canonical_doc_id"] == 20 and rows[20]["is_canonical"]


def test_inverted_index_top_doc_by_tf_then_lowest_id(spark, tmp_path):
    sf = _write_docs(
        tmp_path,
        [
            (1, "apple apple banana"),
            (2, "apple apple apple"),  # top doc for apple: tf=3
            (3, "banana cherry"),      # banana tf=1 ties doc 1 (tf=1)? no: doc1 tf=1, doc3 tf=1 -> lowest id wins
        ],
    )
    rows = {r["term"]: r.asDict() for r in q_inverted_index_stats(spark, sf).collect()}
    assert rows["apple"]["df"] == 2 and rows["apple"]["total_tf"] == 5
    assert rows["apple"]["top_tf"] == 3 and rows["apple"]["top_doc_id"] == 2
    # tf tie between doc 1 and doc 3 -> lowest doc_id
    assert rows["banana"]["top_tf"] == 1 and rows["banana"]["top_doc_id"] == 1
    assert rows["cherry"]["df"] == 1 and rows["cherry"]["top_doc_id"] == 3


def test_mixture_resample_downsamples_overrepresented_cell(spark, tmp_path):
    # two cells: ("en","web") with 40 docs, ("de","book") with 2 docs.
    # total=42, n_cells=2 -> target=21: the big cell gets rate
    # (21*10000)//40 = 5250 bp, the small cell keeps everything (10000).
    rows = [(i, f"en web doc {i}") for i in range(40)] + [
        (100, "de book doc a"),
        (101, "de book doc b"),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array(
                    ["en"] * 40 + ["de"] * 2, pa.string()
                ),
                "source": pa.array(["web"] * 40 + ["book"] * 2, pa.string()),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = q_mixture_resample(spark, str(tmp_path)).collect()
    by_cell = {}
    for r in out:
        by_cell.setdefault((r["lang"], r["source"]), []).append(r)
    assert all(r["rate_bp"] == 10000 for r in by_cell[("de", "book")])
    assert len(by_cell[("de", "book")]) == 2  # under target: fully kept
    en = by_cell[("en", "web")]
    assert all(r["rate_bp"] == 5250 for r in en)
    assert 0 < len(en) < 40  # genuinely downsampled
    # rerun-stable: the keep-set is a pure function of doc_id
    again = sorted(r["doc_id"] for r in q_mixture_resample(spark, str(tmp_path)).collect())
    assert again == sorted(r["doc_id"] for r in out)


def test_quality_filter_reason_bits(spark, tmp_path):
    good = (
        "the quick brown fox jumps over the lazy dog and then the dog "
        "sleeps in a warm corner of the old house near the river bank"
    )
    sf = _write_docs(
        tmp_path,
        [
            (1, good),                      # passes every rule
            (2, "tiny doc"),                # bit 0: too short
            (3, " ".join(["word"] * 50)),   # bit 2: ttr -> also bit 3 (no stopwords)
            (4, " ".join(["!!!"] * 12) + " the and of to in is a dog"),  # punct-heavy
        ],
    )
    rows = {r["doc_id"]: r.asDict() for r in q_quality_filter(spark, sf).collect()}
    assert rows[1]["keep"] and rows[1]["reasons"] == 0
    assert not rows[2]["keep"] and rows[2]["reasons"] & 1
    assert not rows[3]["keep"] and rows[3]["reasons"] & 4 and rows[3]["reasons"] & 8
    assert not rows[4]["keep"] and rows[4]["reasons"] & 16


def test_embedding_quantize_error_known_vector(spark, tmp_path):
    dim = 64
    v = [0.0] * dim
    v[0], v[1], v[2] = 1.0, -0.5, 0.25  # scale = 1.0
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([7], pa.int64()),
                "embedding": pa.array([v], pa.list_(pa.float32())),
                "label": pa.array([0], pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    row = q_embedding_quantize_error(spark, str(tmp_path)).collect()[0].asDict()
    assert row["vec_id"] == 7
    assert row["scale"] == 1.0
    # q = round(x*127): [127, -64 (round-half-even would give -64? no: -63.5
    # rounds half-up in Spark/DuckDB to -64), 32 (31.75 -> 32), 0...]
    q0, q1, q2 = 127, -64, 32
    checksum = q0 * 1 + q1 * 2 + q2 * 3
    assert row["q_checksum"] == checksum
    errs = [abs(1.0 - 127 / 127.0), abs(-0.5 - q1 / 127.0), abs(0.25 - q2 / 127.0)]
    assert row["max_abs_err"] == pytest.approx(max(errs), abs=1e-6)
    assert row["sum_abs_err"] == pytest.approx(sum(errs), abs=1e-6)
    assert math.isfinite(row["sum_abs_err"])


def test_substring_dup_spans_finds_planted_shared_run(spark, tmp_path):
    """Docs 1 and 2 share an exact 10-word run at DIFFERENT offsets (3 vs
    5 words in — the misalignment a fixed-stride grid would miss); doc 3
    is unique. 10 shared words = 3 shared 8-gram shingles in each doc;
    doc 4 is shorter than one shingle and must still produce one window."""
    shared = "the quick brown fox jumps over the lazy sleeping dog"  # 10 words
    assert len(shared.split()) == 10
    sf = _write_docs(
        tmp_path,
        [
            (1, "intro text before " + shared + " and a unique tail here one"),
            (2, "a very different opening clause " + shared + " other ending words"),
            (3, "unique document with its own vocabulary nothing repeated across "
                "documents at all more padding tokens to get enough windows"),
            (4, "tiny doc"),
        ],
    )
    got = {r["doc_id"]: r.asDict() for r in q_substring_dup_spans(spark, sf).collect()}
    assert got[1]["n_shared"] == 3 and got[2]["n_shared"] == 3
    assert got[3]["n_shared"] == 0 and got[3]["shared_ratio"] == 0.0
    assert got[4]["n_windows"] == 1 and got[4]["n_shared"] == 0
    for r in got.values():
        assert r["n_windows"] >= 1
        assert 0.0 <= r["shared_ratio"] <= 1.0


def test_url_domain_stats_planted_urls(spark, tmp_path):
    """URL detection + domain normalization: mixed-case domains collapse
    (lower-cased), repeated domains dedupe, path/bare forms both match."""
    from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.corpus_queries import (
        q_url_domain_stats,
    )

    sf = _write_docs(
        tmp_path,
        [
            (1, "see https://Example.COM/a and http://example.com/b?q=1 plus "
                "https://other.org trailing words"),
            (2, "no links in this document at all"),
            (3, "bare http://single.net end"),
        ],
    )
    got = {r["doc_id"]: r.asDict() for r in q_url_domain_stats(spark, sf).collect()}
    assert got[1]["n_urls"] == 3 and got[1]["n_domains"] == 2  # example.com dedup
    assert got[2] == {"doc_id": 2, "n_urls": 0, "n_domains": 0}
    assert got[3]["n_urls"] == 1 and got[3]["n_domains"] == 1
