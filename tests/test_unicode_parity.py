"""Cross-engine text-function parity on adversarial UNICODE.

The strict sweeps prove parity on the (ASCII) synthetic corpora; this
fuzz proves the text functions stay engine-agnostic on the inputs a
real multilingual crawl contains. Found a real divergence on first run:
``punct_ratio`` lowered the text before stripping ``[a-z0-9 ]``, and the
JVM and utf8proc case-mapping tables disagree on EXPANDING characters —
Java ``lower('İ')`` is ``'i'`` + a combining dot (2 codepoints), DuckDB's
is plain ``'i'`` — so the ratio silently split on 133/400 fuzz rows.
Fixed by making case-insensitivity live in the character class
(``[A-Za-z0-9 ]`` on the ORIGINAL text): explicit codepoint ranges mean
the same thing in both regex engines.

Deterministic seed: this is a pinned regression corpus, not a flaky
sampler — the adversarial pool covers case-mapping specials (İ ı ß ﬁ
ǅ ς Ⅸ), combining marks, CJK, emoji, and RTL.
"""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from real_time_weather_data_pipeline_for_philippine_cities_spark.functions import (
    text as T,
)

SPECIAL = [
    "İ", "ı", "ß", "ﬁ", "Σ", "ς", "ʼn", "Ǆ", "ǅ", "ǆ", "Å", "ﬀ", "Ⅸ",
    "㎒", "İ̇", "é", "é", "中 文", "🙂🙃", "ع ربي", "ΑΒΓ δε",
]
POOL = SPECIAL + ["word", "The QUICK brown.", "a,b;c!", "123 #$%"]


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(42)
    return [
        (i, " ".join(rng.choice(POOL) for _ in range(rng.randint(1, 8))))
        for i in range(400)
    ]


def test_quality_and_lang_id_agree_on_unicode(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    qf = T.quality_features("text")
    got = {
        r["doc_id"]: tuple(r)[1:]
        for r in df.select(
            "doc_id",
            *[c.alias(n) for n, c in qf.items()],
            T.predicted_lang(F.col("text")).alias("lang"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", corpus)
    q = T.quality_features_sql("text")
    want = con.execute(
        f"SELECT doc_id, {q['n_tokens']}, {q['ttr']}, {q['stop_ratio']},"
        f" {q['punct_ratio']}, {q['quality']},"
        f" {T.predicted_lang_sql('text')} FROM t"
    ).fetchall()
    diffs = {
        r[0]: (got[r[0]], tuple(r[1:]))
        for r in want
        if got[r[0]] != tuple(r[1:])
    }
    assert not diffs, dict(list(diffs.items())[:5])


# -- the case-fold oracle boundary, characterized --------------------------
#
# The dedup/fingerprint family hashes md5(lower(token)) on BOTH engines.
# Java's lower() is the ENGINE's semantics — context-sensitive final
# sigma (ΣΑΣ -> σας) and canonical dotted-İ expansion — and is
# linguistically correct; utf8proc (DuckDB) does simple per-codepoint
# mapping. We deliberately do NOT weaken the engine to match the test
# oracle: parity for hash-keyed text ops is GUARANTEED on text whose
# lowercase fold is context-free and non-expanding (all ASCII, CJK,
# Arabic, Cyrillic, non-final Greek), and the three known divergence
# classes are pinned here so a change in either engine's tables — or an
# accidental "fix" that silently alters dedup keys — fails loudly.

KNOWN_DIVERGENT = ["İ", "İ̇", "İstanbul", "ΣΑΣ ς", "ΤΕΛΟΣ"]
KNOWN_AGREEING = [
    "word", "The QUICK brown.", "ΑΒΓδε", "σας", "ß", "ﬁ", "Å",
    "中文", "عربي", "ПРИВЕТ", "ǅ", "ı",
]


def test_casefold_oracle_boundary(spark):
    import duckdb

    rows = [(i, s) for i, s in enumerate(KNOWN_DIVERGENT + KNOWN_AGREEING)]
    df = spark.createDataFrame(rows, "i long, s string")
    got = {r["i"]: r["l"] for r in df.select("i", F.lower("s").alias("l")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    duck = dict(con.execute("SELECT i, lower(s) FROM t").fetchall())
    n_div = len(KNOWN_DIVERGENT)
    for i, s in enumerate(KNOWN_DIVERGENT):
        assert got[i] != duck[i], (
            f"{s!r}: engines now AGREE — the documented oracle boundary "
            "moved; update BASELINE.md and this pin"
        )
    for i, s in enumerate(KNOWN_AGREEING, start=n_div):
        assert got[i] == duck[i], (s, got[i], duck[i])
