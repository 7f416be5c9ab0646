"""LLM-training-data-pipeline catalog entries (SURVEY.md §7.6): dedup,
similarity search, and text analysis over the driver's `documents` /
`embeddings` tables. Every query here is oracle-paired — including
MinHash-LSH and hyperplane-LSH ANN, whose DuckDB twins run the identical
algorithm with identical md5-derived constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions.rounding import oracle_round_div, round_div
from ..operators import dedup as D
from ..operators import similarity as S
from .base import Q, spread, t

EMB_DIM = 64


# -- exact dedup (hash-groupBy) --------------------------------------------
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    # Content key: md5 of lowercased text. The corpus has no exact dups, so
    # the grouping structure comes from a coarser record key as well —
    # both are emitted so the operator's collision handling is exercised.
    out = D.exact_dedup(
        docs.select("doc_id", "text", "lang", "source"),
        F.md5(F.concat_ws("|", F.col("lang"), F.col("source"))),
        "doc_id",
    )
    return out.select("doc_id", "dedup_key", "kept")


_DEDUP_EXACT_SQL = """
SELECT doc_id, dedup_key,
       doc_id = min(doc_id) OVER (PARTITION BY dedup_key) AS kept
-- concat_ws mirrors the engine's null-SKIPPING key join (a || chain
-- would NULL-propagate and give missing-metadata docs no dedup key)
FROM (SELECT doc_id, md5(concat_ws('|', lang, source)) AS dedup_key
      FROM documents)
"""


# -- minhash LSH near-dup pairs --------------------------------------------
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return D.minhash_near_dup_pairs(docs)


# -- simhash signatures ----------------------------------------------------
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(t(spark, sf_dir, "documents"))
    return (
        docs.select("doc_id", F.split(F.lower("text"), " +").alias("t"))
        .withColumn("hs32", D.token_hash32_expr("t"))
        .select("doc_id", D.simhash_from_hashes("hs32").alias("simhash"))
    )


_SIMHASH_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(text), ' +') AS t FROM documents),
hashed AS (
  SELECT doc_id, {D.token_hash32_sql('t')} AS hs32 FROM toks)
SELECT doc_id, {D.simhash_from_hashes_sql('hs32')} AS simhash FROM hashed
"""


# -- exact all-pairs jaccard (prefix-filtered) -----------------------------
def q_dedup_allpairs_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return D.allpairs_jaccard_pairs(docs)


# -- deterministic stratified sampling (mixture quotas) --------------------
_MIX = {"en": 0.6, "de": 0.3, "fr": 0.3, "es": 0.1}  # zh dropped (quota 0)


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return D.stratified_sample(docs, "lang", _MIX).select(
        "doc_id", "lang", "source", "n_chars"
    )


_STRAT_SQL = (
    "SELECT doc_id, lang, source, n_chars FROM ("
    + D.stratified_sample_sql("documents", "lang", _MIX)
    + ")"
)


# -- cluster assignment: pairs → components → canonical survivor -----------
def q_dedup_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    pairs = D.minhash_near_dup_pairs(docs).select("doc_a", "doc_b")
    return D.dedup_cluster_assign(docs, pairs)


_CLUSTER_SQL = D.dedup_cluster_sql(
    # identical pair generation as dedup_minhash_lsh, projected to edges
    f"SELECT doc_a, doc_b FROM ({D.minhash_near_dup_sql()})"
)


# -- simhash near-dup pairs (banded hamming join) --------------------------
def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return D.simhash_near_dup_pairs(docs)


# -- blocked n-gram jaccard pairs ------------------------------------------
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(docs)


# -- embedding cosine top-k (brute force baseline) -------------------------
def q_embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return S.cosine_topk(emb, F.col("vid") < 10, k=5)


# -- LSH-bucketed ANN (scale path) -----------------------------------------
def q_ann_lsh_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return S.ann_lsh_topk(emb, F.col("vid") < 10, n_planes=6, dim=EMB_DIM, k=3)


# -- OR-amplified multi-table LSH ANN (the production point on the
# quality/cost curve) --------------------------------------------------------
def q_ann_lsh_multitable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L=8 independent plane tables with OR-amplification: a candidate
    qualifies if it collides in ANY table, so per-neighbor miss
    probability drops from (1-p^b) to (1-p^b)^8 at ~8x candidate cost —
    measured recall@10 0.68 at 22% of brute cost for L=16 on the sf1
    isotropic worst case (BASELINE.md §ANN recall; floors pinned by
    tests/test_ann_recall.py). The single-table ``ann_lsh_cosine`` entry
    stays as the textbook/demo config; THIS is the config a production
    index would run (round-7 verdict item: promote the OR-amplified
    point onto the driver-checked catalog).

    Plan shape: one equi-join keyed on (table, bucket) — the posexplode
    adds a factor L to each side, never a cross product — and duplicate
    collisions collapse to one row per candidate pair BEFORE the 64-dim
    dot (groupBy on the pair key), so amplification multiplies only the
    cheap candidate stream, not the scoring work.
    """
    emb = t(spark, sf_dir, "embeddings")
    return S.ann_lsh_topk(
        emb, F.col("vid") < 10, n_planes=6, dim=EMB_DIM, k=3, n_tables=8
    )


# -- corpus-scale kNN JOIN (every vector a query) --------------------------
#: structural input bound for the two kNN-join catalog entries: the exact
#: twin is a brute n² in DuckDB and the LSH twin's candidate count grows
#: n²/2^b, so the ENTRY operates on the KNN_CAP smallest vec_ids at any
#: SF (all 500 at sf0.01 — full-coverage proof there; bounded at sf1/sf10
#: so the strict ladder stays exclusion-free). The unbounded corpus-scale
#: path is exercised by tools/knn_crossover.py, which measures the
#: exact-vs-LSH crossover walls at sf10 and records KNN_CROSSOVER.json.
KNN_CAP = 2000


def q_knn_join_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine kNN join (block-pair + Arrow kernel, operators/knn.py):
    per-query top-3 over the bounded corpus, brute-force DuckDB twin."""
    from ..operators.knn import knn_join_exact

    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < KNN_CAP)
    return knn_join_exact(emb, k=3, n_blocks=8, dim=EMB_DIM)


def q_knn_join_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed approximate kNN join: per-(table, bucket) Arrow kernels,
    result ≡ ann_lsh_topk with an all-rows predicate (which is the twin).
    """
    from ..operators.knn import knn_join_lsh

    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < KNN_CAP)
    return knn_join_lsh(emb, k=3, n_planes=6, n_tables=2, dim=EMB_DIM)


def _knn_exact_oracle() -> str:
    from ..operators.knn import knn_join_exact_sql

    return knn_join_exact_sql(
        EMB_DIM,
        k=3,
        table=f"(SELECT * FROM embeddings WHERE vec_id < {KNN_CAP})",
    )


def _knn_lsh_oracle() -> str:
    return S.ann_lsh_topk_sql(
        "TRUE",
        n_planes=6,
        dim=EMB_DIM,
        k=3,
        n_tables=2,
        table=f"(SELECT * FROM embeddings WHERE vec_id < {KNN_CAP})",
    )


# -- IVF-bucketed ANN (data-adaptive scale path) ---------------------------
def q_ivf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving path of the train-once/serve-many IVF pattern: centroids are
    FROZEN literals (plans/ivf_index.py, trained deterministically on the
    sf0.01 corpus), so the catalog query is pure assign+probe+score — no
    training in the measured path, and the whole thing is SQL-expressible,
    giving it a full DuckDB oracle (assignment argmax and probe ranking are
    bit-reproducible: every dot is a sequential-order accumulation on both
    engines). Training itself is exercised by tests."""
    from .ivf_index import FROZEN_CENTROIDS

    emb = t(spark, sf_dir, "embeddings")
    return S.ivf_topk(
        emb, F.col("vid") < 10, n_probe=2, k=3, centroids=FROZEN_CENTROIDS
    )


def _ivf_oracle() -> str:
    from .ivf_index import FROZEN_CENTROIDS

    return S.ivf_topk_sql(
        "vid < 10", FROZEN_CENTROIDS, dim=EMB_DIM, n_probe=2, k=3
    )


# -- embedding near-dup pairs ----------------------------------------------
def q_near_dup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked exact all-pairs (block-pair replication + Arrow-vectorized
    verify) — identical answer to the brute-force oracle at any SF, but a
    keyed-join plan instead of the O(n²) non-equi join (which stays as the
    test-only baseline in near_dup_pairs_cosine). The input is STRUCTURALLY
    bounded to the EXACT_PAIRS_CAP smallest vec_ids inside the operator
    (oracle applies the identical cap), so this exactness baseline can
    never be pointed at an unbounded corpus — the ANN entries
    (ann_lsh_cosine / ivf_cosine_topk) are the full-corpus scale path.
    ``on_excess='truncate'`` is the explicit verification-budget opt-in
    (the operator warns when the cap binds, e.g. at sf1's 20k vectors;
    library callers get a raise by default)."""
    emb = t(spark, sf_dir, "embeddings")
    return S.near_dup_pairs_cosine_blocked(
        emb, threshold=0.45, n_blocks=8, on_excess="truncate"
    )


# -- benchmark decontamination (8-gram overlap sweep) ----------------------
# The benchmark split is BOUNDED: at most DECONTAM_BENCH_MAX docs (every
# 37th doc up to a fixed id cap), matching how real held-out benchmarks
# are fixed-size regardless of corpus scale — so the broadcast of the
# benchmark shingle set stays O(benchmark), not O(corpus/37), and the
# operator's 100 TB contract (broadcast bounded by definition) is honest.
DECONTAM_BENCH_MAX = 16
_DECONTAM_ID_CAP = 37 * DECONTAM_BENCH_MAX


def q_decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A fixed-size held-out benchmark split (≤16 docs); the rest of the
    corpus is swept for shared word-8-grams — the standard evaluation-
    contamination check. Benchmark shingle set is broadcast (bounded by
    the constant cap); corpus side is one scan + keyed join."""
    from ..operators.decontam import benchmark_overlap

    docs = t(spark, sf_dir, "documents")
    pred = (F.col("doc_id") % 37 == 0) & (F.col("doc_id") < _DECONTAM_ID_CAP)
    return benchmark_overlap(docs, pred, n=8)


def _decontam_oracle() -> str:
    from ..operators.decontam import benchmark_overlap_sql

    return benchmark_overlap_sql(
        f"doc_id % 37 = 0 AND doc_id < {_DECONTAM_ID_CAP}", n=8
    )


# -- TF-IDF top terms per document -----------------------------------------
TFIDF_TOP_K = 3


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 terms per doc by tf·idf with the UNLOGGED idf variant
    (tf · N / df): every score is a ratio of exact integers, so both
    engines compute bit-identical doubles — no transcendental whose last
    ulp could differ between JVM Math.log and libm. Shapes: explode →
    two map-combined groupBys + one per-doc window; scan-scaling.

    N flows through the plan as a 1-row aggregate broadcast-joined onto
    the scored terms — no eager ``docs.count()`` on the driver, so the
    query is a single job and `documents` is scanned once, not twice
    (at 100 TB a second full pass just to fetch a scalar is real money).

    spread() before the tokenize: the explode+lower+split chain and its
    partial aggregation otherwise run inside the scan stage, whose
    parallelism is the (single-file) split count — measured 4.8 s → 1.4 s
    at sf1 from this alone.
    """
    from pyspark.sql import Window

    docs = spread(t(spark, sf_dir, "documents"))
    # Guaranteed-1-row aggregate, cross-broadcast onto the scored terms:
    # plans as a BroadcastNestedLoopJoin whose build side is ONE row — the
    # degenerate case where BNLJ is exactly right (each task streams its
    # rows past the single broadcast row; no shuffle, no quadratic risk).
    # Whitelisted in tests/test_plan_shape.py NON_EQUI_OK for that reason.
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    terms = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " +")).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        tf.join(df, "term")
        .join(F.broadcast(n))
        .withColumn(
            # integer ratio (tf*n_docs / df) -> exact 6-dp quantization
            # (tie-margin batch, round 8); n_docs stays BIGINT for it
            "tfidf",
            round_div("tf * n_docs", "df", 6),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP_K)
        .select("doc_id", "term", "tf", "df", "tfidf", "rank")
    )


_TFIDF_SQL = f"""
WITH terms AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), ' +')) AS term
  FROM documents),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         {oracle_round_div('tf.tf * (SELECT n_docs FROM n)', 'df.df', 6)} AS tfidf
  FROM tf JOIN df USING (term)),
ranked AS (
  SELECT doc_id, term, tf, df, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored)
SELECT doc_id, term, tf, df, tfidf, rank FROM ranked WHERE rank <= {TFIDF_TOP_K}
"""


# -- intra-doc repetition score --------------------------------------------
def q_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction of a doc's word-3-grams that are repeats — the
    Gopher-style repetition quality signal. distinct/total are exact
    integers (shared shingle hashing with the dedup ops), so the ratio is
    bit-identical cross-engine; pure map-side expressions, scan-scaling."""
    docs = spread(t(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id", F.split(F.lower("text"), " +").alias("t")
    ).select(
        "doc_id",
        F.greatest(F.size("t") - 2, F.lit(0)).alias("n_grams"),
        F.when(F.size("t") >= 3, F.size(D.shingle_hash_expr("t", 3)))
        .otherwise(F.lit(0))
        .alias("n_distinct"),
    )
    return base.select(
        "doc_id",
        "n_grams",
        "n_distinct",
        F.when(
            F.col("n_grams") > 0,
            round_div("n_grams - n_distinct", "n_grams", 6),
        )
        .otherwise(F.lit(0.0))
        .alias("repetition_ratio"),
    )


_REPETITION_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(text), ' +') AS t FROM documents),
base AS (
  SELECT doc_id,
         greatest(len(t) - 2, 0) AS n_grams,
         CASE WHEN len(t) >= 3 THEN len({D.shingle_hash_sql('t', 3)})
              ELSE 0 END AS n_distinct
  FROM toks)
SELECT doc_id, n_grams, n_distinct,
       CASE WHEN n_grams > 0
            THEN {oracle_round_div('n_grams - n_distinct', 'n_grams', 6)}
            ELSE 0.0 END AS repetition_ratio
FROM base
"""


# -- training-mixture report -----------------------------------------------
def q_mixture_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (lang, source) mixture accounting: doc counts, token and char
    totals, and each cell's share of the corpus — the bookkeeping a
    data-mixing stage runs before sampling. One map-combined groupBy plus
    an unpartitioned window over the tiny aggregated result."""
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    cells = docs.select(
        "lang",
        "source",
        F.size(F.split(F.lower("text"), " +")).alias("n_tokens"),
        F.col("n_chars"),
    ).groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )
    w = Window.partitionBy()
    return cells.select(
        "lang",
        "source",
        "n_docs",
        "total_tokens",
        "total_chars",
        (F.col("n_docs") / F.sum("n_docs").over(w)).alias("doc_share"),
        (F.col("total_tokens") / F.sum("total_tokens").over(w)).alias(
            "token_share"
        ),
    )


# Sums are CAST to BIGINT: DuckDB's sum() over BIGINT yields HUGEINT, and the
# driver's value hash distinguishes the types even when values are identical
# (the one red r02 row). Shares are UNROUNDED ratios of exact integers — both
# engines perform the identical single IEEE division, so rounding would only
# add cross-engine half-even risk, not remove drift.
_MIXTURE_SQL = """
WITH cells AS (
  SELECT lang, source, count(*) AS n_docs,
         CAST(sum(len(string_split_regex(lower(text), ' +'))) AS BIGINT)
           AS total_tokens,
         CAST(sum(n_chars) AS BIGINT) AS total_chars
  FROM documents GROUP BY lang, source)
SELECT lang, source, n_docs, total_tokens, total_chars,
       n_docs / CAST(sum(n_docs) OVER () AS DOUBLE) AS doc_share,
       total_tokens / CAST(sum(total_tokens) OVER () AS DOUBLE) AS token_share
FROM cells
"""


# -- language ID -----------------------------------------------------------
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(t(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        T.predicted_lang(F.col("text")).alias("predicted_lang"),
    )


_LANG_ID_SQL = f"""
SELECT doc_id, lang AS labeled_lang,
       {T.predicted_lang_sql('text')} AS predicted_lang
FROM documents
"""


# -- quality scoring -------------------------------------------------------
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    # staged attach: tokenize once per row (see attach_quality_features)
    docs = spread(t(spark, sf_dir, "documents"))
    return T.attach_quality_features(docs).select(
        "doc_id", *T.QUALITY_FEATURE_COLS
    )


_QUALITY_SQL = (
    "SELECT doc_id, "
    + ", ".join(f"{sql} AS {name}" for name, sql in T.quality_features_sql("text").items())
    + " FROM documents"
)


# -- token counting --------------------------------------------------------
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(t(spark, sf_dir, "documents"))
    counts = T.token_counts(F.col("text"))
    return docs.select("doc_id", "n_chars", *[c.alias(n) for n, c in counts.items()])


_TOKEN_COUNT_SQL = (
    "SELECT doc_id, n_chars, "
    + ", ".join(f"{sql} AS {name}" for name, sql in T.token_counts_sql("text").items())
    + " FROM documents"
)


# -- document fingerprint --------------------------------------------------
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(t(spark, sf_dir, "documents"))
    return docs.select("doc_id", T.fingerprint(F.col("text")).alias("fingerprint"))


_FINGERPRINT_SQL = f"""
SELECT doc_id, {T.fingerprint_sql('text')} AS fingerprint FROM documents
"""


# -- greedy sequence packing into fixed token windows ----------------------
PACK_WINDOW_TOKENS = 2048


def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each document to a training-context pack: docs are laid out
    in deterministic (source, doc_id) order and cut into
    ``PACK_WINDOW_TOKENS``-sized bins by running token count — the
    sequential packing step a pretraining pipeline runs before writing
    example shards. Pure integer arithmetic (windowed sum + integer
    division), so both engines agree bit-for-bit; one keyed shuffle on
    ``source``, then map-side math — scan-scaling at 100 TB."""
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.lower("text"), " +")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return toks.withColumn("cum_tokens", F.sum("n_tokens").over(w)).select(
        "doc_id",
        "source",
        "n_tokens",
        "cum_tokens",
        F.expr(f"(cum_tokens - n_tokens) div {PACK_WINDOW_TOKENS}").alias("pack_id"),
    )


_PACKING_SQL = f"""
WITH toks AS (
  SELECT doc_id, source,
         CAST(len(string_split_regex(lower(text), ' +')) AS BIGINT) AS n_tokens
  FROM documents),
cum AS (
  SELECT doc_id, source, n_tokens,
         -- CAST: DuckDB windowed sum() yields HUGEINT (driver-hash leak)
         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id ASC
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_tokens
  FROM toks)
SELECT doc_id, source, n_tokens, cum_tokens,
       CAST((cum_tokens - n_tokens) // {PACK_WINDOW_TOKENS} AS BIGINT) AS pack_id
FROM cum
"""


# -- overlapping token-window chunking -------------------------------------
CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every document into overlapping ``CHUNK_TOKENS``-token
    windows advancing by ``CHUNK_STRIDE`` — the chunking step feeding
    context-window training or a RAG index. Entirely map-side (sequence +
    explode + slice inside codegen; zero shuffles), so it scan-scales.
    Chunk text is emitted as an md5 fingerprint to keep the result
    row-bounded; token counts stay exact integers."""
    docs = spread(t(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.split(F.lower("text"), " +").alias("tk")
    ).withColumn("n", F.size("tk"))
    starts = toks.select(
        "doc_id",
        "tk",
        F.explode(
            F.sequence(F.lit(0), F.col("n") - 1, F.lit(CHUNK_STRIDE))
        ).alias("s"),
    )
    chunk = F.slice("tk", F.col("s") + 1, F.lit(CHUNK_TOKENS))
    return starts.select(
        "doc_id",
        F.expr(f"s div {CHUNK_STRIDE}").cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
    )


_CHUNK_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(text), ' +') AS tk,
         len(string_split_regex(lower(text), ' +')) AS n
  FROM documents),
starts AS (
  SELECT doc_id, tk,
         unnest(generate_series(0, n - 1, {CHUNK_STRIDE})) AS s
  FROM toks)
SELECT doc_id,
       CAST(s // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(len(list_slice(tk, s + 1, s + {CHUNK_TOKENS})) AS BIGINT)
         AS n_chunk_tokens,
       md5(list_aggregate(list_slice(tk, s + 1, s + {CHUNK_TOKENS}),
                          'string_agg', ' ')) AS chunk_hash
FROM starts
"""


#: Salt for the training-order permutation: changing it is a new epoch.
TRAIN_ORDER_SALT = "epoch1:"


def q_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order assignment — the epoch-shuffle step a
    data loader consumes: every doc gets a dense 1..N position in the
    pseudo-random order md5(salt || doc_id), via the two-phase
    ``global_order_positions`` operator (bucket-parallel windows + a
    256-row offset lattice) instead of a single global row_number, so the
    permutation is computable at corpus scale with ONE shuffle. Rerun- and
    engine-reproducible: position is a pure function of (salt, doc_id).
    """
    from ..operators.relational import global_order_positions

    docs = t(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit(TRAIN_ORDER_SALT), F.col("doc_id").cast("string")))
    return global_order_positions(
        docs.select("doc_id"), key, "doc_id", "position"
    ).select("doc_id", "position")


_TRAIN_ORDER_SQL = f"""
SELECT doc_id,
       CAST(row_number() OVER (
         ORDER BY md5('{TRAIN_ORDER_SALT}' || CAST(doc_id AS VARCHAR)) ASC,
                  doc_id ASC) AS BIGINT) AS position
FROM documents
"""


# -- PageRank authority over the dup graph ---------------------------------
def q_pagerank_dup_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-lattice damped PageRank over the SAME minhash pair graph as
    dedup_cluster_assign — the authority complement to the structural
    canonical choice (operators/graph.py has the determinism contract)."""
    from ..operators.graph import pagerank_scores

    docs = t(spark, sf_dir, "documents")
    pairs = D.minhash_near_dup_pairs(docs).select("doc_a", "doc_b")
    return pagerank_scores(docs, pairs)


def _pagerank_oracle() -> str:
    from ..operators.graph import pagerank_sql

    return pagerank_sql(f"SELECT doc_a, doc_b FROM ({D.minhash_near_dup_sql()})")


ENTRIES: dict[str, Q] = {
    "pagerank_dup_graph": Q(
        q_pagerank_dup_graph,
        _pagerank_oracle(),
        "integer-lattice PageRank over the minhash dup graph",
    ),
    "training_order": Q(
        q_training_order, _TRAIN_ORDER_SQL, "scalable epoch-shuffle positions"
    ),
    "dedup_exact": Q(q_dedup_exact, _DEDUP_EXACT_SQL, "hash-groupBy exact dedup"),
    "dedup_minhash_lsh": Q(
        q_dedup_minhash_lsh, D.minhash_near_dup_sql(), "minhash+LSH band join"
    ),
    "dedup_simhash": Q(q_dedup_simhash, _SIMHASH_SQL, "32-bit simhash signatures"),
    "stratified_sample": Q(
        q_stratified_sample, _STRAT_SQL, "deterministic mixture sampling"
    ),
    "dedup_cluster_assign": Q(
        q_dedup_cluster_assign, _CLUSTER_SQL, "pairs → components → survivor"
    ),
    "dedup_allpairs_jaccard": Q(
        q_dedup_allpairs_jaccard,
        D.allpairs_jaccard_sql(),
        "exact all-pairs jaccard, prefix-filtered",
    ),
    "simhash_near_dup": Q(
        q_simhash_near_dup, D.simhash_near_dup_sql(), "banded-hamming simhash pairs"
    ),
    "dedup_ngram_jaccard": Q(
        q_dedup_ngram_jaccard, D.ngram_jaccard_sql(), "blocked 3-gram-set jaccard"
    ),
    "embedding_cosine_topk": Q(
        q_embedding_cosine_topk,
        S.cosine_topk_sql("vid < 10", EMB_DIM, k=5),
        "brute-force cosine top-k",
    ),
    "ann_lsh_cosine": Q(
        q_ann_lsh_cosine,
        S.ann_lsh_topk_sql("vid < 10", n_planes=6, dim=EMB_DIM, k=3),
        "hyperplane-LSH bucketed ANN",
    ),
    "ann_lsh_multitable": Q(
        q_ann_lsh_multitable,
        S.ann_lsh_topk_sql("vid < 10", n_planes=6, dim=EMB_DIM, k=3, n_tables=8),
        "OR-amplified multi-table LSH ANN (L=8)",
    ),
    "ivf_cosine_topk": Q(
        q_ivf_cosine_topk, _ivf_oracle(), "IVF k-means-bucketed ANN (frozen index)"
    ),
    "knn_join_exact": Q(
        q_knn_join_exact,
        _knn_exact_oracle(),
        "exact cosine kNN join (block-pair Arrow kernel)",
    ),
    "knn_join_lsh": Q(
        q_knn_join_lsh,
        _knn_lsh_oracle(),
        "bucketed approximate kNN join (per-bucket Arrow kernel)",
    ),
    "near_dup_embeddings": Q(
        q_near_dup_embeddings,
        S.near_dup_pairs_cosine_sql(EMB_DIM, threshold=0.45),
        "embedding near-dup pairs",
    ),
    "decontaminate_overlap": Q(
        q_decontaminate_overlap, _decontam_oracle(), "benchmark 8-gram decontamination"
    ),
    "tfidf_top_terms": Q(
        q_tfidf_top_terms, _TFIDF_SQL, "per-doc tf-idf top terms (unlogged idf)"
    ),
    "repetition_score": Q(
        q_repetition_score, _REPETITION_SQL, "intra-doc 3-gram repetition ratio"
    ),
    "mixture_report": Q(
        q_mixture_report, _MIXTURE_SQL, "per (lang, source) mixture accounting"
    ),
    "lang_id": Q(q_lang_id, _LANG_ID_SQL, "stopword-profile language ID"),
    "quality_score": Q(q_quality_score, _QUALITY_SQL, "text quality features"),
    "token_count": Q(q_token_count, _TOKEN_COUNT_SQL, "ws + BPE-ish token counts"),
    "doc_fingerprint": Q(q_doc_fingerprint, _FINGERPRINT_SQL, "rolling-hash fingerprint"),
    "sequence_packing": Q(
        q_sequence_packing, _PACKING_SQL, "greedy context-window packing"
    ),
    "chunk_documents": Q(
        q_chunk_documents, _CHUNK_SQL, "overlapping token-window chunking"
    ),
}
