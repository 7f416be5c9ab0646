"""Corpus-scale k-nearest-neighbor JOIN (every vector is a query).

The ann/similarity operators answer the few-queries shape (a bounded
query set broadcast against the corpus). The kNN *join* — top-k
neighbors for EVERY corpus vector — is the shape behind embedding-level
near-dup clustering and retrieval-index audits, and it is where the
bucketed LSH path must finally BEAT the exact blocked path (round-9
verdict: the win regime was asserted from asymptotics, never measured;
tools/knn_crossover.py records the measured walls).

Two operators, one contract:

* ``knn_join_exact`` — block-pair replication (the
  near_dup_pairs_cosine_blocked shape): P blocks, P(P+1)/2 unordered
  block-pair groups routed by two broadcast equi-joins, one numpy pass
  per group. Every ordered (query, neighbor) pair lives in EXACTLY one
  group, and each group emits its per-query local top-k, so the global
  window re-rank is exact. O(n²/P) rows per task — the honest exact
  baseline, quadratic by definition.
* ``knn_join_lsh`` — multi-table random-hyperplane LSH: per-table
  bucket ids (the similarity.py plane family), one shuffle keyed on
  (table, bucket), one numpy pass per bucket. Candidates are bucket
  mates only; work is sum-of-squared-bucket-sizes ≈ n²·L/2^b — the
  scale path. Result equals ``ann_lsh_topk`` with an all-rows query
  predicate (same planes, same candidate semantics), which supplies the
  DuckDB oracle.

Determinism contract (shared with the blocked near-dup kernel): dots and
norms accumulate per-dimension in ASCENDING index order (bitwise equal
to the SQL twins' sequential fold / list_inner_product), and the cosine
is quantized INSIDE the kernel with the same floor template as
functions/rounding.quantize_double — numpy's multiply/floor/divide are
the same IEEE ops, so the kernel's quantized value is bit-identical to
the oracle's. Local top-k cuts therefore use the FINAL (quantized,
neighbor-id) total order; cutting on the raw cosine could drop a
candidate that quantizes into a tie the oracle breaks the other way.

Correctness of local-topk-then-global-rerank for the LSH path: a pair
may collide in several (table, bucket) groups. If a globally-top-k
neighbor x of query q fell outside some group's local top-k, that group
holds >= k strictly-better (quantized-order) neighbors of q — all of
which are global candidates too, contradicting x's global rank. So the
union of local top-k lists always contains the global top-k; duplicates
collapse on (query, neighbor) before the re-rank.

100 TB: both operators are one keyed shuffle + Arrow-batched kernels;
the exact path's block count P scales so a block pair fits executor
memory, the LSH path's bucket width is set by n_planes. Skewed buckets
(dense hubs) are the known LSH hazard — AQE skew-split applies to the
groupBy, and n_planes directly bounds expected bucket size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..session import materialize
from .similarity import (
    EXACT_PAIRS_CAP,
    finite_vec_pred,
    lsh_buckets_col,
    lsh_planes,
    norm_col,
    vec_double_col,
)

_KNN_SCHEMA = "query_id long, neighbor_id long, cos_q double"


def _kernel_topk(A_ids, A_vecs, B_ids, B_vecs, k, dp, self_pairs):
    """numpy: per-query (A-side) top-k against B, quantized order.

    Per-dimension ascending accumulation == the SQL fold; quantize ==
    floor(|x|*10^dp + 0.5)/10^dp sign-aware — both bitwise equal to the
    oracle templates on identical input doubles.
    """
    import numpy as np

    dim = A_vecs.shape[1]
    acc = np.zeros((len(A_ids), len(B_ids)))
    for d in range(dim):
        acc += np.outer(A_vecs[:, d], B_vecs[:, d])
    na = np.zeros(len(A_ids))
    nb = np.zeros(len(B_ids))
    for d in range(dim):
        na += A_vecs[:, d] * A_vecs[:, d]
        nb += B_vecs[:, d] * B_vecs[:, d]
    na, nb = np.sqrt(na), np.sqrt(nb)
    cos = acc / np.outer(na, nb)
    scale = 10.0**dp
    cos_q = np.where(
        cos < 0,
        -np.floor(-cos * scale + 0.5) / scale,
        np.floor(cos * scale + 0.5) / scale,
    )
    if self_pairs:
        cos_q[A_ids[:, None] == B_ids[None, :]] = -np.inf  # drop self
    kk = min(k, cos_q.shape[1])
    # total order (cos_q DESC, neighbor_id ASC) via lexsort on (-cos, id)
    order = np.lexsort((B_ids[None, :].repeat(len(A_ids), 0), -cos_q), axis=1)
    top = order[:, :kk]
    q_out = A_ids.repeat(kk)
    n_out = B_ids[top].ravel()
    c_out = np.take_along_axis(cos_q, top, axis=1).ravel()
    keep = np.isfinite(c_out)  # strips the -inf self slots
    import pandas as pd

    return pd.DataFrame(
        {"query_id": q_out[keep], "neighbor_id": n_out[keep], "cos_q": c_out[keep]}
    )


def _empty_pdf():
    import pandas as pd

    return pd.DataFrame(
        {
            "query_id": pd.Series(dtype="int64"),
            "neighbor_id": pd.Series(dtype="int64"),
            "cos_q": pd.Series(dtype="float64"),
        }
    )


def _normed_base(
    emb: DataFrame, id_col: str, emb_col: str, dim: int
) -> DataFrame:
    """Shared ingestion: finite fixed-dim vectors, positive norm (the
    zero-vector gate every cosine surface applies), spread partitions."""
    return (
        emb.filter(finite_vec_pred(emb_col, dim))
        .select(
            F.col(id_col).cast("long").alias("vid"),
            vec_double_col(emb_col).alias("v"),
        )
        .repartition(F.col("vid"))
        .withColumn("nrm", norm_col("v"))
        .filter(F.col("nrm") > 0)
        .drop("nrm")
    )


def _global_topk(cands: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def knn_join_exact(
    emb: DataFrame,
    k: int = 3,
    n_blocks: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    quant_dp: int = 6,
    max_rows: int = EXACT_PAIRS_CAP * 64,
) -> DataFrame:
    """EXACT cosine kNN join via block-pair replication + numpy top-k.

    ``max_rows`` is a loud structural bound (an exact quadratic join on
    an unbounded corpus is a scale bug by definition); the bench corpus
    at sf10 (200k vectors) sits inside the default.
    """

    def kernel(key, pdf):  # type: ignore[no-untyped-def]
        import numpy as np
        import pandas as pd

        bi, bj = key
        if bi == bj:
            A = pdf[pdf["role"] == 0]
            if len(A) < 2:
                return _empty_pdf()
            ids = A["vid"].to_numpy()
            V = np.vstack(A["v"].to_numpy())
            return _kernel_topk(ids, V, ids, V, k, quant_dp, self_pairs=True)
        A = pdf[pdf["role"] == 0]
        B = pdf[pdf["role"] == 1]
        if A.empty or B.empty:
            return _empty_pdf()
        ia, VA = A["vid"].to_numpy(), np.vstack(A["v"].to_numpy())
        ib, VB = B["vid"].to_numpy(), np.vstack(B["v"].to_numpy())
        return pd.concat(
            [
                _kernel_topk(ia, VA, ib, VB, k, quant_dp, self_pairs=False),
                _kernel_topk(ib, VB, ia, VA, k, quant_dp, self_pairs=False),
            ]
        )

    # Materialize the normed base ONCE (eager localCheckpoint): the
    # count() bound probe, both block-pair join sides, and the kernel
    # input would otherwise each re-run the scan + norm pipeline (the
    # count alone was a full duplicate pass — measured ~0.4 s of the
    # 1.7 s entry at sf0.1, r10).
    base = _normed_base(emb, id_col, emb_col, dim).transform(materialize)
    n = base.count()
    if n > max_rows:
        raise ValueError(
            f"knn_join_exact: {n} vectors exceeds the exact-path bound "
            f"{max_rows}; use knn_join_lsh for larger corpora"
        )
    blocked = base.withColumn(
        "blk", F.pmod(F.col("vid"), F.lit(n_blocks)).cast("int")
    )
    bp = [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)]
    pairs = base.sparkSession.createDataFrame(bp, "bi int, bj int")
    side_a = blocked.join(F.broadcast(pairs), blocked.blk == pairs.bi).select(
        "bi", "bj", F.lit(0).alias("role"), "vid", "v"
    )
    side_b = blocked.join(F.broadcast(pairs), blocked.blk == pairs.bj).select(
        "bi", "bj", F.lit(1).alias("role"), "vid", "v"
    )
    cands = (
        side_a.unionByName(side_b)
        .groupBy("bi", "bj")
        .applyInPandas(kernel, schema=_KNN_SCHEMA)
        .withColumnRenamed("cos_q", "cos_sim")
    )
    return _global_topk(cands, k)


def knn_join_lsh(
    emb: DataFrame,
    k: int = 3,
    n_planes: int = 6,
    n_tables: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    quant_dp: int = 6,
) -> DataFrame:
    """Approximate cosine kNN join: candidates = multi-table LSH bucket
    mates; result ≡ ``ann_lsh_topk`` with an all-rows query predicate
    (the DuckDB twin reuses ann_lsh_topk_sql('TRUE', ...))."""

    def kernel(key, pdf):  # type: ignore[no-untyped-def]
        import numpy as np

        # Dup-safety contract (shared with the jaccard pair operators):
        # duplicate vec_ids carry identical vectors, so collapse copies
        # BEFORE the local top-k — otherwise copies of one strong
        # neighbor consume the whole cut while the oracle's pair-level
        # DISTINCT keeps k distinct neighbors (dup-parity sweep, r10).
        pdf = pdf[~pdf["vid"].duplicated()]
        if len(pdf) < 2:
            return _empty_pdf()
        ids = pdf["vid"].to_numpy()
        V = np.vstack(pdf["v"].to_numpy())
        return _kernel_topk(ids, V, ids, V, k, quant_dp, self_pairs=True)

    tables = [lsh_planes(n_planes, dim, table=tb) for tb in range(n_tables)]
    base = _normed_base(emb, id_col, emb_col, dim)
    # posexplode_OUTER: the non-outer generator's implicit size > 0
    # pruning filter duplicates the Arrow bucket kernel below it (guide
    # §4.4); the kernel always emits a length-L array so the generated
    # rows are identical (see similarity.ann_lsh_topk).
    flat = base.withColumn(
        "buckets", lsh_buckets_col("v", tables, dim)
    ).select("vid", "v", F.posexplode_outer("buckets").alias("tbl", "bucket"))
    local = flat.groupBy("tbl", "bucket").applyInPandas(
        kernel, schema=_KNN_SCHEMA
    )
    # duplicate collisions across tables carry the SAME quantized cosine
    # (same vectors, same IEEE ops): collapse on the pair key only.
    cands = local.dropDuplicates(["query_id", "neighbor_id"]).withColumnRenamed(
        "cos_q", "cos_sim"
    )
    return _global_topk(cands, k)


def knn_join_exact_sql(
    dim: int,
    k: int = 3,
    table: str = "embeddings",
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    quant_dp: int = 6,
) -> str:
    """Brute-force DuckDB twin of :func:`knn_join_exact` (affordable at
    the strict-proof SFs; the blocked Spark plan must match it bitwise).
    """
    from ..functions.rounding import oracle_quantize_double
    from .similarity import dot_sql, finite_vec_sql, norm_sql, vec_double_sql

    return f"""
WITH base AS (
  SELECT {id_col} AS vid, {vec_double_sql(emb_col)} AS v FROM {table}
  WHERE {finite_vec_sql(emb_col, dim)}),
normed AS MATERIALIZED (
  SELECT * FROM (SELECT vid, v, {norm_sql('v')} AS nrm FROM base)
  WHERE nrm > 0),
scored AS (
  SELECT a.vid AS query_id, b.vid AS neighbor_id,
         {oracle_quantize_double(dot_sql('a.v', 'b.v', dim) + ' / (a.nrm * b.nrm)', quant_dp)} AS cos_sim
  FROM normed a JOIN normed b ON a.vid <> b.vid),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= {k}
"""
