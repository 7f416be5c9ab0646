"""Graph centrality over the near-duplicate graph.

Beyond-reference operator (SURVEY.md §7.6 family): an authority score for
every document from the duplicate-pair graph — the standard curation trick
for picking which copy of a template family to keep (a high-centrality hub
is boilerplate; a leaf is more likely original), complementing
``dedup_cluster_assign``'s purely structural canonical choice.

Determinism contract: the entire recurrence is INTEGER arithmetic on a
1e9 lattice — init = SCALE div N, per-neighbor contribution =
rank div degree, damping = (15 * base + 85 * Σ) div 100 — so there is no
floating-point fold anywhere and both engines produce identical BIGINTs
regardless of partitioning or summation order. (A double-based PageRank
cannot be hash-compared across engines: neighbor sums are fold-order
sensitive.) Mass is NOT conserved (integer floors drop remainders,
dangling mass is dropped by design); scores are a ranking signal, not a
probability distribution, and the docstring is the spec.

Scale shape per iteration: ONE keyed equi-join (ranks ⋈ edges on src) +
ONE map-combined groupBy(dst) — no left-join-back, because every
connected node receives a contribution each round (undirected edges ⇒ it
is someone's dst), and isolated nodes are a constant fixed point appended
once at the end. The edge list (degrees and the global base baked in) is
checkpointed once across the fixed iteration count. Iterations are a
constant (default 5), not convergence-tested: a fixed-depth unrolled loop
keeps the lineage bounded and the oracle expressible as chained CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import materialize

PAGERANK_SCALE = 1_000_000_000
PAGERANK_ITERS = 5


def pagerank_scores(
    docs: DataFrame,
    pairs: DataFrame,
    iters: int = PAGERANK_ITERS,
    id_col: str = "doc_id",
) -> DataFrame:
    """Integer-lattice damped PageRank over an undirected pair list.

    ``pairs`` must have columns (doc_a, doc_b) with doc_a < doc_b (the
    near-dup pair convention); every doc in ``docs`` is a node (isolated
    docs keep the damped base score).
    Returns (doc_id, rank) with rank BIGINT on the 1e9 lattice.
    """
    nodes = docs.select(F.col(id_col).alias("doc_id"))
    # Materialize the pair list ONCE before fanning it out: edges_deg
    # below references it four times in a single job (pairs ∪ swapped,
    # then the degree aggregate over that union again), so without this
    # leaf the upstream pair pipeline — an LSH band join + verification —
    # re-executes per reference inside the edges_deg checkpoint.
    # Measured at sf0.1 (r10): pagerank with iters=0 cost ~5.8 s while
    # the pair pipeline alone cost ~2.0 s warm — the gap was these
    # re-evaluations, not the iteration rounds (iters=5 ≈ iters=0).
    pairs = pairs.select("doc_a", "doc_b").transform(materialize)
    # Undirected → both directions; degree baked onto each edge so the
    # per-iteration join needs no second lookup.
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n_row = nodes.agg(F.count(F.lit(1)).alias("n_docs"))
    # base = SCALE div N is a GLOBAL constant: bake it onto every edge row
    # before the checkpoint (1-row broadcast — no driver collect, same
    # pattern as tfidf's corpus N) so the iteration loop never needs a
    # second input.
    # Eager localCheckpoint, not persist(): the pair-generation subtree
    # (minhash signatures, band joins) would otherwise be INLINED once per
    # unrolled iteration in the logical plan — optimizer time then grows
    # with iterations × subtree size and dominates wall clock (measured
    # ~25 s vs ~5 s at sf0.1 for identical results). Checkpointing
    # replaces it with a LogicalRDD leaf, same lineage hygiene as
    # connected_components (dedup.py).
    edges_deg = (
        edges.join(deg, "src")
        .join(F.broadcast(n_row))
        .select(
            "src", "dst", "deg", F.expr(f"{PAGERANK_SCALE} div n_docs").alias("base")
        )
        .transform(materialize)
    )

    # Iterate ONLY over connected nodes: every node with an edge receives
    # a contribution each round (undirected ⇒ it is someone's dst), so one
    # join + one aggregate per round replaces join + agg + left-join-back.
    # Isolated nodes are a fixed point from round 1 — rank = (15·base)
    # div 100 forever — appended once at the end.
    ranks = edges_deg.select("src").distinct().join(F.broadcast(n_row)).select(
        F.col("src").alias("doc_id"),
        F.expr(f"{PAGERANK_SCALE} div n_docs").alias("rank"),
    )
    for _ in range(iters):
        ranks = (
            ranks.join(edges_deg, ranks.doc_id == edges_deg.src, "inner")
            .select(F.col("dst"), F.expr("rank div deg").alias("c"), "base")
            .groupBy("dst")
            .agg(F.sum("c").alias("s"), F.max("base").alias("base"))
            .select(
                F.col("dst").alias("doc_id"),
                F.expr("(15 * base + 85 * s) div 100").alias("rank"),
            )
        )
    isolated = (
        nodes.join(
            edges_deg.select(F.col("src").alias("doc_id")).distinct(),
            "doc_id",
            "left_anti",
        )
        .join(F.broadcast(n_row))
        .select(
            "doc_id",
            F.expr(
                f"(15 * ({PAGERANK_SCALE} div n_docs)) div 100"
                if iters > 0
                else f"{PAGERANK_SCALE} div n_docs"
            ).alias("rank"),
        )
    )
    return ranks.select("doc_id", "rank").union(isolated)


def pagerank_sql(
    pairs_sql: str,
    table: str = "documents",
    id_col: str = "doc_id",
    iters: int = PAGERANK_ITERS,
) -> str:
    """DuckDB twin: the same integer recurrence as chained CTEs.

    Every multiply-referenced CTE is ``AS MATERIALIZED``: DuckDB inlines
    plain CTEs per reference, so without the hint the (expensive) pair
    subquery re-evaluates once per reference per iteration — the chain
    re-ran the minhash near-dup SQL ~2·iters times, which is what made
    the sf1 sweep unaffordable (VERDICT r05 #1). Materialization changes
    cost only, never values."""
    ctes = [
        f"nodes AS MATERIALIZED (SELECT {id_col} AS doc_id FROM {table})",
        f"pairs AS MATERIALIZED ({pairs_sql})",
        "edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs"
        " UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs)",
        "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src)",
        "edges_deg AS MATERIALIZED"
        " (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d ON d.src = e.src)",
        "n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM nodes)",
        f"r0 AS MATERIALIZED (SELECT doc_id, {PAGERANK_SCALE} // n_docs AS rank,"
        f" {PAGERANK_SCALE} // n_docs AS base FROM nodes, n)",
    ]
    for i in range(iters):
        ctes.append(
            f"c{i} AS (SELECT e.dst, CAST(sum(r.rank // e.deg) AS BIGINT) AS s"
            f" FROM r{i} r JOIN edges_deg e ON r.doc_id = e.src GROUP BY e.dst)"
        )
        ctes.append(
            f"r{i + 1} AS MATERIALIZED (SELECT r.doc_id,"
            f" (15 * r.base + 85 * coalesce(c.s, 0)) // 100 AS rank, r.base"
            f" FROM r{i} r LEFT JOIN c{i} c ON c.dst = r.doc_id)"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT doc_id, rank FROM r{iters}"
    )
