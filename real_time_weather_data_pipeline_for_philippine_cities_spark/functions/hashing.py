"""Portable deterministic hashing, identical in Spark SQL and DuckDB SQL.

The correctness harness compares every Spark query against a DuckDB oracle
(value-hash match), so any hash used in dedup / fingerprint / minhash
operators must produce bit-identical values in both engines. Engine-native
hashes (Spark xxhash64 / DuckDB hash) differ, so we derive integers from
``md5`` hex (standard in both) and do the arithmetic in ANSI-safe ranges:

  hash28(x) = int(md5(x)[0:7], 16)    < 2^28  (minhash base: products with
                                               31-bit coefficients stay < 2^59,
                                               no bigint overflow under ANSI)
  hash32(x) = int(md5(x)[0:8], 16)    < 2^32  (simhash bit source)
  hash60(x) = int(md5(x)[0:15], 16)   < 2^60  (exact-dup fingerprints)

DuckDB twins (kept textually in the oracle SQL strings):
  ('0x' || substring(md5(x), 1, N))::BIGINT
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Large prime below 2^31 for minhash permutations h_i = (a_i*h + b_i) % P.
MINHASH_PRIME = 2147483647


def _hex_prefix_int(col: Column, n_hex: int) -> Column:
    return F.conv(F.substring(F.md5(col), 1, n_hex), 16, 10).cast("long")


def hash28(col: Column) -> Column:
    """28-bit hash (7 md5 hex chars) — safe base for modular minhash math."""
    return _hex_prefix_int(col, 7)


def hash32(col: Column) -> Column:
    """32-bit hash (8 md5 hex chars) — simhash bit source."""
    return _hex_prefix_int(col, 8)


def hash60(col: Column) -> Column:
    """60-bit hash (15 md5 hex chars) — content fingerprint / exact dedup."""
    return _hex_prefix_int(col, 15)


def duckdb_hash_sql(expr: str, n_hex: int) -> str:
    """DuckDB SQL text computing the same value as ``_hex_prefix_int``."""
    return f"('0x' || substring(md5({expr}), 1, {n_hex}))::BIGINT"


def minhash_coefficients(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for k minhash permutations.

    Pure arithmetic (no RNG object) so the exact same constants can be
    inlined into the DuckDB oracle SQL. a in [1, P), b in [0, P).
    """
    coeffs = []
    a, b = seed * 2654435761 % MINHASH_PRIME, seed
    for _ in range(k):
        a = (a * 1103515245 + 12345) % MINHASH_PRIME
        b = (b * 69069 + 1) % MINHASH_PRIME
        coeffs.append((a if a > 0 else 1, b))
    return coeffs


#: Canonical sketch width shared by the batch catalog entry and the
#: streaming windowed sketch — the batch/stream bit-for-bit agreement
#: contract requires ONE source of truth for R. rel err ~ 1/sqrt(R).
KMV_R = 32


def kmv_hash_col(id_col: str) -> Column:
    """The per-row base hash for the KMV sketch, to be PROJECTED once
    below the aggregate (aliased ``kmv_h0``). Keeping the md5 out of the
    R aggregate expressions guarantees one hash per row in the plan
    itself rather than relying on codegen subexpression elimination."""
    return hash28(F.col(id_col).cast("string")).alias("kmv_h0")


def kmv_minima_aggs(r: int = KMV_R, h_col: str = "kmv_h0") -> list[Column]:
    """R side-by-side min() aggregate columns ``m0..m{r-1}`` over integer
    minhash permutations of the projected ``kmv_hash_col`` — the mergeable
    KMV-style distinct-count sketch shared by the batch catalog entry
    (plans/profiling_queries.py::q_kmv_distinct_sketch) and the streaming
    windowed sketch (streaming/cardinality.py).

    One md5 per input row, then pure modular arithmetic: min aggregates
    are map-side combinable AND streaming-state friendly (R BIGINTs per
    open group, merged monotonically, evicted with the window)."""
    coeffs = minhash_coefficients(r)
    return [
        F.min((F.col(h_col) * a + b) % MINHASH_PRIME).alias(f"m{i}")
        for i, (a, b) in enumerate(coeffs)
    ]


def kmv_sum_col(r: int = KMV_R) -> Column:
    """The exact BIGINT sum S of the ``m0..m{r-1}`` minima — the sketch's
    integer state digest. Consumers that need cross-engine / cross-shard
    comparisons should compare S (exact) rather than float estimates."""
    return F.expr(" + ".join(f"m{i}" for i in range(r))).cast("long")


def kmv_estimate_col(r: int = KMV_R) -> Column:
    """Distinct-count estimate from the ``m0..m{r-1}`` minima columns.

    The min of n uniforms on [0, P) has mean ~P/(n+1), so with S the exact
    BIGINT sum of the R minima: n_est = R*P/S - 1. S is an
    order-independent integer sum; the division/subtraction are the only
    float ops — single elementwise IEEE ops on identical integers, so the
    raw double is bit-identical cross-engine. Deliberately UNROUNDED:
    round-on-raw-division lands on .5 half-cases where engines' rounding
    modes diverge (the repo-wide determinism rule — see operators/stats.py
    and the round-5 advice)."""
    s = F.expr(" + ".join(f"m{i}" for i in range(r)))
    return F.lit(r) * F.lit(float(MINHASH_PRIME)) / s - 1
