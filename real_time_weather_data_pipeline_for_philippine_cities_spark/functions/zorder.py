"""Z-order (Morton) clustering keys: interleave the bits of two 32-bit
dimensions into one 64-bit sort key.

Sorting/partitioning a table by the Morton key co-locates rows that are
close in BOTH dimensions, so per-file min/max statistics become selective
for predicates on EITHER column — the multi-dimensional data-skipping
layout behind Delta's OPTIMIZE ZORDER and Hudi/Iceberg clustering. Here it
is a pure expression (the classic parallel-prefix bit-spread: 5 shift+mask
rounds per dimension), identical int64 arithmetic in Spark and DuckDB, so
the layout decision is testable cross-engine like any other query.

At 100 TB the operator is a map-only projection feeding a
``repartitionByRange(zkey)`` + sortWithinPartitions write — no shuffle
beyond the one range exchange the layout itself requires.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# parallel-prefix spread: after these rounds the 32 input bits sit in the
# even bit positions of an int64
_SPREAD_ROUNDS: list[tuple[int, int]] = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _spread_sql(expr: str) -> str:
    """Engine-neutral SQL for the bit spread (operators &, |, << behave
    identically on BIGINT in Spark SQL and DuckDB for these masks).

    Inputs are masked to 31 bits so the interleaved key tops out at bit 62:
    keys stay POSITIVE int64 on both engines, and DuckDB's checked shift
    cannot overflow (a full 32-bit b-dimension would push its top bit into
    the int64 sign bit). 31 bits/dimension is no practical loss — z-order
    dimensions are range-bucketed before interleaving anyway."""
    # the CAST keeps both engines shifting at 64-bit width (an INTEGER-typed
    # input would otherwise overflow the 32-bit shift in either engine)
    out = f"(CAST({expr} AS BIGINT) & 2147483647)"
    for shift, mask in _SPREAD_ROUNDS:
        out = f"((({out} | ({out} << {shift})) & {mask}))"
    return out


def morton_key_sql(a_expr: str, b_expr: str) -> str:
    """Positive 63-bit Morton key of two non-negative integer expressions
    (each truncated to its low 31 bits); ``a`` occupies the even bits,
    ``b`` the odd bits."""
    return f"({_spread_sql(a_expr)} | ({_spread_sql(b_expr)} << 1))"


def morton_key_col(a_expr: str, b_expr: str) -> Column:
    """Spark Column form; ``a_expr``/``b_expr`` are SQL expressions (column
    names or casts). One shared formula with the DuckDB twin — the key is
    the same BIGINT on both engines."""
    return F.expr(morton_key_sql(f"CAST({a_expr} AS LONG)", f"CAST({b_expr} AS LONG)"))
