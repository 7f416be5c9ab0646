"""Skew mitigation for shuffle joins (SURVEY.md §4.2 scale notes).

RECOMMENDED PATH AT SCALE: AQE (`spark.sql.adaptive.skewJoin.enabled`, on
in session.tune) — it splits oversized post-shuffle partitions at runtime.
Measured head-to-head on a planted 50%-hot-key join
(tools/skew_experiment.py, 20M/50M rows, value-identity asserted): skew
OFF 5.94 s, AQE 2.60 s, salted 2.33 s at 50M — AQE and salting both
recover the ~2.4× skew penalty and land within ~10% of each other, so the
zero-code path wins by default (no small-side ×n_salt replication, no
join-type restriction, no salt-width tuning). ``salted_join`` stays as
the explicit fallback for exactly the cases AQE cannot rewrite: streaming
joins, joins feeding a required distribution, or engines/configs without
AQE. The split mechanics are plan-pinned in tests/test_skew_aqe.py
(`skew=true` on the planted key, results ≡ salted bit-for-bit).

Aggregation skew needs no salting in Spark — hash aggregates
map-side-combine before the shuffle — except for distinct/collect
aggregates, where pre-aggregating by (key, salt) first is the same trick.

Mechanics: the big (skewed) side gets a uniform random salt in [0, n);
the other side is replicated n× with every salt value; the join keys
become (keys…, salt). A key with s% of the rows now occupies n partitions
instead of one, at the cost of replicating the small side n×.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    n_salt: int = 16,
    seed: int = 42,
    force_shuffle: bool = False,
) -> DataFrame:
    """Equi-join with the big side's hot keys spread across ``n_salt``
    shuffle partitions. Results are identical to ``big.join(small, on,
    how)`` for row-preserving join types.

    ``how`` is restricted to types where replicating the small side is
    sound per-row: inner / left / left_semi / left_anti (the big side is
    the left). Right/full joins would duplicate unmatched small-side rows
    once per salt — use AQE for those.

    ``force_shuffle`` adds a SHUFFLE_HASH hint on the replicated small
    side: when the small side fits under the broadcast threshold Spark
    would otherwise broadcast it, making the salt dead weight — the hint
    keeps the demonstration (and any test asserting salted parallelism)
    honest. Leave it False when the planner should choose.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(f"salted_join does not support how={how!r}")
    salted_big = big.withColumn(
        SALT_COL, F.floor(F.rand(seed) * n_salt).cast("int")
    )
    replicated_small = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    if force_shuffle:
        replicated_small = replicated_small.hint("shuffle_hash")
    return salted_big.join(replicated_small, [*on, SALT_COL], how).drop(SALT_COL)


def top_heavy_keys(df: DataFrame, keys: list[str], top: int = 10) -> DataFrame:
    """Diagnostic: the ``top`` heaviest key tuples with their row counts —
    what you run before deciding whether a join needs salting."""
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    return counts.orderBy(F.col("n_rows").desc(), *[F.col(k) for k in keys]).limit(top)


def skew_ratio(df: DataFrame, keys: list[str]) -> float:
    """max/avg key-group size, collected to a scalar (≫1 ⇒ skewed).

    Diagnostic-only: runs a job and returns a driver-side float — never
    call it inside a query plan."""
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    return counts.agg(
        (F.max("n") / F.avg("n")).alias("skew_ratio")
    ).collect()[0]["skew_ratio"]
