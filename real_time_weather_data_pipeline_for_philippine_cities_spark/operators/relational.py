"""Relational operator layer (SURVEY.md §2.3-2.6, §2.12).

Each operator is a pure ``DataFrame -> DataFrame`` function — testable
without I/O, composable into plans, and implemented exclusively with
Catalyst-expressible built-ins so predicate pushdown / column pruning /
whole-stage codegen apply end-to-end.

Scale notes are inline per operator: the design target is a 1000-executor
cluster over ~100 TB, where every avoidable shuffle matters.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def symmetric_difference(
    new: DataFrame,
    old: DataFrame,
    columns: Sequence[str],
    side_col: str = "diff_side",
) -> DataFrame:
    """Value-level symmetric difference — the reference's change detector.

    The reference computes ``merge(how='outer', indicator=True)`` over all
    compare columns and keeps rows where ``_merge != 'both'``
    (weather_data_fetcher.py:384-390). That full-outer natural join is
    re-expressed as two left-anti joins unioned: each side streams once,
    no wide outer-join row explosion, and null-safe equality (``<=>``)
    reproduces pandas' NaN-joins-NaN merge behavior.

    Scale: both anti-joins shuffle-hash on the same key set; with AQE the
    smaller snapshot side is broadcast and the diff is a single pass over
    the big side. ``side_col`` says which snapshot the row came from
    ('left_only' = only in ``new``, mirroring pandas indicator semantics).
    """
    left = new.select(*columns)
    right = old.select(*columns)

    def anti(a: DataFrame, b: DataFrame, tag: str) -> DataFrame:
        bb = b.alias("b")
        aa = a.alias("a")
        cond = [F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}")) for c in columns]
        return aa.join(bb, on=cond, how="left_anti").withColumn(side_col, F.lit(tag))

    return anti(left, right, "left_only").unionByName(anti(right, left, "right_only"))


def global_order_positions(
    df: DataFrame,
    key: Column,
    tiebreak: str,
    pos_col: str = "position",
    bucket_chars: int = 2,
) -> DataFrame:
    """Dense 1..N positions over a global key order — the CORPUS-SCALE
    counterpart of :func:`dense_ids` (whose single global ``row_number``
    is documented as dimension-only). Two phases, no global sort:

      1. bucket rows by the key's leading two hex chars (256 buckets —
         a prefix of the key itself, so bucket order IS key order) and
         ``row_number`` WITHIN each bucket: one corpus shuffle, 256-way
         parallel windows instead of one;
      2. cumulative bucket counts over the 256-row lattice (trivially a
         one-partition window — it is 256 rows at any corpus size)
         broadcast back as offsets; position = offset + within-rank.

    ``tiebreak`` (a unique column) appends to the order so equal keys
    cannot produce engine-dependent ranks. This is the deterministic
    training-order / epoch-shuffle primitive: key = md5(salt || id)
    gives a reproducible pseudo-random permutation of the corpus.

    ``bucket_chars`` widens the bucket prefix for keys whose leading
    characters are poorly distributed (e.g. magnitude-prefixed numeric
    sort keys, where the first chars encode the digit count): a longer
    prefix splits each magnitude class into finer ordered buckets.
    """
    keyed = df.withColumn("__k", key).withColumn(
        "__b", F.substring("__k", 1, bucket_chars)
    )
    wb = Window.partitionBy("__b").orderBy("__k", tiebreak)
    counts = keyed.groupBy("__b").agg(F.count(F.lit(1)).alias("__c"))
    woff = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__b", F.coalesce(F.sum("__c").over(woff), F.lit(0)).alias("__off")
    )
    return (
        keyed.withColumn("__r", F.row_number().over(wb))
        .join(F.broadcast(offsets), "__b")
        .withColumn(pos_col, (F.col("__off") + F.col("__r")).cast("long"))
        .drop("__k", "__b", "__r", "__off")
    )


def dense_ids(
    df: DataFrame,
    order_by: Sequence[str | Column],
    id_col: str = "id",
) -> DataFrame:
    """Dense 1..N surrogate keys over a stable total order.

    Reproduces ``IDENTITY(1,1)`` + ``DBCC CHECKIDENT RESEED``
    (weather_data_fetcher.py:63,236-237) deterministically: the reference's
    key order depended on pandas row order; we pin it to an explicit sort.

    Scale: a single global ``row_number`` forces one-partition windowing.
    For dimension tables (the only place the reference needs dense keys —
    146 rows) that is fine. For big tables use ``zipWithIndex``-style
    two-phase numbering or ``monotonically_increasing_id`` when density is
    not required (SURVEY.md §2.12).
    """
    w = Window.orderBy(*order_by)
    return df.withColumn(id_col, F.row_number().over(w))


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    rn_col: str = "_rn",
) -> DataFrame:
    """Keep one row per key group — the first under ``order_by``.

    This is the analytics layer's "latest reading per location"
    (SURVEY.md §2.5) and the geocoder's first-match-wins selection
    (weather_data_fetcher.py:172-218) in one primitive.

    Scale: one hash-shuffle on ``keys``; partial ranking happens within
    shuffle partitions (no global sort). Skewed keys are split by AQE.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn(rn_col, F.row_number().over(w)).filter(F.col(rn_col) == 1).drop(rn_col)


def topk_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows per key group, rank retained (dense ranks not needed —
    reference's candidate selection is positional, W1/W2)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def first_match(
    df: DataFrame,
    keys: Sequence[str],
    priority: Column,
    tiebreak: Sequence[Column],
    keep_priority_col: str | None = None,
) -> DataFrame:
    """First-match-by-priority: the reference's if-ladder candidate matcher.

    ``match_province`` (weather_data_fetcher.py:159-218) walks geocode
    candidates in API order and returns on the first rule hit; the rule
    order defines which candidate wins. Encoded declaratively: a priority
    expression (lower = better; null = no match) + positional tiebreak,
    then rank-1 selection. Rows with null priority (no rule matched) drop,
    matching the reference's None return (weather_data_fetcher.py:218).
    """
    scored = df.withColumn("_prio", priority).filter(F.col("_prio").isNotNull())
    w = Window.partitionBy(*keys).orderBy(F.col("_prio").asc(), *tiebreak)
    out = scored.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    if keep_priority_col:
        return out.withColumnRenamed("_prio", keep_priority_col)
    return out.drop("_prio")


def pareto_frontier_max_min(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Skyline / Pareto frontier on (maximize ``x_col``, minimize
    ``y_col``): the x values whose best (minimal) y strictly beats every
    larger x's best y.

    Aggregate-first scalable form: the corpus-sized work is ONE
    map-combined min() per x key; the dominance test is a running-min
    window over that collapsed relation ordered by x DESC — never the
    quadratic all-pairs dominance self-join. Assumes ``x_col`` is a
    bounded-cardinality attribute (the usual skyline axis); the window
    input is |distinct x| rows. Strict '<' dominance: an equal y at a
    larger x dominates.

    Returns columns ``(x_col, best_y)`` ordered by ``x_col`` DESC.
    """
    best = df.groupBy(x_col).agg(F.min(y_col).alias("best_y"))
    w = Window.orderBy(F.desc(x_col)).rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        best.withColumn("_min_above", F.min("best_y").over(w))
        .filter(
            F.col("_min_above").isNull()
            | (F.col("best_y") < F.col("_min_above"))
        )
        .select(x_col, "best_y")
        .orderBy(F.desc(x_col))
    )
