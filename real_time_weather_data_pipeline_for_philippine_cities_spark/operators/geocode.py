"""Geocode candidate matching as a distributed operator (SURVEY.md §2.8/J4).

The reference's fuzzy lookup join (``get_geocode`` + ``match_province``,
weather_data_fetcher.py:104-218) decomposes into:

  1. candidates arrive as rows (query key, candidate_idx, lat, lon, state) —
     the exploded ArrayType form of the ≤5-candidate API response (W1);
  2. a pure boolean acceptance expression per candidate
     (functions.normalize.candidate_accepted);
  3. first-accepted-candidate-wins selection = rank over candidate_idx
     (operators.relational.first_match).

Scale: one shuffle on the query key; the acceptance predicate is evaluated
map-side inside whole-stage codegen, so at 100 TB the cost is the single
per-key ranking — no Python, no per-row lookups.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.normalize import candidate_accepted
from ..operators.relational import first_match

#: Hard cap on the probe side of ``fuzzy_best_match``. The operator is a
#: broadcast cross join (|probe| × |candidates| Levenshtein evaluations) —
#: correct only because the probe is a bounded batch, the way the
#: reference geocodes only its changed-rows diff (weather_data_fetcher.py
#: :104-130, ≤ a few hundred cities per run). The cap is enforced INSIDE
#: the operator via a bounded top-k on the probe key, so the cross join is
#: safe by construction: if a caller's filter drifts, the operator still
#: never scores more than FUZZY_PROBE_CAP probes.
FUZZY_PROBE_CAP = 1024


def match_geocode_candidates(
    candidates: DataFrame,
    keys: Sequence[str] = ("query_city",),
    city_col: str = "query_city",
    province_col: str = "province_name",
    state_col: str = "state",
    idx_col: str = "candidate_idx",
) -> DataFrame:
    """Pick the first accepted candidate per key, reference-faithfully.

    Rows where no rule matches are dropped (the reference returns None and
    the caller's coalesce cascade moves to the next name variant —
    wdf.py:110-126).
    """
    accepted = candidates.filter(
        candidate_accepted(F.col(city_col), F.col(province_col), F.col(state_col))
    )
    return first_match(
        accepted,
        keys,
        priority=F.col(idx_col).cast("int"),
        tiebreak=[],
    )


def fuzzy_best_match(
    probe: DataFrame,
    candidates: DataFrame,
    probe_col: str = "query_name",
    cand_col: str = "cand_name",
    max_dist: int = 10,
    max_probe: int = FUZZY_PROBE_CAP,
    on_excess: str = "error",
) -> DataFrame:
    """Best Levenshtein candidate per probe name — the principled upgrade
    of the reference's substring 'fuzzy' cascade (weather_data_fetcher.py
    :104-130): closest candidate within ``max_dist`` edits, ties broken by
    candidate name.

    Scale contract: the probe side is deduplicated to DISTINCT names (the
    output is per-name anyway, and counting duplicate rows against the cap
    would admit fewer names than budgeted — round-5 advice), then capped
    to the ``max_probe`` smallest names inside the operator. The distinct
    is a map-side-combined aggregate (the shuffle carries distinct names,
    not probe rows); its ``max_probe + 1`` smallest names are fetched by
    ONE bounded top-k job (bounds.bounded_key_cutoff) and the admitted
    batch becomes a local relation — the probe side is never scanned
    twice (round-6 review finding). When the cap would bind, the operator
    RAISES by default; ``on_excess='truncate'`` accepts the bounded batch
    with a warning — never silent. Candidates are broadcast and the
    Levenshtein + ranking run JVM-side in whole-stage codegen, so cost is
    ≤ max_probe × |candidates| regardless of caller filters — the
    geocode-batch semantic made structural.
    """
    from pyspark.sql.types import StructField, StructType

    from .bounds import bounded_key_cutoff

    names = probe.select(F.col(probe_col)).distinct()
    _, admitted = bounded_key_cutoff(
        names, probe_col, max_probe, on_excess, "fuzzy_best_match"
    )
    # the rebuilt local relation must carry the PROBE's own column type —
    # the parameter is generic, and a hard-coded string schema would
    # coerce (or reject) non-string probe keys.
    probe_field = StructType([StructField(probe_col, probe.schema[probe_col].dataType)])
    bounded = (
        probe.sparkSession.createDataFrame([(v,) for v in admitted], probe_field)
        # a local ≤max_probe-row relation lands in ONE partition,
        # serializing the probe x candidate Levenshtein stage in a single
        # task; hashing it out parallelizes it AND pre-satisfies the
        # ranking window's exchange on the same key (no extra shuffle).
        # EXPLICIT small partition count: the default (200+) spreads
        # ≤max_probe rows over hundreds of near-empty tasks across the
        # 3-stage chain — pure scheduler overhead (measured ~2x the whole
        # query at sf0.1); one task per CORE is the right fan-out for a
        # bounded probe batch, so size it from the cluster's own
        # defaultParallelism, never a literal core count.
        .repartition(
            probe.sparkSession.sparkContext.defaultParallelism, F.col(probe_col)
        )
    )
    # crossJoin + project + filter (NOT a join condition): putting the
    # distance bound in the join condition makes the BNLJ evaluate
    # levenshtein once for the condition and AGAIN for the projected
    # edit_dist (no cross-operator CSE) — measured 2x the scoring cost.
    scored = (
        bounded.crossJoin(F.broadcast(candidates.select(F.col(cand_col)).distinct()))
        .withColumn(
            "edit_dist",
            F.levenshtein(F.lower(probe_col), F.lower(cand_col)).cast("long"),
        )
        .filter(F.col("edit_dist") <= max_dist)
    )
    from pyspark.sql import Window

    w = Window.partitionBy(probe_col).orderBy(
        F.col("edit_dist").asc(), F.col(cand_col).asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(probe_col, cand_col, "edit_dist")
    )
