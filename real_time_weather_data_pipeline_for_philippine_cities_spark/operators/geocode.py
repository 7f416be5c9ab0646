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
