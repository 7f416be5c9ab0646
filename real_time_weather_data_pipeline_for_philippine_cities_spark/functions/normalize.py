"""City-name normalization and geocode-candidate matching (SURVEY.md §2.8).

Every reference helper here compiles to pure Catalyst expressions — no UDFs
(SURVEY.md §2.10 principle: only network I/O stays in Python).

Semantics derived from the reference (cited, not copied):
  * ``normalize_city_name`` — weather_data_fetcher.py:145-157: strip the
    FIRST matching prefix of ['City of ', 'Municipality of ', 'Barangay ',
    'Town of '] (one removal only, anchored at position 0), then trim.
  * `` City`` suffix strip — weather_data_fetcher.py:121-124.
  * ``match_province`` — weather_data_fetcher.py:159-218: candidate-major
    first-match. For each geocode candidate IN API ORDER, the candidate is
    accepted if ANY rule holds; the first accepted candidate's coordinates
    are returned. Rules (within one candidate all return the same coords,
    so only candidate order affects the result):
      R1 state is null/NaN                      (wdf.py:176-180)
      R2 city=='isabela' and 'basilan' ∈ state  (wdf.py:183-187)
      R3 province is a string and:
         a. lower(state) == lower(province)     (wdf.py:193)
         b. lower(province) ∈ lower(state)      (wdf.py:199)
         c. city=='naga' and state ∈ {'nan',''}
            and province=='camarines sur'       (wdf.py:206-210)
    A non-string (null) province disables R3 but NOT R1/R2 (wdf.py:211-212
    only logs — the loop continues).

Note R3c's ``state == 'nan'`` matches a literal string 'nan' — an artifact
of the reference's ``astype(str)`` NaN sentinel (wdf.py:362, SURVEY.md
F11). We reproduce it verbatim: the sentinel is part of the contract.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: weather_data_fetcher.py:147 — order matters only for which prefix is
#: logged; at most one strip happens either way because all are anchored.
CITY_PREFIXES = ("City of ", "Municipality of ", "Barangay ", "Town of ")

_PREFIX_RE = "^(" + "|".join(CITY_PREFIXES) + ")"


def normalize_city_name(city: Column) -> Column:
    """Strip one anchored prefix then trim (wdf.py:145-157)."""
    return F.trim(F.regexp_replace(city, _PREFIX_RE, ""))


def normalize_city_name_sql(expr: str) -> str:
    """DuckDB twin (regexp_replace is first-match-only there by default)."""
    return f"trim(regexp_replace({expr}, '{_PREFIX_RE}', ''))"


def strip_city_suffix(city: Column) -> Column:
    """Drop a trailing ' City' and trim (wdf.py:121-124)."""
    return F.when(
        city.endswith(" City"),
        F.trim(F.substring(city, F.lit(1), F.length(city) - F.lit(5))),
    ).otherwise(city)


def candidate_accepted(city: Column, province: Column, state: Column) -> Column:
    """Boolean: does this geocode candidate satisfy any match rule?

    Mirrors the per-candidate rule set of wdf.py:172-210 (see module doc).
    ``city`` must already be the name variant used for the lookup; ``state``
    may carry the literal 'nan' sentinel (R3c).
    """
    r1 = state.isNull()
    r2 = (F.lower(city) == "isabela") & state.isNotNull() & F.lower(state).contains("basilan")
    r3_guard = province.isNotNull()
    r3a = state.isNotNull() & (F.lower(state) == F.lower(province))
    r3b = state.isNotNull() & F.lower(state).contains(F.lower(province))
    r3c = (
        (F.lower(city) == "naga")
        & state.isNotNull()
        & state.isin("nan", "")
        & (F.lower(province) == "camarines sur")
    )
    return r1 | r2 | (r3_guard & (r3a | r3b | r3c))


def candidate_accepted_sql(city: str, province: str, state: str) -> str:
    """DuckDB-SQL twin of :func:`candidate_accepted` (textually inlined into
    oracle queries so both engines evaluate identical logic)."""
    return f"""(
      {state} IS NULL
      OR (lower({city}) = 'isabela' AND {state} IS NOT NULL
          AND position('basilan' IN lower({state})) > 0)
      OR ({province} IS NOT NULL AND (
            ({state} IS NOT NULL AND lower({state}) = lower({province}))
         OR ({state} IS NOT NULL
             AND position(lower({province}) IN lower({state})) > 0)
         OR (lower({city}) = 'naga' AND {state} IN ('nan', '')
             AND lower({province}) = 'camarines sur')))
    )"""
