"""Mechanical inventory of every ``F.round(`` site in the package — the
"decidable-safe list" the round-8 verdict asked for.

The tie-margin bug class: ``round()`` on a raw double is engine-dependent
exactly when the double's shortest decimal representation lands on a
rounding half at the target precision (Spark rounds that representation
HALF_UP, DuckDB rounds the binary value). The converted sites now run the
shared integer-space / IEEE-identical templates in functions/rounding.py
and no longer appear here (they contain no ``F.round``). Every REMAINING
``F.round`` call must match exactly one ledger rule below; the test
(tests/test_round_audit.py) fails on any new unclassified site and on any
rule that stops matching — so the inventory cannot silently rot.

Classes:

* ``safe-0dp`` — round to an INTEGER (no dp argument / dp=0). A 0-dp tie
  is X.5, which is exactly representable in binary for |X| < 2^52, and a
  shortest repr ending in ".5" round-trips to exactly that double — so
  shortest-repr-half and binary-half coincide and both engines agree on
  every input. Divergence is IMPOSSIBLE at 0 dp.
* ``safe-subgrid`` — the input is an exact k-decimal grid value (integer
  cents / 100, a 2-dp money column, an integral-double sum) rounded at
  n >= k dp: its shortest repr has at most k decimals, so it cannot end
  in a half digit at position n+1.
* ``safe-proven`` — a site with an inline arithmetic proof that a tie is
  impossible (the quality composite: its exact value is even in 1e-5
  units, ties are odd).
* ``stream-internal`` — a streaming-only surface with no DuckDB oracle:
  both sides of every comparison (batch-parity tests, stateful twins) run
  Spark's round, so cross-engine repr divergence cannot arise. If one of
  these expressions is ever given a SQL twin it must be reclassified.
* ``risky-latent`` — a genuine remaining exposure: an integer ratio or a
  generic double rounded at >= 2 dp. Bitwise-green at sf0.01/sf1/sf10
  today (no landed tie in three decades of data); each is convertible
  with the existing templates and queued as the round-9 batch (window
  slots are the constraint, not the recipe — see BASELINE.md).

Usage: python tools/round_audit.py   (prints the classified inventory;
exit code = number of unclassified sites + dead rules)
"""

from __future__ import annotations

import os
import re
import sys

ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "real_time_weather_data_pipeline_for_philippine_cities_spark",
)

#: (file basename, distinctive substring of the normalized call, class, note)
#: Normalization collapses all whitespace, so substrings must be written
#: without spaces-sensitive gaps. A site matches a rule when the rule's
#: substring occurs in the site's normalized full-call text and the file
#: matches; every site must match >= 1 rule (first match wins for class),
#: and every rule must match >= 1 site.
LEDGER: list[tuple[str, str, str, str]] = [
    # ---- safe-subgrid ----
    ("relational_queries.py", "F.round(F.sum(\"l_quantity\"),2)", "safe-subgrid", "integral-double sum @2dp"),
    ("relational_queries.py", "F.round(F.sum(F.round(finite(\"l_extendedprice\")*100).cast(\"bigint\"))/100.0,2", "safe-subgrid", "cents/100 @2dp"),
    ("relational_queries.py", "F.round(F.sum(F.round(finite(\"value\")*100).cast(\"bigint\"))/100.0,2", "safe-subgrid", "cents/100 @2dp"),
    ("relational_queries.py", "F.round(F.coalesce(\"acctbal\",F.lit(0.0)),2)", "safe-subgrid", "2-dp money grid @2dp"),
    ("relational_queries.py", "F.round(F.col(\"c_acctbal\")+F.when(F.col(\"c_custkey\")%7==0,F.lit(100.0))", "safe-subgrid", "2-dp grid + exact 100 @2dp"),
    # ---- safe-0dp: integer quantization (money cents / micro units) ----
    ("warehouse_queries.py", "F.round(expr*100)", "safe-0dp", "_cents helper"),
    ("warehouse_queries.py", "p_retailprice\")*F.col(\"l_quantity\")*60", "safe-0dp", "profit cost cents"),
    ("subquery_queries.py", "finite(F.col(\"l_extendedprice\")*(1-F.col(\"l_discount\")))*100", "safe-0dp", "revenue cents (finite-guarded)"),
    ("subquery_queries.py", "F.round(finite(\"p_retailprice\")*100)", "safe-0dp", "retail cents (finite-guarded)"),
    ("relational_queries.py", "F.round(finite(\"l_extendedprice\")*100)", "safe-0dp", "price cents (finite-guarded)"),
    ("relational_queries.py", "F.round(finite(\"value\")*100)", "safe-0dp", "metric cents"),
    ("relational_queries.py", "l_extendedprice\")*(1-F.col(\"l_discount\"))*100", "safe-0dp", "revenue cents"),
    ("relational_queries.py", "finite(F.col(\"l_extendedprice\")*(1-F.col(\"l_discount\")))*100", "safe-0dp", "revenue cents (finite-guarded)"),
    ("relational_queries.py", "F.round(finite(\"o_totalprice\")*100)", "safe-0dp", "order cents (finite-guarded)"),
    ("timeseries_queries.py", "F.round(F.col(\"value\")*100)", "safe-0dp", "metric cents"),
    ("timeseries_queries.py", "F.round(finite(\"o_totalprice\")*100)", "safe-0dp", "order cents (finite-guarded; was mislabeled by the pre-round-9 catch-all)"),
    ("timeseries_queries.py", "F.round(finite(\"value\")*1000000)", "safe-0dp", "metric micros"),
    ("timeseries_queries.py", "F.round(F.col(\"value\")*1000000)", "safe-0dp", "metric micros"),
    ("timeseries_queries.py", "F.round(F.sum(\"day_cents\").over(w)/F.count", "safe-0dp", "7d MA cents (0-dp int ratio: X.5 representable, engines agree)"),
    ("operators/timeseries.py", "F.round(F.col(value_col)*100)", "safe-0dp", "metric cents"),
    ("curation_queries.py", "F.round(F.col(\"quality\")*10000,0)", "safe-0dp", "quality key micro-units"),
    # ---- safe-proven ----
    ("functions/text.py", "F.round(0.4*ttr+0.4*stop_ratio+0.2*(1-punct_ratio),4)", "safe-proven", "even-in-1e-5 composite; tie arithmetically impossible (see inline proof)"),
    ("functions/text.py", "F.round(0.4*_F.col(\"ttr\")+0.4*_F.col(\"stop_ratio\")+0.2*(1-_F.col(\"punct_ratio\")),4,)", "safe-proven", "same composite, staged-attach form (same proof)"),
    # ---- stream-internal (no DuckDB oracle on these surfaces) ----
    ("streaming/windows.py", "F.round(F.min(value_col),2)", "stream-internal", "windowed min"),
    ("streaming/windows.py", "F.round(F.max(value_col),2)", "stream-internal", "windowed max"),
    ("streaming/windows.py", "F.round(F.avg(value_col),2)", "stream-internal", "windowed avg"),
    ("streaming/windows.py", "F.round(F.sum(value_col),2)", "stream-internal", "session sum"),
    ("streaming/neardup.py", "F.array_intersect(\"hs_a\",\"hs_b\")", "stream-internal", "stream jaccard (batch-parity tested vs the SAME expression)"),
    # ---- risky-latent: RETIRED (round 10) ----
    # The final 28-site batch went through the exact-integer round_div /
    # IEEE-identical quantize_double templates (with quantize_domain_guard
    # on unbounded magnitudes) in round 10 — the category is now EMPTY and
    # the audit gate (tests/test_round_audit.py) pins it that way: any new
    # F.round on an integer ratio or generic double at >= 2 dp shows up as
    # UNCLASSIFIED and must be written with the templates instead.
]


def _sites() -> list[tuple[str, int, str]]:
    """Every F.round( call site as (relpath, line, normalized full call)."""
    out = []
    for dirpath, _dirnames, filenames in os.walk(ROOT):
        if "__pycache__" in dirpath:
            continue
        for fn in filenames:
            if not fn.endswith(".py") or fn == "rounding.py":
                continue
            path = os.path.join(dirpath, fn)
            src = open(path).read()
            for m in re.finditer(r"F\.round\(", src):
                start = m.start()
                depth, i = 0, m.end() - 1
                while i < len(src):
                    if src[i] == "(":
                        depth += 1
                    elif src[i] == ")":
                        depth -= 1
                        if depth == 0:
                            break
                    i += 1
                call = re.sub(r"\s+", "", src[start : i + 1])
                line = src[: start].count("\n") + 1
                rel = os.path.relpath(path, ROOT)
                out.append((rel, line, call))
    return out


#: Rules expected to (first-)match MORE than one site. Any rule whose
#: match count differs from its expectation fails the audit — so a NEW
#: F.round site that happens to contain an existing rule's substring
#: cannot silently inherit that rule's class (it bumps the count and the
#: gate trips); it must be classified deliberately (round-8 advice).
EXPECTED_MULTI: dict[tuple[str, str], int] = {
    ("relational_queries.py", "F.round(F.col(\"c_acctbal\")+F.when(F.col(\"c_custkey\")%7==0,F.lit(100.0))"): 2,
    ("subquery_queries.py", "finite(F.col(\"l_extendedprice\")*(1-F.col(\"l_discount\")))*100"): 3,
    ("timeseries_queries.py", "F.round(F.col(\"value\")*100)"): 3,
}


def audit() -> tuple[
    list[tuple[str, int, str, str, str]],
    list[tuple[str, int, str]],
    list[tuple[str, str]],
    list[tuple[str, str, int, int]],
]:
    """Returns (classified, unclassified, dead_rules, miscounted_rules)."""
    sites = _sites()
    classified, unclassified = [], []
    counts: dict[int, int] = {}
    for rel, line, call in sites:
        hit = None
        for idx, (f, sub, cls, note) in enumerate(LEDGER):
            if rel.endswith(f) and re.sub(r"\s+", "", sub) in call:
                hit = (cls, note)
                counts[idx] = counts.get(idx, 0) + 1
                break
        if hit:
            classified.append((rel, line, call[:70], hit[0], hit[1]))
        else:
            unclassified.append((rel, line, call[:120]))
    dead = [
        (f, sub)
        for idx, (f, sub, _c, _n) in enumerate(LEDGER)
        if idx not in counts
    ]
    miscounted = []
    for idx, (f, sub, _c, _n) in enumerate(LEDGER):
        got = counts.get(idx, 0)
        want = EXPECTED_MULTI.get((f, sub), 1)
        if got and got != want:
            miscounted.append((f, sub, want, got))
    return classified, unclassified, dead, miscounted


def main() -> int:
    classified, unclassified, dead, miscounted = audit()
    from collections import Counter

    by_class = Counter(c for _r, _l, _call, c, _n in classified)
    for rel, line, call, cls, note in sorted(classified, key=lambda x: (x[3], x[0], x[1])):
        print(f"{cls:16} {rel}:{line}  {call}  # {note}")
    print(f"\n{len(classified)} classified: {dict(by_class)}")
    if unclassified:
        print(f"\nUNCLASSIFIED ({len(unclassified)}):")
        for rel, line, call in unclassified:
            print(f"  {rel}:{line}  {call}")
    if dead:
        print(f"\nDEAD RULES ({len(dead)}):")
        for f, sub in dead:
            print(f"  {f}: {sub}")
    if miscounted:
        print(f"\nMISCOUNTED RULES ({len(miscounted)}):")
        for f, sub, want, got in miscounted:
            print(f"  {f}: {sub}  expected {want}, matched {got}")
    return len(unclassified) + len(dead) + len(miscounted)


if __name__ == "__main__":
    sys.exit(main())
