"""Regenerate QUERIES.md — the catalog index (name → module → description).

Run: python tools/gen_queries_md.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_weather_data_pipeline_for_philippine_cities_spark.plans.catalog import CATALOG  # noqa: E402

HEADER = [
    "# QUERIES — catalog index",
    "",
    "Auto-generated from `plans/catalog.py` (one row per `queries()` entry;",
    "every entry is DuckDB-oracle-paired). Regenerate with",
    "`python tools/gen_queries_md.py`.",
    "",
    "| Query | Module | Description |",
    "|---|---|---|",
]


def main() -> None:
    lines = list(HEADER)
    for name in sorted(CATALOG):
        q = CATALOG[name]
        mod = q.fn.__module__.split(".")[-1]
        lines.append(f"| `{name}` | {mod} | {q.doc} |")
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md"
    )
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(CATALOG)} queries")


if __name__ == "__main__":
    main()
