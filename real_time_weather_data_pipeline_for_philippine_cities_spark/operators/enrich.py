"""Per-row HTTP enrichment as Arrow-batched mapInPandas (SURVEY.md §2.7).

The reference's three iterrows() loops (geocode wdf.py:405-419, weather
fetch wdf.py:442-453) are the only genuinely Python-bound work in the whole
pipeline — network I/O. They become mapInPandas stages with an injectable
fetcher so tests run hermetically and the driver never loops.

Rate limiting: the reference enforces a *global* 1 req/sec (time.sleep(1),
wdf.py:419). In a distributed engine a global limit needs either a single
partition (fidelity mode, the default here matches ~146-row dim tables) or
a per-partition budget of rate/num_partitions (throughput mode for large
enrichments where the provider allows more).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

#: A fetcher takes one input row (as a dict) and returns a dict of new
#: column values (or None values on failure — failures become nulls,
#: filtered downstream per SURVEY.md §2.11).
Fetcher = Callable[[dict[str, Any]], dict[str, Any]]

#: Token-bucket timestamps that outlive one mapInPandas invocation: keyed
#: by bucket name, stored in the Python *worker* process, which Spark
#: reuses across tasks and streaming micro-batches
#: (spark.python.worker.reuse, on by default). Without this, each epoch's
#: first fetch would ignore the spacing owed to the previous epoch's last
#: fetch and a streaming enrichment would burst-exceed the provider limit
#: at every micro-batch boundary.
_BUCKET_LAST: dict[str, float] = {}


def enrich_map_in_pandas(
    df: DataFrame,
    fetcher: Fetcher,
    result_schema: StructType,
    rate_per_sec: float | None = None,
    single_partition: bool = False,
    bucket: str | None = None,
) -> DataFrame:
    """Append fetcher-produced columns to every row.

    ``result_schema`` must be the input schema plus the new columns.
    ``single_partition=True`` reproduces the reference's strictly-global
    rate limit; otherwise each partition gets the full ``rate_per_sec``
    budget (callers divide by parallelism when the limit is truly global).

    ``bucket`` names a persistent rate-limit bucket: the last-fetch
    timestamp is kept in worker-process state so the global interval holds
    ACROSS streaming micro-batches, not just within one (requires
    ``single_partition=True`` to be truly global — one task at a time).
    """
    new_fields = [f.name for f in result_schema.fields if f.name not in df.columns]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        min_interval = 1.0 / rate_per_sec if rate_per_sec else 0.0
        last = _BUCKET_LAST.get(bucket, 0.0) if bucket else 0.0
        for pdf in batches:
            out_cols: dict[str, list] = {name: [] for name in new_fields}
            for row in pdf.to_dict("records"):
                if min_interval:
                    wait = min_interval - (time.monotonic() - last)
                    if wait > 0:
                        time.sleep(wait)
                    last = time.monotonic()
                    if bucket:
                        _BUCKET_LAST[bucket] = last
                got = fetcher(row) or {}
                for name in new_fields:
                    out_cols[name].append(got.get(name))
            for name in new_fields:
                pdf[name] = out_cols[name]
            yield pdf

    src = df.coalesce(1) if single_partition else df
    return src.mapInPandas(run, schema=result_schema)
