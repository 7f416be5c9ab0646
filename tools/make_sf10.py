"""Generate a 100× scale-up of /root/testdata/sf0.1 into bench_data/sf10
(~60 M lineitem / 10 M events / 500 k documents / 200 k embeddings) for the
heavy-cohort scale probe (VERDICT r05 #3) — one decade past sf1, where
skew and memory pressure actually bite.

Same key-shifted-copies construction as tools/make_sf1.py (FK web
consistent per copy, within-copy similarity structure preserved EXACTLY,
~zero cross-copy matches) with one addition: embeddings rotate by
``i mod 64`` (the dimension), so two copies 64 apart would repeat the same
rotation and plant cross-copy EXACT duplicates — the second 64-block is
therefore sign-flipped, which preserves every within-copy cosine and
pushes cross-block cosines to -1 (far below any dup threshold).

Run: python tools/make_sf10.py   (writes bench_data/sf10/*.parquet, ~2 GB)
"""

from __future__ import annotations

import os

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench_data", "sf10"
)
N_COPIES = 100
EMB_DIM = 64


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SRC}/{t}.parquet'")

    off = {}
    for t, k in [("customer", "c_custkey"), ("orders", "o_orderkey"),
                 ("part", "p_partkey"), ("supplier", "s_suppkey"),
                 ("events", "event_id"), ("documents", "doc_id"),
                 ("embeddings", "vec_id")]:
        off[t] = con.execute(f"SELECT max({k}) + 1 FROM {t}").fetchone()[0]
    ucap = con.execute("SELECT max(user_id) + 1 FROM events").fetchone()[0]
    off["customer"] = max(off["customer"], ucap)
    off["user"] = off["customer"]

    copies = f"range(0, {N_COPIES}) c(i)"
    rot = f"CAST(i % {EMB_DIM} AS INTEGER)"
    rotated = (
        f"list_concat(embedding[{rot} + 1:], embedding[:{rot}])"
    )
    jobs = {
        "region": "SELECT * FROM region",
        "nation": "SELECT * FROM nation",
        "customer": f"""SELECT c_custkey + i * {off['customer']} AS c_custkey,
            c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer, {copies}""",
        "supplier": f"""SELECT s_suppkey + i * {off['supplier']} AS s_suppkey,
            s_name, s_nationkey, s_acctbal FROM supplier, {copies}""",
        "part": f"""SELECT p_partkey + i * {off['part']} AS p_partkey, p_name,
            p_brand, p_type, p_size, p_retailprice FROM part, {copies}""",
        "orders": f"""SELECT o_orderkey + i * {off['orders']} AS o_orderkey,
            o_custkey + i * {off['customer']} AS o_custkey, o_orderstatus,
            o_totalprice, o_orderdate, o_orderpriority FROM orders, {copies}""",
        "lineitem": f"""SELECT l_orderkey + i * {off['orders']} AS l_orderkey,
            l_partkey + i * {off['part']} AS l_partkey,
            l_suppkey + i * {off['supplier']} AS l_suppkey, l_linenumber,
            l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag,
            l_linestatus, l_shipdate FROM lineitem, {copies}""",
        "events": f"""SELECT event_id + i * {off['events']} AS event_id, ts,
            user_id + i * {off['user']} AS user_id, event_type, value, props
            FROM events, {copies}""",
        # the per-word transform is the dominant per-row cost — compute it
        # ONCE in a subquery and derive n_chars from the result (the old
        # inline form evaluated it twice per row; round-6 review finding)
        "documents": f"""SELECT doc_id, text2 AS text, lang, source,
            CASE WHEN i = 0 THEN n_chars
                 ELSE CAST(length(text2) AS BIGINT) END AS n_chars
            FROM (
              SELECT doc_id + i * {off['documents']} AS doc_id,
                     CASE WHEN i = 0 THEN text ELSE
                       list_aggregate(list_transform(string_split(text, ' '),
                                      w -> w || '_c' || i), 'string_agg', ' ')
                     END AS text2,
                     lang, source, n_chars, i
              FROM documents, {copies})""",
        "embeddings": f"""SELECT vec_id + i * {off['embeddings']} AS vec_id,
            CASE WHEN i = 0 THEN embedding
                 WHEN (i // {EMB_DIM}) % 2 = 0 THEN {rotated}
                 ELSE list_transform({rotated}, x -> -x) END AS embedding,
            label FROM embeddings, {copies}""",
    }
    for t, sql in jobs.items():
        out = f"{DST}/{t}.parquet"
        con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{t}: {n} rows", flush=True)


if __name__ == "__main__":
    main()
