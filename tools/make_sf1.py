"""Generate a 10× scale-up of /root/testdata/sf0.1 into bench_data/sf1.

The driver ships sf{0.001,0.01,0.1}; scale claims beyond that need
measurement, so this builds an sf≈1 corpus as 10 key-shifted copies of
sf0.1 with the FK web kept consistent per copy:

  * entity keys (custkey/orderkey/partkey/suppkey/user_id/doc_id/vec_id)
    shift by copy_i × (max_key + 1) — joins and intersections behave
    exactly as in-copy, never across copies;
  * nation/region stay single-copy (bounded dims — they don't scale);
  * document text gets a per-copy word suffix: word-level substitution
    preserves every within-copy shingle-set similarity EXACTLY while
    sharing ~zero shingles across copies, so dedup outputs scale ~10×,
    not quadratically (copied-verbatim text would plant n² near-dup
    pairs and distort the bench);
  * embeddings rotate coordinates by copy_i: an orthogonal permutation
    preserves within-copy dot products exactly and decorrelates copies.

Run: python tools/make_sf1.py  (writes bench_data/sf1/*.parquet)
Then: SPARK_GRAFT_SF_DIR=$PWD/bench_data/sf1 python bench.py
"""

from __future__ import annotations

import os

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench_data", "sf1")
N_COPIES = 10


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
    # events.user_id shares the customer key domain (intersect/asof
    # queries), so BOTH customer keys and user_id must shift by the SAME
    # stride — otherwise user↔customer joins only match in copy 0 and the
    # scaled corpus silently deflates match density ~N_COPIES×.
    ucap = con.execute("SELECT max(user_id) + 1 FROM events").fetchone()[0]
    off["customer"] = max(off["customer"], ucap)
    off["user"] = off["customer"]

    copies = f"range(0, {N_COPIES}) c(i)"
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
        "documents": f"""SELECT doc_id + i * {off['documents']} AS doc_id,
            CASE WHEN i = 0 THEN text ELSE
              list_aggregate(list_transform(string_split(text, ' '),
                             w -> w || '_c' || i), 'string_agg', ' ') END AS text,
            lang, source,
            CASE WHEN i = 0 THEN n_chars ELSE
              CAST(length(list_aggregate(list_transform(string_split(text, ' '),
                   w -> w || '_c' || i), 'string_agg', ' ')) AS BIGINT) END AS n_chars
            FROM documents, {copies}""",
        "embeddings": f"""SELECT vec_id + i * {off['embeddings']} AS vec_id,
            CASE WHEN i = 0 THEN embedding ELSE
              list_concat(embedding[CAST(i + 1 AS INTEGER):],
                          embedding[:CAST(i AS INTEGER)]) END AS embedding,
            label FROM embeddings, {copies}""",
    }
    for t, sql in jobs.items():
        out = f"{DST}/{t}.parquet"
        con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
