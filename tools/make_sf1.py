"""Deterministic 10x upsample of sf0.1 into a local sf1 profile set.

The driver ships sf{0.001,0.01,0.1}; the scale-slope table needs a
second, less-overhead-dominated decade for its top queries (r5 VERDICT
item 7: several sf0.01->sf0.1 "slopes" on ~1 s queries are fixed-cost
noise).  This produces sf1 = 10 copies of sf0.1 with keys remapped per
copy (copy c shifts every key by c * SPAN, so FK integrity holds within
a copy and never crosses copies) — written to a repo-local dir because
/root/testdata is read-only.

Replication choices that keep workloads HONEST at 10x:
- region/nation: fixed dimensions, copied once.
- part names get a per-copy 4-char prefix ("c0: ", "c1: ", ...) so the
  edit-distance join does not see 10 identical copies of every name
  (cross-copy prefix distance is 4 > 2); copy 0 is prefixed too, so
  all copies behave alike.
- document texts are WORD-ROTATED by copy (rotate the word list by c)
  so shingle/minhash dedup sees ~10x more dup GROUPS, not 10x BIGGER
  groups — matching how duplicate mass actually grows with corpus
  size; doc_id keyspace shifts per copy.
- embeddings get a c-scaled deterministic micro-offset per dimension
  (+c * (dim % 7 - 3) * 1e-4) so near-dup/semantic dedup does not see
  10 bit-identical copies of every vector; vec_id < N_QUERIES query
  vectors stay copy-0-only, so ANN keeps a fixed query set against a
  10x corpus.
- events keep their timestamps (same window, 10x density) and shift
  user_id per copy (10x users, same events-per-user profile).

Usage: python tools/make_sf1.py  [writes to .localdata/sf1/]
"""

from __future__ import annotations

import os

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = os.environ.get(
    "SPARK_GRAFT_SF1_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".localdata", "sf1"),
)
COPIES = 10
SPAN = 100_000_000  # key shift per copy; far above any sf0.1 key


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        )
    copies = f"(SELECT unnest(range({COPIES})) AS c) cp"

    jobs = {
        "region": "SELECT * FROM region",
        "nation": "SELECT * FROM nation",
        "customer": f"""
            SELECT c_custkey + c * {SPAN} AS c_custkey, c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM customer, {copies}""",
        "supplier": f"""
            SELECT s_suppkey + c * {SPAN} AS s_suppkey, s_name,
                   s_nationkey, s_acctbal
            FROM supplier, {copies}""",
        "part": f"""
            SELECT p_partkey + c * {SPAN} AS p_partkey,
                   'c' || c || ': ' || p_name AS p_name,
                   p_brand, p_type, p_size, p_retailprice
            FROM part, {copies}""",
        "orders": f"""
            SELECT o_orderkey + c * {SPAN} AS o_orderkey,
                   o_custkey + c * {SPAN} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM orders, {copies}""",
        "lineitem": f"""
            SELECT l_orderkey + c * {SPAN} AS l_orderkey,
                   l_partkey + c * {SPAN} AS l_partkey,
                   l_suppkey + c * {SPAN} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM lineitem, {copies}""",
        "events": f"""
            SELECT event_id + c * {SPAN} AS event_id, ts,
                   user_id + c * {SPAN} AS user_id,
                   event_type, value, props
            FROM events, {copies}""",
        "documents": f"""
            SELECT doc_id + c * {SPAN} AS doc_id,
                   CASE WHEN c = 0 THEN text ELSE array_to_string(
                       list_concat(
                           w[1 + (c % greatest(len(w), 1)):],
                           w[:(c % greatest(len(w), 1))]
                       ), ' ') END AS text,
                   lang, source, CAST(length(text) AS BIGINT) AS n_chars
            FROM (SELECT *, string_split(text, ' ') AS w FROM documents),
                 {copies}""",
        "embeddings": f"""
            SELECT vec_id + c * {SPAN} AS vec_id,
                   CASE WHEN c = 0 THEN embedding ELSE
                       list_transform(list_apply(embedding, (e, i) ->
                           CAST(e + c * ((i % 7) - 3) * 0.0001 AS FLOAT)),
                           x -> x)
                   END AS embedding,
                   label
            FROM embeddings, {copies}""",
    }
    for t, sql in jobs.items():
        path = os.path.join(OUT, f"{t}.parquet")
        con.execute(f"COPY ({sql}) TO '{path}' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{path}')"
        ).fetchone()[0]
        print(f"# {t}: {n} rows -> {path}")


if __name__ == "__main__":
    main()
