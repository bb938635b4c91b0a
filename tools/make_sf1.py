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
- part names get a per-copy 4-char prefix ("000 ", "111 ", ...) so the
  edit-distance join does not see 10 identical copies of every name:
  the repeated digit means any two copies differ in >= 3 characters
  (> the d=2 threshold; a first attempt used "c0: "/"c1: ", which are
  edit distance 1 apart and made every part match its 9 copies).
  Copy 0 is prefixed too, so all copies behave alike.
- document texts get a copy-marker word spliced after EVERY 3rd word
  (c > 0), so every 3-gram shingle of copy c contains a copy-specific
  token: cross-copy Jaccard collapses to ~0 while within-copy dup and
  near-dup structure is preserved verbatim (both members of a dup pair
  receive the identical transformation).  MinHash dedup then sees ~10x
  more dup GROUPS, not 10x BIGGER groups — matching how duplicate mass
  actually grows with corpus size.  (A first attempt ROTATED the word
  list; that preserves all but ~3 boundary shingles, so every copy was
  a 0.95-Jaccard near-dup of every other and minhash_dedup exploded to
  212k pairs / 209 s at sf1.)
- embeddings are transformed by a per-copy DIAGONAL SIGN FLIP (dim d
  negated when bit (c + d) of knuth_hash(d + 64c) is set): a diagonal
  orthogonal matrix, so every within-copy cosine/L2 relation is
  preserved EXACTLY while cross-copy cosines collapse toward 0 —
  near-dup and SemDeDup workloads see 10x more clusters, never
  10 bit-identical copies of each vector; vec_id < N_QUERIES query
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
                   c || '' || c || '' || c || ' ' || p_name AS p_name,
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
            SELECT doc_id, text, lang, source,
                   CAST(length(text) AS BIGINT) AS n_chars
            FROM (
                SELECT doc_id + c * {SPAN} AS doc_id,
                       CASE WHEN c = 0 THEN text ELSE array_to_string(
                           flatten(list_transform(
                               range(0, CAST(ceil(len(w) / 3.0) AS BIGINT)),
                               g -> list_concat(
                                   w[g * 3 + 1 : g * 3 + 3],
                                   ['zq' || c]
                               ))), ' ') END AS text,
                       lang, source
                FROM (SELECT *, string_split(text, ' ') AS w FROM documents),
                     {copies}
            )""",
        "embeddings": f"""
            SELECT vec_id + c * {SPAN} AS vec_id,
                   CASE WHEN c = 0 THEN embedding ELSE
                       list_apply(embedding, (e, i) -> CAST(
                           CASE WHEN ((((i + 64 * c) * 2654435761)
                                       >> (7 + c)) & 1) = 1
                                THEN -e ELSE e END AS FLOAT))
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
