"""Deterministic 100x upsample of sf0.1 into a local sf10 profile set
— the THIRD scale decade (VERDICT r7 #1: every decade so far exposed
real quadratics the previous one hid).

Same honesty rules as tools/make_sf1.py (read its docstring for the
full rationale), applied at 100 copies in ONE level:

- part-name prefixes must keep every cross-copy pair past the d=2
  edit-distance join: copy c is prefixed with str(c) repeated three
  times ("000 ", "111 ", ..., "121212 ").  Any two distinct copies
  differ in >= 3 characters (equal length: a 1- or 2-digit repeat
  differing anywhere differs in >= 3 of its positions; mixed 3-char vs
  6-char: >= 3 insertions) — so no part ever matches its 99 clones.
- document texts splice a copy-marker word after every 3rd word
  (c > 0): every 3-gram shingle of copy c carries a copy-specific
  token, so cross-copy Jaccard ~ 0 and duplicate GROUPS scale 100x,
  never group SIZE (the corpus-growth shape).
- embeddings get a per-copy diagonal sign flip.  make_sf1's bit
  ``(x * 2654435761) >> (7 + c)`` is copy-count-UNSAFE past c = 56
  (the shift leaves BIGINT range), so this uses the shift-free form:
  dim d of copy c is negated when bit 13 of
  ``knuth_hash(d + 997 * c)`` is set — still a diagonal orthogonal
  matrix per copy (within-copy cosines exact), still ~half the dims
  flipped between any two copies (cross-copy cosines collapse), valid
  for any copy count.  Copy 0 is identity so the fixed ANN query set
  (vec_id < N_QUERIES) stays a copy-0-only probe against a 100x
  corpus.
- events keep their window (100x density), users shift per copy.

Usage: python tools/make_sf10.py   [writes to .localdata/sf10/, ~1.7 GB]
"""

from __future__ import annotations

import os

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = os.environ.get(
    "SPARK_GRAFT_SF10_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".localdata", "sf10"),
)
COPIES = 100
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
                           CASE WHEN (((i + 997 * c) * 2654435761)
                                       >> 13 & 1) = 1
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
