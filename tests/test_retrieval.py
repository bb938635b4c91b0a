"""Retrieval operators on crafted corpora with closed-form answers."""

import math

from skdist_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    bm25_rank,
    build_inverted_index,
    phrase_search,
)

DOCS = [
    (1, "hash join beats nested loop join"),
    (2, "sort merge join and hash join and hash join"),
    (3, "full scan only"),
    (4, "hash then join but not adjacent hash"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def test_inverted_index_postings(spark):
    idx = {
        (r["word"], r["doc_id"]): (r["tf"], r["positions"])
        for r in build_inverted_index(_df(spark)).collect()
    }
    assert idx[("join", 2)] == (3, [3, 6, 9])
    assert idx[("hash", 1)] == (1, [1])
    assert idx[("hash", 4)] == (1, [1]) or idx[("hash", 4)][0] == 2
    assert ("join", 3) not in idx


def test_phrase_search_adjacency_only(spark):
    rows = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_search(_df(spark), ("hash", "join")).collect()
    }
    # doc 4 has both words but never adjacent; doc 2 has two occurrences
    assert rows == {1: 1, 2: 2}


def test_bm25_matches_manual_formula(spark):
    got = {r["doc_id"]: r["bm25"] for r in bm25_rank(_df(spark), ("hash",)).collect()}
    # manual: N=4, df(hash)=3, dl = [6, 9, 3, 7], avgdl = 6.25
    n, dfr = 4, 3
    idf = math.log((n - dfr + 0.5) / (dfr + 0.5) + 1.0)
    def score(tf, dl):
        return round(
            idf * (tf * (BM25_K1 + 1.0))
            / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / 6.25)),
            6,
        )
    assert got == {1: score(1, 6), 2: score(2, 9), 4: score(2, 7)}
