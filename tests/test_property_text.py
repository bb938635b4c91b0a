"""Hypothesis property tests for the text-pipeline generics: random
synthetic corpora, invariants checked against the declared semantics.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "x1", "y2"])
_text = st.lists(_word, min_size=0, max_size=40).map(" ".join)
_corpus = st.lists(_text, min_size=1, max_size=15)


@given(texts=_corpus)
@_SETTINGS
def test_exact_dedup_canonical_is_min_id(spark, texts):
    from skdist_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    rows = exact_dedup(df).collect()
    by_text: dict[str, list] = {}
    for i, t in enumerate(texts):
        by_text.setdefault(t, []).append(i)
    for r in rows:
        group = by_text[texts[r.doc_id]]
        assert r.canonical_id == min(group)
        assert r.is_dup == (r.doc_id != min(group))


@given(texts=_corpus)
@_SETTINGS
def test_chunking_reconstructs_token_count(spark, texts):
    from skdist_spark.operators.text import (
        CHUNK_STRIDE, CHUNK_TOKENS, chunk_documents,
    )

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    chunks = chunk_documents(df).toPandas()
    for i, t in enumerate(texts):
        n = len(t.split())
        grp = chunks[chunks.doc_id == i].sort_values("chunk_id")
        if n == 0:
            assert len(grp) == 0
            continue
        # stride-advanced windows tile the token range exactly
        expected_chunks = max(-(-(n - CHUNK_TOKENS) // CHUNK_STRIDE), 0) + 1
        assert len(grp) == expected_chunks
        last = grp.iloc[-1]
        assert last.chunk_id * CHUNK_STRIDE + last.n_chunk_tokens == n


@given(lengths=st.lists(st.integers(1, 700), min_size=1, max_size=30))
@_SETTINGS
def test_packing_budget_and_coverage(spark, lengths):
    from skdist_spark.operators.text import pack_sequences

    df = spark.createDataFrame(
        pd.DataFrame({"item": range(len(lengths)), "ln": lengths})
    )
    packed = pack_sequences(df, "item", "ln", budget=512, num_partitions=3).toPandas()
    assert sorted(packed.item) == list(range(len(lengths)))
    fills = (
        packed.merge(pd.DataFrame({"item": range(len(lengths)), "ln": lengths}))
        .groupby("bin_id")
        .agg(fill=("ln", "sum"), biggest=("ln", "max"), n=("ln", "count"))
    )
    for _, r in fills.iterrows():
        assert r.fill <= 512 or (r.n == 1 and r.biggest > 512)


@given(texts=_corpus)
@_SETTINGS
def test_repetition_fold_matches_counter(spark, texts):
    """The sorted-run fold must equal a literal Counter over bigrams."""
    from collections import Counter

    from skdist_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    rows = {r.doc_id: r for r in repetition_stats(df).collect()}
    for i, t in enumerate(texts):
        words = t.split()
        bigrams = [f"{a} {b}" for a, b in zip(words, words[1:])]
        counts = Counter(bigrams)
        r = rows[i]
        assert r.n_bigrams == len(bigrams)
        assert r.top_bigram_n == (max(counts.values()) if counts else 0)
        dup = sum(c for c in counts.values() if c >= 2)
        if bigrams:
            assert r.dup_bigram_ppm == dup * 1_000_000 // len(bigrams)
        else:
            assert r.dup_bigram_ppm == 0


@given(texts=_corpus)
@_SETTINGS
def test_tfidf_rank_matches_reference_scoring(spark, texts):
    """Integer TF-IDF scores must equal the closed-form computation."""
    from skdist_spark.operators.text import tfidf_rank

    terms = ("alpha", "beta")
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got = {r.doc_id: r.score_ppm for r in tfidf_rank(df, terms=terms, k=100).collect()}
    n = len(texts)
    tf = {i: {t: texts[i].split().count(t) for t in terms} for i in range(n)}
    dfreq = {t: sum(1 for i in range(n) if tf[i][t] > 0) for t in terms}
    for i in range(n):
        expect = sum(
            tf[i][t] * (1_000_000 * n // dfreq[t] if dfreq[t] else 0) for t in terms
        )
        if expect > 0:
            assert got[i] == expect
        else:
            assert i not in got
