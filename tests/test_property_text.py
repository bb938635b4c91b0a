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


def test_scrub_pii_redacts_and_counts(spark):
    """Typed placeholders and per-type counts on hit-positive inputs
    (the parquet corpus is PII-free, so the parity query exercises only
    the zero path; this covers the hits)."""
    from skdist_spark.operators.text import scrub_pii

    rows = [
        (0, "contact bob.smith+x@example.co.uk or call +1 (303) 555-0142 now"),
        (1, "server at 10.0.255.7 and backup 192.168.1.1 ok"),
        (2, "plain text, no pii at all"),
        (3, "two mails a@b.io c@d.org one ip 8.8.8.8"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in scrub_pii(df).collect()}
    assert out[0].n_email == 1 and out[0].n_phone == 1 and out[0].n_ip == 0
    assert "<EMAIL>" in out[0].clean_text and "<PHONE>" in out[0].clean_text
    assert "@" not in out[0].clean_text
    assert out[1].n_ip == 2 and "<IP>" in out[1].clean_text
    assert "10.0.255.7" not in out[1].clean_text
    assert out[2].clean_text == rows[2][1]
    assert out[2].n_email == out[2].n_ip == out[2].n_phone == 0
    assert out[3].n_email == 2 and out[3].n_ip == 1


def test_scrub_pii_duckdb_regex_parity(spark):
    """Java regex (Spark) and RE2 (DuckDB) must agree on the PII
    patterns — the premise of the text_scrub_pii oracle, checked here
    on inputs that actually match."""
    import duckdb

    from skdist_spark.operators.text import (
        PII_EMAIL_RE,
        PII_IP_RE,
        PII_PHONE_RE,
        scrub_pii,
    )

    rows = [
        (0, "x@y.com then 1.2.3.4 then +44 20 7946 0958 end"),
        (1, "no hits"),
        (2, "edge: 999.999.999.999 and a@@b.com and 12-34"),
        (3, "a.b-c_d%e+f@sub.domain.net trailing"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = scrub_pii(df).orderBy("doc_id").toPandas()

    con = duckdb.connect()
    pdf = pd.DataFrame({"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]})
    con.register("docs", pdf)
    exp = con.execute(
        f"""
        WITH s AS (
            SELECT doc_id,
                   len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS n_email,
                   regexp_replace(text, '{PII_EMAIL_RE}', '<EMAIL>', 'g') AS t1
            FROM docs
        ), s2 AS (
            SELECT doc_id, n_email,
                   len(regexp_extract_all(t1, '{PII_IP_RE}')) AS n_ip,
                   regexp_replace(t1, '{PII_IP_RE}', '<IP>', 'g') AS t2
            FROM s
        )
        SELECT doc_id,
               regexp_replace(t2, '{PII_PHONE_RE}', '<PHONE>', 'g') AS clean_text,
               n_email, n_ip,
               len(regexp_extract_all(t2, '{PII_PHONE_RE}')) AS n_phone
        FROM s2 ORDER BY doc_id
        """
    ).df()
    for col in ("clean_text", "n_email", "n_ip", "n_phone"):
        assert list(got[col]) == list(exp[col]), col


def test_temperature_sample_flattens_mixture(spark):
    """alpha=0.5 must lift small groups' keep-RATE above large groups',
    keep totals near the budget, and be retry-deterministic."""
    from skdist_spark.operators.text import temperature_sample

    rows = [(i, "big" if i < 9000 else "small") for i in range(9500)]
    df = spark.createDataFrame(rows, "doc_id long, grp string").repartition(8)
    kept = temperature_sample(df, "doc_id", "grp", alpha=0.5, budget_frac=0.5)
    counts = {r.grp: r.n for r in kept.groupBy("grp").count().withColumnRenamed("count", "n").collect()}
    # keep-rates: small group must be kept at a higher RATE than big
    assert counts["small"] / 500 > counts["big"] / 9000
    total = counts["big"] + counts["small"]
    assert 0.35 * 9500 < total < 0.65 * 9500
    again = temperature_sample(df, "doc_id", "grp", alpha=0.5, budget_frac=0.5)
    assert sorted(r.doc_id for r in kept.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_dedup_lines_drops_boilerplate_keeps_order(spark):
    from skdist_spark.operators.text import dedup_lines

    docs = [
        (1, "COOKIE BANNER\nunique prose one\nfooter text"),
        (2, "COOKIE BANNER\nunique prose two\nfooter text"),
        (3, "COOKIE BANNER\nonly boilerplate here too\nfooter text"),
        (4, "totally unique document\nwith two lines"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in dedup_lines(df, max_df=1).collect()}
    # lines repeated across docs are gone; unique lines survive in order
    assert out[1]["clean_text"] == "unique prose one"
    assert out[2]["clean_text"] == "unique prose two"
    assert out[3]["clean_text"] == "only boilerplate here too"
    assert out[4]["clean_text"] == "totally unique document\nwith two lines"
    assert out[1]["n_lines_dropped"] == 2 and out[4]["n_lines_dropped"] == 0
    # every doc is retained even if fully boilerplate
    assert set(out) == {1, 2, 3, 4}


def test_dedup_lines_max_df_threshold(spark):
    from skdist_spark.operators.text import dedup_lines

    docs = [(i, "shared pair line\nself " + str(i)) for i in range(1, 3)] + [
        (3, "shared pair line\nself 3"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    # max_df=3: the shared line appears in exactly 3 docs -> kept
    out3 = {r["doc_id"]: r["n_lines_dropped"] for r in dedup_lines(df, max_df=3).collect()}
    assert out3 == {1: 0, 2: 0, 3: 0}
    out2 = {r["doc_id"]: r["n_lines_dropped"] for r in dedup_lines(df, max_df=2).collect()}
    assert out2 == {1: 1, 2: 1, 3: 1}


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=12),
        min_size=1,
        max_size=4,
    )
)
def test_balance_floor_identity_property(spark, per_user_deltas):
    """Property: the running-min window identity equals the sequential
    clamp for arbitrary signed delta sequences."""
    from skdist_spark.plans.behavior import balance_with_floor

    rows = [
        (uid, seq, d)
        for uid, deltas in enumerate(per_user_deltas)
        for seq, d in enumerate(deltas)
    ]
    df = spark.createDataFrame(rows, "uid long, seq long, delta long")
    got = {
        (r.uid, r.seq): r.balance
        for r in balance_with_floor(df, "uid", ["seq"], "delta").collect()
    }
    for uid, deltas in enumerate(per_user_deltas):
        bal = 0
        for seq, d in enumerate(deltas):
            bal = max(0, bal + d)
            assert got[(uid, seq)] == bal
