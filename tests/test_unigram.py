"""Distributed unigram-LM tokenizer == pure-Python reference trainer
(hard-EM Viterbi counts are integers, so equality is EXACT), plus
coverage/encode invariants."""

import math

from skdist_spark.operators.lm import (
    UNI_ITERS,
    UNI_MAX_PIECE,
    UNI_SEED,
    UNI_VOCAB,
    unigram_encode,
    unigram_train,
    unigram_vocab_table,
    viterbi_segment,
)


def _py_viterbi(word, logp, max_piece):
    """Independent DP implementation of the documented spec: maximize
    total logp, exact ties keep the longer last piece."""
    n = len(word)
    score = [0.0] + [-math.inf] * n
    back = [0] + [-1] * n
    for end in range(1, n + 1):
        for start in range(max(0, end - max_piece), end):
            if score[start] == -math.inf:
                continue
            lp = logp.get(word[start:end])
            if lp is None:
                continue
            cand = score[start] + lp
            if cand > score[end]:
                score[end], back[end] = cand, start
    if score[n] == -math.inf:
        return list(word)
    out, end = [], n
    while end > 0:
        out.append(word[back[end] : end])
        end = back[end]
    return out[::-1]


def _py_unigram_train(texts, max_piece, seed_size, vocab_size, iters):
    """Serial reference: same seed rule, same hard-EM, same prune."""
    wcount = {}
    for t in texts:
        for w in t.strip().lower().split():
            if w:
                wcount[w] = wcount.get(w, 0) + 1
    weighted = {}
    for w, n in wcount.items():
        for ln in range(1, max_piece + 1):
            for i in range(len(w) - ln + 1):
                p = w[i : i + ln]
                weighted[p] = weighted.get(p, 0) + n
    ranked = sorted(weighted.items(), key=lambda kv: (-kv[1], kv[0]))
    counts = dict(ranked[:seed_size])
    for p, c in weighted.items():
        if len(p) == 1:
            counts[p] = c
    for _ in range(iters):
        total = sum(counts.values())
        logp = {p: math.log(c / total) for p, c in counts.items() if c > 0}
        acc = {}
        for w, n in wcount.items():
            for piece in _py_viterbi(w, logp, max_piece):
                acc[piece] = acc.get(piece, 0) + n
        counts = acc
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        kept = dict(ranked[:vocab_size])
        for p, c in counts.items():
            if len(p) == 1:
                kept[p] = c
        counts = kept
    return sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))


def test_viterbi_spec_matches_independent_dp():
    logp = {"a": -1.0, "b": -1.5, "ab": -1.8, "abc": -2.0, "c": -3.0, "bc": -2.2}
    for w in ("abc", "abcabc", "aabbcc", "cab", "abcb"):
        assert viterbi_segment(w, logp) == _py_viterbi(w, logp, UNI_MAX_PIECE)


def test_viterbi_uncovered_falls_back_to_chars():
    assert viterbi_segment("xyz", {"a": -1.0}) == ["x", "y", "z"]


def test_unigram_train_matches_serial_reference(spark, sf_dir):
    from skdist_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir).select("text")
    got = unigram_train(docs)
    texts = [r["text"] for r in docs.collect()]
    want = _py_unigram_train(
        texts, UNI_MAX_PIECE, UNI_SEED, UNI_VOCAB, UNI_ITERS
    )
    assert got == want


def test_unigram_encode_roundtrip(spark, sf_dir):
    from pyspark.sql import functions as F

    from skdist_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    vocab = unigram_train(docs.select("text"))
    enc = unigram_encode(docs, vocab)
    rows = enc.orderBy("doc_id").limit(20).collect()
    raw = {
        r["doc_id"]: r["joined"]
        for r in docs.select(
            "doc_id",
            F.expr(
                "concat_ws('', filter(split(trim(lower(text)), '\\\\s+'),"
                " x -> x != ''))"
            ).alias("joined"),
        )
        .orderBy("doc_id")
        .limit(20)
        .collect()
    }
    for r in rows:
        # pieces concatenate back to the exact character stream
        assert "".join(r["pieces"]) == raw[r["doc_id"]]
        assert r["n_pieces"] >= r["n_words"] >= 1


def test_unigram_vocab_entry_smoke(spark, sf_dir):
    out = unigram_vocab_table(spark, sf_dir).collect()
    assert len(out) >= 26  # at least full char coverage survives
    counts = [r["count"] for r in out]
    assert counts == sorted(counts, reverse=True)
