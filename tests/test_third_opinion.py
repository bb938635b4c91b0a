"""THIRD-opinion lane: independent pure-Python/pandas/numpy replays of
high-value queries, compared against the SPARK results — neither Spark
SQL nor DuckDB is involved in the expectation, so an engine-typing
quirk (like the HUGEINT hash mismatch that cost round 2 two rows)
cannot bias both sides of the check.

Replays reproduce the engines' arithmetic exactly where it matters:
DECIMAL money math via `decimal.Decimal` with HALF_UP (Spark's cast
rounding), cosine via the same sequential left-fold order as the
`aggregate(zip_with(...))` expression, and PageRank via the integer
("pico") fixed-point model shared with the DuckDB oracle.

Runs at sf0.001 in the default lane (seconds per test).
"""

from __future__ import annotations

import hashlib
import re
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
_KNUTH = 2654435761
_MOD32 = 4294967296
_WEEK_EPOCH = pd.Timestamp("2024-01-01")


def _table(name: str) -> pd.DataFrame:
    df = pq.read_table(f"{SF}/{name}.parquet").to_pandas()
    if "ts" in df.columns:
        ts = pd.to_datetime(df["ts"])
        if ts.dt.tz is not None:
            ts = ts.dt.tz_convert("UTC").dt.tz_localize(None)
        df["ts"] = ts
    return df


def _rows(df) -> list[tuple]:
    """Spark DataFrame -> sorted list of plain tuples (sorted columns)."""
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    out = []
    for row in pdf[cols].itertuples(index=False):
        out.append(tuple(None if (isinstance(v, float) and np.isnan(v)) else v
                         for v in row))
    return sorted(out, key=repr), cols


def _dec2(x: float) -> Decimal:
    # Spark cast(double as decimal(18,2)): shortest-repr string, HALF_UP
    return Decimal(repr(float(x))).quantize(Decimal("0.01"), ROUND_HALF_UP)


def _dec6(x: float) -> Decimal:
    return Decimal(repr(float(x))).quantize(Decimal("0.000001"), ROUND_HALF_UP)


def test_third_q6(spark):
    from skdist_spark.plans.tpch import q6

    li = _table("lineitem")
    m = (
        (li["l_shipdate"] >= pd.Timestamp("1996-01-01"))
        & (li["l_shipdate"] < pd.Timestamp("1997-01-01"))
        & (li["l_discount"] >= 0.05)
        & (li["l_discount"] <= 0.07)
        & (li["l_quantity"] < 24)
    )
    total = sum(
        (_dec2(p) * _dec2(d) for p, d in zip(li.loc[m, "l_extendedprice"],
                                             li.loc[m, "l_discount"])),
        Decimal(0),
    )
    got = q6(spark, SF).collect()[0].revenue
    assert got == float(total)


def test_third_dedup_exact(spark):
    from skdist_spark.operators.dedup import dedup_exact

    docs = _table("documents")
    h = docs["text"].map(lambda t: hashlib.md5(t.encode()).hexdigest())
    canon = docs.assign(text_hash=h).groupby("text_hash")["doc_id"].min()
    want = sorted(
        (int(r.doc_id), str(r.text_hash), int(canon[r.text_hash]),
         bool(r.doc_id != canon[r.text_hash]))
        for r in docs.assign(text_hash=h).itertuples()
    )
    got = sorted(
        (r.doc_id, r.text_hash, r.canonical_id, r.is_dup)
        for r in dedup_exact(spark, SF).collect()
    )
    assert got == want


def test_third_text_tokens(spark):
    from skdist_spark.operators.text import QUERIES

    docs = _table("documents")
    bpe = re.compile(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]", re.ASCII)
    want = {}
    for r in docs.itertuples():
        ws = [t for t in re.split(r"\s+", r.text.strip(), flags=re.ASCII) if t]
        want[int(r.doc_id)] = (
            len(ws),
            len(bpe.findall(r.text)),
            len(set(ws)),
            len(r.text),
        )
    got = {
        r.doc_id: (r.n_tokens_ws, r.n_tokens_bpe, r.n_tokens_distinct,
                   r.n_chars_measured)
        for r in QUERIES["text_tokens"](spark, SF).collect()
    }
    assert got == want


def test_third_sample_documents(spark):
    from skdist_spark.operators.text import (
        QUERIES, SAMPLE_DEFAULT_PERMILLE, SAMPLE_PERMILLE,
    )

    docs = _table("documents")
    keep = docs[
        (docs["doc_id"] * _KNUTH) % _MOD32 % 1000
        < docs["lang"].map(lambda s: SAMPLE_PERMILLE.get(s, SAMPLE_DEFAULT_PERMILLE))
    ]
    want = {
        lang: (len(g), int(g["n_chars"].sum()))
        for lang, g in keep.groupby("lang")
    }
    got = {
        r.lang: (r.n_docs, r.sum_chars)
        for r in QUERIES["sample_documents"](spark, SF).collect()
    }
    assert got == want


def test_third_user_streaks(spark):
    from skdist_spark.plans.behavior import QUERIES

    ev = _table("events")
    days = (
        ev.assign(d=(ev["ts"].dt.normalize() - _WEEK_EPOCH).dt.days)[
            ["user_id", "d"]
        ]
        .drop_duplicates()
        .sort_values(["user_id", "d"])
    )
    want = {}
    for uid, g in days.groupby("user_id"):
        ds = g["d"].to_numpy()
        runs = np.split(ds, np.flatnonzero(np.diff(ds) != 1) + 1)
        want[int(uid)] = (
            int(ds.size), len(runs), int(max(len(r) for r in runs))
        )
    got = {
        r.user_id: (r.active_days, r.n_streaks, r.longest_streak)
        for r in QUERIES["user_streaks"](spark, SF).collect()
    }
    assert got == want


def test_third_weekly_revenue_wow(spark):
    from skdist_spark.plans.behavior import QUERIES

    ev = _table("events")
    p = ev[ev["event_type"] == "purchase"].copy()
    p["week"] = (p["ts"].dt.normalize() - _WEEK_EPOCH).dt.days // 7
    weekly = {
        int(wk): float(sum((_dec6(v) for v in g["value"]), Decimal(0)))
        for wk, g in p.groupby("week")
    }
    want = []
    prev = None
    for wk in sorted(weekly):
        rev = weekly[wk]
        if prev is None:
            want.append((wk, rev, None, None))
        else:
            want.append((
                wk,
                rev,
                float(Decimal(repr(prev)).quantize(Decimal("0.000001"), ROUND_HALF_UP)),
                float(Decimal(repr((rev - prev) / prev * 100)).quantize(
                    Decimal("0.000001"), ROUND_HALF_UP)),
            ))
        prev = rev
    got = [
        (r.week, r.revenue, r.prev_revenue, r.pct_change)
        for r in QUERIES["weekly_revenue_wow"](spark, SF).collect()
    ]
    assert got == want


def test_third_growth_accounting(spark):
    from skdist_spark.plans.behavior import QUERIES

    ev = _table("events")
    wk = ev.assign(week=(ev["ts"].dt.normalize() - _WEEK_EPOCH).dt.days // 7)[
        ["user_id", "week"]
    ].drop_duplicates()
    by_user = {u: sorted(g["week"]) for u, g in wk.groupby("user_id")}
    max_week = int(wk["week"].max())
    agg: dict[int, list[int]] = {}

    def slot(w):
        return agg.setdefault(int(w), [0, 0, 0, 0])

    for weeks in by_user.values():
        first = weeks[0]
        for i, w in enumerate(weeks):
            s = slot(w)
            if w == first:
                s[0] += 1
            elif weeks[i - 1] == w - 1:
                s[1] += 1
            else:
                s[2] += 1
            if i + 1 == len(weeks) or weeks[i + 1] > w + 1:
                if w + 1 <= max_week:
                    slot(w + 1)[3] += 1
    want = sorted((w, *v) for w, v in agg.items())
    got = [
        (r.week, r.n_new, r.n_retained, r.n_resurrected, r.n_churned)
        for r in QUERIES["growth_accounting"](spark, SF).collect()
    ]
    assert got == want


def test_third_user_behavior_entropy(spark):
    import math

    from skdist_spark.plans.behavior import QUERIES

    ev = _table("events")
    counts = ev.groupby(["user_id", "event_type"]).size()
    want = {}
    for uid, g in counts.groupby(level=0):
        cs = g.to_numpy()
        n = int(cs.sum())
        ent = sum(-(c / n) * math.log(c / n) for c in cs)
        want[int(uid)] = (
            n, len(cs),
            float(Decimal(repr(ent)).quantize(Decimal("0.000001"), ROUND_HALF_UP)),
        )
    got = {
        r.user_id: (r.n_events, r.n_types, r.entropy_nats)
        for r in QUERIES["user_behavior_entropy"](spark, SF).collect()
    }
    assert got == want


def test_third_ann_topk(spark):
    """Cosine replayed with the SAME sequential left-fold float order
    as the Spark `aggregate(zip_with(...))` expression — doubles must
    match bit-for-bit, not approximately."""
    from skdist_spark.operators.similarity import N_QUERIES, TOP_K, QUERIES

    emb = _table("embeddings").sort_values("vec_id")
    ids = emb["vec_id"].to_numpy()
    vecs = [np.asarray(v, dtype=np.float64) for v in emb["embedding"]]

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def fold_norm(a):
        acc = 0.0
        for x in a:
            acc = acc + x * x
        return float(np.sqrt(acc))

    norms = [fold_norm(v) for v in vecs]
    want = []
    for qi in range(len(ids)):
        if ids[qi] >= N_QUERIES:
            continue
        scored = []
        for ci in range(len(ids)):
            if ids[ci] == ids[qi]:
                continue
            cos = fold_dot(vecs[qi], vecs[ci]) / (norms[qi] * norms[ci])
            scored.append((-cos, int(ids[ci])))
        scored.sort()
        for rank, (negcos, nid) in enumerate(scored[:TOP_K], start=1):
            want.append((int(ids[qi]), nid, -negcos, rank))
    got = [
        (r.query_id, r.neighbor_id, r.cosine, r.rank)
        for r in QUERIES["ann_topk"](spark, SF).collect()
    ]
    assert got == want


def test_third_event_pagerank(spark):
    """Integer ("pico") replay of the DECIMAL fixed point — the same
    model the DuckDB oracle implements, derived independently here."""
    from skdist_spark.operators.graph import QUERIES

    ev = _table("events").sort_values(["user_id", "ts", "event_id"])
    P = 10**12

    def half_up(num, den):
        return (2 * num + den) // (2 * den)

    edges: dict[tuple[str, str], int] = {}
    for _, g in ev.groupby("user_id"):
        types = g["event_type"].tolist()
        for a, b in zip(types, types[1:]):
            edges[(a, b)] = edges.get((a, b), 0) + 1
    out_w: dict[str, int] = {}
    for (s, _), n in edges.items():
        out_w[s] = out_w.get(s, 0) + n
    frac = {
        st: half_up(n * 10**10, out_w[st[0]]) * 100 for st, n in edges.items()
    }
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    n = len(nodes)
    base = int(Decimal((1.0 - 0.85) / n).scaleb(12).quantize(
        Decimal(1), ROUND_HALF_UP))
    rank = {
        v: int(Decimal(1.0 / n).scaleb(12).quantize(Decimal(1), ROUND_HALF_UP))
        for v in nodes
    }
    for _ in range(8):
        dangling = sum(rank[v] for v in nodes if v not in out_w)
        redist = half_up(half_up(dangling * 10**20, n), 10**20)
        contrib = {v: 0 for v in nodes}
        for (s, t), f in frac.items():
            contrib[t] += rank[s] * f
        rank = {
            v: half_up(base * P + 850000000000 * (half_up(contrib[v], P) + redist), P)
            for v in nodes
        }
    want = [
        (v, round(float(Decimal(rank[v]) / P), 9)) for v in nodes
    ]
    got = [
        (r.event_type, r.rank)
        for r in QUERIES["event_pagerank"](spark, SF).collect()
    ]
    assert got == want


def test_third_text_blocklist(spark):
    from skdist_spark.operators.text import (
        BLOCKLIST, BLOCKLIST_MAX_PERMILLE, QUERIES,
    )

    docs = _table("documents")
    want = {}
    for r in docs.itertuples():
        toks = [t for t in re.split(r"\s+", r.text.strip(), flags=re.ASCII) if t]
        blocked = sum(1 for t in toks if t.lower() in BLOCKLIST)
        n = len(toks)
        want[int(r.doc_id)] = (
            n,
            blocked,
            (blocked * 1000) // n if n else 0,
            n > 0 and blocked * 1000 > BLOCKLIST_MAX_PERMILLE * n,
        )
    got = {
        r.doc_id: (r.n_tokens, r.n_blocked, r.blocked_permille, r.dropped)
        for r in QUERIES["text_blocklist"](spark, SF).collect()
    }
    assert got == want


def test_third_text_keyword_tags(spark):
    from skdist_spark.operators.text import KEYWORD_TAGS, QUERIES

    docs = _table("documents")
    want = set()
    for r in docs.itertuples():
        toks = [
            t.lower()
            for t in re.split(r"\s+", r.text.strip(), flags=re.ASCII)
            if t
        ]
        for tag, kws in KEYWORD_TAGS.items():
            hits = sum(1 for t in toks if t in kws)
            if hits:
                want.add((int(r.doc_id), tag, hits))
    got = {
        (r.doc_id, r.tag, r.n_hits)
        for r in QUERIES["text_keyword_tags"](spark, SF).collect()
    }
    assert got == want


def test_third_user_balance_resets(spark):
    import math

    from skdist_spark.plans.behavior import QUERIES

    ev = _table("events")
    ev = ev[ev["event_type"].isin(["purchase", "view"])].sort_values(
        ["user_id", "ts", "event_id"]
    )
    want = {}
    for uid, g in ev.groupby("user_id"):
        bal = peak = floors = 0
        for r in g.itertuples():
            cents = int(math.floor(r.value * 100))
            d = cents if r.event_type == "purchase" else -cents
            bal = bal + d
            if bal < 0:
                bal = 0
            if bal == 0 and d < 0:
                floors += 1
            peak = max(peak, bal)
        want[int(uid)] = (len(g), bal, peak, floors)
    got = {
        r.user_id: (
            r.n_moves, r.final_balance_cents,
            r.peak_balance_cents, r.n_floor_hits,
        )
        for r in QUERIES["user_balance_resets"](spark, SF).collect()
    }
    assert got == want


def test_third_orders_fingerprint(spark):
    from skdist_spark.operators.quality import QUERIES

    orders = _table("orders")
    buckets: dict[str, list[str]] = {}
    for r in orders.itertuples():
        d = hashlib.md5(
            f"{r.o_orderkey}|{r.o_custkey}|{r.o_orderstatus}|{r.o_orderpriority}".encode()
        ).hexdigest()
        buckets.setdefault(d[:2], []).append(d)
    want = {
        b: (len(ds), hashlib.md5("".join(sorted(ds)).encode()).hexdigest())
        for b, ds in buckets.items()
    }
    root = hashlib.md5(
        "".join(want[b][1] for b in sorted(want)).encode()
    ).hexdigest()
    want["(root)"] = (len(orders), root)
    got = {
        r.bucket: (r.n_rows, r.digest)
        for r in QUERIES["orders_fingerprint"](spark, SF).collect()
    }
    assert got == want


def test_third_funnel_conversion_intervals(spark):
    import math

    from skdist_spark.plans.behavior import FUNNEL_STEPS, QUERIES

    ev = _table("events").sort_values(["user_id", "ts"])
    counts = [0] * (len(FUNNEL_STEPS) + 1)
    for _, g in ev.groupby("user_id"):
        counts[0] += 1
        prev_t = None
        depth = 0
        for step in FUNNEL_STEPS:
            rows = g[g["event_type"] == step]
            if prev_t is not None:
                rows = rows[rows["ts"] > prev_t]
            if rows.empty:
                break
            prev_t = rows["ts"].min()
            depth += 1
            counts[depth] += 1
    z = 1.959963984540054
    want = []
    for i, step in enumerate(FUNNEL_STEPS, start=1):
        k, n = counts[i], counts[i - 1]
        if n == 0:
            continue
        p = k / n
        denom = 1.0 + z * z / n
        center = p + z * z / (2.0 * n)
        half = z * math.sqrt((p * (1.0 - p) + z * z / (4.0 * n)) / n)
        want.append((
            i, step, k, n, round(p, 6),
            round((center - half) / denom, 6),
            round((center + half) / denom, 6),
        ))
    got = [
        (r.step_idx, r.step_name, r.n_completed, r.n_entered,
         r.conv_rate, r.wilson_lo, r.wilson_hi)
        for r in QUERIES["funnel_conversion_intervals"](spark, SF).collect()
    ]
    assert got == want


def test_third_dedup_remove_spans(spark):
    """Pure-Python span removal: per-doc 5-gram hashing, cross-doc
    duplicate detection, covered-position union, and ordered
    reassembly — no Spark SQL, no DuckDB."""
    from skdist_spark.operators.dedup import SPAN_N, QUERIES

    docs = _table("documents")
    toks = {
        int(r.doc_id): [
            t for t in re.split(r"\s+", r.text.strip(), flags=re.ASCII) if t
        ]
        for r in docs.itertuples()
    }
    gram_docs: dict[str, set[int]] = {}
    gram_pos: dict[int, list[tuple[int, str]]] = {}
    for did, ts in toks.items():
        lst = []
        for i in range(len(ts) - SPAN_N + 1):
            h = hashlib.md5(" ".join(ts[i : i + SPAN_N]).encode()).hexdigest()[:16]
            gram_docs.setdefault(h, set()).add(did)
            lst.append((i, h))
        gram_pos[did] = lst
    want = {}
    for did, ts in toks.items():
        covered = set()
        for i, h in gram_pos[did]:
            if len(gram_docs[h]) >= 2:
                covered.update(range(i, i + SPAN_N))
        kept = [t for i, t in enumerate(ts) if i not in covered]
        want[did] = (
            len(ts),
            len(covered),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.clean_md5)
        for r in QUERIES["dedup_remove_spans"](spark, SF).collect()
    }
    assert got == want


def test_third_bm25_search(spark):
    """Pure-Python BM25: tf/df/dl recomputed from the raw text, idf and
    score arithmetic replayed in the same double operation order as
    the Spark expression, HALF_UP rounding at 6 dp."""
    import math

    from skdist_spark.operators.retrieval import (
        BM25_B, BM25_K1, BM25_TERMS, BM25_TOP, QUERIES,
    )

    docs = _table("documents")
    toks = {
        int(r.doc_id): [
            t for t in re.split(r"\s+", r.text.strip(), flags=re.ASCII) if t
        ]
        for r in docs.itertuples()
    }
    dl = {d: len(ts) for d, ts in toks.items()}
    n_docs = len(dl)
    # integer doc lengths sum exactly in doubles -> avg is order-free
    avgdl = float(sum(dl.values())) / float(n_docs)
    tf = {
        d: {t: ts.count(t) for t in BM25_TERMS if t in ts}
        for d, ts in toks.items()
    }
    dfreq = {
        t: sum(1 for d in tf if t in tf[d]) for t in BM25_TERMS
    }
    scored = []
    for d, terms in tf.items():
        if not terms:
            continue
        s = 0.0
        for t, f in terms.items():
            idf = math.log(
                (float(n_docs) - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1.0
            )
            s += idf * (f * (BM25_K1 + 1.0)) / (
                f + BM25_K1 * (1.0 - BM25_B + BM25_B * dl[d] / avgdl)
            )
        scored.append(
            (
                float(Decimal(repr(s)).quantize(
                    Decimal("0.000001"), ROUND_HALF_UP)),
                d,
                len(terms),
            )
        )
    want = [
        (d, s, nt)
        for s, d, nt in sorted(scored, key=lambda x: (-x[0], x[1]))[:BM25_TOP]
    ]
    got = [
        (r.doc_id, r.bm25, r.n_terms_hit)
        for r in QUERIES["bm25_search"](spark, SF).collect()
    ]
    assert got == want


def test_third_inverted_postings(spark):
    from skdist_spark.operators.retrieval import INDEX_TOP_WORDS, QUERIES

    docs = _table("documents")
    postings: dict[str, dict[int, list[int]]] = {}
    for r in docs.itertuples():
        ws = [t for t in re.split(r"\s+", r.text.strip(), flags=re.ASCII) if t]
        for pos, w in enumerate(ws, start=1):
            postings.setdefault(w, {}).setdefault(int(r.doc_id), []).append(pos)
    top = sorted(postings, key=lambda w: (-len(postings[w]), w))[:INDEX_TOP_WORDS]
    want = sorted(
        (
            w,
            len(postings[w]),
            d,
            len(ps),
            ",".join(str(p) for p in sorted(ps)),
        )
        for w in top
        for d, ps in postings[w].items()
    )
    got = sorted(
        (r.word, r.df, r.doc_id, r.tf, r.positions)
        for r in QUERIES["inverted_postings"](spark, SF).collect()
    )
    assert got == want


def test_third_phrase_search(spark):
    from skdist_spark.operators.retrieval import PHRASE, QUERIES

    docs = _table("documents")
    w1, w2 = PHRASE
    want = {}
    for r in docs.itertuples():
        ws = [t for t in re.split(r"\s+", r.text.strip(), flags=re.ASCII) if t]
        n = sum(1 for a, b in zip(ws, ws[1:]) if a == w1 and b == w2)
        if n:
            want[int(r.doc_id)] = n
    got = {
        r.doc_id: r.n_occurrences
        for r in QUERIES["phrase_search_docs"](spark, SF).collect()
    }
    assert got == want


def test_third_hybrid_search_rrf(spark):
    """Pure-Python hybrid RRF: BM25 top-20 + sequential-fold cosine
    top-20, fused as sum 1/(60 + rank) — ranks are integers so the
    fusion replays exactly."""
    import math

    from skdist_spark.operators.retrieval import (
        BM25_B, BM25_K1, BM25_TERMS, QUERIES, RRF_DEPTH, RRF_K,
        RRF_QUERY_VEC, RRF_TOP,
    )

    # ---- text modality: BM25 top-RRF_DEPTH (same replay as bm25) ----
    docs = _table("documents")
    toks = {
        int(r.doc_id): [
            t for t in re.split(r"\s+", r.text.strip(), flags=re.ASCII) if t
        ]
        for r in docs.itertuples()
    }
    dl = {d: len(ts) for d, ts in toks.items()}
    avgdl = float(sum(dl.values())) / float(len(dl))
    tf = {
        d: {t: ts.count(t) for t in BM25_TERMS if t in ts}
        for d, ts in toks.items()
    }
    dfreq = {t: sum(1 for d in tf if t in tf[d]) for t in BM25_TERMS}
    scored = []
    for d, terms in tf.items():
        if not terms:
            continue
        s = 0.0
        for t, f in terms.items():
            idf = math.log(
                (float(len(dl)) - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1.0
            )
            s += idf * (f * (BM25_K1 + 1.0)) / (
                f + BM25_K1 * (1.0 - BM25_B + BM25_B * dl[d] / avgdl)
            )
        scored.append((float(Decimal(repr(s)).quantize(
            Decimal("0.000001"), ROUND_HALF_UP)), d))
    text_top = sorted(scored, key=lambda x: (-x[0], x[1]))[:RRF_DEPTH]
    r_text = {d: i + 1 for i, (_, d) in enumerate(text_top)}

    # ---- vector modality: sequential-fold cosine top-RRF_DEPTH ----
    emb = _table("embeddings").sort_values("vec_id")
    vecs = {int(r.vec_id): [float(x) for x in r.embedding]
            for r in emb.itertuples()}

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def fold_norm(a):
        acc = 0.0
        for x in a:
            acc = acc + x * x
        return math.sqrt(acc)

    qv = vecs[RRF_QUERY_VEC]
    qn = fold_norm(qv)
    cos = sorted(
        ((-(fold_dot(qv, v) / (qn * fold_norm(v))), d)
         for d, v in vecs.items() if d != RRF_QUERY_VEC),
    )[:RRF_DEPTH]
    r_vec = {d: i + 1 for i, (_, d) in enumerate(cos)}

    # ---- fusion ----
    fused = []
    for d in set(r_text) | set(r_vec):
        s = (1.0 / (RRF_K + r_text[d]) if d in r_text else 0.0) + (
            1.0 / (RRF_K + r_vec[d]) if d in r_vec else 0.0
        )
        fused.append((
            d,
            r_text.get(d),
            r_vec.get(d),
            float(Decimal(repr(s)).quantize(Decimal("0.000001"), ROUND_HALF_UP)),
        ))
    want = sorted(fused, key=lambda x: (-x[3], x[0]))[:RRF_TOP]
    got = [
        (r.doc_id, r.r_text, r.r_vec, r.rrf_score)
        for r in QUERIES["hybrid_search_rrf"](spark, SF).collect()
    ]
    assert got == want


def test_third_doc_winnowing(spark):
    """Pure-Python winnowing replay: split/md5/window-min with ordinary
    list code, no SQL engine on the expectation side."""
    from skdist_spark.operators.dedup import (
        WINNOW_K,
        WINNOW_W,
        doc_winnowing,
    )

    got, _ = _rows(doc_winnowing(spark, SF))
    docs = _table("documents")
    want = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        wd = [w for w in re.split(r"\s+", str(text).strip()) if w]
        n_kg = max(len(wd) - (WINNOW_K - 1), 1)
        kg = [
            hashlib.md5(" ".join(wd[i:i + WINNOW_K]).encode()).hexdigest()
            for i in range(n_kg)
        ]
        n_win = max(len(kg) - (WINNOW_W - 1), 1)
        fps = sorted({min(kg[j:j + WINNOW_W]) for j in range(n_win)})
        want.append((
            int(doc_id),
            hashlib.md5("".join(fps).encode()).hexdigest(),
            min(fps),
            len(fps),
        ))
    # spark columns sorted: doc_id, fp_digest, min_fp, n_fingerprints
    assert got == sorted(want, key=repr)


def test_third_source_length_ks(spark):
    """KS replay straight from the definition: per-pair ECDF max gap
    over numpy arrays."""
    from skdist_spark.operators.stats import source_length_ks

    got, _ = _rows(source_length_ks(spark, SF))
    docs = _table("documents")
    by_src = {s: np.sort(g["n_chars"].to_numpy()) for s, g in docs.groupby("source")}
    want = []
    for sa in by_src:
        for sb in by_src:
            if sa >= sb:
                continue
            xs, ys = by_src[sa], by_src[sb]
            allv = np.union1d(xs, ys)
            fa = np.searchsorted(xs, allv, side="right") / len(xs)
            fb = np.searchsorted(ys, allv, side="right") / len(ys)
            d = float(np.max(np.abs(fa - fb)))
            crit = 1.358 * np.sqrt((len(xs) + len(ys)) / (len(xs) * len(ys)))
            want.append((d, int(len(xs)), int(len(ys)), bool(d > crit), sa, sb))
    # spark columns sorted: ks_d, n_a, n_b, reject_05, source_a, source_b
    assert len(got) == len(want)
    got = sorted(got, key=lambda t: (t[4], t[5]))
    want = sorted(want, key=lambda t: (t[4], t[5]))
    for g, w in zip(got, want):
        assert g[4] == w[4] and g[5] == w[5]
        assert g[1] == w[1] and g[2] == w[2]
        assert abs(g[0] - w[0]) < 1e-12 and g[3] == w[3]


def test_third_doc_filter_funnel(spark):
    from skdist_spark.operators.text import FUNNEL_RULES, doc_filter_funnel

    docs = _table("documents")
    h = docs["text"].map(lambda t: hashlib.md5(t.encode()).hexdigest())
    canon = docs.assign(text_hash=h).groupby("text_hash")["doc_id"].min()
    drops = {r: 0 for r in FUNNEL_RULES}
    for r in docs.assign(text_hash=h).itertuples():
        wd = [w for w in re.split(r"\s+", r.text.strip()) if w]
        n = len(wd)
        mwl = len(r.text.replace(" ", "")) / n
        dr = len(set(wd)) / n
        if n < 10:
            drops["too_short"] += 1
        elif n > 1000:
            drops["too_long"] += 1
        elif mwl < 2.0 or mwl > 12.0:
            drops["word_len"] += 1
        elif dr < 0.1:
            drops["low_diversity"] += 1
        elif r.doc_id != canon[r.text_hash]:
            drops["exact_dup"] += 1
    remaining, want = len(docs), []
    for i, rule in enumerate(FUNNEL_RULES):
        remaining -= drops[rule]
        want.append((i + 1, rule, drops[rule], remaining))
    got = [
        (r.stage, r.rule, r.n_dropped, r.n_remaining)
        for r in doc_filter_funnel(spark, SF).collect()
    ]
    assert got == want


def test_third_event_training_pairs(spark):
    from skdist_spark.operators.sampling import event_training_pairs

    ev = _table("events").sort_values(["user_id", "ts", "event_id"])
    want = []
    for uid, grp in ev.groupby("user_id"):
        types = list(grp["event_type"])
        eids = list(grp["event_id"])
        for i in range(1, len(types)):
            ctx = types[max(0, i - 3):i]
            want.append((int(uid), int(eids[i]), len(ctx), " ".join(ctx), types[i]))
    want.sort()
    got = sorted(
        (r.user_id, r.event_id, r.n_context, r.context_seq, r.target)
        for r in event_training_pairs(spark, SF).collect()
    )
    assert got == want


def test_third_user_split_summary(spark):
    from skdist_spark.operators.sampling import user_split_summary

    ev = _table("events")
    b = (ev["user_id"].astype("int64") * _KNUTH) % _MOD32 % 1000
    split = np.where(b < 800, "train", np.where(b < 900, "val", "test"))
    want = []
    for s in ("test", "train", "val"):
        sub = ev[split == s]
        sv = sum((_dec6(v) for v in sub["value"]), Decimal(0))
        want.append((s, int(sub["user_id"].nunique()), len(sub), float(sv)))
    got = sorted(
        (r.split, r.n_users, r.n_events, r.sum_value)
        for r in user_split_summary(spark, SF).collect()
    )
    assert got == sorted(want)


def test_third_decontaminate_exact_ngrams(spark):
    from skdist_spark.operators.text import EXACT_CONTAM_N, decontaminate_exact_ngrams

    docs = _table("documents")

    def grams(text: str) -> set:
        wd = [w for w in re.split(r"\s+", text.strip()) if w]
        n = EXACT_CONTAM_N
        if len(wd) <= n:
            return {" ".join(wd)}
        return {" ".join(wd[i:i + n]) for i in range(len(wd) - n + 1)}

    bench = set()
    for r in docs[docs["doc_id"] % 20 == 0].itertuples():
        bench |= grams(r.text)
    want = []
    for r in docs[docs["doc_id"] % 20 != 0].itertuples():
        hit = len(grams(r.text) & bench)
        if hit:
            want.append((int(r.doc_id), hit))
    got = sorted(
        (r.doc_id, r.n_colliding)
        for r in decontaminate_exact_ngrams(spark, SF).collect()
    )
    assert got == sorted(want)


def test_third_dedup_minhash_eval(spark):
    from skdist_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        N_BANDS,
        N_HASHES,
        N_SEEDS,
        SHINGLE,
        dedup_minhash_eval,
    )

    docs = _table("documents")

    def shingles(text: str) -> list:
        wd = [w for w in re.split(r"\s+", text.strip()) if w]
        n = SHINGLE
        k = max(len(wd) - n + 1, 1)
        out, seen = [], set()
        for i in range(k):
            s = " ".join(wd[i:i + n])
            if s not in seen:
                seen.add(s)
                out.append(s)
        return out

    sh = {int(r.doc_id): shingles(r.text) for r in docs.itertuples()}
    # signatures: per-seed md5 digests, min over 8-hex windows
    bands = {}
    for did, ss in sh.items():
        sigs = []
        for seed in range(N_SEEDS):
            digs = [hashlib.md5(f"{seed}:{s}".encode()).hexdigest() for s in ss]
            for win in range(4):
                sigs.append(min(d[win * 8:(win + 1) * 8] for d in digs))
        assert len(sigs) == N_HASHES
        bands[did] = [sigs[2 * b] + sigs[2 * b + 1] for b in range(N_BANDS)]
    ids = sorted(sh)
    cand = set()
    index = {}
    for did in ids:
        for b, bh in enumerate(bands[did]):
            for other in index.get((b, bh), []):
                cand.add((other, did))
            index.setdefault((b, bh), []).append(did)
    truth = set()
    for i, a in enumerate(ids):
        sa = set(sh[a])
        for b_ in ids[i + 1:]:
            sb = set(sh[b_])
            inter = len(sa & sb)
            if inter * 1000 >= (len(sa) + len(sb) - inter) * int(
                round(JACCARD_THRESHOLD * 1000)
            ):
                truth.add((a, b_))
    hits = len(cand & truth)
    want = (
        len(truth),
        len(cand),
        hits,
        int(np.floor(1e6 * hits / max(len(cand), 1))),
        int(np.floor(1e6 * hits / max(len(truth), 1))),
    )
    r = dedup_minhash_eval(spark, SF).collect()[0]
    assert (r.n_truth, r.n_candidates, r.n_hits, r.precision_ppm, r.recall_ppm) == want


def test_third_user_value_theilsen(spark):
    from skdist_spark.operators.stats import user_value_theilsen

    ev = _table("events")
    base = pd.Timestamp("2024-01-01")
    ev = ev.assign(
        x=(ev["ts"].dt.normalize() - base).dt.days,
        y=np.floor(ev["value"] * 1e6).astype("int64"),
    )
    daily = ev.groupby(["user_id", "x"])["y"].sum().reset_index()
    want = []
    for uid, grp in daily.groupby("user_id"):
        xs = grp["x"].to_numpy(dtype=float)
        ys = grp["y"].to_numpy(dtype=float)
        if len(xs) < 2:
            continue
        slopes = [
            (ys[j] - ys[i]) / (xs[j] - xs[i])
            for i in range(len(xs))
            for j in range(len(xs))
            if xs[i] < xs[j]
        ]
        med = round(float(np.median(slopes)), 6)
        want.append(
            (int(uid), len(xs), len(slopes), round(med / 1e6, 6))
        )
    got = sorted(
        (r.user_id, r.n_points, r.n_pairs, r.slope_per_day)
        for r in user_value_theilsen(spark, SF).collect()
    )
    assert got == sorted(want)


def test_third_ann_diversified(spark):
    from skdist_spark.operators.similarity import (
        MMR_CANDIDATES,
        MMR_DIV_THRESHOLD,
        N_QUERIES,
        TOP_K,
        ann_diversified,
    )

    emb = _table("embeddings")
    vecs = {int(r.vec_id): np.asarray(list(r.embedding), dtype=np.float64)
            for r in emb.itertuples()}
    want = []
    for qid in sorted(v for v in vecs if v < N_QUERIES):
        qv = vecs[qid]
        qn = qv / np.linalg.norm(qv)
        scored = sorted(
            ((float(qn @ (v / np.linalg.norm(v))), nid)
             for nid, v in vecs.items() if nid != qid),
            key=lambda t: (-t[0], t[1]),
        )[:MMR_CANDIDATES]
        kept = []
        kept_vecs = []
        for cosv, nid in scored:
            nv = vecs[nid] / np.linalg.norm(vecs[nid])
            if any(float(nv @ kv) > MMR_DIV_THRESHOLD for kv in kept_vecs):
                continue
            kept_vecs.append(nv)
            kept.append((qid, len(kept) + 1, nid, round(cosv, 6)))
            if len(kept) >= TOP_K:
                break
        want.extend(kept)
    got = [
        (r.query_id, r.div_rank, r.neighbor_id, r.cosine)
        for r in ann_diversified(spark, SF).collect()
    ]
    # cosine computed sequentially in Spark (left-fold) vs numpy dot:
    # compare ids/ranks exactly, cosines to 1e-6
    assert [(a, b, c) for a, b, c, _ in got] == [(a, b, c) for a, b, c, _ in want]
    for (_, _, _, g), (_, _, _, w) in zip(got, want):
        assert abs(g - w) < 1e-6


def test_third_doc_clustering_coeff(spark):
    from skdist_spark.operators.graph import doc_clustering_coeff

    docs = _table("documents")

    def shingles(text: str) -> set:
        wd = [w for w in re.split(r"\s+", text.strip()) if w]
        k = max(len(wd) - 2, 1)
        return {" ".join(wd[i:i + 3]) for i in range(k)}

    sh = {int(r.doc_id): (shingles(r.text), r.source) for r in docs.itertuples()}
    ids = sorted(sh)
    adj = {}
    for i, a in enumerate(ids):
        sa, srca = sh[a]
        for b in ids[i + 1:]:
            sb, srcb = sh[b]
            if srca != srcb:
                continue
            inter = len(sa & sb)
            if inter and inter / (len(sa) + len(sb) - inter) >= 0.2:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
    want = []
    for v in sorted(adj):
        nb = adj[v]
        d = len(nb)
        if d < 2:
            continue
        t = sum(1 for x in nb for y in nb if x < y and y in adj.get(x, ()))
        want.append((v, d, t, round(2 * t / (d * (d - 1)), 6)))
    got = [
        (r.doc_id, r.degree, r.n_triangles, r.lcc)
        for r in doc_clustering_coeff(spark, SF).collect()
    ]
    assert got == want


def test_third_langid_isotonic(spark):
    from skdist_spark.operators.quality import langid_isotonic
    from skdist_spark.operators.text import LANG_PROFILES

    docs = _table("documents")

    def replay_lang(text):
        wd = [w for w in re.split(r"\s+", text.strip()) if w]
        hits = {lang: sum(1 for w in wd if w in set(sw))
                for lang, sw in LANG_PROFILES.items()}
        # the engines' tie order: LANG_PROFILES dict order, 'und' at 0
        top = max(hits.values())
        best = "und" if top == 0 else next(
            lang for lang, h in hits.items() if h == top
        )
        return wd, best, top

    pts = {}
    for r in docs.itertuples():
        wd, pred, nh = replay_lang(r.text)
        if not wd:
            continue
        conf = round(nh / len(wd), 6)
        pts.setdefault(r.lang, []).append((conf, 1 if pred == r.lang else 0))

    def pav_replay(xy):
        # independent PAV formulation: repeatedly scan-and-merge
        from collections import defaultdict
        agg = defaultdict(lambda: [0.0, 0])
        for x, y in xy:
            agg[x][0] += y
            agg[x][1] += 1
        items = sorted(agg.items())
        segs = [[x, x, s, c] for x, (s, c) in items]
        changed = True
        while changed:
            changed = False
            i = 0
            while i < len(segs) - 1:
                a, b = segs[i], segs[i + 1]
                if a[2] * b[3] >= b[2] * a[3]:  # mean_a >= mean_b: violator
                    segs[i] = [a[0], b[1], a[2] + b[2], a[3] + b[3]]
                    del segs[i + 1]
                    changed = True
                    if i > 0:
                        i -= 1
                else:
                    i += 1
        return [
            (lo, hi, (2_000_000 * int(s) + int(c)) // (2 * int(c)) / 1e6, int(c))
            for lo, hi, s, c in segs
        ]

    want = []
    for lang in sorted(pts):
        for lo, hi, rate, c in pav_replay(pts[lang]):
            want.append((lang, lo, hi, rate, c))
    got = [
        (r.lang, r.x_lo, r.x_hi, r.rate, r.n_obs)
        for r in langid_isotonic(spark, SF).collect()
    ]
    assert got == want
    # fitted rates are monotone non-decreasing within each language
    for lang in sorted(pts):
        rates = [r for (lg, _, _, r, _) in got if lg == lang]
        assert rates == sorted(rates)


def test_third_event_value_bootstrap(spark):
    """Pure-pandas replay of the Poisson-bootstrap CI: same unit
    totals, same Knuth-hash uniforms, same integer Poisson CDF, same
    order-statistic ranks — no Spark SQL, no DuckDB."""
    from skdist_spark.operators.stats import (
        _POIS_CDF_PPM, BOOT_ALPHA_PPM, BOOT_REPS, event_value_bootstrap,
    )

    ev = _table("events")
    ev["y"] = np.floor(ev["value"] * 1_000_000).astype(np.int64)
    units = ev.groupby(["event_type", "user_id"], as_index=False)["y"].sum()

    expected = {}
    for etype, grp in units.groupby("event_type"):
        salt = ord(etype[0])
        uid = grp["user_id"].to_numpy(dtype=np.int64)
        y = grp["y"].to_numpy(dtype=np.int64)
        means = []
        for r in range(BOOT_REPS):
            u = (
                (uid % 2147483647).astype(object) * _KNUTH
                + (r * 31 + salt) * 40503
            ) % _MOD32 % 1_000_000
            w = np.full(len(uid), 5, dtype=np.int64)
            for k in reversed(range(len(_POIS_CDF_PPM))):
                w[np.asarray(u, dtype=np.int64) < _POIS_CDF_PPM[k]] = k
            sw = int(w.sum())
            if sw > 0:
                means.append(
                    float(_dec6(float((w * y).sum()) / (float(sw) * 1e6)))
                )
        means.sort()
        n = len(means)
        cut = n * BOOT_ALPHA_PPM // 1_000_000
        expected[etype] = (
            len(grp),
            float(_dec6(float(y.sum()) / (len(grp) * 1e6))),
            means[cut],
            means[n - cut - 1],
        )

    got = {
        row["event_type"]: (
            row["n_units"], row["mean_value"], row["boot_lo"], row["boot_hi"]
        )
        for row in event_value_bootstrap(spark, SF).collect()
    }
    assert set(got) == set(expected)
    for etype, (n, mean, lo, hi) in expected.items():
        gn, gmean, glo, ghi = got[etype]
        assert gn == n
        assert abs(gmean - mean) < 1e-9, etype
        assert abs(glo - lo) < 1e-9 and abs(ghi - hi) < 1e-9, etype
        assert glo <= gmean <= ghi, etype


def test_third_daily_revenue_mannkendall(spark):
    """Pure-numpy Mann-Kendall: exact S, tie term, z — neither engine."""
    from skdist_spark.operators.tsa import daily_revenue_mannkendall

    o = _table("orders")
    o["x"] = (pd.to_datetime(o["o_orderdate"]) - pd.Timestamp("1992-01-01")).dt.days
    cents = (
        o.assign(c=(o["o_totalprice"].map(_dec2) * 100).map(int))
        .groupby("x")["c"]
        .sum()
        .sort_index()
    )
    y = cents.to_numpy(dtype=object)
    n = len(y)
    s = sum(
        (1 if y[j] > y[i] else (-1 if y[j] < y[i] else 0))
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties = pd.Series(y).value_counts()
    tie_term = int(sum(t * (t - 1) * (2 * t + 5) for t in ties))
    var = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
    z = (s - 1) / var**0.5 if s > 0 else ((s + 1) / var**0.5 if s < 0 else 0.0)
    r = daily_revenue_mannkendall(spark, SF).collect()[0]
    assert r.n == n and r.s == s
    assert abs(r.var_s - round(var, 6)) < 1e-6
    assert abs(r.z - round(z, 6)) < 1e-6
    assert r.trend_05 == (abs(z) > 1.959964)


def test_third_source_token_js(spark):
    """Pure-python JS divergence over exact token counts."""
    import math
    from collections import Counter

    from skdist_spark.operators.lm import source_token_js

    docs = _table("documents")
    counts, totals = {}, {}
    for src, grp in docs.groupby("source"):
        c = Counter()
        for t in grp["text"]:
            c.update(w for w in t.strip().lower().split() if w)
        counts[src] = c
        totals[src] = sum(c.values())
    want = {}
    srcs = sorted(counts)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            vocab = set(counts[a]) | set(counts[b])
            js = 0.0
            for w in vocab:
                pa = counts[a][w] / totals[a]
                pb = counts[b][w] / totals[b]
                if counts[a][w]:
                    js += pa * math.log(2 * pa / (pa + pb))
                if counts[b][w]:
                    js += pb * math.log(2 * pb / (pa + pb))
            want[(a, b)] = (totals[a], totals[b], len(vocab), round(js * 0.5, 6))
    got = {
        (r.source_a, r.source_b): (
            r.n_tokens_a, r.n_tokens_b, r.vocab_union, r.js_nats
        )
        for r in source_token_js(spark, SF).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][:3] == want[k][:3], k
        assert abs(got[k][3] - want[k][3]) < 2e-6, k


def test_third_part_return_rate_eb(spark):
    """Pure-pandas EB shrinkage: integer-ppm moments, MoM prior."""
    from skdist_spark.operators.stats import part_return_rate_eb

    li = _table("lineitem")
    g = li.groupby("l_partkey").agg(
        n=("l_returnflag", "size"),
        k=("l_returnflag", lambda s: int((s == "R").sum())),
    )
    g["r_ppm"] = (g["k"] * 1_000_000) // g["n"]
    n_keys = len(g)
    sr, srr = int(g["r_ppm"].sum()), int((g["r_ppm"] ** 2).sum())
    mean = sr / n_keys / 1e6
    var = srr / n_keys / 1e12 - mean * mean
    strength = max(mean * (1 - mean) / var - 1.0, 1.0) if var > 0 else 1.0
    alpha = strength * mean
    g["shrunk"] = ((g["k"] + alpha) / (g["n"] + strength)).round(6)
    want = g.sort_values(["shrunk", "l_partkey"], ascending=[False, True]).head(50)
    got = part_return_rate_eb(spark, SF).collect()
    assert len(got) == len(want)
    for r, (pk, row) in zip(got, want.iterrows()):
        assert r.l_partkey == pk and r.n == row["n"] and r.k == row["k"]
        assert abs(r.shrunk_rate - row["shrunk"]) < 2e-6


def test_third_daily_spearman(spark):
    from skdist_spark.operators.stats import daily_spearman

    ev = _table("events")
    daily = (
        ev.assign(day=ev["ts"].dt.normalize())
        .groupby("day")
        .apply(
            lambda g: pd.Series(
                {
                    "clicks": int((g["event_type"] == "click").sum()),
                    "rev": int(
                        sum(
                            int(np.floor(v * 1_000_000))
                            for v in g.loc[
                                g["event_type"] == "purchase", "value"
                            ]
                        )
                    ),
                }
            ),
            include_groups=False,
        )
        .reset_index()
        .sort_values("day")
    )
    rx = daily.sort_values(["clicks", "day"]).reset_index()
    ry = daily.sort_values(["rev", "day"]).reset_index()
    pos_x = {i: r + 1 for r, i in enumerate(rx["index"])}
    pos_y = {i: r + 1 for r, i in enumerate(ry["index"])}
    n = len(daily)
    sum_d2 = sum((pos_x[i] - pos_y[i]) ** 2 for i in daily.index)
    rho = round(1 - 6 * sum_d2 / (n**3 - n), 6)
    got = daily_spearman(spark, SF).collect()[0]
    assert (got["n"], got["sum_d2"], got["rho"]) == (n, sum_d2, rho)


def test_third_daily_kendall(spark):
    from skdist_spark.operators.stats import daily_kendall

    ev = _table("events")
    per = {}
    for _, r in ev.iterrows():
        d = r["ts"].normalize()
        c, v = per.get(d, (0, 0))
        per[d] = (
            c + (1 if r["event_type"] == "click" else 0),
            v
            + (
                int(np.floor(r["value"] * 1_000_000))
                if r["event_type"] == "purchase"
                else 0
            ),
        )
    days = sorted(per)
    C = D = tx = ty = n0 = 0
    for i in range(len(days)):
        for j in range(i + 1, len(days)):
            (xa, ya), (xb, yb) = per[days[i]], per[days[j]]
            n0 += 1
            s = (xa - xb) * (ya - yb)
            C += s > 0
            D += s < 0
            tx += xa == xb
            ty += ya == yb
    tau = round((C - D) / np.sqrt(float((n0 - tx) * (n0 - ty))), 6)
    got = daily_kendall(spark, SF).collect()[0]
    assert (
        got["n_pairs"],
        got["concordant"],
        got["discordant"],
        got["ties_x"],
        got["ties_y"],
        got["tau_b"],
    ) == (n0, C, D, tx, ty, tau)


def test_third_brand_modularity(spark):
    from skdist_spark.operators.graph import brand_copurchase_modularity

    li = _table("lineitem")[["l_orderkey", "l_partkey"]].drop_duplicates()
    part = _table("part")[["p_partkey", "p_brand"]]
    brand = dict(zip(part["p_partkey"], part["p_brand"]))
    from collections import Counter

    pair_count = Counter()
    for _, grp in li.groupby("l_orderkey"):
        ps = sorted(set(grp["l_partkey"]))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_count[(ps[i], ps[j])] += 1
    edges = [p for p, c in pair_count.items() if c >= 2]
    m = len(edges)
    got = {
        r["brand"]: (
            r["n_nodes"],
            r["intra_edges"],
            r["degree_sum"],
            r["q_numer"],
        )
        for r in brand_copurchase_modularity(spark, SF).collect()
    }
    if m == 0:
        assert got == {}
        return
    from collections import defaultdict

    deg = defaultdict(int)
    nodes = defaultdict(set)
    intra = defaultdict(int)
    for a, b in edges:
        ca, cb = brand[a], brand[b]
        deg[ca] += 1
        deg[cb] += 1
        nodes[ca].add(a)
        nodes[cb].add(b)
        if ca == cb:
            intra[ca] += 1
    want = {
        c: (len(nodes[c]), intra[c], deg[c], 4 * m * intra[c] - deg[c] ** 2)
        for c in deg
    }
    assert got == want


def test_third_event_value_winsorized(spark):
    from skdist_spark.operators.stats import event_value_winsorized

    ev = _table("events")
    got = {
        r["event_type"]: (
            r["n"],
            r["n_clamped_each_side"],
            r["winsorized_mean"],
        )
        for r in event_value_winsorized(spark, SF).collect()
    }
    for et, grp in ev.groupby("event_type"):
        v = sorted(
            (int(np.floor(x * 1_000_000)), eid)
            for x, eid in zip(grp["value"], grp["event_id"])
        )
        n = len(v)
        k = n * 100_000 // 1_000_000
        vals = [t[0] for t in v]
        wins = vals[k : n - k]
        total = sum(wins) + k * (vals[k] + vals[n - k - 1])
        mean = round(total / n / 1_000_000, 6)
        assert got[et] == (n, k, mean)


def test_third_tfidf_doc_pairs(spark):
    from collections import Counter, defaultdict

    from skdist_spark.operators.retrieval import (
        COSINE_DF_PRUNE,
        COSINE_MIN,
        COSINE_NGRAM,
        tfidf_doc_pairs,
    )

    docs = _table("documents")
    postings = defaultdict(Counter)  # gram -> {doc: tf}
    for r in docs.itertuples():
        w = [t for t in r.text.strip().split() if t]
        for i in range(max(len(w) - COSINE_NGRAM + 1, 1)):
            g = " ".join(w[i : i + COSINE_NGRAM])
            postings[g][r.doc_id] += 1
    pruned = {g: c for g, c in postings.items() if len(c) <= COSINE_DF_PRUNE}
    norms = Counter()
    dots = Counter()
    for g, c in pruned.items():
        items = sorted(c.items())
        for d, tf in items:
            norms[d] += tf * tf
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                (da, ta), (db, tb) = items[i], items[j]
                dots[(da, db)] += ta * tb
    want = sorted(
        (da, db, dot, round(dot / np.sqrt(float(norms[da] * norms[db])), 6))
        for (da, db), dot in dots.items()
        if dot / np.sqrt(float(norms[da] * norms[db])) >= COSINE_MIN
    )
    got = sorted(
        (r["doc_a"], r["doc_b"], r["dot"], r["cosine"])
        for r in tfidf_doc_pairs(spark, SF).collect()
    )
    assert got == want and len(got) > 0


def test_third_time_decay_attribution(spark):
    import math
    from collections import defaultdict

    from skdist_spark.plans.behavior import (
        DECAY_LOOKBACK_DAYS,
        time_decay_attribution,
    )

    ev = _table("events")
    by_user = defaultdict(list)
    for r in ev.itertuples():
        by_user[r.user_id].append(r)
    per_channel = defaultdict(lambda: [0, 0, 0])  # ppm, cents, touches
    for rows in by_user.values():
        purchases = [r for r in rows if r.event_type == "purchase"]
        touches = [r for r in rows if r.event_type != "purchase"]
        for p in purchases:
            p_day = p.ts.normalize()
            p_cents = int(math.floor(p.value * 100))
            wc = defaultdict(int)
            nt = defaultdict(int)
            for t in touches:
                age = (p_day - t.ts.normalize()).days
                if t.ts < p.ts and age <= DECAY_LOOKBACK_DAYS:
                    wc[t.event_type] += 1 << (DECAY_LOOKBACK_DAYS - age)
                    nt[t.event_type] += 1
            W = sum(wc.values())
            for ch, w in wc.items():
                per_channel[ch][0] += w * 1_000_000 // W
                per_channel[ch][1] += p_cents * w // W
                per_channel[ch][2] += nt[ch]
    got = {
        r["channel"]: (
            r["conversions_ppm"],
            r["revenue_cents"],
            r["n_touches"],
        )
        for r in time_decay_attribution(spark, SF).collect()
    }
    want = {ch: tuple(v) for ch, v in per_channel.items()}
    assert got == want and len(got) > 0


def test_third_gopher_quality_flags(spark):
    """Pure-Python replay of the Gopher rule ledger: same rule set,
    integer cross-multiplication thresholds, exact-equality against
    the Spark result."""
    from skdist_spark.operators.text import (
        GOPHER_MAX_WORDS,
        GOPHER_MIN_WORDS,
        GOPHER_STOPWORDS,
        gopher_quality_flags,
    )

    docs = _table("documents")
    fails = {
        "too_few_words": 0, "too_many_words": 0, "mean_word_len_low": 0,
        "mean_word_len_high": 0, "symbol_ratio_high": 0,
        "alpha_share_low": 0, "stopword_hits_low": 0, "pass_all": 0,
    }
    stops = set(GOPHER_STOPWORDS)
    alpha = re.compile(r"[a-zA-Z]")
    # NULL text is excluded on both engines (ADVICE r4) — mirror that
    for text in docs["text"].dropna():
        wd = [w for w in re.split(r"\s+", text.strip()) if w]
        n = len(wd)
        sum_wlen = sum(len(w) for w in wd)
        n_alpha = sum(1 for w in wd if alpha.search(w))
        n_stop = sum(1 for w in wd if w in stops)
        n_sym = text.count("#") + text.count("...")
        flags = {
            "too_few_words": n < GOPHER_MIN_WORDS,
            "too_many_words": n > GOPHER_MAX_WORDS,
            "mean_word_len_low": sum_wlen < 3 * n,
            "mean_word_len_high": sum_wlen > 10 * n,
            "symbol_ratio_high": n_sym * 10 > n,
            "alpha_share_low": n_alpha * 10 < n * 8,
            "stopword_hits_low": n_stop < 2,
        }
        for k, v in flags.items():
            fails[k] += int(v)
        fails["pass_all"] += int(not any(flags.values()))
    n_docs = len(docs)
    want = sorted(
        (rule, cnt, cnt * 1_000_000 // n_docs)
        for rule, cnt in fails.items()
    )
    got = [
        (r.rule, r.n_docs_flagged, r.share_ppm)
        for r in gopher_quality_flags(spark, SF).collect()
    ]
    assert got == want


def test_third_c4_quality_flags(spark):
    """Pure-Python replay of the C4 rule ledger: same doc-level
    renderings of the published line/page rules, exact equality."""
    from skdist_spark.operators.text import (
        C4_MIN_SENTENCES,
        C4_MIN_WORDS_PER_LINE,
        _C4_POLICY_PHRASES,
        c4_quality_flags,
    )

    docs = _table("documents")
    names = (
        "too_few_sentences", "short_lines_majority",
        "unterminated_lines_majority", "lorem_ipsum", "curly_brace",
        "javascript_mention", "policy_phrase",
    )
    fails = {n: 0 for n in (*names, "pass_all")}
    texts = docs["text"].dropna()
    for text in texts:
        # strip(' ') not strip(): the Spark/DuckDB faces use trim(),
        # which removes only SPACES — a bare strip() would also eat
        # \r/\t and silently diverge on CRLF or tab-padded lines
        lines = [l for l in text.split("\n") if l.strip(" ")]
        n_lines = len(lines)
        n_term = text.count(".") + text.count("!") + text.count("?")
        n_short = sum(
            1
            for l in lines
            if len([w for w in l.split(" ") if w]) < C4_MIN_WORDS_PER_LINE
        )
        n_unterm = sum(
            1 for l in lines if not l.strip(" ").endswith((".", "!", "?", '"'))
        )
        low = text.lower()
        flags = {
            "too_few_sentences": n_term < C4_MIN_SENTENCES,
            "short_lines_majority": 2 * n_short > n_lines,
            "unterminated_lines_majority": 2 * n_unterm > n_lines,
            "lorem_ipsum": "lorem ipsum" in low,
            "curly_brace": "{" in text,
            "javascript_mention": "javascript" in low,
            "policy_phrase": any(p in low for p in _C4_POLICY_PHRASES),
        }
        for k, v in flags.items():
            fails[k] += int(v)
        fails["pass_all"] += int(not any(flags.values()))
    n_docs = len(texts)
    want = sorted(
        (rule, cnt, cnt * 1_000_000 // n_docs) for rule, cnt in fails.items()
    )
    got = [
        (r.rule, r.n_docs_flagged, r.share_ppm)
        for r in c4_quality_flags(spark, SF).collect()
    ]
    assert got == want
