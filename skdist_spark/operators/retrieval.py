"""Full-text retrieval primitives: inverted index construction,
positional phrase search, and BM25 ranking.

The search-engine face of the documents table: build the posting
lists a retrieval system serves from, answer phrase queries from
POSITIONS (index-side, never re-scanning text), and rank documents
with the standard BM25 function — all as DataFrame programs whose
oracles recompute the same answers by an INDEPENDENT direct-scan
algorithm, so a hash match proves index-based retrieval equals
ground truth.

Scale posture (100 TB):
- The index build is one scan + one shuffle on the word key (posexplode
  materializes (doc, word, position) once; tf/positions pre-aggregate
  per (word, doc) with map-side combine).
- Phrase search joins the TWO relevant posting lists on doc_id —
  work is bounded by the posting sizes of the queried words, not the
  corpus (the point of an inverted index); adjacency is an
  arrays_overlap on shifted positions, zero re-tokenization.
- BM25 needs only (tf, df, dl, avgdl): integer counts + one scalar
  broadcast; scoring is map-side; top-k is TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table

# same tokenization as the dedup/text family (trim + whitespace split)
_SPARK_WORDS = "filter(split(trim(text), '\\\\s+'), x -> x != '')"
_DUCK_WORDS = "list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '')"

INDEX_TOP_WORDS = 10  # posting rows shipped by the demo query
PHRASE = ("hash", "join")
BM25_TERMS = ("hash", "join", "scan")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP = 20


def build_inverted_index(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Posting lists: one row per (word, doc) with term frequency and
    the sorted 1-based token positions.  The shuffle key is the word;
    positions aggregate with map-side combine."""
    words = _SPARK_WORDS.replace("text", text_col)
    tokens = df.select(
        F.col(id_col), F.posexplode(F.expr(words)).alias("pos0", "word")
    ).select(id_col, "word", (F.col("pos0") + 1).alias("pos"))
    return tokens.groupBy("word", id_col).agg(
        F.count(F.lit(1)).alias("tf"),
        F.sort_array(F.collect_list("pos")).alias("positions"),
    )


def inverted_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: posting lists of the ``INDEX_TOP_WORDS`` most
    frequent words (highest document frequency, then word; the word
    cut is TakeOrderedAndProject)."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    index = build_inverted_index(docs)
    top_words = F.broadcast(
        index.groupBy("word")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), F.asc("word"))
        .limit(INDEX_TOP_WORDS)
    )
    return (
        index.join(top_words, "word")
        .select(
            "word",
            "df",
            "doc_id",
            "tf",
            # comma-joined string, not array<int>: the driver's value-hash
            # is representation-strict and engines disagree on list renders
            F.array_join("positions", ",").alias("positions"),
        )
        .orderBy("word", "doc_id")
    )


def phrase_search(
    df: DataFrame,
    phrase: tuple[str, str] = PHRASE,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Docs containing the exact two-word phrase, answered from the
    inverted index: join the two words' postings on the doc and test
    position adjacency (p, p+1) — no text re-scan.  Returns
    (doc_id, n_occurrences)."""
    w1, w2 = phrase
    index = build_inverted_index(df, id_col, text_col)
    p1 = index.where(F.col("word") == w1).select(
        id_col, F.col("positions").alias("pos1")
    )
    p2 = index.where(F.col("word") == w2).select(
        id_col, F.col("positions").alias("pos2")
    )
    n_adj = F.expr(
        "size(array_intersect(transform(pos1, p -> p + 1), pos2))"
    )
    return (
        p1.join(p2, id_col)
        .select(F.col(id_col), n_adj.alias("n_occurrences"))
        .where(F.col("n_occurrences") > 0)
        .orderBy(id_col)
    )


def phrase_search_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: every document containing the phrase
    '"hash join"', with its occurrence count."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    return phrase_search(docs)


def bm25_rank(
    df: DataFrame,
    terms: tuple[str, ...] = BM25_TERMS,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
    top: int = BM25_TOP,
) -> DataFrame:
    """BM25 top-k documents for a bag of query terms.

    idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1)  (Robertson-Sparck
    Jones, the Lucene variant that never goes negative);
    score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).
    tf, df, dl are exact integers; N/avgdl come from one broadcast
    scalar row.  Rounded to 6 decimals (per-term doubles are
    bit-identical; a doc sums at most |terms| of them).
    """
    words = _SPARK_WORDS.replace("text", text_col)
    # EAGER checkpoint: base (the regex word split over the corpus)
    # feeds dl (referenced by stats AND the score join) and tokens
    # (referenced by tf, itself read twice via dfreq) — without it the
    # split re-ran up to 4x per query (snapshot: 4-6 FileScans across
    # the bm25 family).
    base = df.select(F.col(id_col), F.expr(words).alias("wd")).localCheckpoint(
        eager=True
    )
    dl = base.select(id_col, F.size("wd").alias("dl"))
    tokens = base.select(id_col, F.explode("wd").alias("word"))
    tf = (
        tokens.where(F.col("word").isin(*terms))
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("dfr"))
    stats = F.broadcast(
        dl.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg(F.col("dl").cast("double")).alias("avgdl"),
        )
    )
    idf = "ln((CAST(n_docs AS DOUBLE) - dfr + 0.5) / (dfr + 0.5) + 1.0)"
    term_score = (
        f"{idf} * (tf * ({k1} + 1.0))"
        f" / (tf + {k1} * (1.0 - {b} + {b} * dl / avgdl))"
    )
    return (
        tf.join(F.broadcast(dfreq), "word")
        .join(dl, id_col)
        .crossJoin(stats)
        .groupBy(id_col)
        .agg(
            F.round(F.sum(F.expr(term_score)), 6).alias("bm25"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(top)
    )


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: BM25 top-20 for the terms (hash, join, scan)."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    return bm25_rank(docs)


RRF_K = 60          # the standard reciprocal-rank-fusion constant
RRF_DEPTH = 20      # per-modality candidate depth
RRF_TOP = 10
RRF_QUERY_VEC = 0   # query embedding id (doc i's embedding is vec i)

_DOT_FOLD = "aggregate(zip_with(q.v, c.v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
_NORM_FOLD = "sqrt(aggregate(transform({0}, x -> x * x), 0D, (acc, x) -> acc + x))"
_DUCK_DOT_FOLD = (
    "list_reduce(list_transform(range(1, 65), i -> {a}[i] * {b}[i]),"
    " (x, y) -> x + y)"
)
_DUCK_NORM_FOLD = "sqrt(list_reduce(list_transform({0}, x -> x * x), (x, y) -> x + y))"


def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 keyword ranks fused with vector-cosine
    ranks by reciprocal-rank fusion, rrf = sum 1/(RRF_K + rank) over
    the modalities that returned the doc.

    The modern search default (lexical recall + semantic recall beat
    either alone, and RRF needs no score calibration because it only
    consumes RANKS).  Both candidate lists are top-RRF_DEPTH; the
    fusion is one full-outer join on the doc id; ranks are integers so
    the fused scores are bit-identical across engines.  Ties break on
    doc_id.
    """
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    # rank recomputed from the scores (a row_number over the already-
    # limited frame would depend on arrival order)
    scored = bm25_rank(docs, top=RRF_DEPTH).select("doc_id", "bm25")
    w_text = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    text_ranks = scored.withColumn("r_text", F.row_number().over(w_text)).select(
        "doc_id", "r_text"
    )

    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = F.broadcast(emb.where(F.col("vec_id") == RRF_QUERY_VEC)).alias("q")
    c = emb.where(F.col("vec_id") != RRF_QUERY_VEC).alias("c")
    cos = f"{_DOT_FOLD} / ({_NORM_FOLD.format('q.v')} * {_NORM_FOLD.format('c.v')})"
    vec_scored = q.join(c, F.lit(True)).select(
        F.col("c.vec_id").alias("doc_id"), F.expr(cos).alias("cosine")
    )
    w_vec = Window.orderBy(F.desc("cosine"), F.asc("doc_id"))
    vec_ranks = (
        vec_scored.withColumn("r_vec", F.row_number().over(w_vec))
        .where(F.col("r_vec") <= RRF_DEPTH)
        .select("doc_id", "r_vec")
    )
    rrf = (
        f"COALESCE(1.0D / ({RRF_K} + r_text), 0.0D)"
        f" + COALESCE(1.0D / ({RRF_K} + r_vec), 0.0D)"
    )
    return (
        text_ranks.join(vec_ranks, "doc_id", "full_outer")
        .select(
            "doc_id",
            "r_text",
            "r_vec",
            F.expr(f"ROUND({rrf}, 6)").alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(RRF_TOP)
    )


def _hybrid_oracle_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    idf = "ln((CAST(n_docs AS DOUBLE) - dfr + 0.5) / (dfr + 0.5) + 1.0)"
    term_score = (
        f"{idf} * (tf * ({BM25_K1} + 1.0))"
        f" / (tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl / avgdl))"
    )
    dot = _DUCK_DOT_FOLD.format(a="q.v", b="c.v")
    rrf = (
        f"COALESCE(1.0 / ({RRF_K} + r_text), 0.0)"
        f" + COALESCE(1.0 / ({RRF_K} + r_vec), 0.0)"
    )
    return f"""
        WITH base AS (
            SELECT doc_id, {_DUCK_WORDS} AS wd FROM documents
        ), dl AS (
            SELECT doc_id, CAST(len(wd) AS INTEGER) AS dl FROM base
        ), tf AS (
            SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
            FROM (SELECT doc_id, unnest(wd) AS word FROM base)
            WHERE word IN ({terms})
            GROUP BY doc_id, word
        ), dfreq AS (
            SELECT word, CAST(COUNT(*) AS BIGINT) AS dfr FROM tf GROUP BY word
        ), stats AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl
            FROM dl
        ), bm AS (
            SELECT doc_id, ROUND(SUM({term_score}), 6) AS bm25
            FROM tf JOIN dfreq USING (word) JOIN dl USING (doc_id) CROSS JOIN stats
            GROUP BY doc_id
            ORDER BY bm25 DESC, doc_id ASC LIMIT {RRF_DEPTH}
        ), text_ranks AS (
            SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS INTEGER) AS r_text
            FROM bm
        ), e AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
        ), vec_scored AS (
            SELECT c.vec_id AS doc_id,
                   {dot} / ({_DUCK_NORM_FOLD.format('q.v')} * {_DUCK_NORM_FOLD.format('c.v')}) AS cosine
            FROM (SELECT v FROM e WHERE vec_id = {RRF_QUERY_VEC}) q
            CROSS JOIN (SELECT vec_id, v FROM e WHERE vec_id != {RRF_QUERY_VEC}) c
        ), vec_ranks AS (
            SELECT doc_id, r_vec FROM (
                SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id ASC) AS INTEGER) AS r_vec
                FROM vec_scored
            ) WHERE r_vec <= {RRF_DEPTH}
        )
        SELECT doc_id, r_text, r_vec, ROUND({rrf}, 6) AS rrf_score
        FROM text_ranks FULL OUTER JOIN vec_ranks USING (doc_id)
        ORDER BY rrf_score DESC, doc_id ASC
        LIMIT {RRF_TOP}
    """


def _postings_oracle_sql() -> str:
    return f"""
        WITH tokens AS (
            SELECT doc_id, unnest({_DUCK_WORDS}) AS word,
                   unnest(range(1, len({_DUCK_WORDS}) + 1)) AS pos
            FROM documents
        ), index AS (
            SELECT word, doc_id, CAST(COUNT(*) AS BIGINT) AS tf,
                   list_sort(list(CAST(pos AS INTEGER))) AS positions
            FROM tokens GROUP BY word, doc_id
        ), top_words AS (
            SELECT word, CAST(COUNT(*) AS BIGINT) AS df
            FROM index GROUP BY word
            ORDER BY df DESC, word ASC LIMIT {INDEX_TOP_WORDS}
        )
        SELECT i.word, t.df, i.doc_id, i.tf,
               array_to_string(i.positions, ',') AS positions
        FROM index i JOIN top_words t USING (word)
        ORDER BY word, doc_id
    """


def _phrase_oracle_sql() -> str:
    """Independent direct-scan algorithm: count adjacent (w1, w2) token
    pairs per document — no inverted index involved."""
    w1, w2 = PHRASE
    return f"""
        WITH wd AS (
            SELECT doc_id, {_DUCK_WORDS} AS w FROM documents
        ), counted AS (
            SELECT doc_id,
                   CAST(len(list_filter(range(1, len(w)),
                        i -> w[i] = '{w1}' AND w[i + 1] = '{w2}')) AS INTEGER)
                       AS n_occurrences
            FROM wd
        )
        SELECT doc_id, n_occurrences FROM counted
        WHERE n_occurrences > 0
        ORDER BY doc_id
    """


def _bm25_oracle_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    idf = "ln((CAST(n_docs AS DOUBLE) - dfr + 0.5) / (dfr + 0.5) + 1.0)"
    term_score = (
        f"{idf} * (tf * ({BM25_K1} + 1.0))"
        f" / (tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl / avgdl))"
    )
    return f"""
        WITH base AS (
            SELECT doc_id, {_DUCK_WORDS} AS wd FROM documents
        ), dl AS (
            SELECT doc_id, CAST(len(wd) AS INTEGER) AS dl FROM base
        ), tf AS (
            SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
            FROM (SELECT doc_id, unnest(wd) AS word FROM base)
            WHERE word IN ({terms})
            GROUP BY doc_id, word
        ), dfreq AS (
            SELECT word, CAST(COUNT(*) AS BIGINT) AS dfr FROM tf GROUP BY word
        ), stats AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   AVG(CAST(dl AS DOUBLE)) AS avgdl
            FROM dl
        )
        SELECT doc_id,
               ROUND(SUM({term_score}), 6) AS bm25,
               CAST(COUNT(*) AS BIGINT) AS n_terms_hit
        FROM tf JOIN dfreq USING (word) JOIN dl USING (doc_id) CROSS JOIN stats
        GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id ASC
        LIMIT {BM25_TOP}
    """


QUERIES = {
    "hybrid_search_rrf": hybrid_search_rrf,
    "inverted_postings": inverted_postings,
    "phrase_search_docs": phrase_search_docs,
    "bm25_search": bm25_search,
}

ORACLE_SQL: dict[str, str] = {
    "hybrid_search_rrf": _hybrid_oracle_sql(),
    "inverted_postings": _postings_oracle_sql(),
    "phrase_search_docs": _phrase_oracle_sql(),
    "bm25_search": _bm25_oracle_sql(),
}


# ---- retrieval quality eval -------------------------------------------


def bm25_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall@k of the BM25 ranking against boolean-AND weak
    truth (docs containing EVERY query term) — the retrieval face of
    the eval family (``dedup_minhash_eval``, ``ann_recall_eval``):
    never ship a ranker without a measured agreement to a defensible
    baseline.  Counts are exact; the two ratios are single double
    divisions.  The truth side is one aggregation over the same
    pre-tokenized frame the ranker uses, so the eval adds no new scan
    shape.
    """
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    ranked = bm25_rank(docs).select("doc_id")
    words = F.expr(_SPARK_WORDS)
    # EAGER checkpoint: truth (the few all-terms docs) feeds the hits
    # join AND the n_relevant count — each reference re-ran the token
    # explode + distinct-term aggregation over the corpus.
    truth = (
        docs.select("doc_id", F.explode(words).alias("word"))
        .where(F.col("word").isin(*BM25_TERMS))
        .groupBy("doc_id")
        .agg(F.countDistinct("word").alias("n_terms"))
        .where(F.col("n_terms") == len(BM25_TERMS))
        .select("doc_id")
        .localCheckpoint(eager=True)
    )
    hits = ranked.join(truth, "doc_id").agg(F.count(F.lit(1)).alias("hits"))
    n_rel = truth.agg(F.count(F.lit(1)).alias("n_relevant"))
    return (
        hits.crossJoin(F.broadcast(n_rel))
        .select(
            F.lit(BM25_TOP).cast("int").alias("k"),
            "n_relevant",
            "hits",
            F.round(F.col("hits").cast("double") / BM25_TOP, 6).alias("p_at_k"),
            F.round(
                F.col("hits").cast("double") / F.col("n_relevant").cast("double"), 6
            ).alias("recall_truncated"),
        )
    )


def _bm25_eval_oracle_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return f"""
        WITH ranked AS ({_bm25_oracle_sql()}),
        truth AS (
            SELECT doc_id
            FROM (SELECT doc_id, unnest({_DUCK_WORDS}) AS word FROM documents)
            WHERE word IN ({terms})
            GROUP BY doc_id
            HAVING COUNT(DISTINCT word) = {len(BM25_TERMS)}
        ), h AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS hits
            FROM ranked r JOIN truth t USING (doc_id)
        ), n AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_relevant FROM truth
        )
        SELECT CAST({BM25_TOP} AS INTEGER) AS k, n_relevant, hits,
               ROUND(CAST(hits AS DOUBLE) / {BM25_TOP}, 6) AS p_at_k,
               ROUND(CAST(hits AS DOUBLE) / CAST(n_relevant AS DOUBLE), 6)
                   AS recall_truncated
        FROM h CROSS JOIN n
    """


QUERIES["bm25_eval"] = bm25_eval
ORACLE_SQL["bm25_eval"] = _bm25_eval_oracle_sql()


# ---- index-based weighted (TF) cosine document pairs --------------------

COSINE_NGRAM = 3       # shingle width for the similarity dimension
COSINE_DF_PRUNE = 10   # drop shingles present in more docs than this
COSINE_MIN = 0.5       # emit pairs at or above this cosine


def tf_cosine_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = COSINE_NGRAM,
    df_prune: int = COSINE_DF_PRUNE,
    min_cosine: float = COSINE_MIN,
) -> DataFrame:
    """Weighted near-duplicate pairs by TF cosine over n-gram counts —
    the multiset complement of the set-Jaccard face (`similar_doc_pairs`):
    a doc that repeats a shared phrase 5x scores higher here, identically
    here, and the score is the classic sparse-vector cosine served by an
    inverted index.

    Index shape, not doc x doc: postings (gram, doc, tf) self-join on
    the gram key, so work is sum(df^2) over surviving grams.  Grams
    with df > ``df_prune`` are dropped BEFORE the join — the standard
    stop-shingle prune that both bounds the fan-out (each survivor
    contributes <= df_prune^2 pairs) and sharpens the metric (a gram in
    half the corpus carries no signal).  Norms are computed over the
    same pruned space so the cosine is exact for the pruned metric:
    integer dot and squared norms, one sqrt+divide at the end.
    """
    words = _SPARK_WORDS.replace("text", text_col)
    grams = (
        f"transform(sequence(1, greatest(size({words}) - {n - 1}, 1)),"
        f" i -> concat_ws(' ', slice({words}, i, {n})))"
    )
    postings = (
        df.select(F.col(id_col).alias("doc"), F.explode(F.expr(grams)).alias("g"))
        .groupBy("g", "doc")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    docfreq = postings.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    # merge hint: both sides are corpus-vocabulary-sized — the pruned
    # gram list must never be broadcast on a size estimate.
    # EAGER checkpoint: pruned feeds THREE branches (norms, both dot
    # sides) and the df-prune join sits above the gram-explode of the
    # whole corpus — without it the compiled plan re-derived the
    # explode subtree up to 10x (measured: FileScan x10 / Generate x10
    # / 31 Exchanges at sf0.1; 0 / 0 / 11 after).  Eager, not lazy:
    # the setsim/minhash race finding — concurrent downstream stages
    # would each recompute the subtree before either stores it.
    pruned = (
        postings.hint("merge")
        .join(docfreq.where(F.col("df") <= df_prune).select("g"), "g")
        .localCheckpoint(eager=True)
    )
    norms = pruned.groupBy("doc").agg(
        F.sum(F.col("tf") * F.col("tf")).alias("n2")
    )
    a = pruned.select(F.col("doc").alias("da"), "g", F.col("tf").alias("tfa"))
    b = pruned.select(F.col("doc").alias("db"), "g", F.col("tf").alias("tfb"))
    dots = (
        a.hint("merge").join(b, "g")
        .where(F.col("da") < F.col("db"))
        .groupBy("da", "db")
        .agg(F.sum(F.col("tfa") * F.col("tfb")).alias("dot"))
    )
    na = norms.select(F.col("doc").alias("da"), F.col("n2").alias("n2a"))
    nb = norms.select(F.col("doc").alias("db"), F.col("n2").alias("n2b"))
    cos = F.col("dot").cast("double") / F.sqrt(
        (F.col("n2a") * F.col("n2b")).cast("double")
    )
    return (
        dots.join(na, "da")
        .join(nb, "db")
        .where(cos >= min_cosine)  # threshold the RAW cosine (oracle-aligned)
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            F.col("dot").cast("long").alias("dot"),
            F.round(cos, 6).alias("cosine"),
        )
        .orderBy("doc_a", "doc_b")
    )


def tfidf_doc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: trigram TF-cosine near-dup pairs over documents."""
    return tf_cosine_pairs(load_table(spark, "documents", sf_dir))


def _tf_cosine_oracle_sql(
    n: int = COSINE_NGRAM,
    df_prune: int = COSINE_DF_PRUNE,
    min_cosine: float = COSINE_MIN,
) -> str:
    grams = (
        f"list_transform(range(1, greatest(len(w) - {n - 1}, 1) + 1),"
        f" i -> array_to_string(w[i:i+{n - 1}], ' '))"
    )
    return f"""
        WITH toks AS (
            SELECT doc_id, {_DUCK_WORDS} AS w FROM documents
        ), grams AS (
            SELECT doc_id AS doc, unnest({grams}) AS g FROM toks
        ), postings AS (
            SELECT g, doc, CAST(COUNT(*) AS BIGINT) AS tf
            FROM grams GROUP BY g, doc
        ), keep AS (
            SELECT g FROM postings GROUP BY g HAVING COUNT(*) <= {df_prune}
        ), pruned AS (
            SELECT p.* FROM postings p JOIN keep USING (g)
        ), norms AS (
            SELECT doc, SUM(tf * tf) AS n2 FROM pruned GROUP BY doc
        ), dots AS (
            SELECT a.doc AS da, b.doc AS db, SUM(a.tf * b.tf) AS dot
            FROM pruned a JOIN pruned b USING (g)
            WHERE a.doc < b.doc GROUP BY a.doc, b.doc
        )
        SELECT da AS doc_a, db AS doc_b,
               CAST(dot AS BIGINT) AS dot,
               ROUND(CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 * nb.n2 AS DOUBLE)), 6)
                   AS cosine
        FROM dots
        JOIN norms na ON da = na.doc
        JOIN norms nb ON db = nb.doc
        WHERE CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 * nb.n2 AS DOUBLE))
              >= {min_cosine}
        ORDER BY doc_a, doc_b
    """


QUERIES["tfidf_doc_pairs"] = tfidf_doc_pairs
ORACLE_SQL["tfidf_doc_pairs"] = _tf_cosine_oracle_sql()
