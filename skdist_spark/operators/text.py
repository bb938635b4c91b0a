"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, and document fingerprinting.

Pure Spark SQL expressions (split/filter/aggregate/md5) — single scan,
no UDFs, whole-stage codegen end-to-end — each with a value-identical
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table

_SPARK_WORDS = "filter(split(trim(text), '\\\\s+'), x -> x != '')"
_DUCK_WORDS = "list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '')"

# stopword profiles for the language-ID heuristic (hit-count argmax,
# deterministic priority order on ties, 'und' when nothing matches)
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "los"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une"),
    "de": ("der", "die", "das", "und", "ist", "von", "den", "ein"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "不"),
}


def _hits_expr(words: str, stopwords: tuple[str, ...], engine: str) -> str:
    quoted = ", ".join(f"'{w}'" for w in stopwords)
    if engine == "spark":
        return f"size(filter({words}, t -> t IN ({quoted})))"
    return f"len(list_filter({words}, t -> t IN ({quoted})))"


def _langid_exprs(engine: str, words: str | None = None) -> tuple[str, str]:
    """(pred_lang_expr, n_hits_expr): argmax of profile hits."""
    if words is None:
        words = _SPARK_WORDS if engine == "spark" else _DUCK_WORDS
    hits = {lang: _hits_expr(words, sw, engine) for lang, sw in LANG_PROFILES.items()}
    greatest = f"greatest({', '.join(hits.values())})"
    # deterministic priority: dict order breaks ties
    cases = " ".join(
        f"WHEN {h} = {greatest} AND {greatest} > 0 THEN '{lang}'"
        for lang, h in hits.items()
    )
    return f"(CASE {cases} ELSE 'und' END)", greatest


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Generic language-ID over any (id, text) frame (stopword-profile
    argmax; columns: id, pred_lang, n_hits)."""
    docs = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    words_df = docs.select("doc_id", F.expr(_SPARK_WORDS).alias("wd"))
    pred, n_hits = _langid_exprs("spark", words="wd")
    return words_df.select(
        "doc_id",
        F.expr(pred).alias("pred_lang"),
        F.expr(n_hits).cast("int").alias("n_hits"),
    )


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    # tokenize ONCE into a column; the 10+ hit-count lambdas all read it
    # (inlining would re-split per profile term check)
    words_df = docs.select("doc_id", "lang", F.expr(_SPARK_WORDS).alias("wd"))
    pred, n_hits = _langid_exprs("spark", words="wd")
    return words_df.select(
        "doc_id",
        "lang",
        F.expr(pred).alias("pred_lang"),
        F.expr(n_hits).cast("int").alias("n_hits"),
    ).orderBy("doc_id")


def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counts: whitespace tokens, BPE-ish subword pieces
    (letter-runs / digit-runs / single other chars), distinct ratio."""
    docs = load_table(spark, "documents", sf_dir)
    words_df = docs.select("doc_id", "text", F.expr(_SPARK_WORDS).alias("wd"))
    bpe = "size(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]', 0))"
    return words_df.select(
        "doc_id",
        F.expr("size(wd)").alias("n_tokens_ws"),
        F.expr(bpe).alias("n_tokens_bpe"),
        F.expr("size(array_distinct(wd))").alias("n_tokens_distinct"),
        F.length("text").alias("n_chars_measured"),
    ).orderBy("doc_id")


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Generic quality scoring over any (id, text) frame — same metric
    set as text_quality."""
    return _quality_impl(
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    )


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality metrics: length, mean word length, distinct-token ratio,
    stopword ratio, and a composite keep/filter verdict — the standard
    pre-training corpus filters (Gopher-style rules) as one scan."""
    return _quality_impl(load_table(spark, "documents", sf_dir))


def _quality_impl(raw: DataFrame) -> DataFrame:
    docs = raw.select("doc_id", "text", F.expr(_SPARK_WORDS).alias("wd"))
    words = "wd"
    en_hits = _hits_expr(words, LANG_PROFILES["en"], "spark")
    n_words = f"size({words})"
    mean_wl = f"(CAST(length(replace(text, ' ', '')) AS DOUBLE) / {n_words})"
    distinct_ratio = f"(CAST(size(array_distinct({words})) AS DOUBLE) / {n_words})"
    stop_ratio = f"(CAST({en_hits} AS DOUBLE) / {n_words})"
    keep = (
        f"({n_words} >= 10 AND {n_words} <= 1000 AND {mean_wl} >= 2"
        f" AND {mean_wl} <= 12 AND {distinct_ratio} >= 0.1)"
    )
    return docs.select(
        "doc_id",
        F.expr(n_words).alias("n_words"),
        F.expr(mean_wl).alias("mean_word_len"),
        F.expr(distinct_ratio).alias("distinct_ratio"),
        F.expr(stop_ratio).alias("stopword_ratio"),
        F.expr(keep).alias("keep"),
    ).orderBy("doc_id")


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Generic bottom-k shingle fingerprint over any (id, text) frame."""
    return _fingerprint_impl(
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    )


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: the k smallest md5 hashes of word 4-gram
    shingles (a bottom-k sketch), concatenated and re-hashed into one
    stable signature. Containment-comparable across corpora."""
    return _fingerprint_impl(load_table(spark, "documents", sf_dir))


def _fingerprint_impl(docs: DataFrame) -> DataFrame:
    # let-bind the words array (CollapseProject merges the staged
    # selects, so a plain wd column would re-split per shingle inside
    # the lambda — see dedup._let); the two cheap output derivations
    # share the hashes tree via top-level subexpression elimination
    from .dedup import _let

    hashes_df = docs.select(
        "doc_id",
        F.expr(
            _let(
                _SPARK_WORDS,
                "__wd",
                "array_sort(transform(sequence(1, greatest(size(__wd) - 3, 1)),"
                " i -> md5(concat_ws(' ', slice(__wd, i, 4)))))",
            )
        ).alias("hashes"),
    )
    return hashes_df.select(
        "doc_id",
        F.expr("md5(concat_ws('', slice(hashes, 1, 4)))").alias("fingerprint"),
        F.expr("element_at(hashes, 1)").alias("min_shingle_hash"),
    ).orderBy("doc_id")


# Gopher-style repetition thresholds (ppm): a doc whose single most
# frequent bigram exceeds 18% of all bigrams, or whose duplicated
# bigrams cover more than 60%, is boilerplate/spam-shaped.
_TOP_BIGRAM_PPM_MAX = 180_000
_DUP_BIGRAM_PPM_MAX = 600_000

# run-length scan over the SORTED bigram array: one fold computes the
# max duplicate-group size (best) and the total occurrences inside
# duplicated groups (dup) — O(n log n) per row, zero shuffles, vs the
# explode + (doc, bigram) groupBy which shuffles every bigram. On this
# synthetic corpus the fold is the whole query; at 100 TB it's the
# difference between a map-only scan and a corpus-wide exchange.
_REP_FOLD_BODY = """
    aggregate(
      CASE WHEN size(__wd) >= 2
           THEN array_sort(transform(sequence(0, size(__wd) - 2),
                                     i -> concat(__wd[i], ' ', __wd[i + 1])))
           ELSE array() END,
      named_struct('prev', CAST(NULL AS STRING), 'run', CAST(0 AS BIGINT),
                   'best', CAST(0 AS BIGINT), 'dup', CAST(0 AS BIGINT)),
      (acc, x) -> named_struct(
        'prev', x,
        'run', IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1, CAST(1 AS BIGINT)),
        'best', greatest(acc.best,
                         IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1, CAST(1 AS BIGINT))),
        'dup', acc.dup + CASE WHEN acc.prev IS NOT NULL AND x = acc.prev
                              THEN IF(acc.run = 1, CAST(2 AS BIGINT), CAST(1 AS BIGINT))
                              ELSE CAST(0 AS BIGINT) END))
"""
# let-bound over the wd column: CollapseProject inlines wd's regex
# split into the bigram lambda otherwise — once per bigram element
_REP_FOLD = f"transform(array(wd), __wd -> {_REP_FOLD_BODY})[0]"


def repetition_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Generic Gopher-style repetition filter over any (id, text) frame:
    integer-ppm top-bigram and duplicated-bigram fractions + keep flag."""
    return _repetition_impl(
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    )


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality filter (Gopher rules): the fraction of
    word bigrams taken by the most frequent bigram and by all duplicated
    bigrams, exact in integer ppm, with a keep verdict."""
    return _repetition_impl(load_table(spark, "documents", sf_dir))


def _repetition_impl(docs: DataFrame) -> DataFrame:
    words_df = docs.select("doc_id", F.expr(_SPARK_WORDS).alias("wd"))
    staged = words_df.select(
        "doc_id",
        F.expr("greatest(size(wd) - 1, 0)").cast("long").alias("n_bigrams"),
        F.expr(_REP_FOLD).alias("rep"),
    ).select(
        "doc_id",
        "n_bigrams",
        F.col("rep.best").alias("top_bigram_n"),
        F.expr("IF(n_bigrams > 0, rep.best * 1000000 div n_bigrams, CAST(0 AS BIGINT))").alias(
            "top_bigram_ppm"
        ),
        F.expr("IF(n_bigrams > 0, rep.dup * 1000000 div n_bigrams, CAST(0 AS BIGINT))").alias(
            "dup_bigram_ppm"
        ),
    )
    return staged.select(
        "doc_id",
        "n_bigrams",
        "top_bigram_n",
        "top_bigram_ppm",
        "dup_bigram_ppm",
        (
            (F.col("top_bigram_ppm") <= _TOP_BIGRAM_PPM_MAX)
            & (F.col("dup_bigram_ppm") <= _DUP_BIGRAM_PPM_MAX)
        ).alias("keep"),
    ).orderBy("doc_id")


# fixed query vocabulary for the TF-IDF ranking demo; idf stays
# integer-exact as floor(1e6 * N / df) so both engines hash-match
TFIDF_TERMS = ("spark", "join", "window", "stream")


def tfidf_rank(
    df: DataFrame,
    terms: tuple[str, ...] = TFIDF_TERMS,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
) -> DataFrame:
    """Generic integer-exact TF-IDF keyword ranking over any (id, text)
    frame: score = sum_t tf_t * floor(1e6 * N / df_t), top-k rows."""
    docs = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    words_df = docs.select("doc_id", F.expr(_SPARK_WORDS).alias("wd"))
    tf_cols = [
        F.expr(f"CAST(size(filter(wd, x -> x = '{t}')) AS BIGINT)").alias(f"tf_{t}")
        for t in terms
    ]
    tf = words_df.select("doc_id", *tf_cols)
    # corpus stats collapse to ONE row (doc count + per-term doc freq);
    # broadcast it back so scoring stays map-side
    stats = tf.agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[
            F.sum(F.expr(f"IF(tf_{t} > 0, 1, 0)")).cast("long").alias(f"df_{t}")
            for t in terms
        ],
    )
    score = " + ".join(
        f"tf_{t} * IF(df_{t} > 0, 1000000 * n_docs div df_{t}, CAST(0 AS BIGINT))"
        for t in terms
    )
    return (
        tf.join(F.broadcast(stats))
        .select("doc_id", F.expr(f"CAST({score} AS BIGINT)").alias("score_ppm"))
        .where(F.col("score_ppm") > 0)
        .orderBy(F.desc("score_ppm"), F.asc("doc_id"))
        .limit(k)
    )


def tfidf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword search: top-20 documents by integer-exact TF-IDF score
    over a fixed query vocabulary."""
    return tfidf_rank(load_table(spark, "documents", sf_dir))


def rebalance_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    stratum_col: str = "lang",
) -> DataFrame:
    """Data-mixing rebalance: deterministically down-sample every
    stratum toward the SMALLEST stratum's size (rate_permille =
    floor(1000 * min_count / count)), so the output mix is ~uniform.

    Plan: one tiny counts aggregate broadcast back (map-side membership
    test after it), Knuth-hash bucketing for retry-stable membership —
    the language-mix control step of corpus construction, integer-exact
    so the DuckDB oracle reproduces it bit-for-bit.
    """
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__n"))
    rates = counts.select(
        stratum_col,
        F.floor(
            F.lit(1000) * F.min("__n").over(Window.partitionBy()) / F.col("__n")
        )
        .cast("bigint")
        .alias("__rate"),
    )
    bucket = F.pmod((F.col(id_col).cast("bigint") * _KNUTH) % _MOD32, F.lit(1000))
    return (
        df.join(F.broadcast(rates), stratum_col)
        .where(bucket < F.col("__rate"))
        .drop("__rate")
    )


def language_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language kept counts after rebalancing the documents corpus
    toward the smallest language's size."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        rebalance_sample(docs)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum(F.col("n_chars").cast("bigint")).alias("sum_chars"),
        )
        .orderBy("lang")
    )


def _duck_repetition_sql() -> str:
    w = _DUCK_WORDS
    return f"""
        WITH words AS (SELECT doc_id, {w} AS w FROM documents),
        big AS (
          SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])) AS bg
          FROM words WHERE len(w) >= 2),
        cnts AS (SELECT doc_id, bg, COUNT(*) AS c FROM big GROUP BY doc_id, bg),
        agg AS (SELECT doc_id, MAX(c) AS best,
                       SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup
                FROM cnts GROUP BY doc_id),
        staged AS (
          SELECT w.doc_id,
                 CAST(greatest(len(w.w) - 1, 0) AS BIGINT) AS n_bigrams,
                 CAST(COALESCE(a.best, 0) AS BIGINT) AS top_bigram_n,
                 CAST(CASE WHEN len(w.w) >= 2
                      THEN COALESCE(a.best, 0) * 1000000 // (len(w.w) - 1)
                      ELSE 0 END AS BIGINT) AS top_bigram_ppm,
                 CAST(CASE WHEN len(w.w) >= 2
                      THEN COALESCE(a.dup, 0) * 1000000 // (len(w.w) - 1)
                      ELSE 0 END AS BIGINT) AS dup_bigram_ppm
          FROM words w LEFT JOIN agg a USING (doc_id))
        SELECT doc_id, n_bigrams, top_bigram_n, top_bigram_ppm, dup_bigram_ppm,
               (top_bigram_ppm <= {_TOP_BIGRAM_PPM_MAX}
                AND dup_bigram_ppm <= {_DUP_BIGRAM_PPM_MAX}) AS keep
        FROM staged ORDER BY doc_id
    """


def _duck_tfidf_sql() -> str:
    w = _DUCK_WORDS
    tf_cols = ",\n               ".join(
        f"CAST(len(list_filter(w, x -> x = '{t}')) AS BIGINT) AS tf_{t}"
        for t in TFIDF_TERMS
    )
    df_cols = ",\n                 ".join(
        f"CAST(SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}"
        for t in TFIDF_TERMS
    )
    score = " + ".join(
        f"tf_{t} * (CASE WHEN df_{t} > 0 THEN 1000000 * n_docs // df_{t} ELSE 0 END)"
        for t in TFIDF_TERMS
    )
    return f"""
        WITH words AS (SELECT doc_id, {w} AS w FROM documents),
        tf AS (SELECT doc_id,
               {tf_cols}
               FROM words),
        stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 {df_cols}
                 FROM tf)
        SELECT doc_id, CAST({score} AS BIGINT) AS score_ppm
        FROM tf, stats
        WHERE {score} > 0
        ORDER BY score_ppm DESC, doc_id ASC
        LIMIT 20
    """


def _duck_quality_sql() -> str:
    words = _DUCK_WORDS
    en_hits = _hits_expr(words, LANG_PROFILES["en"], "duck")
    n_words = f"len({words})"
    mean_wl = f"(CAST(length(replace(text, ' ', '')) AS DOUBLE) / {n_words})"
    distinct_ratio = f"(CAST(len(list_distinct({words})) AS DOUBLE) / {n_words})"
    stop_ratio = f"(CAST({en_hits} AS DOUBLE) / {n_words})"
    keep = (
        f"({n_words} >= 10 AND {n_words} <= 1000 AND {mean_wl} >= 2"
        f" AND {mean_wl} <= 12 AND {distinct_ratio} >= 0.1)"
    )
    return f"""
        SELECT doc_id,
               CAST({n_words} AS INTEGER) AS n_words,
               {mean_wl} AS mean_word_len,
               {distinct_ratio} AS distinct_ratio,
               {stop_ratio} AS stopword_ratio,
               {keep} AS keep
        FROM documents ORDER BY doc_id
    """


_URL_RE = r"https?://\S+"
_EMAIL_RE = r"\S+@\S+"


def clean_text(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Normalize raw text for training: strip URLs and emails, lowercase,
    collapse whitespace. Single pass of JVM regexp_replace — no UDF.

    Returns id, cleaned text, and removed-span counts.
    """
    stripped = F.regexp_replace(
        F.regexp_replace(F.col(text_col), _URL_RE, " "), _EMAIL_RE, " "
    )
    cleaned = F.trim(F.regexp_replace(F.lower(stripped), r"\s+", " "))
    return df.select(
        F.col(id_col),
        cleaned.alias("clean_text"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(_URL_RE), F.lit(0))).alias("n_urls"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(_EMAIL_RE), F.lit(0))).alias("n_emails"),
    )


def text_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: cleaned-text digest per document (md5 so the
    oracle compare ships hashes, not full text)."""
    docs = load_table(spark, "documents", sf_dir)
    out = clean_text(docs)
    return out.select(
        "doc_id",
        F.md5(F.col("clean_text")).alias("clean_md5"),
        F.length("clean_text").cast("int").alias("n_chars_clean"),
        "n_urls",
        "n_emails",
    ).orderBy("doc_id")


CHUNK_TOKENS = 64
CHUNK_STRIDE = 48


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """Split documents into overlapping fixed-token-window chunks (the
    context-window packing step of an LLM data pipeline).

    Tokens are materialized ONCE as an array column; chunk starts come
    from ``sequence`` + ``explode`` and each chunk is an O(1) ``slice``
    of the shared array — no shuffle at all: chunking is embarrassingly
    parallel per input partition, so at 100 TB it scales with the scan.
    """
    toks = F.expr(
        f"filter(split(trim({text_col}), '\\\\s+'), x -> x != '')"
    )
    with_toks = df.select(F.col(id_col), toks.alias("__toks")).where(
        F.size("__toks") > 0
    )
    # ceil((n - W) / stride) + 1: the last start is the smallest whose
    # window reaches the end — never a chunk fully contained in the
    # previous one, every non-last chunk exactly full-width
    n_chunks = (
        F.greatest(F.ceil((F.size("__toks") - chunk_tokens) / F.lit(stride)), F.lit(0))
        + 1
    )
    return (
        with_toks.withColumn("chunk_id", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .withColumn("__chunk", F.slice("__toks", F.col("chunk_id") * stride + 1, chunk_tokens))
        .select(
            F.col(id_col),
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.size("__chunk").alias("n_chunk_tokens"),
            F.md5(F.array_join("__chunk", " ")).alias("chunk_md5"),
        )
    )


def chunk_documents_udtf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """Python UDTF face of `chunk_documents` (Spark 4 user-defined
    TABLE function + lateral join): identical output — same chunk ids,
    token counts, and md5s — produced by imperative per-row Python
    instead of SQL array expressions.

    This is the FLEXIBILITY face (drop in a real tokenizer, a
    sentence splitter, any Python library, without leaving the lateral
    join shape); `chunk_documents` remains the performance face (pure
    codegen, no Python in the hot path).  Still shuffle-free: the UDTF
    fans out rows within the scan partition.
    """
    import hashlib
    import math

    from pyspark.sql.functions import udtf

    # useArrow: eval is still called per row (the UDTF contract), but
    # batches cross the JVM<->Python boundary as Arrow instead of
    # pickled rows (guide: the serialization is the controllable cost).
    # Returns are exact int/int/hex-str, so the Arrow/pickle coercion
    # difference cannot bite.
    @udtf(
        returnType="chunk_id int, n_chunk_tokens int, chunk_md5 string",
        useArrow=True,
    )
    class ChunkDoc:
        def eval(self, text: str):  # noqa: D401 - UDTF protocol
            toks = [t for t in (text or "").strip().split() if t]
            if not toks:
                return
            n = len(toks)
            n_chunks = max(math.ceil((n - chunk_tokens) / stride), 0) + 1
            for cid in range(n_chunks):
                chunk = toks[cid * stride : cid * stride + chunk_tokens]
                yield (
                    cid,
                    len(chunk),
                    hashlib.md5(" ".join(chunk).encode()).hexdigest(),
                )

    return (
        df.select(F.col(id_col), F.col(text_col).alias("__text"))
        .lateralJoin(ChunkDoc(F.col("__text").outer()))
        .select(id_col, "chunk_id", "n_chunk_tokens", "chunk_md5")
    )


def doc_chunks_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: the UDTF chunker over documents — must equal
    `doc_chunks` bit-for-bit (it shares that query's oracle)."""
    docs = load_table(spark, "documents", sf_dir)
    return chunk_documents_udtf(docs).orderBy("doc_id", "chunk_id")


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return chunk_documents(docs).orderBy("doc_id", "chunk_id")


# deterministic per-language sampling rates, permille (stratified
# downsampling of overrepresented languages)
SAMPLE_PERMILLE: dict[str, int] = {"en": 100, "es": 300, "fr": 300, "de": 300}
SAMPLE_DEFAULT_PERMILLE = 500
_KNUTH = 2654435761
_MOD32 = 4294967296


def sample_stratified(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    permille: dict[str, int],
    default_permille: int,
) -> DataFrame:
    """Deterministic stratified sampling: keep a row iff
    ``knuth_hash(id) % 1000 < rate(stratum)``. Unlike ``sampleBy`` this
    is reproducible across retries/speculative tasks (no rand()) and
    portable (pure BIGINT arithmetic — the DuckDB oracle reproduces it
    bit-for-bit). Pure map-side filter: no shuffle, scales with scan.
    """
    bucket = F.pmod((F.col(id_col).cast("bigint") * _KNUTH) % _MOD32, F.lit(1000))
    rate = F.lit(default_permille)
    for stratum, p in sorted(permille.items()):
        rate = F.when(F.col(stratum_col) == stratum, p).otherwise(rate)
    return df.where(bucket < rate)


def sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: per-language doc counts after deterministic
    stratified sampling (exactly reproducible in the oracle)."""
    docs = load_table(spark, "documents", sf_dir)
    kept = sample_stratified(
        docs, "doc_id", "lang", SAMPLE_PERMILLE, SAMPLE_DEFAULT_PERMILLE
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang")
    )


def _sample_rate_sql() -> str:
    cases = " ".join(
        f"WHEN lang = '{s}' THEN {p}" for s, p in sorted(SAMPLE_PERMILLE.items())
    )
    return f"CASE {cases} ELSE {SAMPLE_DEFAULT_PERMILLE} END"


MIXTURE_BUDGET_FRAC = 0.5


def temperature_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    alpha: float = 0.5,
    budget_frac: float = MIXTURE_BUDGET_FRAC,
) -> DataFrame:
    """Temperature-flattened mixture resampling: target share of group
    g is proportional to n_g^alpha (alpha < 1 upweights small groups —
    the standard multilingual/source rebalance rule from public LLM
    corpus recipes), with total kept rows ~= budget_frac * N.

    Keep-rate r_g = min(1, budget_frac * N / (S * n_g^(1-alpha))) with
    S = sum_h n_h^alpha; quantized to integer permille and applied with
    the same Knuth-hash bucket as sample_stratified, so the sample is
    deterministic under retries AND bit-reproducible in the DuckDB
    oracle. Where min(1,.) clamps (tiny groups kept whole), the
    realized total falls slightly under budget — documented, not
    re-normalized, to keep the rate a pure per-group expression.

    Determinism notes: the group-count aggregates are exact integers;
    sqrt is IEEE-correctly-rounded in every engine (alpha=0.5 uses
    sqrt, not pow, for that reason); S is accumulated in DECIMAL so
    partial-sum order cannot perturb the last bit. Plan shape: one
    tiny groupBy + one broadcast join + a map-side filter — the scan
    dominates at any scale.
    """
    def _powered(col, exponent):
        return F.sqrt(col) if exponent == 0.5 else F.pow(col, F.lit(exponent))

    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    tot = counts.agg(
        F.sum("__n").cast("double").alias("__N"),
        F.sum(_powered(F.col("__n").cast("double"), alpha).cast("decimal(28,12)"))
        .cast("double")
        .alias("__S"),
    )
    # tot derives from counts, so bare-name lookups in the cross join
    # are ambiguous — qualify through string aliases
    rates = (
        counts.alias("c")
        .crossJoin(F.broadcast(tot.alias("t")))
        .select(
            F.col(f"c.{group_col}"),
            F.least(
                F.lit(1000),
                F.floor(
                    F.lit(1000.0) * F.lit(budget_frac) * F.col("t.__N")
                    / (
                        F.col("t.__S")
                        * _powered(F.col("c.__n").cast("double"), 1.0 - alpha)
                    )
                ).cast("int"),
            ).alias("__permille"),
        )
    )
    bucket = F.pmod((F.col(id_col).cast("bigint") * _KNUTH) % _MOD32, F.lit(1000))
    return (
        df.join(F.broadcast(rates), group_col)
        .where(bucket < F.col("__permille"))
        .drop("__permille")
    )


def mixture_sample_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: per-source doc counts after temperature-flattened
    (alpha=0.5) source-mixture resampling at a half-size budget."""
    docs = load_table(spark, "documents", sf_dir)
    kept = temperature_sample(docs, "doc_id", "source", alpha=0.5)
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("source")
    )


def _mixture_sample_sql() -> str:
    return f"""
        WITH c AS (
            SELECT source, CAST(COUNT(*) AS DOUBLE) AS n_g
            FROM documents GROUP BY source
        ), t AS (
            SELECT CAST(SUM(n_g) AS DOUBLE) AS tot_n,
                   CAST(SUM(CAST(SQRT(n_g) AS DECIMAL(28,12))) AS DOUBLE) AS tot_s
            FROM c
        ), r AS (
            SELECT source,
                   LEAST(1000, CAST(FLOOR(1000.0 * {MIXTURE_BUDGET_FRAC} * tot_n
                       / (tot_s * SQRT(n_g))) AS INTEGER)) AS permille
            FROM c, t
        )
        SELECT d.source, COUNT(*) AS n_kept, CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars
        FROM documents d JOIN r ON d.source = r.source
        WHERE (d.doc_id * {_KNUTH}) % {_MOD32} % 1000 < r.permille
        GROUP BY d.source ORDER BY d.source
    """


# PII redaction patterns: intentionally simple syntax (no lookaround,
# no lazy quantifiers) so Java regex (Spark) and RE2 (DuckDB) agree.
# Applied sequentially; each count is measured on the text as it stood
# when that pattern ran.
PII_EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+?\d[\d()\- ]{6,}\d"


def scrub_pii(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Redact emails, IPv4 addresses, and phone-like digit runs with
    typed placeholder tokens — the standard pre-training privacy pass.
    Pure JVM regexp expressions (no UDF): scales with the scan.

    Output: id, ``clean_text`` with ``<EMAIL>``/``<IP>``/``<PHONE>``
    placeholders, and per-type match counts. Emails are redacted
    before IPs before phones, so a phone match can't fire inside an
    address that was already redacted.
    """
    t0 = F.col(text_col)
    n_email = F.size(F.regexp_extract_all(t0, F.lit(PII_EMAIL_RE), F.lit(0)))
    t1 = F.regexp_replace(t0, PII_EMAIL_RE, "<EMAIL>")
    n_ip = F.size(F.regexp_extract_all(t1, F.lit(PII_IP_RE), F.lit(0)))
    t2 = F.regexp_replace(t1, PII_IP_RE, "<IP>")
    n_phone = F.size(F.regexp_extract_all(t2, F.lit(PII_PHONE_RE), F.lit(0)))
    t3 = F.regexp_replace(t2, PII_PHONE_RE, "<PHONE>")
    return df.select(
        F.col(id_col),
        t3.alias("clean_text"),
        n_email.alias("n_email"),
        n_ip.alias("n_ip"),
        n_phone.alias("n_phone"),
    )


def text_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: PII-redaction digest per document (md5 of the
    redacted text + per-type counts; this corpus is synthetic word-soup
    so counts are typically zero — the regex execution and oracle
    parity are the point, and pytest covers hit-positive inputs)."""
    docs = load_table(spark, "documents", sf_dir)
    out = scrub_pii(docs)
    return out.select(
        "doc_id",
        F.md5("clean_text").alias("clean_md5"),
        "n_email",
        "n_ip",
        "n_phone",
    ).orderBy("doc_id")


def _scrub_pii_sql() -> str:
    email, ip, phone = PII_EMAIL_RE, PII_IP_RE, PII_PHONE_RE
    return f"""
        WITH s AS (
            SELECT doc_id,
                   len(regexp_extract_all(text, '{email}')) AS n_email,
                   regexp_replace(text, '{email}', '<EMAIL>', 'g') AS t1
            FROM documents
        ), s2 AS (
            SELECT doc_id, n_email,
                   len(regexp_extract_all(t1, '{ip}')) AS n_ip,
                   regexp_replace(t1, '{ip}', '<IP>', 'g') AS t2
            FROM s
        )
        SELECT doc_id, md5(regexp_replace(t2, '{phone}', '<PHONE>', 'g')) AS clean_md5,
               n_email, n_ip,
               len(regexp_extract_all(t2, '{phone}')) AS n_phone
        FROM s2 ORDER BY doc_id
    """


CONTAM_SHINGLE = 3
CONTAM_MIN_RATIO = 0.5


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_ratio: float = CONTAM_MIN_RATIO,
) -> DataFrame:
    """Decontamination: flag corpus documents whose distinct word
    n-grams overlap the benchmark's shingle set by >= ``min_ratio``
    (the eval-set leakage gate every LLM training pipeline runs).

    A RATIO, not an absolute count: in any real corpus the common
    n-grams of the language appear in both sets, so a fixed shared
    count degenerates to flagging everything as the corpus grows; a
    document is leakage when MOST of it appears in the benchmark.

    Shape: benchmark explodes to a DISTINCT shingle set (bounded by
    benchmark size — the small side, broadcastable); the corpus posting
    list semi-joins it and counts matches per doc. Never a doc x doc
    comparison: cost is |corpus shingles| + |benchmark shingles|.
    """
    from .dedup import _spark_shingles

    def _shingles(df):
        return df.select(
            F.col(id_col).alias("doc_id"),
            F.expr(_SPARK_WORDS.replace("text", text_col)).alias("wd"),
        ).select("doc_id", F.expr(_spark_shingles(words="wd")).alias("sh"))

    bench_sh = (
        _shingles(benchmark)
        .select(F.explode_outer("sh").alias("shingle"))
        .distinct()
    )
    postings = (
        _shingles(corpus)
        .select("doc_id", F.explode_outer("sh").alias("shingle"))
        .distinct()
    )
    totals = postings.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    shared = (
        postings.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    # integer-exact threshold: shared/total >= r  <=>  shared*SCALE >= total*(r*SCALE)
    scaled = int(round(min_ratio * 1000))
    return (
        shared.join(totals, "doc_id")
        .where(F.col("n_shared") * 1000 >= F.col("n_sh") * scaled)
        .select("doc_id", "n_shared", "n_sh")
    )


def decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: treat every 20th document as the held-out
    benchmark; flag the rest of the corpus for shingle overlap."""
    docs = load_table(spark, "documents", sf_dir)
    benchmark = docs.where(F.col("doc_id") % 20 == 0)
    corpus = docs.where(F.col("doc_id") % 20 != 0)
    return contamination_check(corpus, benchmark).orderBy("doc_id")


PACK_BUDGET = 512
PACK_PARTITIONS = 16  # MINIMUM pack groups
# pack groups scale with the corpus so the EXPECTED GROUP SIZE stays
# constant (the SEMDEDUP_TARGET_CELL rule): with a fixed group count,
# per-group pandas buffers and the linear open-bin scan of first-fit
# grow with the data; p = max(16, n // TARGET) keeps both bounded.
# The oracle recomputes the same p from COUNT(*) so the two faces
# cannot drift.
PACK_GROUP_TARGET = 4_096


def pack_sequences(
    df: DataFrame,
    id_col: str,
    len_col: str,
    budget: int = PACK_BUDGET,
    num_partitions: int | None = None,
    n_items: int | None = None,
) -> DataFrame:
    """Greedy sequence packing: assign items (chunks with token
    lengths) to bins of at most ``budget`` tokens — the context-window
    packing step that turns chunks into dense training sequences.

    Packing is per PACK GROUP — pk = portable_hash32(id) % P, the
    engine-portable hash from operators/sketches.py, NOT Spark's
    murmur partitioning — so the full bin manifest is a pure function
    of the data that a DuckDB recursive CTE replays bit-for-bit
    (ORACLE-BACKED via ``pack_chunks``, promoted r6).  Groups are
    embarrassingly parallel (one shuffle on pk); first-fit-decreasing
    within each group over items sorted by (length DESC, id ASC); bin
    ids are globally unique (pk * 2^32 + local bin).  Items longer
    than ``budget`` get a bin of their own.  Each group's items are
    buffered in pandas before packing (FFD needs the whole group), so
    ``num_partitions`` defaults to max(16, n // PACK_GROUP_TARGET):
    the expected group stays ~constant-size as the corpus grows and
    always fits an executor; the oracle recomputes the same p from
    COUNT(*).  Callers that already know the item count can pass
    ``n_items`` to skip that count job (it would re-scan ``df``'s
    lineage); the group count derived from it is identical.
    """
    import pandas as pd

    from .sketches import hash_stage_exprs

    if num_partitions is None:
        if n_items is None:
            # bounded driver action (one count), same posture as
            # semantic_dedup's corpus-scaled k
            n_items = df.count()
        num_partitions = max(PACK_PARTITIONS, n_items // PACK_GROUP_TARGET)

    def _pack(batches):
        frames = [pdf for pdf in batches if len(pdf)]
        if not frames:
            return
        whole = pd.concat(frames, ignore_index=True)
        out_ids, out_bins = [], []
        for pk, grp in whole.groupby("__pk", sort=True):
            bins: list[int] = []  # remaining capacity per open bin
            base = int(pk) << 32
            order = grp.sort_values([len_col, id_col], ascending=[False, True])
            for item_id, ln in zip(order[id_col], order[len_col]):
                ln = int(ln)
                placed = None
                for bi, cap in enumerate(bins):
                    if cap >= ln:
                        placed = bi
                        bins[bi] = cap - ln
                        break
                if placed is None:
                    bins.append(max(budget - ln, 0))
                    placed = len(bins) - 1
                out_ids.append(int(item_id))
                out_bins.append(base + placed)
        yield pd.DataFrame({id_col: out_ids, "bin_id": out_bins})

    hashed = df.select(F.col(id_col), F.col(len_col)).withColumn(
        "__pk", F.col(id_col).cast("bigint")
    )
    for expr in hash_stage_exprs("__pk", "spark"):
        hashed = hashed.select(id_col, len_col, F.expr(expr).alias("__pk"))
    items = hashed.withColumn(
        "__pk", F.pmod(F.col("__pk"), F.lit(num_partitions)).cast("int")
    ).repartition(num_partitions, F.col("__pk"))
    assignments = items.mapInPandas(_pack, schema=f"{id_col} long, bin_id long")
    return assignments


def pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: pack document chunks into 512-token training bins;
    per-bin fill statistics (rows-only: greedy packing has no SQL
    equivalent)."""
    docs = load_table(spark, "documents", sf_dir)
    chunks = chunk_documents(docs).withColumn(
        "chunk_uid",
        F.col("doc_id") * 10000 + F.col("chunk_id"),
    )
    packed = pack_sequences(chunks, "chunk_uid", "n_chunk_tokens")
    lens = chunks.select("chunk_uid", "n_chunk_tokens")
    return (
        packed.join(lens, "chunk_uid")
        .groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_chunk_tokens").alias("fill_tokens"),
        )
        .orderBy("bin_id")
    )


def _pack_chunks_oracle_sql(
    budget: int = PACK_BUDGET,
    p_min: int = PACK_PARTITIONS,
    target: int = PACK_GROUP_TARGET,
) -> str:
    """DuckDB replay of the FFD bin manifest: the chunker CTE from
    ``doc_chunks``, the portable 32-bit hash for pack-group keys, and
    a recursive CTE that walks each group's (length DESC, id ASC)
    order carrying the open-bin capacity list — first-fit placement,
    new bin on miss, oversize items alone — exactly the per-group
    Python loop in ``pack_sequences``."""
    from .sketches import duck_hash32_cte

    hash_cte = duck_hash32_cte(
        f"""SELECT chunk_uid, ln, chunk_uid AS h FROM (
            SELECT doc_id * 10000 + chunk_id AS chunk_uid,
                   CAST(len(toks[chunk_id * {CHUNK_STRIDE} + 1 :
                               chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS}])
                        AS BIGINT) AS ln
            FROM (
                SELECT doc_id, toks,
                       unnest(range(0, greatest(CAST(ceil((n - {CHUNK_TOKENS})
                                / {CHUNK_STRIDE}.0) AS BIGINT), 0) + 1))
                           AS chunk_id
                FROM (
                    SELECT doc_id, {_DUCK_WORDS} AS toks, len({_DUCK_WORDS}) AS n
                    FROM documents
                ) WHERE n > 0
            )
        )""",
        "chunk_uid, ln",
    )
    return f"""
        WITH RECURSIVE src AS MATERIALIZED (
            {hash_cte}
        ), pnum AS (
            SELECT GREATEST({p_min}, COUNT(*) // {target}) AS p FROM src
        ), pkt AS (
            SELECT chunk_uid, ln, CAST(h % (SELECT p FROM pnum) AS INT) AS pk
            FROM src
        ), ranked AS (
            SELECT pk, chunk_uid, ln,
                   row_number() OVER (PARTITION BY pk
                                      ORDER BY ln DESC, chunk_uid) AS r
            FROM pkt
        ), rec AS (
            SELECT pk, CAST(0 AS BIGINT) AS r,
                   CAST([] AS BIGINT[]) AS caps,
                   CAST(NULL AS BIGINT) AS uid, CAST(NULL AS BIGINT) AS ln,
                   CAST(NULL AS BIGINT) AS bin_idx
            FROM (SELECT DISTINCT pk FROM ranked)
          UNION ALL
            SELECT pk, r,
                   CASE WHEN idx > 0 THEN
                            list_transform(range(1, len(caps0) + 1),
                                j -> CASE WHEN j = idx THEN caps0[j] - ln
                                          ELSE caps0[j] END)
                        ELSE list_append(caps0, greatest({budget} - ln, 0))
                   END AS caps,
                   uid, ln,
                   CASE WHEN idx > 0 THEN idx - 1 ELSE len(caps0) END AS bin_idx
            FROM (
                SELECT i.pk AS pk, i.r AS r, rec.caps AS caps0,
                       i.chunk_uid AS uid, i.ln AS ln,
                       COALESCE(list_position(
                           list_transform(rec.caps, c -> c >= i.ln), true),
                           0) AS idx
                FROM rec JOIN ranked i ON i.pk = rec.pk AND i.r = rec.r + 1
            )
        )
        SELECT CAST(pk * 4294967296 + bin_idx AS BIGINT) AS bin_id,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(SUM(ln) AS BIGINT) AS fill_tokens
        FROM rec WHERE r >= 1
        GROUP BY pk, bin_idx
        ORDER BY bin_id
    """


_DUCK_PRED, _DUCK_HITS = _langid_exprs("duck")


def _decontaminate_sql() -> str:
    from .dedup import _duck_shingles

    scaled = int(round(CONTAM_MIN_RATIO * 1000))
    return f"""
        WITH bench AS (
            SELECT DISTINCT unnest({_duck_shingles()}) AS shingle
            FROM documents WHERE doc_id % 20 = 0
        ), postings AS (
            SELECT DISTINCT doc_id, unnest({_duck_shingles()}) AS shingle
            FROM documents WHERE doc_id % 20 != 0
        ), totals AS (
            SELECT doc_id, COUNT(*) AS n_sh FROM postings GROUP BY doc_id
        ), shared AS (
            SELECT doc_id, COUNT(*) AS n_shared
            FROM postings JOIN bench USING (shingle)
            GROUP BY doc_id
        )
        SELECT doc_id, n_shared, n_sh
        FROM shared JOIN totals USING (doc_id)
        WHERE n_shared * 1000 >= n_sh * {scaled}
        ORDER BY doc_id
    """


ORACLE_SQL: dict[str, str] = {
    "decontaminate_docs": _decontaminate_sql(),
    "text_clean": f"""
        WITH cleaned AS (
            SELECT doc_id,
                   trim(regexp_replace(lower(
                       regexp_replace(regexp_replace(text, '{_URL_RE}', ' ', 'g'),
                                      '{_EMAIL_RE}', ' ', 'g')),
                       '\\s+', ' ', 'g')) AS clean_text,
                   CAST(len(regexp_extract_all(text, '{_URL_RE}', 0)) AS INTEGER) AS n_urls,
                   CAST(len(regexp_extract_all(text, '{_EMAIL_RE}', 0)) AS INTEGER) AS n_emails
            FROM documents
        )
        SELECT doc_id, md5(clean_text) AS clean_md5,
               CAST(length(clean_text) AS INTEGER) AS n_chars_clean,
               n_urls, n_emails
        FROM cleaned ORDER BY doc_id
    """,
    "doc_chunks": f"""
        WITH t AS (
            SELECT doc_id, {_DUCK_WORDS} AS toks FROM documents
        ), n AS (
            SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0
        ), e AS (
            SELECT doc_id, toks,
                   unnest(range(0, greatest(CAST(ceil((n - {CHUNK_TOKENS}) / {CHUNK_STRIDE}.0) AS BIGINT), 0) + 1)) AS chunk_id
            FROM n
        )
        SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
               CAST(len(toks[chunk_id * {CHUNK_STRIDE} + 1 : chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS}]) AS INTEGER) AS n_chunk_tokens,
               md5(array_to_string(toks[chunk_id * {CHUNK_STRIDE} + 1 : chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS}], ' ')) AS chunk_md5
        FROM e ORDER BY doc_id, chunk_id
    """,
    "sample_documents": f"""
        SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        WHERE (doc_id * {_KNUTH}) % {_MOD32} % 1000 < {_sample_rate_sql()}
        GROUP BY lang ORDER BY lang
    """,
    "text_langid": f"""
        SELECT doc_id, lang, {_DUCK_PRED} AS pred_lang,
               CAST({_DUCK_HITS} AS INTEGER) AS n_hits
        FROM documents ORDER BY doc_id
    """,
    "text_tokens": f"""
        SELECT doc_id,
               CAST(len({_DUCK_WORDS}) AS INTEGER) AS n_tokens_ws,
               CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]', 0)) AS INTEGER) AS n_tokens_bpe,
               CAST(len(list_distinct({_DUCK_WORDS})) AS INTEGER) AS n_tokens_distinct,
               CAST(length(text) AS INTEGER) AS n_chars_measured
        FROM documents ORDER BY doc_id
    """,
    "text_quality": _duck_quality_sql(),
    "text_repetition": _duck_repetition_sql(),
    "language_rebalance": f"""
        WITH counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
        rates AS (
          SELECT lang,
                 CAST(FLOOR(1000 * (SELECT MIN(n) FROM counts) / n) AS BIGINT) AS rate
          FROM counts),
        kept AS (
          SELECT d.lang, d.n_chars
          FROM documents d JOIN rates r USING (lang)
          WHERE (d.doc_id * {_KNUTH}) % {_MOD32} % 1000 < r.rate)
        SELECT lang, COUNT(*) AS n_kept, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM kept GROUP BY lang ORDER BY lang
    """,
    "tfidf_search": _duck_tfidf_sql(),

    "mixture_sample_sources": _mixture_sample_sql(),
    "text_scrub_pii": _scrub_pii_sql(),
    "text_fingerprint": f"""
        WITH sh AS (
            SELECT doc_id,
                   list_sort(list_transform(
                       range(1, greatest(len({_DUCK_WORDS}) - 3, 1) + 1),
                       i -> md5(array_to_string(({_DUCK_WORDS})[i:i+3], ' ')))) AS hashes
            FROM documents
        )
        SELECT doc_id,
               md5(array_to_string(hashes[1:4], '')) AS fingerprint,
               hashes[1] AS min_shingle_hash
        FROM sh ORDER BY doc_id
    """,
}

def weighted_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted corpus subsample: 5 docs per language drawn
    with probability proportional to length (Efraimidis-Spirakis A-ES
    over hash-derived uniforms — see operators.sampling.weighted_sample_k)."""
    from .sampling import weighted_sample_k

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "lang", "n_chars")
    return (
        weighted_sample_k(docs, "lang", "doc_id", "n_chars", 5)
        .select("lang", "doc_id", "n_chars", "sample_rank")
        .orderBy("lang", "sample_rank")
    )


ORACLE_WEIGHTED_SAMPLE = f"""
    WITH keyed AS (
        SELECT lang, doc_id, n_chars,
               -ln((((doc_id * {_KNUTH}) % {_MOD32})::DOUBLE + 0.5) / {float(_MOD32)})
                 / n_chars::DOUBLE AS key
        FROM documents WHERE n_chars > 0
    )
    SELECT lang, doc_id, n_chars,
           ROW_NUMBER() OVER (PARTITION BY lang ORDER BY key ASC, doc_id ASC)
               AS sample_rank
    FROM keyed
    QUALIFY sample_rank <= 5
    ORDER BY lang, sample_rank
"""


ORACLE_SQL["weighted_doc_sample"] = ORACLE_WEIGHTED_SAMPLE

def source_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture planning view: whitespace-token budget per
    source with integer-exact ppm shares and cumulative coverage in
    descending-budget order — "which sources dominate the mixture and
    where does the tail start".

    One scan, one tiny per-source aggregate; shares are integer ppm
    (BIGINT div) and the cumulative window runs over the aggregated
    |sources|-row frame only.
    """
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    per_source = (
        docs.select("source", F.expr(f"size({_SPARK_WORDS})").alias("n_tok"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_tok").cast("bigint")).alias("tokens"),
        )
    )
    total = F.broadcast(per_source.agg(F.sum("tokens").alias("total_tokens")))
    w = Window.orderBy(F.desc("tokens"), F.asc("source"))
    return (
        per_source.crossJoin(total)
        .withColumn("rank", F.row_number().over(w))
        .withColumn(
            "cum_tokens",
            F.sum("tokens").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .select(
            "rank",
            "source",
            "n_docs",
            "tokens",
            F.expr("CAST(tokens * 1000000 div total_tokens AS BIGINT)").alias("share_ppm"),
            F.expr("CAST(cum_tokens * 1000000 div total_tokens AS BIGINT)").alias("cum_share_ppm"),
        )
        .orderBy("rank")
    )


ORACLE_SQL_SOURCE_BUDGET = f"""
    WITH per_source AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len({_DUCK_WORDS})) AS BIGINT) AS tokens
        FROM documents GROUP BY source
    ), tot AS (
        SELECT CAST(SUM(tokens) AS BIGINT) AS total_tokens FROM per_source
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY tokens DESC, source ASC) AS INTEGER) AS rank,
           source, n_docs, tokens,
           CAST(tokens * 1000000 // total_tokens AS BIGINT) AS share_ppm,
           CAST(CAST(SUM(tokens) OVER (ORDER BY tokens DESC, source ASC
                ROWS UNBOUNDED PRECEDING) AS BIGINT) * 1000000 // total_tokens AS BIGINT)
               AS cum_share_ppm
    FROM per_source CROSS JOIN tot
    ORDER BY rank
"""

# ---- blocklist filtering (C4-style "bad words" pass) ------------------

# words whose density flags a doc for removal; real pipelines load the
# list from a file — the operator only needs the token-set contract
BLOCKLIST: tuple[str, ...] = ("dup", "slow", "error")
BLOCKLIST_MAX_PERMILLE = 60  # drop a doc when > 6% of tokens are blocked


def blocklist_filter(
    df: DataFrame,
    blocklist: tuple[str, ...] = BLOCKLIST,
    max_permille: int = BLOCKLIST_MAX_PERMILLE,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style blocklist pass: per-doc blocked-token count and density
    (ppm-style integer permille — engine-exact), plus the keep/drop
    verdict.  One scan, one token-filter lambda over the pre-split
    array; no shuffle at all (verdict is row-local).
    """
    words = _SPARK_WORDS.replace("text", text_col)
    quoted = ", ".join(f"'{w}'" for w in blocklist)
    d = df.select(
        F.col(id_col).alias("doc_id"), F.expr(words).alias("wd")
    ).select(
        "doc_id",
        F.expr("size(wd)").alias("n_tokens"),
        F.expr(f"size(filter(wd, t -> lower(t) IN ({quoted})))").alias(
            "n_blocked"
        ),
    )
    return d.select(
        "doc_id",
        "n_tokens",
        "n_blocked",
        F.expr(
            "CASE WHEN n_tokens > 0"
            " THEN CAST(n_blocked * 1000 div n_tokens AS INT) ELSE 0 END"
        ).alias("blocked_permille"),
        F.expr(
            f"n_tokens > 0 AND n_blocked * 1000 > {max_permille} * n_tokens"
        ).alias("dropped"),
    )


def text_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: blocklist density + verdict over documents."""
    return blocklist_filter(load_table(spark, "documents", sf_dir)).orderBy(
        "doc_id"
    )


def _blocklist_oracle_sql() -> str:
    quoted = ", ".join(f"'{w}'" for w in BLOCKLIST)
    return f"""
        WITH d AS (
            SELECT doc_id,
                   len({_DUCK_WORDS}) AS n_tokens,
                   len(list_filter({_DUCK_WORDS},
                       t -> lower(t) IN ({quoted}))) AS n_blocked
            FROM documents
        )
        SELECT doc_id,
               CAST(n_tokens AS INT) AS n_tokens,
               CAST(n_blocked AS INT) AS n_blocked,
               CAST(CASE WHEN n_tokens > 0
                    THEN n_blocked * 1000 // n_tokens ELSE 0 END AS INT)
                   AS blocked_permille,
               n_tokens > 0 AND n_blocked * 1000 > {BLOCKLIST_MAX_PERMILLE} * n_tokens
                   AS dropped
        FROM d ORDER BY doc_id
    """


# ---- multi-keyword tagging --------------------------------------------

# tag -> keyword set; a doc carries a tag when any keyword appears as a
# token (exact token match — the curation-taxonomy primitive)
KEYWORD_TAGS: dict[str, tuple[str, ...]] = {
    "exec": ("scan", "join", "agg"),
    "perf": ("fast", "slow"),
    "storage": ("table", "column", "row"),
    "streaming": ("stream", "window"),
}


def keyword_tag(
    df: DataFrame,
    tags: dict[str, tuple[str, ...]] = KEYWORD_TAGS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Multi-keyword taxonomy tagging: (id, tag, n_hits) for every tag
    whose keyword set intersects the doc's token multiset, with the
    exact hit count.  The tag dictionary is a plan-time constant
    (broadcast-free: it compiles into the filter lambdas); one scan,
    one explode bounded by |tags| per doc — never tokens x keywords.
    """
    words = _SPARK_WORDS.replace("text", text_col)
    base = df.select(F.col(id_col).alias("doc_id"), F.expr(words).alias("wd"))
    entries = ", ".join(
        "named_struct('tag', '{0}', 'n_hits', size(filter(wd, t -> lower(t) IN ({1}))))".format(
            tag, ", ".join(f"'{w}'" for w in kws)
        )
        for tag, kws in sorted(tags.items())
    )
    return (
        base.select(
            "doc_id", F.explode(F.expr(f"array({entries})")).alias("e")
        )
        .select(
            "doc_id",
            F.col("e.tag").alias("tag"),
            F.col("e.n_hits").cast("int").alias("n_hits"),
        )
        .where(F.col("n_hits") > 0)
    )


def text_keyword_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: taxonomy tags over documents."""
    return keyword_tag(load_table(spark, "documents", sf_dir)).orderBy(
        "doc_id", "tag"
    )


def _keyword_tags_oracle_sql() -> str:
    rows = "\n        UNION ALL\n".join(
        """        SELECT doc_id, '{0}' AS tag,
               CAST(len(list_filter({1}, t -> lower(t) IN ({2}))) AS INT) AS n_hits
        FROM documents""".format(
            tag, _DUCK_WORDS, ", ".join(f"'{w}'" for w in kws)
        )
        for tag, kws in sorted(KEYWORD_TAGS.items())
    )
    return f"""
        SELECT doc_id, tag, n_hits FROM (
{rows}
        ) WHERE n_hits > 0
        ORDER BY doc_id, tag
    """


QUERIES = {
    "source_token_budget": source_token_budget,
    "text_blocklist": text_blocklist,
    "text_keyword_tags": text_keyword_tags,
    "text_langid": text_langid,
    "weighted_doc_sample": weighted_doc_sample,
    "text_tokens": text_tokens,
    "text_quality": text_quality,
    "text_repetition": text_repetition,
    "language_rebalance": language_rebalance,
    "tfidf_search": tfidf_search,
    "text_fingerprint": text_fingerprint,
    "text_clean": text_clean,
    "doc_chunks": doc_chunks,
    "doc_chunks_udtf": doc_chunks_udtf,
    "sample_documents": sample_documents,
    "mixture_sample_sources": mixture_sample_sources,
    "text_scrub_pii": text_scrub_pii,
    "decontaminate_docs": decontaminate_docs,
    "pack_chunks": pack_chunks,
}

ORACLE_SQL["source_token_budget"] = ORACLE_SQL_SOURCE_BUDGET
# the UDTF chunker must equal the SQL chunker bit-for-bit, so it is
# checked against the same independent DuckDB algorithm
ORACLE_SQL["doc_chunks_udtf"] = ORACLE_SQL["doc_chunks"]
ORACLE_SQL["text_blocklist"] = _blocklist_oracle_sql()
# FFD bin manifest replay (promoted r6: was rows-only) — possible since
# pack groups are keyed by the portable hash, not Spark's partitioner
ORACLE_SQL["pack_chunks"] = _pack_chunks_oracle_sql()
ORACLE_SQL["text_keyword_tags"] = _keyword_tags_oracle_sql()


def dedup_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    max_df: int = 1,
) -> DataFrame:
    """CCNet-style line-level dedup: drop every LINE that appears in
    more than ``max_df`` documents (boilerplate headers, nav bars,
    cookie banners repeat across pages; prose doesn't), then reassemble
    each document from its surviving lines in original order.

    One scan: posexplode the split, hash-count line df across the
    corpus (md5 of the trimmed line — the shuffle carries 32-byte
    digests, not line text), anti-filter, re-join with array ordering
    by original position.  Docs whose every line is boilerplate come
    back EMPTY (kept, zero lines) so downstream length filters make
    the drop decision — this operator never deletes documents.
    Returns (id, clean_text, n_lines_kept, n_lines_dropped).
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), F.lit(sep))).alias("pos", "line"),
    ).withColumn("lh", F.md5(F.trim(F.col("line"))))
    dfreq = (
        lines.select("lh", id_col).distinct()
        .groupBy("lh").agg(F.count(F.lit(1)).alias("line_df"))
    )
    marked = lines.hint("merge").join(dfreq, "lh").withColumn(
        "keep", F.col("line_df") <= max_df
    )
    return (
        marked.groupBy(id_col)
        .agg(
            F.array_join(
                F.expr("transform(array_sort(collect_list(CASE WHEN keep THEN struct(pos, line) END)), s -> s.line)"),
                sep,
            ).alias("clean_text"),
            F.sum(F.expr("CASE WHEN keep THEN 1 ELSE 0 END")).alias("n_lines_kept"),
            F.sum(F.expr("CASE WHEN keep THEN 0 ELSE 1 END")).alias("n_lines_dropped"),
        )
        .orderBy(id_col)
    )


def dedup_lines_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level dedup over MULTI-LINE documents — ORACLE-BACKED
    (new r6): the synthetic corpus ships single-line docs (on which
    line dedup degenerates to exact dedup), so this face synthesizes
    the multi-line shape deterministically INSIDE the query — a
    per-source banner, a global nav line, the original body, and a
    per-source footer, identically on both engines — then runs
    ``dedup_lines``.  The banner/nav/footer lines repeat across
    documents (line_df > 1) and are dropped; unique bodies survive;
    bodies of exact-duplicate docs also exceed max_df and are dropped —
    exactly the CCNet boilerplate-removal semantics the generic
    operator implements, now pinned cross-engine (VERDICT r5 gap #2).
    """
    docs = load_table(spark, "documents", sf_dir).where(F.col("text").isNotNull())
    # every 11th doc gets a CONSTANT body, so whole documents reduce to
    # boilerplate and come back EMPTY (kept, zero lines) — pinning the
    # never-deletes-documents reassembly contract, not just line drops
    body = F.when(
        F.col("doc_id") % 11 == 0, F.lit("lorem duplicated body")
    ).otherwise(F.col("text"))
    multi = docs.select(
        "doc_id",
        F.concat(
            F.lit("SOURCE: "), F.col("source"), F.lit(" | all rights reserved\n"),
            F.lit("home | about | contact\n"),
            body, F.lit("\n"),
            F.lit("copyright "), F.col("source"),
        ).alias("text"),
    )
    return dedup_lines(multi, "doc_id", "text").select(
        "doc_id",
        "clean_text",
        F.col("n_lines_kept").cast("bigint").alias("n_lines_kept"),
        F.col("n_lines_dropped").cast("bigint").alias("n_lines_dropped"),
    )


QUERIES["dedup_lines_docs"] = dedup_lines_docs
ORACLE_SQL["dedup_lines_docs"] = """
    WITH multi AS (
        SELECT doc_id,
               'SOURCE: ' || source || ' | all rights reserved' || chr(10)
               || 'home | about | contact' || chr(10)
               || CASE WHEN doc_id % 11 = 0 THEN 'lorem duplicated body'
                       ELSE text END || chr(10)
               || 'copyright ' || source AS mtext
        FROM documents WHERE text IS NOT NULL
    ), sp AS (
        SELECT doc_id, string_split(mtext, chr(10)) AS ls FROM multi
    ), lines AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ls) + 1),
                      i -> struct_pack(pos := i - 1, line := ls[i]))) AS u
        FROM sp
    ), flat AS (
        SELECT doc_id, CAST(u.pos AS BIGINT) AS pos, u.line AS line FROM lines
    ), dfreq AS (
        SELECT trim(line) AS tl, COUNT(DISTINCT doc_id) AS line_df
        FROM flat GROUP BY trim(line)
    ), marked AS (
        SELECT f.doc_id, f.pos, f.line, d.line_df <= 1 AS keep
        FROM flat f JOIN dfreq d ON trim(f.line) = d.tl
    )
    SELECT doc_id,
           COALESCE(string_agg(line, chr(10) ORDER BY pos)
                      FILTER (WHERE keep), '') AS clean_text,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_lines_kept,
           CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_lines_dropped
    FROM marked GROUP BY doc_id ORDER BY doc_id
"""


def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document (nats) — the
    gibberish/compression-quality signal: natural prose sits in a
    narrow entropy band, keyboard mash and base64 blobs above it,
    repeated-character junk below.

    Char histogram per doc via one posexplode+count, entropy from
    exact integer counts, only the final ln/ratio in DOUBLE (round 6).
    """
    docs = load_table(spark, "documents", sf_dir)
    chars = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), "")).alias("ch")
    ).where(F.col("ch") != "")
    counts = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    tot = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("n_distinct_chars")
    )
    term = "-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"
    return (
        counts.join(tot, "doc_id")
        .groupBy("doc_id", "n", "n_distinct_chars")
        .agg(F.round(F.sum(F.expr(term)), 6).alias("entropy_nats"))
        .select(
            "doc_id",
            F.col("n").alias("n_chars"),
            "n_distinct_chars",
            "entropy_nats",
        )
        .orderBy("doc_id")
    )


ORACLE_SQL["text_entropy"] = """
    WITH chars AS (
        SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
    ), counts AS (
        SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c
        FROM chars WHERE ch != '' GROUP BY doc_id, ch
    ), tot AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_chars
        FROM counts GROUP BY doc_id
    )
    SELECT doc_id, n AS n_chars, n_distinct_chars,
           ROUND(SUM(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                     * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))), 6) AS entropy_nats
    FROM counts JOIN tot USING (doc_id)
    GROUP BY doc_id, n, n_distinct_chars
    ORDER BY doc_id
"""

QUERIES["text_entropy"] = text_entropy


# ---- readability scoring ---------------------------------------------


def readability(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Flesch reading ease + Flesch-Kincaid grade per document from
    pure regex counts — the classic curation signal for audience level
    (and a cheap gibberish flag: nonsense text lands far outside the
    0-100 band).

    Syllables are approximated as vowel groups ('[aeiouy]+' runs in
    the lowercased text), the standard regex proxy; sentences are
    '[.!?]+' runs (min 1).  The three counts are exact integers from
    one map-only scan — no shuffle at all — and the two scores are
    single DOUBLE expressions, so cross-engine parity is exact.
    """
    words = f"size({_SPARK_WORDS.replace('text', text_col)})"
    syl = f"size(regexp_extract_all(lower({text_col}), '[aeiouy]+', 0))"
    sent = f"greatest(size(regexp_extract_all({text_col}, '[.!?]+', 0)), 1)"
    w_per_s = "(CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))"
    syl_per_w = "(CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))"
    return (
        df.select(
            F.col(id_col),
            F.expr(words).alias("n_words"),
            F.expr(sent).alias("n_sentences"),
            F.expr(syl).alias("n_syllables"),
        )
        .where(F.col("n_words") > 0)
        .select(
            id_col,
            "n_words",
            "n_sentences",
            "n_syllables",
            F.expr(
                f"ROUND(206.835 - 1.015 * {w_per_s} - 84.6 * {syl_per_w}, 4)"
            ).alias("flesch_ease"),
            F.expr(
                f"ROUND(0.39 * {w_per_s} + 11.8 * {syl_per_w} - 15.59, 4)"
            ).alias("fk_grade"),
        )
    )


def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return readability(docs).orderBy("doc_id")


ORACLE_SQL["text_readability"] = f"""
    WITH c AS (
        SELECT doc_id,
               CAST(len({_DUCK_WORDS}) AS BIGINT) AS n_words,
               CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS n_sentences,
               CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables
        FROM documents
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           ROUND(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
                 - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)), 4) AS flesch_ease,
           ROUND(0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
                 + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)) - 15.59, 4) AS fk_grade
    FROM c WHERE n_words > 0 ORDER BY doc_id
"""

QUERIES["text_readability"] = text_readability


EXACT_CONTAM_N = 8  # canonical eval-leakage n-gram size (13 in papers; 8 fits the short synthetic docs)


def exact_ngram_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = EXACT_CONTAM_N,
) -> DataFrame:
    """Exact n-gram decontamination: flag every corpus document that
    shares AT LEAST ONE exact word n-gram with the benchmark — the
    canonical eval-set leakage gate (GPT-3 appendix C ran 13-grams;
    Llama and most open pipelines since use 8-13).  The companion to
    ``contamination_check``: that one asks "is MOST of this doc in the
    benchmark" (ratio), this one asks "does ANY verbatim span leak"
    (a single long n-gram is already memorizable).

    Returns (doc_id, n_colliding) — distinct colliding n-grams per
    flagged doc.  Same shape as the ratio gate: the benchmark explodes
    to a DISTINCT broadcastable n-gram set; the corpus posting list
    equi-joins it.  Cost is |corpus n-grams| + |benchmark n-grams|,
    never doc x doc — at 100 TB this is one hash join against a
    benchmark-sized build side (md5 the n-gram if span text is long).
    """
    from .dedup import _spark_shingles

    def _grams(df):
        return df.select(
            F.col(id_col).alias("doc_id"),
            F.expr(_SPARK_WORDS.replace("text", text_col)).alias("wd"),
        ).select(
            "doc_id", F.expr(_spark_shingles(words="wd", n=n)).alias("sh")
        )

    bench = (
        _grams(benchmark)
        .select(F.explode_outer("sh").alias("gram"))
        .distinct()
    )
    postings = (
        _grams(corpus)
        .select("doc_id", F.explode_outer("sh").alias("gram"))
        .distinct()
    )
    return (
        postings.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_colliding"))
    )


def decontaminate_exact_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: every 20th document is the held-out benchmark
    (same split as the ratio gate); flag corpus docs leaking any exact
    8-gram."""
    docs = load_table(spark, "documents", sf_dir)
    benchmark = docs.where(F.col("doc_id") % 20 == 0)
    corpus = docs.where(F.col("doc_id") % 20 != 0)
    return exact_ngram_decontaminate(corpus, benchmark).orderBy("doc_id")


def _decontaminate_exact_sql() -> str:
    from .dedup import _duck_shingles

    g = _duck_shingles(n=EXACT_CONTAM_N)
    return f"""
        WITH bench AS (
            SELECT DISTINCT unnest({g}) AS gram
            FROM documents WHERE doc_id % 20 = 0
        ), postings AS (
            SELECT DISTINCT doc_id, unnest({g}) AS gram
            FROM documents WHERE doc_id % 20 != 0
        )
        SELECT doc_id, COUNT(*) AS n_colliding
        FROM postings JOIN bench USING (gram)
        GROUP BY doc_id ORDER BY doc_id
    """


QUERIES["decontaminate_exact_ngrams"] = decontaminate_exact_ngrams
ORACLE_SQL["decontaminate_exact_ngrams"] = _decontaminate_exact_sql()


FUNNEL_RULES = ("too_short", "too_long", "word_len", "low_diversity", "exact_dup")


def filter_funnel(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Sequential filter FUNNEL over the Gopher-style quality rules +
    exact dedup: one row per rule with how many docs that rule dropped
    (first failing rule wins, like the real pipeline applies them) and
    how many remain after it — the per-rule observability table every
    production corpus build publishes (FineWeb's "what each filter
    removed" chart).  Rule set and thresholds are exactly
    ``quality_score``'s, so the funnel explains that operator's
    verdict rather than inventing a second policy.

    One scan computes all per-doc signals (the dedup signal is one
    window over md5(text)); the funnel is then a groupBy on the
    first-failing rule, a broadcast stage list making zero-drop rules
    explicit, and a running-total window over |rules| rows.  Scale
    cost = the dedup hash shuffle; everything else is map-side.
    """
    from pyspark.sql import Window

    docs = df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).withColumn("wd", F.expr(_SPARK_WORDS))
    sig = docs.select(
        "doc_id",
        F.expr("size(wd)").alias("n_words"),
        F.expr("CAST(length(replace(text, ' ', '')) AS DOUBLE) / size(wd)").alias("mwl"),
        F.expr("CAST(size(array_distinct(wd)) AS DOUBLE) / size(wd)").alias("dr"),
        (
            F.col("doc_id")
            != F.min("doc_id").over(Window.partitionBy(F.md5("text")))
        ).alias("is_dup"),
    )
    first_fail = (
        F.when(F.col("n_words") < 10, F.lit("too_short"))
        .when(F.col("n_words") > 1000, F.lit("too_long"))
        .when((F.col("mwl") < 2.0) | (F.col("mwl") > 12.0), F.lit("word_len"))
        .when(F.col("dr") < 0.1, F.lit("low_diversity"))
        .when(F.col("is_dup"), F.lit("exact_dup"))
    )
    drops = (
        sig.select(first_fail.alias("rule"))
        .where(F.col("rule").isNotNull())
        .groupBy("rule")
        .agg(F.count(F.lit(1)).alias("n_dropped"))
    )
    spark = df.sparkSession
    stages = spark.createDataFrame(
        [(i + 1, r) for i, r in enumerate(FUNNEL_RULES)], "stage int, rule string"
    )
    total = sig.agg(F.count(F.lit(1)).alias("n_total"))
    w = Window.orderBy("stage").rowsBetween(Window.unboundedPreceding, 0)
    return (
        stages.join(drops, "rule", "left")
        .withColumn("n_dropped", F.coalesce("n_dropped", F.lit(0)))
        .crossJoin(F.broadcast(total))
        .withColumn("n_remaining", F.col("n_total") - F.sum("n_dropped").over(w))
        .select("stage", "rule", "n_dropped", "n_remaining")
        .orderBy("stage")
    )


def doc_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: the quality-rule funnel over the documents table."""
    return filter_funnel(load_table(spark, "documents", sf_dir))


def _filter_funnel_sql() -> str:
    stage_values = ", ".join(
        f"({i + 1}, '{r}')" for i, r in enumerate(FUNNEL_RULES)
    )
    return f"""
        WITH sig AS (
            SELECT doc_id,
                   len({_DUCK_WORDS}) AS n_words,
                   CAST(length(replace(text, ' ', '')) AS DOUBLE) / len({_DUCK_WORDS}) AS mwl,
                   CAST(len(list_distinct({_DUCK_WORDS})) AS DOUBLE) / len({_DUCK_WORDS}) AS dr,
                   doc_id != MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
            FROM documents
        ), tagged AS (
            SELECT CASE WHEN n_words < 10 THEN 'too_short'
                        WHEN n_words > 1000 THEN 'too_long'
                        WHEN mwl < 2.0 OR mwl > 12.0 THEN 'word_len'
                        WHEN dr < 0.1 THEN 'low_diversity'
                        WHEN is_dup THEN 'exact_dup'
                   END AS rule
            FROM sig
        ), drops AS (
            SELECT rule, COUNT(*) AS n_dropped FROM tagged
            WHERE rule IS NOT NULL GROUP BY rule
        ), stages(stage, rule) AS (VALUES {stage_values})
        SELECT CAST(s.stage AS INTEGER) AS stage, s.rule,
               CAST(COALESCE(d.n_dropped, 0) AS BIGINT) AS n_dropped,
               CAST((SELECT COUNT(*) FROM documents)
                 - SUM(COALESCE(d.n_dropped, 0)) OVER (ORDER BY s.stage) AS BIGINT) AS n_remaining
        FROM stages s LEFT JOIN drops d USING (rule)
        ORDER BY s.stage
    """


QUERIES["doc_filter_funnel"] = doc_filter_funnel
ORACLE_SQL["doc_filter_funnel"] = _filter_funnel_sql()


def source_leakage_matrix(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    n: int = EXACT_CONTAM_N,
) -> DataFrame:
    """Cross-source verbatim-overlap matrix: for every ordered source
    pair (a < b), how many distinct word n-grams appear in BOTH — the
    corpus-level leakage heatmap (mirrored content between crawls,
    syndication, a benchmark hiding inside a crawl slice) that decides
    which source pairs need the doc-level decontamination gates.

    Shape: one distinct (source, gram) posting list (two map-side
    aggregations), self-joined on the gram — only co-occurring grams
    materialize, and the output is |sources|^2-bounded.  md5 the grams
    at 100 TB so the shuffle carries 32-byte keys, not span text.
    """
    from .dedup import _spark_shingles

    grams = (
        df.select(
            F.col(group_col).alias("src"),
            F.expr(_SPARK_WORDS.replace("text", text_col)).alias("wd"),
        )
        .select("src", F.explode_outer(F.expr(_spark_shingles(words="wd", n=n))).alias("gram"))
        .distinct()
    )
    # merge hint: exploded corpus sides must never be broadcast (the
    # estimator cannot see the explode fan-out)
    a = grams.alias("a").hint("merge")
    b = grams.alias("b")
    return (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.src") < F.col("b.src")),
        )
        .groupBy(
            F.col("a.src").alias("source_a"), F.col("b.src").alias("source_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )


def source_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: source x source shared verbatim 8-gram counts."""
    return source_leakage_matrix(load_table(spark, "documents", sf_dir)).orderBy(
        "source_a", "source_b"
    )


def _source_leakage_sql() -> str:
    from .dedup import _duck_shingles

    g = _duck_shingles(n=EXACT_CONTAM_N)
    return f"""
        WITH grams AS (
            SELECT DISTINCT source AS src, unnest({g}) AS gram
            FROM documents
        )
        SELECT a.src AS source_a, b.src AS source_b, COUNT(*) AS n_shared_ngrams
        FROM grams a JOIN grams b ON a.gram = b.gram AND a.src < b.src
        GROUP BY 1, 2 ORDER BY 1, 2
    """


def boilerplate_ratio(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    sep: str = "\\n",
    max_df: int = 1,
) -> DataFrame:
    """Per-source boilerplate rate: the fraction of line OCCURRENCES
    whose line appears in more than ``max_df`` documents corpus-wide
    (nav bars, cookie banners, license headers) — the source-level
    health read on what ``dedup_lines`` would strip, reported as
    integer counts + a ppm so the matrix is value-exact.

    One posexplode scan; line identity is md5 of the trimmed line (the
    shuffle carries digests); document frequency is counted on
    distinct (line, doc) pairs, then line occurrences roll up by
    source.
    """
    lines = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("src"),
        F.explode_outer(F.split(F.col(text_col), F.lit(sep))).alias("line"),
    ).withColumn("lh", F.md5(F.trim(F.col("line"))))
    dfreq = (
        lines.select("lh", "doc_id").distinct()
        .groupBy("lh")
        .agg(F.count(F.lit(1)).alias("line_df"))
    )
    return (
        lines.hint("merge").join(dfreq, "lh")
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum((F.col("line_df") > max_df).cast("bigint")).alias("n_boiler"),
        )
        .select(
            F.col("src").alias("source"),
            "n_lines",
            "n_boiler",
            F.floor(F.lit(1000000) * F.col("n_boiler") / F.col("n_lines"))
            .cast("bigint")
            .alias("boiler_ppm"),
        )
    )


def source_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: per-source boilerplate line rate (df > 1)."""
    return boilerplate_ratio(load_table(spark, "documents", sf_dir)).orderBy("source")


_BOILERPLATE_SQL = r"""
    WITH lines AS (
        SELECT doc_id, source AS src,
               md5(trim(line)) AS lh
        FROM (SELECT doc_id, source, unnest(string_split(text, '\n')) AS line
              FROM documents)
    ), dfreq AS (
        SELECT lh, COUNT(DISTINCT doc_id) AS line_df FROM lines GROUP BY lh
    )
    SELECT src AS source, COUNT(*) AS n_lines,
           CAST(SUM(CASE WHEN line_df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
           CAST(FLOOR(1000000.0 * SUM(CASE WHEN line_df > 1 THEN 1 ELSE 0 END)
                / COUNT(*)) AS BIGINT) AS boiler_ppm
    FROM lines JOIN dfreq USING (lh)
    GROUP BY src ORDER BY src
"""

QUERIES["source_leakage"] = source_leakage
ORACLE_SQL["source_leakage"] = _source_leakage_sql()
QUERIES["source_boilerplate"] = source_boilerplate
ORACLE_SQL["source_boilerplate"] = _BOILERPLATE_SQL


def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility table: how many sub-word
    (BPE-ish regex) tokens each whitespace word costs, and how many
    characters each token carries — the standard tokenizer-evaluation
    read (languages with fertility >> 1 pay more context window per
    word; a multilingual token budget is planned off exactly this
    table).  One scan, integer sums, FLOOR-ppm ratios — value-exact.
    """
    docs = load_table(spark, "documents", sf_dir)
    per_doc = docs.select(
        "lang",
        F.expr(f"size({_SPARK_WORDS})").cast("bigint").alias("ws"),
        F.expr(
            "size(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]', 0))"
        ).cast("bigint").alias("bpe"),
        F.length("text").cast("bigint").alias("chars"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws").alias("sum_words"),
            F.sum("bpe").alias("sum_tokens"),
            F.sum("chars").alias("sum_chars"),
        )
        .select(
            "lang",
            "n_docs",
            "sum_words",
            "sum_tokens",
            F.expr("(sum_tokens * 1000000) div sum_words").alias("fertility_ppm"),
            F.expr("(sum_chars * 1000000) div sum_tokens").alias("chars_per_token_ppm"),
        )
        .orderBy("lang")
    )


ORACLE_SQL["tokenizer_fertility"] = f"""
    WITH per_doc AS (
        SELECT lang,
               CAST(len({_DUCK_WORDS}) AS BIGINT) AS ws,
               CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]', 0)) AS BIGINT) AS bpe,
               CAST(length(text) AS BIGINT) AS chars
        FROM documents
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(ws) AS BIGINT) AS sum_words,
           CAST(SUM(bpe) AS BIGINT) AS sum_tokens,
           CAST((SUM(bpe) * 1000000) // SUM(ws) AS BIGINT) AS fertility_ppm,
           CAST((SUM(chars) * 1000000) // SUM(bpe) AS BIGINT) AS chars_per_token_ppm
    FROM per_doc GROUP BY lang ORDER BY lang
"""
QUERIES["tokenizer_fertility"] = tokenizer_fertility


# ---- per-document keyphrases ------------------------------------------

KEYPHRASE_TOP = 3


def doc_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document over the FULL corpus vocabulary
    — the "what is this doc about" labeling pass (tfidf_rank ranks
    docs for a fixed query; this ranks TERMS within each doc).

    Integer-exact scores (tf * FLOOR(1e6*N/df), the tfidf_rank idiom);
    terms appearing in more than half the corpus are dropped as
    uninformative (a deterministic stopword cut that needs no list).
    Two aggregations over the (doc, word) frame + one per-doc window;
    the df side joins on the word key (never broadcast — web-scale
    vocabularies are billions of terms, same posture as perplexity).
    """
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    tf = (
        docs.select("doc_id", F.explode(F.expr(_SPARK_WORDS)).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n_docs = F.broadcast(docs.agg(F.count(F.lit(1)).alias("n_docs")))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_ppm"), F.asc("word")
    )
    return (
        tf.hint("merge").join(dfreq, "word")
        .crossJoin(n_docs)
        .where(F.expr("df * 2 < n_docs"))
        .select(
            "doc_id",
            "word",
            F.expr("CAST(tf * (1000000 * n_docs DIV df) AS BIGINT)").alias(
                "score_ppm"
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= KEYPHRASE_TOP)
        .select("doc_id", F.col("rank").cast("int").alias("rank"), "word", "score_ppm")
        .orderBy("doc_id", "rank")
    )


ORACLE_SQL["doc_keyphrases"] = f"""
    WITH tf AS (
        SELECT doc_id, w.word, CAST(COUNT(*) AS BIGINT) AS tf
        FROM documents d,
             LATERAL (SELECT UNNEST({_DUCK_WORDS}) AS word) w
        GROUP BY 1, 2
    ), dfreq AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ), n AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
    ), scored AS (
        SELECT doc_id, word,
               CAST(tf * (1000000 * n_docs // df) AS BIGINT) AS score_ppm
        FROM tf JOIN dfreq USING (word) CROSS JOIN n
        WHERE df * 2 < n_docs
    )
    SELECT doc_id, CAST(rank AS INTEGER) AS rank, word, score_ppm FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY score_ppm DESC, word ASC) AS rank
        FROM scored
    ) WHERE rank <= {KEYPHRASE_TOP}
    ORDER BY doc_id, rank
"""

QUERIES["doc_keyphrases"] = doc_keyphrases


# ---- token-budget gate (quota enforcement) --------------------------------

GATE_BUDGET_TOKENS = 150


def token_budget_gate(
    docs: DataFrame,
    budget: int = GATE_BUDGET_TOKENS,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ENFORCE a per-source token quota (source_token_budget PLANS one):
    docs are admitted in ``id_col`` order while the source's running
    token total stays within ``budget``; later docs are dropped.  The
    deterministic ingest-cap every mixture recipe ultimately compiles
    to ('no more than N tokens of source X').

    One window pass per source (cumulative token sum in id order),
    then a per-source rollup.  The admit rule is `cum <= budget` on
    exact integers, so a streaming replay that carries per-source
    offsets across micro-batches lands on the identical admitted set —
    asserted in the streaming suite.
    """
    toks = docs.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("did"),
        F.expr(f"size({_SPARK_WORDS.replace('text', text_col)})")
        .cast("long")
        .alias("n_tok"),
    )
    cum = toks.select(
        "grp",
        "n_tok",
        F.sum("n_tok")
        .over(
            Window.partitionBy("grp")
            .orderBy("did")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("cum"),
    )
    return (
        cum.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("cum") <= budget, 1).otherwise(0))
            .cast("long")
            .alias("n_accepted"),
            F.sum("n_tok").cast("long").alias("tokens_total"),
            F.sum(F.when(F.col("cum") <= budget, F.col("n_tok")).otherwise(0))
            .cast("long")
            .alias("tokens_accepted"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            "n_accepted",
            "tokens_total",
            "tokens_accepted",
        )
        .orderBy(group_col)
    )


def budget_gate_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: per-source admit/drop ledger of the token-budget
    gate over documents."""
    return token_budget_gate(load_table(spark, "documents", sf_dir))


ORACLE_SQL["budget_gate_summary"] = f"""
    WITH toks AS (
        SELECT source AS grp, doc_id AS did,
               CAST(len({_DUCK_WORDS}) AS BIGINT) AS n_tok
        FROM documents
    ), cum AS (
        SELECT grp, n_tok,
               SUM(n_tok) OVER (PARTITION BY grp ORDER BY did
                   ROWS UNBOUNDED PRECEDING) AS c
        FROM toks
    )
    SELECT grp AS source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN c <= {GATE_BUDGET_TOKENS} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_accepted,
           CAST(SUM(n_tok) AS BIGINT) AS tokens_total,
           CAST(SUM(CASE WHEN c <= {GATE_BUDGET_TOKENS} THEN n_tok ELSE 0 END) AS BIGINT)
               AS tokens_accepted
    FROM cum GROUP BY grp ORDER BY source
"""

QUERIES["budget_gate_summary"] = budget_gate_summary


# ---- output-shard planner ---------------------------------------------------

SHARD_TOKENS = 400


def plan_output_shards(
    docs: DataFrame,
    shard_tokens: int = SHARD_TOKENS,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Plan fixed-size training shards: docs are packed in ``id_col``
    order per group and a new shard starts when the RUNNING token total
    crosses a ``shard_tokens`` boundary — the deterministic shard map a
    writer fans out over (shard = where your doc starts, so every doc
    lands in exactly one shard and shard boundaries never split one).

    One window pass (cumulative tokens) + one shard rollup; shard id =
    (cum - n_tok) div shard_tokens on exact integers, identical on any
    engine.  At 100 TB the window partitions by (group, coarse id
    range) and shard ids offset by per-range totals — same arithmetic,
    one extra scan for the range totals."""
    w = (
        Window.partitionBy("grp")
        .orderBy("did")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    toks = docs.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("did"),
        F.expr(f"size({_SPARK_WORDS.replace('text', text_col)})")
        .cast("long")
        .alias("n_tok"),
    )
    cum = toks.select(
        "grp",
        "did",
        "n_tok",
        (F.sum("n_tok").over(w) - F.col("n_tok")).alias("start_off"),
    )
    return (
        cum.select(
            "grp",
            "did",
            "n_tok",
            F.expr(f"CAST(start_off div {shard_tokens} AS BIGINT)").alias(
                "shard"
            ),
        )
        .groupBy("grp", "shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("tokens"),
            F.min("did").cast("long").alias("first_doc"),
            F.max("did").cast("long").alias("last_doc"),
        )
        .select(
            F.col("grp").alias(group_col),
            "shard",
            "n_docs",
            "tokens",
            "first_doc",
            "last_doc",
        )
        .orderBy(group_col, "shard")
    )


def shard_plan_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: the per-source fixed-size shard map of documents."""
    return plan_output_shards(load_table(spark, "documents", sf_dir))


ORACLE_SQL["shard_plan_documents"] = f"""
    WITH toks AS (
        SELECT source AS grp, doc_id AS did,
               CAST(len({_DUCK_WORDS}) AS BIGINT) AS n_tok
        FROM documents
    ), cum AS (
        SELECT grp, did, n_tok,
               SUM(n_tok) OVER (PARTITION BY grp ORDER BY did
                   ROWS UNBOUNDED PRECEDING) - n_tok AS start_off
        FROM toks
    )
    SELECT grp AS source,
           CAST(start_off // {SHARD_TOKENS} AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS tokens,
           CAST(MIN(did) AS BIGINT) AS first_doc,
           CAST(MAX(did) AS BIGINT) AS last_doc
    FROM cum GROUP BY grp, CAST(start_off // {SHARD_TOKENS} AS BIGINT)
    ORDER BY source, shard
"""

QUERIES["shard_plan_documents"] = shard_plan_documents


# ---- Gopher quality-rule ledger ---------------------------------------------

# The word-level repetition/quality rules from the Gopher corpus
# pipeline (Rae et al. 2021, "Scaling Language Models", Appendix A —
# public), as a per-rule failure ledger. Thresholds follow the paper;
# every test is integer cross-multiplication (no division, no floats)
# so both engines agree exactly.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000


def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule Gopher-filter failure counts over the corpus: for each
    named rule, how many documents fail it and the ppm share — plus a
    ``pass_all`` row — the rule-attribution ledger you read BEFORE
    turning the composite filter on (which rule would delete half the
    corpus?).  Complements text_quality (per-doc composite verdict)
    and doc_filter_funnel (sequential survival).

    One scan; per-doc flags are pure word-array expressions (no UDFs),
    the rollup is one one-row aggregate unpivoted via stack — bounded
    output, 100 TB-safe by construction.

    NULL text is excluded on BOTH engines (ADVICE r4): Spark's
    ``~(f1 OR ...)`` of NULL flags is NULL (dropped by SUM) while a
    SQL ``CASE WHEN ... THEN 1 ELSE 0`` would count the doc as
    pass_all — the denominators must agree.
    """
    docs = (
        load_table(spark, "documents", sf_dir)
        .where(F.col("text").isNotNull())
        .select("text", F.expr(_SPARK_WORDS).alias("wd"))
    )
    n_words = "size(wd)"
    sum_wlen = "aggregate(transform(wd, x -> length(x)), 0L, (a, x) -> a + x)"
    n_alpha = "size(filter(wd, x -> x rlike '[a-zA-Z]'))"
    stops = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    n_stop = f"size(filter(wd, x -> x IN ({stops})))"
    n_hash = "length(text) - length(replace(text, '#', ''))"
    n_ellipsis = "(length(text) - length(replace(text, '...', ''))) DIV 3"
    flags = docs.select(
        F.expr(f"{n_words} < {GOPHER_MIN_WORDS}").alias("too_few_words"),
        F.expr(f"{n_words} > {GOPHER_MAX_WORDS}").alias("too_many_words"),
        # mean word length outside [3, 10]: cross-multiplied
        F.expr(f"{sum_wlen} < 3 * {n_words}").alias("mean_word_len_low"),
        F.expr(f"{sum_wlen} > 10 * {n_words}").alias("mean_word_len_high"),
        # symbol-to-word ratio (# + ellipsis) > 0.1
        F.expr(f"({n_hash} + {n_ellipsis}) * 10 > {n_words}").alias(
            "symbol_ratio_high"
        ),
        # < 80% of words contain an alphabetic character
        F.expr(f"{n_alpha} * 10 < {n_words} * 8").alias("alpha_share_low"),
        # fewer than 2 of the 8 required stopwords present
        F.expr(f"{n_stop} < 2").alias("stopword_hits_low"),
    )
    rules = list(flags.columns)
    agg = flags.agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[
            F.sum(F.col(r).cast("long")).alias(f"f_{r}")
            for r in rules
        ],
        F.sum(
            (~F.expr(" OR ".join(rules))).cast("long")
        ).alias("f_pass_all"),
    )
    entries = ", ".join(
        f"'{r}', CAST(f_{r} AS BIGINT)" for r in rules
    ) + ", 'pass_all', CAST(f_pass_all AS BIGINT)"
    return (
        agg.select(
            "n_docs",
            F.expr(
                f"stack({len(rules) + 1}, {entries}) AS (rule, n_docs_flagged)"
            ),
        )
        .select(
            "rule",
            "n_docs_flagged",
            F.expr(
                "CAST(n_docs_flagged * 1000000 DIV n_docs AS BIGINT)"
            ).alias("share_ppm"),
        )
        .orderBy("rule")
    )


def _gopher_oracle_sql() -> str:
    stops = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    n_words = "len(wd)"
    sum_wlen = "list_sum(list_transform(wd, x -> length(x)))"
    n_alpha = "len(list_filter(wd, x -> regexp_matches(x, '[a-zA-Z]')))"
    n_stop = f"len(list_filter(wd, x -> x IN ({stops})))"
    n_hash = "length(text) - length(replace(text, '#', ''))"
    n_ellipsis = "(length(text) - length(replace(text, '...', ''))) // 3"
    rules = {
        "too_few_words": f"{n_words} < {GOPHER_MIN_WORDS}",
        "too_many_words": f"{n_words} > {GOPHER_MAX_WORDS}",
        "mean_word_len_low": f"{sum_wlen} < 3 * {n_words}",
        "mean_word_len_high": f"{sum_wlen} > 10 * {n_words}",
        "symbol_ratio_high": f"({n_hash} + {n_ellipsis}) * 10 > {n_words}",
        "alpha_share_low": f"{n_alpha} * 10 < {n_words} * 8",
        "stopword_hits_low": f"{n_stop} < 2",
    }
    flag_cols = ",\n".join(
        f"CASE WHEN {expr} THEN 1 ELSE 0 END AS f_{name}"
        for name, expr in rules.items()
    )
    pass_all = " + ".join(f"f_{n}" for n in rules)
    unions = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS rule, CAST(SUM(f_{name}) AS BIGINT)"
        f" AS n_docs_flagged, CAST(COUNT(*) AS BIGINT) AS n FROM flags"
        for name in rules
    )
    return f"""
        WITH flags AS (
            SELECT {flag_cols}
            FROM (SELECT text, {_DUCK_WORDS} AS wd FROM documents
                  WHERE text IS NOT NULL)
        ), rolled AS (
            {unions}
            UNION ALL
            SELECT 'pass_all',
                   CAST(SUM(CASE WHEN {pass_all} = 0 THEN 1 ELSE 0 END)
                        AS BIGINT),
                   CAST(COUNT(*) AS BIGINT)
            FROM flags
        )
        SELECT rule, n_docs_flagged,
               CAST(n_docs_flagged * 1000000 // n AS BIGINT) AS share_ppm
        FROM rolled ORDER BY rule
    """


QUERIES["gopher_quality_flags"] = gopher_quality_flags
ORACLE_SQL["gopher_quality_flags"] = _gopher_oracle_sql()


# ---- C4 quality rule ledger ---------------------------------------------

C4_MIN_SENTENCES = 3  # pages with fewer sentences are dropped
C4_MIN_WORDS_PER_LINE = 5  # C4 drops shorter lines; ledger flags majority
_C4_POLICY_PHRASES = ("terms of use", "privacy policy", "cookie policy")


def c4_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule C4-filter failure counts over the corpus — the
    rule-attribution ledger for the C4 (Colossal Clean Crawled Corpus)
    heuristics, shaped exactly like ``gopher_quality_flags``: for each
    named rule, documents failing it + ppm share + a ``pass_all`` row.

    Doc-level renderings of the published line/page rules:
    too-few-sentences (terminal-punctuation count < 3), a majority of
    lines under 5 words, a majority of lines not ending in terminal
    punctuation, and the page-kill substrings (lorem ipsum, curly
    brace, javascript, policy boilerplate).  One scan, pure
    string/array expressions, integer cross-multiplication — bounded
    output, 100 TB-safe by construction.  NULL text excluded on both
    engines (the gopher denominators rule).
    """
    docs = (
        load_table(spark, "documents", sf_dir)
        .where(F.col("text").isNotNull())
        .select(
            "text",
            F.expr("filter(split(text, chr(10)), x -> length(trim(x)) > 0)").alias(
                "ln"
            ),
        )
    )
    n_term = (
        "((length(text) - length(replace(text, '.', '')))"
        " + (length(text) - length(replace(text, '!', '')))"
        " + (length(text) - length(replace(text, '?', ''))))"
    )
    n_lines = "size(ln)"
    n_short = (
        f"size(filter(ln, l -> size(filter(split(l, ' '), w -> w != ''))"
        f" < {C4_MIN_WORDS_PER_LINE}))"
    )
    n_unterm = (
        "size(filter(ln, l -> NOT (right(trim(l), 1) = '.'"
        " OR right(trim(l), 1) = '!' OR right(trim(l), 1) = '?'"
        " OR right(trim(l), 1) = '\"')))"
    )
    policy = " OR ".join(
        f"contains(lower(text), '{p}')" for p in _C4_POLICY_PHRASES
    )
    flags = docs.select(
        F.expr(f"{n_term} < {C4_MIN_SENTENCES}").alias("too_few_sentences"),
        F.expr(f"2 * {n_short} > {n_lines}").alias("short_lines_majority"),
        F.expr(f"2 * {n_unterm} > {n_lines}").alias("unterminated_lines_majority"),
        F.expr("contains(lower(text), 'lorem ipsum')").alias("lorem_ipsum"),
        F.expr("contains(text, '{')").alias("curly_brace"),
        F.expr("contains(lower(text), 'javascript')").alias("javascript_mention"),
        F.expr(f"({policy})").alias("policy_phrase"),
    )
    rules = list(flags.columns)
    agg = flags.agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[F.sum(F.col(r).cast("long")).alias(f"f_{r}") for r in rules],
        F.sum((~F.expr(" OR ".join(rules))).cast("long")).alias("f_pass_all"),
    )
    entries = ", ".join(
        f"'{r}', CAST(f_{r} AS BIGINT)" for r in rules
    ) + ", 'pass_all', CAST(f_pass_all AS BIGINT)"
    return (
        agg.select(
            "n_docs",
            F.expr(f"stack({len(rules) + 1}, {entries}) AS (rule, n_docs_flagged)"),
        )
        .select(
            "rule",
            "n_docs_flagged",
            F.expr("CAST(n_docs_flagged * 1000000 DIV n_docs AS BIGINT)").alias(
                "share_ppm"
            ),
        )
        .orderBy("rule")
    )


def _c4_oracle_sql() -> str:
    n_term = (
        "((length(text) - length(replace(text, '.', '')))"
        " + (length(text) - length(replace(text, '!', '')))"
        " + (length(text) - length(replace(text, '?', ''))))"
    )
    n_lines = "len(ln)"
    n_short = (
        f"len(list_filter(ln, l -> len(list_filter(string_split(l, ' '),"
        f" w -> w != '')) < {C4_MIN_WORDS_PER_LINE}))"
    )
    n_unterm = (
        "len(list_filter(ln, l -> NOT (right(trim(l), 1) = '.'"
        " OR right(trim(l), 1) = '!' OR right(trim(l), 1) = '?'"
        " OR right(trim(l), 1) = '\"')))"
    )
    policy = " OR ".join(
        f"contains(lower(text), '{p}')" for p in _C4_POLICY_PHRASES
    )
    rules = {
        "too_few_sentences": f"{n_term} < {C4_MIN_SENTENCES}",
        "short_lines_majority": f"2 * {n_short} > {n_lines}",
        "unterminated_lines_majority": f"2 * {n_unterm} > {n_lines}",
        "lorem_ipsum": "contains(lower(text), 'lorem ipsum')",
        "curly_brace": "contains(text, '{')",
        "javascript_mention": "contains(lower(text), 'javascript')",
        "policy_phrase": f"({policy})",
    }
    flag_cols = ",\n".join(
        f"CASE WHEN {expr} THEN 1 ELSE 0 END AS f_{name}"
        for name, expr in rules.items()
    )
    pass_all = " + ".join(f"f_{n}" for n in rules)
    unions = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS rule, CAST(SUM(f_{name}) AS BIGINT)"
        f" AS n_docs_flagged, CAST(COUNT(*) AS BIGINT) AS n FROM flags"
        for name in rules
    )
    return f"""
        WITH flags AS (
            SELECT {flag_cols}
            FROM (SELECT text,
                         list_filter(string_split(text, chr(10)),
                                     x -> length(trim(x)) > 0) AS ln
                  FROM documents WHERE text IS NOT NULL)
        ), rolled AS (
            {unions}
            UNION ALL
            SELECT 'pass_all',
                   CAST(SUM(CASE WHEN {pass_all} = 0 THEN 1 ELSE 0 END)
                        AS BIGINT),
                   CAST(COUNT(*) AS BIGINT)
            FROM flags
        )
        SELECT rule, n_docs_flagged,
               CAST(n_docs_flagged * 1000000 // n AS BIGINT) AS share_ppm
        FROM rolled ORDER BY rule
    """


QUERIES["c4_quality_flags"] = c4_quality_flags
ORACLE_SQL["c4_quality_flags"] = _c4_oracle_sql()
