"""Deduplication operators over the documents corpus — exact, MinHash
+LSH, SimHash, blocked n-gram Jaccard, and embedding-cosine near-dup.

All variants are pure Spark SQL expressions (md5, higher-order array
functions) — no Python in the hot path — so Catalyst keeps pushdown /
codegen, and every operator has a value-identical DuckDB oracle.

Cross-engine determinism notes:
- hashes are md5 hex strings (identical in Spark and DuckDB); MinHash
  minimums are *string* minimums over hex — total order, no float
  involvement;
- Jaccard = int-size intersect / int-size union in double: one
  division, bit-identical;
- the LSH candidate join is an equi-join on (band_idx, band_hash) —
  at 100 TB this is a shuffle join on a short key, never a cross join.

Scale posture: N_HASHES/BANDS are deliberately small (8/4) — banding
with r=2 rows/band targets ~Jaccard>=0.5 candidates with high recall;
the verify step computes exact Jaccard only on candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table

N_HASHES = 8
N_BANDS = 4  # rows per band = 2
SHINGLE = 3  # word n-gram size
JACCARD_THRESHOLD = 0.5
BLOCK_JACCARD_THRESHOLD = 0.2
COSINE_THRESHOLD = 0.99

# shared SQL fragments (Spark and DuckDB spellings of the same thing)
_SPARK_WORDS = "filter(split(trim(text), '\\\\s+'), x -> x != '')"
_DUCK_WORDS = "list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '')"


def _spark_shingles(words: str = _SPARK_WORDS, n: int = SHINGLE) -> str:
    return (
        f"array_distinct(transform(sequence(1, greatest(size({words}) - {n - 1}, 1)),"
        f" i -> concat_ws(' ', slice({words}, i, {n}))))"
    )


def _duck_shingles(words: str = _DUCK_WORDS, n: int = SHINGLE) -> str:
    return (
        f"list_distinct(list_transform(range(1, greatest(len({words}) - {n - 1}, 1) + 1),"
        f" i -> array_to_string(({words})[i:i+{n - 1}], ' ')))"
    )


def _minhash_sig_exprs(shingles_expr: str, engine: str) -> list[str]:
    """One min-hash per seed: min over shingles of md5('<k>:'||shingle)."""
    out = []
    for k in range(N_HASHES):
        if engine == "spark":
            out.append(
                f"array_min(transform({shingles_expr}, s -> md5(concat('{k}:', s))))"
            )
        else:
            out.append(
                f"list_min(list_transform({shingles_expr}, s -> md5('{k}:' || s)))"
            )
    return out


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: canonical doc per md5(text) group.

    Output: (doc_id, text_hash, canonical_id, is_dup). At 100 TB this
    is one shuffle on a 128-bit key with map-side pre-aggregation.
    """
    docs = load_table(spark, "documents", sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("text_hash")
    return (
        docs.withColumn("text_hash", F.md5("text"))
        .withColumn("canonical_id", F.min("doc_id").over(w))
        .select(
            "doc_id",
            "text_hash",
            "canonical_id",
            (F.col("doc_id") != F.col("canonical_id")).alias("is_dup"),
        )
        .orderBy("doc_id")
    )


def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, verified with exact shingle Jaccard.

    signature (8 md5 min-hashes over 3-gram shingles) -> 4 bands of 2
    -> equi-join on band hash -> exact Jaccard on candidates only.
    """
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    sh = _spark_shingles()
    sigs = _minhash_sig_exprs(sh, "spark")
    with_sig = docs.select(
        "doc_id",
        F.expr(sh).alias("shingles"),
        *[F.expr(sigs[k]).alias(f"sig{k}") for k in range(N_HASHES)],
    )
    bands = with_sig.select(
        "doc_id",
        "shingles",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.md5(F.concat(F.col(f"sig{2 * b}"), F.col(f"sig{2 * b + 1}"))).alias(
                            "band_hash"
                        ),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "shingles", "band.band_idx", "band.band_hash")
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return (
        pairs.withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked exact n-gram Jaccard: all pairs within a blocking key
    (source), keep pairs over threshold. The block bounds the pair
    explosion at scale (per-block cartesian, shuffled on the key)."""
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "source", F.expr(_spark_shingles()).alias("sh")
    )
    a, b = docs.alias("a"), docs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (
                F.size(F.array_intersect("a.sh", "b.sh")).cast("double")
                / F.size(F.array_union("a.sh", "b.sh"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= BLOCK_JACCARD_THRESHOLD)
        .orderBy("doc_a", "doc_b")
    )


def _simhash_exprs(engine: str, bits: int = 16) -> str:
    """SimHash over word tokens: bit j votes +1 when the j-th hex nibble
    of md5(token) has its high bit set (nibble in 89abcdef)."""
    words = _SPARK_WORDS if engine == "spark" else _DUCK_WORDS
    terms = []
    for j in range(bits):
        if engine == "spark":
            hits = (
                f"size(filter({words}, t -> substring(md5(t), {j + 1}, 1) IN"
                f" ('8','9','a','b','c','d','e','f')))"
            )
            votes = f"(2 * {hits} - size({words}))"
        else:
            hits = (
                f"len(list_filter({words}, t -> md5(t)[{j + 1}:{j + 1}] IN"
                f" ('8','9','a','b','c','d','e','f')))"
            )
            votes = f"(2 * {hits} - len({words}))"
        terms.append(f"(CASE WHEN {votes} > 0 THEN {2**j} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash fingerprint dedup: docs sharing a fingerprint
    form a duplicate group (canonical = min doc_id)."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    from pyspark.sql import Window

    sim = docs.select(
        "doc_id", F.expr(_simhash_exprs("spark")).cast("long").alias("simhash")
    )
    w = Window.partitionBy("simhash")
    return (
        sim.withColumn("canonical_id", F.min("doc_id").over(w))
        .select(
            "doc_id",
            "simhash",
            "canonical_id",
            (F.col("doc_id") != F.col("canonical_id")).alias("is_dup"),
        )
        .orderBy("doc_id")
    )


def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine >= threshold over all pairs.

    The dot product is a strict left fold (aggregate over zip_with) so
    double summation order is fixed and matches the oracle's list_sum.
    At 100 TB the all-pairs join is replaced by the LSH-bucketed path
    (similarity.ann_lsh); this operator is the exact small-N verifier.
    """
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    a, b = emb.alias("a"), emb.alias("b")
    dot = "aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    norm = "sqrt(aggregate(transform({0}, x -> x * x), 0D, (acc, x) -> acc + x))"
    cos = f"{dot} / ({norm.format('a.v')} * {norm.format('b.v')})"
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.expr(cos).alias("cosine"),
        )
        .where(F.col("cosine") >= COSINE_THRESHOLD)
        .orderBy("vec_a", "vec_b")
    )


_DUCK_SH = _duck_shingles()
_DUCK_SIGS = _minhash_sig_exprs("sh", "duck")

ORACLE_SQL: dict[str, str] = {
    "dedup_exact": """
        SELECT doc_id, md5(text) AS text_hash,
               MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
               doc_id != MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
        FROM documents
        ORDER BY doc_id
    """,
    "dedup_minhash": f"""
        WITH sh AS (
            SELECT doc_id, {_DUCK_SH} AS sh FROM documents
        ), sig AS (
            SELECT doc_id, sh,
                   {', '.join(f'{s} AS sig{k}' for k, s in enumerate(_DUCK_SIGS))}
            FROM sh
        ), bands AS (
            SELECT doc_id, sh, band_idx,
                   CASE band_idx
                        {' '.join(f'WHEN {b} THEN md5(sig{2 * b} || sig{2 * b + 1})' for b in range(N_BANDS))}
                   END AS band_hash
            FROM sig, UNNEST([{', '.join(str(b) for b in range(N_BANDS))}]) AS t(band_idx)
        ), pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
             AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b,
               len(list_intersect(sa.sh, sb.sh))::DOUBLE
                 / len(list_distinct(list_concat(sa.sh, sb.sh))) AS jaccard
        FROM pairs
        JOIN sh sa ON sa.doc_id = doc_a
        JOIN sh sb ON sb.doc_id = doc_b
        WHERE len(list_intersect(sa.sh, sb.sh))::DOUBLE
                 / len(list_distinct(list_concat(sa.sh, sb.sh))) >= {JACCARD_THRESHOLD}
        ORDER BY doc_a, doc_b
    """,
    "dedup_ngram_jaccard": f"""
        WITH sh AS (
            SELECT doc_id, source, {_DUCK_SH} AS sh FROM documents
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               len(list_intersect(a.sh, b.sh))::DOUBLE
                 / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
        FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
        WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
                 / len(list_distinct(list_concat(a.sh, b.sh))) >= {BLOCK_JACCARD_THRESHOLD}
        ORDER BY doc_a, doc_b
    """,
    "dedup_simhash": f"""
        WITH sim AS (
            SELECT doc_id, CAST({_simhash_exprs('duck')} AS BIGINT) AS simhash
            FROM documents
        )
        SELECT doc_id, simhash,
               MIN(doc_id) OVER (PARTITION BY simhash) AS canonical_id,
               doc_id != MIN(doc_id) OVER (PARTITION BY simhash) AS is_dup
        FROM sim
        ORDER BY doc_id
    """,
    "dedup_embedding": f"""
        WITH e AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
        )
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]))
                 / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
                    * sqrt(list_sum(list_transform(b.v, x -> x * x)))) AS cosine
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]))
                 / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
                    * sqrt(list_sum(list_transform(b.v, x -> x * x)))) >= {COSINE_THRESHOLD}
        ORDER BY vec_a, vec_b
    """,
}

QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_minhash": dedup_minhash,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_simhash": dedup_simhash,
    "dedup_embedding": dedup_embedding,
}
