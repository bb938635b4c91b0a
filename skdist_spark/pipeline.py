"""End-to-end training-corpus construction: the composition every
individual operator in this engine exists to serve, as ONE DataFrame
program:

    raw documents
      -> normalize (clean_text)
      -> language filter (language_id)
      -> quality filter (quality_score)
      -> exact dedup (md5 canonical)
      -> near-dup dedup (MinHash pairs -> connected components,
         keep each cluster's minimum doc id)
      -> eval-set decontamination (benchmark shingle overlap)
      -> chunk into token windows (chunk_documents)
      -> pack chunks into fixed-budget training bins (pack_sequences)

Everything upstream of packing is pure Catalyst (filters compose into
single scans where possible); the near-dup stage is the only iterative
piece. At 100 TB each stage is the already-audited operator — this
module adds no new physics, only the composition contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.dedup import minhash_dedup
from .operators.graph import connected_components
from .operators.text import (
    LANG_PROFILES,
    chunk_documents,
    clean_text,
    contamination_check,
    pack_sequences,
)
from .sources.catalog import load_table

__all__ = ["build_training_corpus", "corpus_pipeline"]

KEEP_LANGS = ("en", "es", "fr", "de")
MIN_WORDS = 5
MAX_STOPWORD_RATIO = 0.95


def build_training_corpus(
    docs: DataFrame,
    benchmark: DataFrame,
    budget: int = 512,
) -> DataFrame:
    """Run the full pipeline; returns packed chunk assignments
    (doc_id, chunk_id, n_chunk_tokens, bin_id)."""
    cleaned = clean_text(docs).select("doc_id", F.col("clean_text").alias("text"))

    # language + quality gates are ROW-LOCAL expressions (language_id /
    # quality_score with the same constants) — inline them as filter
    # columns over one tokenization instead of materializing two
    # side frames and semi-joining them back: two fewer shuffles and
    # two fewer passes over the regex-heavy cleaned text.
    #
    # The whole gate is ONE _let-bound predicate: CollapseProject
    # inlines an aliased `wd` column into every reference inside the
    # pushed-down filter, and subexpression elimination cannot reach
    # inside HOF lambdas — without the binding the regex split re-runs
    # per conjunct and each language's stopword-hit filter re-runs per
    # CASE branch (same values, ~4x the row work; the dedup._let
    # precedent).  Hit counts, tie-break order (LANG_PROFILES dict
    # order) and every comparison are unchanged.
    from .operators.dedup import _let
    from .operators.text import _SPARK_WORDS, _hits_expr

    langs = list(LANG_PROFILES)
    hit_exprs = ", ".join(
        _hits_expr("__wd", sw, "spark") for sw in LANG_PROFILES.values()
    )
    mx = "greatest(" + ", ".join(f"__h[{i}]" for i in range(len(langs))) + ")"
    cases = " ".join(
        f"WHEN __h[{i}] = __mx AND __mx > 0 THEN '{lang}'"
        for i, lang in enumerate(langs)
    )
    keep_list = ", ".join(f"'{lang}'" for lang in KEEP_LANGS)
    en_idx = langs.index("en")
    body = (
        f"(CASE {cases} ELSE 'und' END) IN ({keep_list})"
        f" AND size(__wd) >= {MIN_WORDS}"
        f" AND CAST(__h[{en_idx}] AS DOUBLE) / size(__wd)"
        f" <= {MAX_STOPWORD_RATIO}"
    )
    keep_expr = _let(
        _SPARK_WORDS, "__wd",
        _let(f"array({hit_exprs})", "__h", _let(mx, "__mx", body)),
    )
    kept = cleaned.where(F.expr(keep_expr)).select("doc_id", "text")

    # exact dedup: keep the minimum doc id per identical cleaned text.
    # localCheckpoint: this frame feeds BOTH the MinHash pair stage and
    # the final anti-joins — without it the whole clean+filter subtree
    # (regex-heavy) re-executes once per consumer.
    canonical = (
        kept.withColumn(
            "keep",
            F.col("doc_id") == F.min("doc_id").over(Window.partitionBy(F.md5("text"))),
        )
        .where("keep")
        .drop("keep")
        .localCheckpoint()
    )

    # near-dup dedup: verified MinHash pairs -> components -> keep the
    # cluster minimum (docs in no pair are singletons and kept)
    pairs = minhash_dedup(canonical, "doc_id", "text")
    clusters = connected_components(pairs, "doc_a", "doc_b")
    dup_losers = clusters.where(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("doc_id")
    )
    deduped = canonical.join(dup_losers, "doc_id", "left_anti")

    # decontamination against the benchmark set
    contaminated = contamination_check(deduped, benchmark).select("doc_id")
    clean_corpus = deduped.join(contaminated, "doc_id", "left_anti")

    # chunks feeds BOTH the packer and the final assignment join;
    # without the checkpoint the contamination anti-joins + chunk
    # explode execute twice (measured ~2.5s of the sf0.1 run).
    chunks = (
        chunk_documents(clean_corpus)
        .withColumn("chunk_uid", F.col("doc_id") * 10000 + F.col("chunk_id"))
        .localCheckpoint()
    )
    # the eager checkpoint above already materialized every chunk, so
    # count() here is a scan of the in-memory RDD; passing it lets
    # pack_sequences skip its own sizing count of the same frame
    packed = pack_sequences(
        chunks, "chunk_uid", "n_chunk_tokens", budget=budget,
        n_items=chunks.count(),
    )
    return (
        chunks.join(packed, "chunk_uid")
        .select("doc_id", "chunk_id", "n_chunk_tokens", "bin_id")
        .orderBy("doc_id", "chunk_id")
    )


def corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: the full corpus build with every 20th document as
    the held-out benchmark (rows-only: composes iterative near-dup
    clustering and greedy packing)."""
    docs = load_table(spark, "documents", sf_dir)
    benchmark = docs.where(F.col("doc_id") % 20 == 0)
    corpus = docs.where(F.col("doc_id") % 20 != 0)
    return build_training_corpus(corpus, benchmark)


ORACLE_SQL: dict[str, str] = {}

QUERIES = {"corpus_pipeline": corpus_pipeline}
