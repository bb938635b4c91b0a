"""Engine-specific: the training-data CURATION toolkit — the filter
funnel, perplexity-percentile selection, exact n-gram
decontamination, the MinHash-LSH precision/recall eval, cross-source
leakage / boilerplate observability, unit-disjoint splits, and
next-item training-pair construction."""

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from skdist_spark.operators.dedup import dedup_minhash_eval
from skdist_spark.operators.lm import perplexity_filter
from skdist_spark.operators.sampling import (
    event_training_pairs,
    user_disjoint_split,
)
from skdist_spark.operators.text import (
    doc_filter_funnel,
    exact_ngram_decontaminate,
    source_boilerplate,
    source_leakage,
)
from skdist_spark.sources.catalog import load_table

spark = SparkSession.builder.master("local[4]").getOrCreate()
sf = "/root/testdata/sf0.001"

print("-- filter funnel: what each quality rule removes, in order --")
doc_filter_funnel(spark, sf).show(truncate=False)

print("-- perplexity selection: keep the in-distribution 90% per source --")
docs = load_table(spark, "documents", sf).select("doc_id", "text", "source")
scored = perplexity_filter(docs)
scored.groupBy("source", "kept").count().orderBy("source", "kept").show()

print("-- exact 8-gram decontamination vs a held-out benchmark --")
bench = docs.where(F.col("doc_id") % 20 == 0)
corpus = docs.where(F.col("doc_id") % 20 != 0)
flagged = exact_ngram_decontaminate(corpus, bench)
print("docs leaking a verbatim 8-gram:", flagged.count())

print("-- is the LSH stage good enough? measured, not asserted --")
dedup_minhash_eval(spark, sf).show()

print("-- which source pairs share verbatim content --")
source_leakage(spark, sf).show()

print("-- per-source boilerplate line rate --")
source_boilerplate(spark, sf).show()

print("-- leakage-safe split: a user never straddles folds --")
ev = load_table(spark, "events", sf)
user_disjoint_split(ev, "user_id").groupBy("split").agg(
    F.countDistinct("user_id").alias("users"),
    F.count(F.lit(1)).alias("events"),
).orderBy("split").show()

print("-- next-item training pairs (context -> target) --")
event_training_pairs(spark, sf).show(5, truncate=False)
# no spark.stop(): examples share the caller's session (getOrCreate) —
# the smoke-test lane runs them all in one session
