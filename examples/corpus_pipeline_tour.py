"""Engine-specific: the end-to-end LLM training-corpus build over the
test documents table (clean -> language filter -> quality filter ->
exact dedup -> MinHash near-dup dedup -> decontaminate -> chunk ->
pack)."""

from pyspark.sql import SparkSession

from skdist_spark.pipeline import build_training_corpus
from skdist_spark.sources.catalog import load_table

spark = SparkSession.builder.master("local[4]").getOrCreate()
docs = load_table(spark, "documents", "/root/testdata/sf0.001")
benchmark = docs.where("doc_id % 20 = 0")
packed = build_training_corpus(docs.where("doc_id % 20 != 0"), benchmark)
print("packed sequences:", packed.count())
packed.select("bin_id", "n_chunk_tokens").show(5)
