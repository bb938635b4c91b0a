"""Engine-specific: the TRAINING-ARTIFACTS toolkit — the pieces that
produce model-side artifacts from a corpus: tokenizer training (BPE
merges and the SentencePiece-style unigram vocabulary), the ALS
recommender factors, Johnson-Lindenstrauss projection health, the
token-budget ingest gate, and corpus-shape diagnostics (Chao1
richness, trigram diversity, Burrows' Delta register distance)."""

from pyspark.sql import SparkSession

from skdist_spark.operators.lm import (
    bpe_train,
    burrows_delta,
    ngram_diversity,
    unigram_encode,
    unigram_train,
    vocab_richness,
)
from skdist_spark.operators.recommend import (
    als_recommend_topk,
    als_rmse,
    als_train,
)
from skdist_spark.operators.text import token_budget_gate
from skdist_spark.plans.ml_queries import ml_source_ablation
from skdist_spark.sources.catalog import load_table

spark = SparkSession.builder.master("local[4]").getOrCreate()
sf = "/root/testdata/sf0.001"
docs = load_table(spark, "documents", sf)

print("-- BPE: the first merges the corpus asks for --")
for left, right, merged, cnt in bpe_train(docs.select("text"), n_merges=4):
    print(f"  {left!r} + {right!r} -> {merged!r}  (count {cnt})")

print("-- unigram-LM vocabulary (hard-EM): top pieces --")
vocab = unigram_train(docs.select("text"))
for piece, count in vocab[:10]:
    print(f"  {piece!r}: {count}")
enc = unigram_encode(docs.select("doc_id", "text"), vocab)
enc.selectExpr(
    "ROUND(AVG(n_pieces / n_words), 3) AS fertility",
    "COUNT(*) AS docs",
).show()

print("-- ALS on the customer x part quantity matrix --")
li = load_table(spark, "lineitem", sf)
orders = load_table(spark, "orders", sf)
from pyspark.sql import functions as F  # noqa: E402

ratings = (
    li.join(orders, li.l_orderkey == orders.o_orderkey)
    .groupBy(F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i"))
    .agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("rating")
    )
    .localCheckpoint(eager=False)
)
uf, itf = als_train(ratings, "u", "i", "rating")
als_rmse(ratings, uf, itf).show()
print("  top recommendation for 3 customers (unseen parts only):")
als_recommend_topk(uf, itf, seen=ratings.select("u", "i"), top_k=1).orderBy(
    "user"
).show(3)

print("-- token-budget gate: per-source admit/drop ledger --")
token_budget_gate(docs).show()

print("-- corpus shape: richness, diversity, register distance --")
vocab_richness(docs).show()
ngram_diversity(docs).show()
burrows_delta(docs).show(5)

print("-- which sources teach the quality model anything --")
ml_source_ablation(spark, sf).orderBy(F.desc("delta_ppm")).show(5)
