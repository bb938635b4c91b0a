"""Engine-specific: the EVALUATION toolkit — never ship an index,
ranker, model, blocking key, or sampling design without a measured
readout.  Every eval below scores an audited operator against an
exact or defensible baseline with integer-exact counts (FLOOR ppm /
order statistics), so the numbers are reproducible across engines
and cluster sizes.
"""

from pyspark.sql import SparkSession

from skdist_spark.operators.similarity import ann_probe_sweep, ann_recall_eval
from skdist_spark.operators.retrieval import bm25_eval
from skdist_spark.operators.stats import event_value_bootstrap
from skdist_spark.plans.ml_queries import ml_permutation_importance
from skdist_spark.plans.tpch import blocking_eval, revenue_change_decomposition
from skdist_spark.plans.windows import markov_predict_eval

spark = SparkSession.builder.master("local[4]").getOrCreate()
sf = "/root/testdata/sf0.001"

print("-- ANN: recall@k of the IVF index vs exact brute-force truth --")
ann_recall_eval(spark, sf).show(truncate=False)

print("-- ... and the recall/cost curve that picks nprobe --")
ann_probe_sweep(spark, sf).show(truncate=False)

print("-- retrieval: BM25 precision/recall@k vs boolean-AND truth --")
bm25_eval(spark, sf).show(truncate=False)

print("-- entity resolution: is (type, size) a good blocking key? --")
blocking_eval(spark, sf).show(truncate=False)

print("-- model: permutation feature importance (signal vs passengers) --")
ml_permutation_importance(spark, sf).show(truncate=False)

print("-- sequences: how predictable is the next event, per state? --")
markov_predict_eval(spark, sf).show(truncate=False)

print("-- uncertainty: every KPI mean ships with a bootstrap CI --")
event_value_bootstrap(spark, sf).show(truncate=False)

print("-- root cause: why did revenue move? volume vs price vs mix --")
revenue_change_decomposition(spark, sf).show(truncate=False)
