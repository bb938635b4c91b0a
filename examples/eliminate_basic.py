"""Distributed feature elimination (reference
examples/eliminate/basic_usage.py): feature subsets scored in
parallel, keeping the cheapest subset within tolerance of the best."""

from pyspark.sql import SparkSession

from skdist_spark.ml import LogisticRegression
from skdist_spark.operators import DistFeatureEliminator

from _data import blobs

spark = SparkSession.builder.master("local[4]").getOrCreate()
X, y = blobs(n_classes=2, d=10)

elim = DistFeatureEliminator(
    LogisticRegression(), sc=spark, cv=3, min_features_to_select=4
)
elim.fit(X, y)
print("kept features:", elim.n_features_)
print("best score:", elim.best_score_)
