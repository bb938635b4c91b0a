"""Distributed tree ensembles + out-of-fold stacking (reference
examples/ensemble/basic_usage.py and the get_oof utility): one Spark
task per tree / per fold."""

from pyspark.sql import SparkSession

from skdist_spark.ml import LogisticRegression, accuracy_score
from skdist_spark.operators import (
    DistRandomForestClassifier,
    DistStackingClassifier,
    get_oof,
)

from _data import blobs

spark = SparkSession.builder.master("local[4]").getOrCreate()
X, y = blobs(n_classes=2)

forest = DistRandomForestClassifier(n_estimators=20, max_depth=4, sc=spark)
forest.fit(X, y)
print("forest accuracy:", accuracy_score(y, forest.predict(X)))

model, oof = get_oof(LogisticRegression(), X, y, n_splits=4, sc=spark)
print("OOF matrix shape:", oof.shape)

stack = DistStackingClassifier(
    [("lr", LogisticRegression(C=0.1)), ("lr2", LogisticRegression(C=10.0))],
    final_estimator=LogisticRegression(),
    sc=spark,
)
stack.fit(X, y)
print("stacked accuracy:", accuracy_score(y, stack.predict(X)))
