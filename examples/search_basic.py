"""Distributed hyperparameter search: the reference's
examples/search/basic_usage.py flow (grid + randomized CV search with
the SparkSession as the parallelism handle), on synthetic blobs with
the built-in numpy LogisticRegression."""

import pickle

from pyspark.sql import SparkSession

from skdist_spark.ml import LogisticRegression
from skdist_spark.operators import DistGridSearchCV, DistRandomizedSearchCV

from _data import blobs

spark = SparkSession.builder.master("local[4]").getOrCreate()
X, y = blobs(n_classes=2)

grid = DistGridSearchCV(
    LogisticRegression(), {"C": [0.01, 0.1, 1.0, 10.0]}, sc=spark, cv=5
)
grid.fit(X, y)
print("-- Grid Search --")
print("Best Score:", grid.best_score_)
print("Best C:", grid.best_params_["C"])

rand = DistRandomizedSearchCV(
    LogisticRegression(), {"C": [0.01, 0.1, 1.0, 10.0]}, sc=spark, cv=5, n_iter=3
)
rand.fit(X, y)
print("-- Randomized Search --")
print("Best Score:", rand.best_score_)

# spark artifacts are stripped: the fitted object pickles
blob = pickle.dumps(grid)
print("pickled bytes:", len(blob))
print("reloaded predicts:", pickle.loads(blob).predict(X[:5]).tolist())
