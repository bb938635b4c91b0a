"""Ensemble voting (reference examples/postprocessing/simple_voter.py):
combine independently fitted models with SimpleVoter."""

from pyspark.sql import SparkSession

from skdist_spark.ml import GaussianNB, KNeighborsClassifier, LogisticRegression, accuracy_score
from skdist_spark.postprocessing import SimpleVoter

from _data import blobs

spark = SparkSession.builder.master("local[4]").getOrCreate()
X, y = blobs(n_classes=3)

models = [
    ("lr", LogisticRegression().fit(X, y)),
    ("nb", GaussianNB().fit(X, y)),
    ("knn", KNeighborsClassifier(n_neighbors=5).fit(X, y)),
]
voter = SimpleVoter(models, classes=sorted(set(y.tolist())), voting="hard")
voter.fit(X, y)  # no-op refit contract, as in the reference
print("voter accuracy:", accuracy_score(y, voter.predict(X)))
