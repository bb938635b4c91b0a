"""Distributed prediction via Arrow pandas UDF (reference
examples/predict/basic_usage.py): fit locally, score a Spark
DataFrame with get_prediction_udf."""

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from skdist_spark.ml import LogisticRegression
from skdist_spark.operators import get_prediction_udf

from _data import blobs

spark = SparkSession.builder.master("local[4]").getOrCreate()
X, y = blobs(n_classes=2, d=4)
model = LogisticRegression().fit(X, y)

sdf = spark.createDataFrame(
    [(float(a), float(b), float(c), float(d)) for a, b, c, d in X],
    "f0 double, f1 double, f2 double, f3 double",
)
predict = get_prediction_udf(model, method="predict", feature_type="numpy")
cols = [F.col(c) for c in sdf.columns]
scored = sdf.withColumn("prediction", predict(*cols))
scored.groupBy("prediction").count().orderBy("prediction").show()
