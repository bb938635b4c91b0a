"""Type-inferred feature encoding (reference
examples/encoder/basic_usage.py): Encoderizer infers numeric /
string / text / multihot encoders per column and fits them as Spark
tasks; the fitted encoder also transforms Spark DataFrames
distributed."""

import pandas as pd
from pyspark.sql import SparkSession

from skdist_spark.operators import Encoderizer

spark = SparkSession.builder.master("local[4]").getOrCreate()
pdf = pd.DataFrame(
    {
        "price": [9.9, 3.5, 7.1, 0.5, 12.0, 2.2],
        "color": ["red", "blue", "red", "green", "blue", "red"],
        "title": [
            "fast red bike", "blue sea kayak", "red road bike",
            "green garden hose", "deep blue kayak", "red fire truck",
        ],
    }
)
enc = Encoderizer(size="small", sc=spark)
feats = enc.fit_transform(pdf)
print("encoded shape:", feats.shape)

sdf = spark.createDataFrame(pdf.reset_index().rename(columns={"index": "row_id"}))
out = enc.transform_distributed(sdf, id_col="row_id")
out.show(3, truncate=60)
