"""Engine-specific: a few stops on the oracle-checked analytics
registry — TPC-H Q1, an ordered funnel, exact ANN top-k, and the
Holt-Winters forecast."""

from pyspark.sql import SparkSession

import __spark_entry__ as registry

spark = SparkSession.builder.master("local[4]").getOrCreate()
queries = registry.queries()
sf = "/root/testdata/sf0.001"
for name in ("q1", "events_funnel", "ann_topk", "weekly_revenue_forecast_hw"):
    df = queries[name](spark, sf)
    print(f"-- {name} --")
    df.show(4, truncate=40)
