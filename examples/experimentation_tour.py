"""Engine-specific: the experimentation toolkit — deterministic hash
arms, fixed-horizon tests (Welch t, Mann-Whitney, conversion z + SRM),
variance reduction (CUPED), sequential monitoring (O'Brien-Fleming),
and censored-lifetime readouts (Kaplan-Meier, Nelson-Aalen, log-rank).

Every statistic is computed distributed with exact integer/decimal
moments and has a DuckDB oracle; the arm split is a pure function of
user_id (reproducible across engines, retries, and cluster sizes).
"""

from pyspark.sql import SparkSession

from skdist_spark.operators.tsa import (
    churn_ab_logrank,
    purchase_ab_conversion,
    purchase_ab_cuped,
    purchase_ab_sequential,
    purchase_ab_welch,
    user_churn_hazard,
    user_churn_survival,
)

spark = SparkSession.builder.master("local[4]").getOrCreate()
sf = "/root/testdata/sf0.001"

print("-- fixed-horizon: Welch t-test on per-user value (hash arms) --")
purchase_ab_welch(spark, sf).show(truncate=False)

print("-- conversion z-test with the sample-ratio-mismatch guard --")
purchase_ab_conversion(spark, sf).show(truncate=False)

print("-- CUPED: pre-period covariate cuts the variance --")
purchase_ab_cuped(spark, sf).show(truncate=False)

print("-- sequential: one look per week vs the O'Brien-Fleming boundary --")
purchase_ab_sequential(spark, sf).show(truncate=False)

print("-- censored lifetimes: Kaplan-Meier survival --")
user_churn_survival(spark, sf).show(5, truncate=False)

print("-- ... its additive companion: Nelson-Aalen cumulative hazard --")
user_churn_hazard(spark, sf).show(5, truncate=False)

print("-- log-rank: do the arms' churn hazards differ? --")
churn_ab_logrank(spark, sf).show(truncate=False)
