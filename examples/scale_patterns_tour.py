"""Engine-specific: the scale-safety toolkit — the two-phase
distributed rank family (global ROW_NUMBER / NTILE / running
aggregates / max-prefix-sum with no single-partition window), the
plan linter that catches the anti-patterns, and the Gopher
quality-rule ledger built on integer-exact expressions."""

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from skdist_spark.functions import (
    ntile_from_row_number,
    two_phase_max_prefix_sum,
    two_phase_row_number,
)
from skdist_spark.operators.text import QUERIES as TEXT_QUERIES
from skdist_spark.plans.lint import plan_lint
from skdist_spark.sources.catalog import load_table

spark = SparkSession.builder.master("local[4]").getOrCreate()
sf = "/root/testdata/sf0.001"

print("-- two-phase global rank: same values, no one-task window --")
per_user = (
    load_table(spark, "events", sf)
    .where(F.col("event_type") == "purchase")
    .groupBy("user_id")
    .agg(F.sum(F.expr("CAST(floor(value * 100) AS BIGINT)")).alias("cents"))
)
ranked = two_phase_row_number(
    per_user,
    [F.col("cents").asc(), F.col("user_id").asc()],
    F.col("cents"),
    "rn",
    total_col="n_total",
)
deciled = ranked.select(
    "user_id",
    "cents",
    F.expr(ntile_from_row_number("rn", "n_total", 10)).alias("decile"),
)
deciled.orderBy(F.desc("cents")).show(5)

print("-- it matches the single-partition window exactly --")
w = Window.orderBy(F.col("cents").asc(), F.col("user_id").asc())
exact = per_user.select("user_id", F.row_number().over(w).alias("ern"))
mismatches = (
    ranked.select("user_id", "rn").join(exact, "user_id")
    .where("rn != ern")
    .count()
)
print(f"rank mismatches vs global window: {mismatches}")

print("-- plan_lint: the global window IS the anti-pattern --")
bad = per_user.select(F.row_number().over(w).alias("rn"))
for f in plan_lint(bad):
    print(f"  {f['rule']}: {f['detail']}")

print("-- max-prefix-sum: the sweep-line peak without per-row ranks --")
ev = load_table(spark, "events", sf).select(
    "ts", F.lit(1).alias("delta")
)
peak = two_phase_max_prefix_sum(
    ev,
    [F.col("ts").asc(), F.col("delta").asc()],
    F.col("ts").cast("double"),
    "delta",
)
peak.show()

print("-- Gopher quality-rule ledger (integer-exact thresholds) --")
TEXT_QUERIES["gopher_quality_flags"](spark, sf).show(truncate=False)
