"""Generic temporal join operators vs brute-force reference results."""

from pyspark.sql import functions as F

from skdist_spark.operators.joins import asof_join, interval_join
from skdist_spark.sources.catalog import load_table


def test_asof_join_matches_bruteforce(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    purchases = ev.where("event_type = 'purchase'").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where("event_type = 'click'").select("user_id", "ts")
    got = {
        (r.event_id, r.asof_ts)
        for r in asof_join(
            purchases, clicks, on="user_id", left_ts="ts", right_ts="ts"
        ).collect()
    }
    brute = {
        (r.event_id, r.asof_ts)
        for r in purchases.alias("p")
        .join(clicks.alias("c"), F.expr("p.user_id = c.user_id AND c.ts < p.ts"), "left")
        .groupBy("p.event_id", "p.ts")
        .agg(F.max("c.ts").alias("asof_ts"))
        .collect()
    }
    assert got == brute and len(got) > 0


def test_interval_join_matches_bruteforce(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    errors = ev.where("event_type = 'error'").select("event_id", "user_id", "ts")
    clicks = ev.where("event_type = 'click'").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    got = {
        (r.event_id, r.click_id)
        for r in interval_join(
            errors, clicks, on="user_id", left_ts="ts", right_ts="ts",
            lower_s=-1800, upper_s=1800,
        ).collect()
    }
    brute = {
        (r.event_id, r.click_id)
        for r in errors.alias("e")
        .join(
            clicks.alias("c"),
            F.expr(
                "e.user_id = c.user_id AND "
                "c.ts >= e.ts - INTERVAL 30 MINUTES AND "
                "c.ts <= e.ts + INTERVAL 30 MINUTES"
            ),
        )
        .collect()
    }
    assert got == brute and len(got) > 0


def test_interval_join_plan_is_equi(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    errors = ev.where("event_type = 'error'").select("event_id", "user_id", "ts")
    clicks = ev.where("event_type = 'click'").select("user_id", "ts")
    df = interval_join(errors, clicks, "user_id", "ts", "ts", -300, 300)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
