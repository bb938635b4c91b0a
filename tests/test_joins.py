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


def test_bloom_semi_join_exact_and_prunes(spark, sf_dir):
    from skdist_spark.operators.joins import bloom_semi_join

    orders = load_table(spark, "orders", sf_dir)
    building = load_table(spark, "customer", sf_dir).where(
        "c_mktsegment = 'BUILDING'"
    )
    got = {r.o_orderkey for r in bloom_semi_join(orders, building, "o_custkey", "c_custkey").collect()}
    want = {
        r.o_orderkey
        for r in orders.join(building, orders.o_custkey == building.c_custkey, "left_semi").collect()
    }
    assert got == want and len(got) > 0


def test_bloom_semi_join_string_keys(spark, sf_dir):
    from skdist_spark.operators.joins import bloom_semi_join

    docs = load_table(spark, "documents", sf_dir)
    en = docs.where("lang = 'en'").select("lang").distinct()
    got = bloom_semi_join(docs, en, "lang").count()
    want = docs.where("lang = 'en'").count()
    assert got == want > 0


def test_bloom_filter_false_positive_rate(spark, sf_dir):
    """With 2^22 bits and k=5, FP rate for a few hundred keys is ~0;
    verify the bloom probe alone (pre exact-join) prunes non-members."""
    import numpy as np
    from skdist_spark.operators import joins as J

    spark_df = load_table(spark, "orders", sf_dir)
    # members: even custkeys; probes: odd custkeys must mostly miss
    members = spark_df.where("o_custkey % 2 = 0").select("o_custkey").distinct()
    probes = spark_df.where("o_custkey % 2 = 1").select("o_custkey").distinct()
    out = J.bloom_semi_join(probes, members, "o_custkey")
    assert out.count() == 0
