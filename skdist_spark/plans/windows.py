"""Window / temporal operators over the events stream table.

Same two-faced layout as plans.tpch: a DataFrame builder plus a DuckDB
oracle with matching aliases. These cover the operator families the
reference lacks but a Spark analytics engine needs: ranked windows,
rollup cubes, as-of joins, gap-based sessionization, and JSON prop
extraction — all expressed with built-in functions (no Python UDFs) so
they stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table

SESSION_GAP_MIN = 30


def events_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events by value per event_type (ranked window).

    Scale note: the window partitions by event_type (low cardinality,
    potentially skewed). For a true 100 TB run the same result is
    cheaper as a per-partition top-k + merge, which AQE approximates;
    row_number over a partitioned window is the canonical form.
    """
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("event_type", "event_id", "user_id", "value", "rn")
        .orderBy("event_type", "rn")
    )


def sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(year, priority) of order totals — hierarchical subtotal cube."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.withColumn("o_year", F.year("o_orderdate"))
        .rollup("o_year", "o_orderpriority")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_sales"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.asc_nulls_first("o_year"), F.asc_nulls_first("o_orderpriority"))
    )


def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase event, the most recent prior click
    by the same user.

    Spark-first plan: instead of an inequality join (which Spark would
    execute as a broadcast-nested-loop), union both event streams and
    take a running ``last(click_ts)`` window per user ordered by time —
    one shuffle on user_id, linear in events, skew-safe under AQE.
    """
    ev = load_table(spark, "events", sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("ev_ts"), F.col("ts").alias("click_ts"),
        F.lit(None).cast("bigint").alias("purchase_id"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("ev_ts"), F.lit(None).cast("timestamp").alias("click_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    # purchases sort BEFORE clicks at identical ts, so a same-instant
    # click is excluded from the purchase's preceding frame — this
    # matches the oracle's strict click_ts < purchase_ts predicate
    order_rank = F.when(F.col("purchase_id").isNull(), 1).otherwise(0)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ev_ts", order_rank)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    merged = clicks.unionByName(purchases).withColumn(
        "asof_click_ts", F.last("click_ts", ignorenulls=True).over(w)
    )
    return (
        merged.where(F.col("purchase_id").isNotNull())
        .select(
            F.col("purchase_id"), "user_id", F.col("ev_ts").alias("purchase_ts"),
            "asof_click_ts",
        )
        .orderBy("purchase_id")
    )


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) per user.

    lag -> gap flag -> running sum = session index; then session-level
    aggregates. One shuffle on user_id; state is bounded per user.
    """
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    with_sess = (
        ev.withColumn("is_new", F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60), 1).otherwise(0))
        .withColumn("session_idx", F.sum("is_new").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ))
    )
    return (
        with_sess.groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .orderBy("user_id", "session_idx")
    )


def events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract numeric JSON prop and aggregate per event_type."""
    ev = load_table(spark, "events", sf_dir)
    k = F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1).cast("int")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


ORACLE_SQL: dict[str, str] = {
    "events_topn": """
        SELECT event_type, event_id, user_id, value, rn FROM (
            SELECT event_type, event_id, user_id, value,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rn
            FROM events
        ) WHERE rn <= 3
        ORDER BY event_type, rn
    """,
    "sales_rollup": """
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year_in, o_orderpriority, o_totalprice FROM orders
    """,  # placeholder; replaced below with full rollup
    "asof_join": """
        WITH purchases AS (
            SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
            FROM events WHERE event_type = 'purchase'
        ), clicks AS (
            SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'
        )
        SELECT p.purchase_id, p.user_id, p.purchase_ts,
               MAX(c.click_ts) AS asof_click_ts
        FROM purchases p
        LEFT JOIN clicks c ON p.user_id = c.user_id AND c.click_ts < p.purchase_ts
        GROUP BY p.purchase_id, p.user_id, p.purchase_ts
        ORDER BY p.purchase_id
    """,
    "sessionize_events": f"""
        WITH flagged AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR EPOCH(ts) - EPOCH(LAG(ts) OVER w) > {SESSION_GAP_MIN * 60}
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
            SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS session_idx
            FROM flagged
        )
        SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
               MIN(ts) AS session_start, MAX(ts) AS session_end,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM sess
        GROUP BY user_id, session_idx
        ORDER BY user_id, session_idx
    """,
    "events_json": """
        SELECT event_type,
               CAST(SUM(TRY_CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INTEGER)) AS BIGINT) AS sum_k,
               COUNT(*) AS n
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
}

ORACLE_SQL["sales_rollup"] = """
    SELECT o_year, o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales,
           COUNT(*) AS n_orders
    FROM (SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year, o_orderpriority, o_totalprice FROM orders)
    GROUP BY ROLLUP (o_year, o_orderpriority)
    ORDER BY o_year ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""

QUERIES = {
    "events_topn": events_topn,
    "sales_rollup": sales_rollup,
    "asof_join": asof_join,
    "sessionize_events": sessionize_events,
    "events_json": events_json,
}
