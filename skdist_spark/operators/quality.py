"""Deequ-style data-quality constraint audit.

A training-data platform needs declarative DQ gates in the same engine
that builds the data: completeness (null fractions), uniqueness (key
duplicates), referential integrity (FK orphans), and range constraints
— each as a DataFrame program whose result is one row per check, so a
pipeline can fail on ``violations > 0`` without collecting the table.

Scale posture: every check family is a single aggregation pass —
completeness and range checks fold into ONE multi-conditional
aggregate over one scan; uniqueness is a two-stage count-distinct
shuffle on the key; FK orphans are a left-anti join (the dim side
broadcasts when small, AQE decides otherwise).  Nothing is ever
collected; the audit result itself is a ~10-row frame.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table


def completeness_check(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per column: how many rows are NULL. Single scan, one
    aggregate with a conditional sum per column."""
    aggs = [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(c)
        for c in cols
    ]
    wide = df.agg(*aggs)
    stack = ", ".join(f"'null_{c}', {c}" for c in cols)
    return wide.selectExpr(
        f"stack({len(cols)}, {stack}) as (check_name, violations)"
    )


def uniqueness_check(df: DataFrame, key_cols: list[str], name: str) -> DataFrame:
    """Surplus rows beyond the first per key (0 = key is unique)."""
    dup = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0)).cast("long").alias("violations"))
    )
    return dup.select(F.lit(name).alias("check_name"), "violations")


def fk_check(
    fact: DataFrame, dim: DataFrame, fk: str, pk: str, name: str
) -> DataFrame:
    """Fact rows whose FK has no matching dim PK (left-anti count)."""
    orphans = fact.join(dim, fact[fk] == dim[pk], "left_anti").agg(
        F.count(F.lit(1)).cast("long").alias("violations")
    )
    return orphans.select(F.lit(name).alias("check_name"), "violations")


def range_check(df: DataFrame, predicate: str, name: str) -> DataFrame:
    """Rows violating a boolean SQL constraint (predicate = the
    CONSTRAINT, violations = rows where it does not hold)."""
    return df.agg(
        F.sum(F.when(~F.expr(predicate), 1).otherwise(0)).cast("long").alias("violations")
    ).select(F.lit(name).alias("check_name"), "violations")


def dq_audit(checks: list[DataFrame]) -> DataFrame:
    """Union the one-row check frames into the audit report."""
    out = reduce(DataFrame.unionByName, checks)
    return out.withColumn("passed", F.col("violations") == 0)


def dq_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ audit of the orders fact against the customer dim:
    completeness, PK uniqueness, FK integrity, value ranges."""
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    report = dq_audit(
        [
            completeness_check(orders, ["o_custkey", "o_totalprice", "o_orderdate"]),
            uniqueness_check(orders, ["o_orderkey"], "unique_o_orderkey"),
            fk_check(orders, customer, "o_custkey", "c_custkey", "fk_orders_customer"),
            range_check(orders, "o_totalprice > 0", "range_o_totalprice_pos"),
            range_check(
                orders,
                "o_orderdate >= DATE'1992-01-01' AND o_orderdate < DATE'1999-01-01'",
                "range_o_orderdate_window",
            ),
        ]
    )
    return report.orderBy("check_name")


ORACLE_SQL: dict[str, str] = {
    "dq_orders": """
        WITH checks AS (
            SELECT 'null_o_custkey' AS check_name,
                   CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations
            FROM orders
            UNION ALL
            SELECT 'null_o_totalprice',
                   CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 'null_o_orderdate',
                   CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 'unique_o_orderkey',
                   CAST(COALESCE(SUM(cnt - 1), 0) AS BIGINT)
            FROM (SELECT COUNT(*) AS cnt FROM orders GROUP BY o_orderkey)
            UNION ALL
            SELECT 'fk_orders_customer',
                   CAST(COUNT(*) AS BIGINT)
            FROM orders o WHERE NOT EXISTS (
                SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
            UNION ALL
            SELECT 'range_o_totalprice_pos',
                   CAST(SUM(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END) AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 'range_o_orderdate_window',
                   CAST(SUM(CASE WHEN NOT (o_orderdate >= DATE '1992-01-01'
                                           AND o_orderdate < DATE '1999-01-01')
                            THEN 1 ELSE 0 END) AS BIGINT)
            FROM orders
        )
        SELECT check_name, violations, violations = 0 AS passed
        FROM checks ORDER BY check_name
    """,
}

QUERIES = {
    "dq_orders": dq_orders,
}
