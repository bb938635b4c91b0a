"""Table catalog for the test star schema.

Centralizes parquet loading so every query gets column pruning and
predicate pushdown from a single place, and so a swap to a different
storage layout (bucketed tables, Delta/Iceberg, partitioned dirs) is a
one-file change at 100 TB scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# Star schema + pipeline tables produced by the driver (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale
# factor; fact tables shuffle on their join keys.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Load one catalog table as a DataFrame (lazy parquet scan).

    ``events.parquet`` is written with nanosecond timestamps, which
    Spark's vectorized parquet reader rejects; we read nanos as long
    (legacy conf, safe to set per-session at runtime) and rebuild a
    microsecond timestamp column. Micro truncation is lossless for the
    driver data (micro-precision generator) and keeps the schema
    identical to what DuckDB reports.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    df = None
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load the full catalog as a dict of DataFrames."""
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every catalog table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
