"""Source/sink round-trips through skdist_spark.sources.io."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from skdist_spark.sources.catalog import load_table
from skdist_spark.sources.io import convert_to_parquet, read_source, write_sink


@pytest.fixture()
def nation_df(spark, sf_dir):
    return load_table(spark, "nation", sf_dir)


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_roundtrip(spark, nation_df, fmt):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, f"nation_{fmt}")
        write_sink(nation_df, path, fmt)
        back = read_source(
            spark,
            path,
            fmt,
            schema="n_nationkey bigint, n_name string, n_regionkey bigint",
        )
        got = {r.n_nationkey: (r.n_name, r.n_regionkey) for r in back.collect()}
        want = {r.n_nationkey: (r.n_name, r.n_regionkey) for r in nation_df.collect()}
        assert got == want


def test_partitioned_write_prunes(spark, nation_df):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "nation_part")
        write_sink(nation_df, path, "parquet", partition_by=["n_regionkey"])
        # hive-style layout exists
        assert any(p.startswith("n_regionkey=") for p in os.listdir(path))
        back = read_source(spark, path).where(F.col("n_regionkey") == 2)
        assert back.count() == nation_df.where("n_regionkey = 2").count()
        # partition filter prunes at planning time: only one partition dir read
        plan = back._jdf.queryExecution().executedPlan().toString()
        assert "n_regionkey=2" in plan or "PartitionFilters" in plan


def test_convert_to_parquet(spark, nation_df):
    with tempfile.TemporaryDirectory() as d:
        csv_path = os.path.join(d, "nation_csv")
        pq_path = os.path.join(d, "nation_pq")
        write_sink(nation_df, csv_path, "csv")
        convert_to_parquet(
            spark,
            csv_path,
            "csv",
            pq_path,
            schema="n_nationkey bigint, n_name string, n_regionkey bigint",
        )
        assert read_source(spark, pq_path).count() == nation_df.count()


def test_unknown_format_rejected(spark, nation_df):
    with pytest.raises(ValueError):
        read_source(spark, "/tmp/x", "avro")
    with pytest.raises(ValueError):
        write_sink(nation_df, "/tmp/x", "xml")


def test_bucketed_tables_join_without_shuffle(spark, sf_dir):
    import uuid

    from skdist_spark.sources.io import write_bucketed_table

    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey", "o_totalprice")
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_name")
    suffix = uuid.uuid4().hex[:8]
    t_orders, t_cust = f"b_orders_{suffix}", f"b_cust_{suffix}"
    try:
        write_bucketed_table(orders, t_orders, ["o_custkey"], n_buckets=8)
        write_bucketed_table(cust, t_cust, ["c_custkey"], n_buckets=8)
        joined = spark.table(t_orders).join(
            spark.table(t_cust),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-bucketed equi-join: no shuffle exchange on either side
        assert "Exchange hashpartitioning" not in plan, plan[:1500]
        assert joined.count() == orders.join(
            cust, orders.o_custkey == cust.c_custkey
        ).count()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_cust}")


def test_kafka_source_gated(spark):
    from skdist_spark.sources import kafka

    if kafka.kafka_available(spark):
        df = kafka.read_kafka_stream(spark, "localhost:9092", "t")
        assert df.isStreaming
    else:
        import pytest

        with pytest.raises(RuntimeError, match="Kafka connector"):
            kafka.read_kafka_stream(spark, "localhost:9092", "t")
