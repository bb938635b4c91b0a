"""Kafka Structured Streaming source, availability-gated.

The spark-sql-kafka connector jar is not bundled in every deployment
(it is absent in this container); these helpers probe for it and fail
with an actionable error instead of a deep Catalyst stack trace. When
the jar IS on the classpath the returned stream is the standard
value/key/topic/partition/offset/timestamp frame, optionally with the
JSON value parsed against a caller-supplied schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["kafka_available", "read_kafka_stream"]

_KAFKA_PROVIDER = "org.apache.spark.sql.kafka010.KafkaSourceProvider"


def kafka_available(spark: SparkSession) -> bool:
    """True iff the Kafka connector is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(_KAFKA_PROVIDER)
        return True
    except Exception:
        return False


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    value_schema: str | None = None,
) -> DataFrame:
    """``readStream`` from a Kafka topic.

    With ``value_schema`` (a DDL string, e.g. ``"user_id LONG, ts
    TIMESTAMP"``), the binary value is parsed as JSON and the parsed
    columns are flattened alongside the Kafka metadata columns.
    """
    if not kafka_available(spark):
        raise RuntimeError(
            "Kafka connector not on classpath. Add the "
            "spark-sql-kafka-0-10 package matching your Spark version "
            "(e.g. --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<version>) "
            "and retry."
        )
    stream = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    if value_schema is None:
        return stream
    parsed = stream.withColumn(
        "__parsed", F.from_json(F.col("value").cast("string"), value_schema)
    )
    return parsed.select(
        "key", "topic", "partition", "offset", "timestamp", "__parsed.*"
    )
