"""Engine-specific: the data-quality / integrity toolkit — declarative
DQ audit, zero-extra-scan observe() counters, the Merkle table
fingerprint, and the manifest-committed Python DataSource writer."""

from pyspark.sql import SparkSession

from skdist_spark.operators.quality import (
    QUERIES as QUALITY_QUERIES,
    observe_quality,
    table_fingerprint,
)
from skdist_spark.sources.catalog import load_table
from skdist_spark.sources.synthetic import (
    JsonlManifestDataSource,
    read_jsonl_manifest,
)

spark = SparkSession.builder.master("local[4]").getOrCreate()
sf = "/root/testdata/sf0.001"

print("-- declarative DQ audit (one row per constraint) --")
QUALITY_QUERIES["dq_orders"](spark, sf).show(truncate=False)

print("-- zero-extra-scan counters: ride the production action --")
orders = load_table(spark, "orders", sf)
observed, obs = observe_quality(
    orders, {"price_positive": "o_totalprice > 0"}
)
n = observed.count()  # the "production job"
print(f"job rows={n}; piggybacked metrics={obs.get}")

print("-- Merkle fingerprint: integrity root + per-bucket digests --")
table_fingerprint(orders, ["o_orderkey", "o_orderstatus"]).show(4)

print("-- Python DataSource writer: manifest-committed shards --")
import tempfile

with tempfile.TemporaryDirectory() as d:
    try:
        spark.dataSource.register(JsonlManifestDataSource)
    except Exception:
        pass
    out = f"{d}/sink"
    orders.limit(50).select("o_orderkey", "o_orderstatus").repartition(
        2
    ).write.format("jsonl_manifest").option("path", out).mode("append").save()
    back = read_jsonl_manifest(spark, out)
    print(f"manifest-visible rows: {back.count()}")
