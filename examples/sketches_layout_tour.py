"""Engine-specific: the portable-sketch and data-layout toolkit —
every sketch here (KMV theta, HLL registers, Bloom bitset, count-min)
is a pure integer function of the data under one shared 32-bit hash,
so a second engine can rebuild the sketch CONTENTS bit-for-bit; the
layout audits (z-order and Hilbert) play the same game with file
assignments.  All state is bounded: k rows, 256 registers, 512 words,
64 files — the shapes that survive a 100 TB shuffle."""

from pyspark.sql import SparkSession

from skdist_spark.operators.sketches import (
    QUERIES as SKETCH_QUERIES,
    kmv_join_keys_estimate,
)
from skdist_spark.sources.catalog import load_table
from skdist_spark.sources.io import hilbert_layout, zorder_layout

spark = SparkSession.builder.master("local[4]").getOrCreate()
sf = "/root/testdata/sf0.001"

print("-- KMV theta sketches: cardinality / union / intersection --")
SKETCH_QUERIES["kmv_user_overlap"](spark, sf).show()

print("-- ... and set DIFFERENCE from the same union sample --")
SKETCH_QUERIES["kmv_user_difference"](spark, sf).show()

print("-- the exact face the sketches are verified against --")
SKETCH_QUERIES["user_overlap_exact"](spark, sf).show()

print("-- portable-HLL registers (first rows) + raw estimate --")
SKETCH_QUERIES["hll_portable_registers"](spark, sf).show(5)

print("-- register tables MAX-merge to coarser grains losslessly --")
SKETCH_QUERIES["hll_portable_rollup"](spark, sf).show(5)

print("-- Bloom runtime-filter: bitset words and the probe contract --")
SKETCH_QUERIES["bloom_filter_words"](spark, sf).show(5)
SKETCH_QUERIES["bloom_probe_audit"](spark, sf).show()

print("-- KMV join-selectivity pre-flight (generic API) --")
orders = load_table(spark, "orders", sf)
lineitem = load_table(spark, "lineitem", sf)
kmv_join_keys_estimate(orders, "o_orderkey", lineitem, "l_orderkey").show()

print("-- z-order layout audit: 64 files, both dims narrow --")
zorder_layout(spark, sf).show(5)

print("-- Hilbert layout audit: contiguous curve segments --")
hilbert_layout(spark, sf).show(5)
# no spark.stop(): examples share the caller's session (getOrCreate) —
# the smoke test runs every script in-process on one shared session
