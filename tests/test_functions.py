"""Tests for the reusable column-expression builders."""

import pandas as pd
from pyspark.sql import functions as F


def test_knuth_bucket_matches_manual(spark):
    from skdist_spark.functions import knuth_bucket

    df = spark.range(100).select(F.col("id"), knuth_bucket("id").alias("b"))
    for r in df.collect():
        assert r.b == (r.id * 2654435761) % 4294967296 % 1000


def test_epoch_micros_diff_seconds(spark):
    import datetime as dt

    from skdist_spark.functions import epoch_micros_diff_seconds

    base = dt.datetime(2024, 1, 1, 0, 0, 0, 600_000)
    rows = [(base, base + dt.timedelta(seconds=3, microseconds=500_000))]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["a", "b"]))
    got = df.select(epoch_micros_diff_seconds("b", "a").alias("s")).collect()[0].s
    assert got == 3  # 3.9 wall seconds -> 3 whole seconds, no per-op truncation


def test_ppm_of_rank_integer_exact(spark):
    from skdist_spark.functions import ppm_of_rank

    df = spark.createDataFrame(
        pd.DataFrame({"rank": [1, 2, 3, 1], "n": [3, 3, 3, 1]})
    )
    got = [
        r.p for r in df.select(ppm_of_rank(F.col("rank"), F.col("n")).alias("p")).collect()
    ]
    assert got == [0, 500000, 1000000, 0]


def test_words_array_and_morton(spark):
    from skdist_spark.functions import morton_value, words_array

    df = spark.createDataFrame(pd.DataFrame({"text": ["  a  b c ", ""]}))
    sizes = [r.n for r in df.select(F.size(F.expr(words_array())).alias("n")).collect()]
    assert sizes == [3, 0]
    z = spark.createDataFrame(pd.DataFrame({"x": [3], "y": [5]})).select(
        morton_value(["x", "y"]).alias("z")
    ).collect()[0].z
    # interleave(3=0b11, 5=0b101) -> x bits at even, y at odd: 0b100111
    assert z == 0b100111
