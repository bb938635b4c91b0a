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


def test_two_phase_row_number_matches_global_window(spark):
    """The distributed rank must equal ROW_NUMBER() OVER (ORDER BY ...)
    exactly — including on a CACHED input (the repartitionByRange +
    spark_partition_id design this helper replaces silently broke
    there: range-partitioner sampling reseeds per physical RDD, so
    unreused exchange branches disagreed on partition ids)."""
    import random

    from pyspark.sql import Window

    from skdist_spark.functions import two_phase_row_number

    random.seed(7)
    rows = [(i, random.randint(0, 50), random.random()) for i in range(5003)]
    df = spark.createDataFrame(rows, "id long, v long, x double").repartition(16)
    order = [F.col("v").asc(), F.col("id").asc()]
    for frame in (df, df.cache()):
        frame.count()
        got = two_phase_row_number(frame, order, F.col("v"), "rn")
        exp = frame.select(
            "id", F.row_number().over(Window.orderBy(*order)).alias("ern")
        )
        assert (
            got.select("id", "rn").join(exp, "id").where("rn != ern").count() == 0
        )
    df.unpersist()
    # DESC order via negated shard key, plus the hash-sampled
    # boundary path (sample only moves boundaries, never ranks)
    order_d = [F.col("x").desc(), F.col("id").asc()]
    got = two_phase_row_number(df, order_d, -F.col("x"), "rn", sample_mod=7)
    exp = df.select(
        "id", F.row_number().over(Window.orderBy(*order_d)).alias("ern")
    )
    assert got.select("id", "rn").join(exp, "id").where("rn != ern").count() == 0
    # empty input
    assert (
        two_phase_row_number(df.where("v < 0"), order, F.col("v"), "rn").count()
        == 0
    )
    # materialize variants compute identical ranks (persist keeps
    # lineage visible to plan audits; checkpoint truncates it)
    for mat in ("persist", "checkpoint", False):
        got = two_phase_row_number(df, order, F.col("v"), "rn", materialize=mat)
        exp = df.select(
            "id", F.row_number().over(Window.orderBy(*order)).alias("ern")
        )
        assert (
            got.select("id", "rn").join(exp, "id").where("rn != ern").count()
            == 0
        ), mat


def test_two_phase_group_row_number_matches_partitioned_window(spark):
    """VERDICT r7 #3: the per-group distributed rank must equal
    ROW_NUMBER() OVER (PARTITION BY g ORDER BY ...) exactly — groups of
    wildly different sizes (one group holds ~60% of rows), ties in the
    shard key, and the per-group total riding the offset table."""
    import random

    from pyspark.sql import Window

    from skdist_spark.functions import two_phase_group_row_number

    random.seed(23)
    rows = [
        (
            i,
            "big" if i % 10 < 6 else f"g{i % 7}",
            random.randint(0, 30),  # heavy ties
        )
        for i in range(6007)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v long").repartition(16)
    order = [F.col("v").asc(), F.col("id").asc()]
    got = two_phase_group_row_number(
        df, ["g"], order, F.col("v"), "rn", total_col="n",
        tie_key=F.col("id"),
    )
    w = Window.partitionBy("g").orderBy(*order)
    exp = df.select(
        "id",
        F.row_number().over(w).alias("ern"),
        F.count(F.lit(1)).over(Window.partitionBy("g")).alias("en"),
    )
    assert (
        got.select("id", "rn", "n").join(exp, "id")
        .where("rn != ern OR n != en").count() == 0
    )
    # the local-rank window must partition by (group, shard) — never
    # the bare group column (that is the hot-partition shape this
    # helper exists to avoid)
    plan = got._jdf.queryExecution().executedPlan().toString()
    data_windows = [
        line for line in plan.splitlines()
        if "Window" in line and "__gr_local" in line
    ]
    assert data_windows and all("__gr_part" in line for line in data_windows)
    # empty input
    assert (
        two_phase_group_row_number(
            df.where("v < 0"), ["g"], order, F.col("v"), "rn"
        ).count() == 0
    )


def test_two_phase_row_number_null_keys(spark):
    """ADVICE r4 (medium): NULL shard keys land in shard 0, which is
    only correct for ASC orders (NULLS FIRST).  For DESC orders the
    caller passes nulls_last=True and NULL-key rows route to the LAST
    shard, matching Spark's DESC NULLS LAST placement."""
    import random

    from pyspark.sql import Window

    from skdist_spark.functions import two_phase_row_number

    random.seed(17)
    rows = [
        (i, None if i % 11 == 0 else random.randint(0, 40)) for i in range(3001)
    ]
    df = spark.createDataFrame(rows, "id long, v long").repartition(16)
    # ASC: NULLS FIRST matches the default shard-0 routing
    order = [F.col("v").asc(), F.col("id").asc()]
    got = two_phase_row_number(df, order, F.col("v"), "rn")
    exp = df.select(
        "id", F.row_number().over(Window.orderBy(*order)).alias("ern")
    )
    assert got.select("id", "rn").join(exp, "id").where("rn != ern").count() == 0
    # DESC: negated key keeps NULL NULL; Spark sorts them LAST
    order_d = [F.col("v").desc(), F.col("id").asc()]
    got = two_phase_row_number(
        df, order_d, -F.col("v"), "rn", nulls_last=True
    )
    exp = df.select(
        "id", F.row_number().over(Window.orderBy(*order_d)).alias("ern")
    )
    assert got.select("id", "rn").join(exp, "id").where("rn != ern").count() == 0


def test_two_phase_row_number_tie_key_balances_tie_mass(spark):
    """VERDICT r4 #6: a value carrying 90% of the rows collapses into
    one shard when boundaries see shard_key alone; with tie_key the
    boundaries are (key, tie) pairs, ranks stay EXACTLY the global
    window's, and the dominant shard holds ~1/n of the data."""
    import random

    from pyspark.sql import Window

    from skdist_spark.functions import two_phase_row_number
    from skdist_spark.functions.global_rank import _PART, _sharded

    random.seed(23)
    n_rows = 20_000
    # 90% tie mass on v=7, the rest spread over [0, 50]
    rows = [
        (i, 7 if i % 10 else random.randint(0, 50)) for i in range(n_rows)
    ]
    df = spark.createDataFrame(rows, "id long, v long").repartition(16)
    order = [F.col("v").asc(), F.col("id").asc()]
    for mod in (1, 7):
        got = two_phase_row_number(
            df, order, F.col("v"), "rn", tie_key=F.col("id"), sample_mod=mod
        )
        exp = df.select(
            "id", F.row_number().over(Window.orderBy(*order)).alias("ern")
        )
        assert (
            got.select("id", "rn").join(exp, "id").where("rn != ern").count()
            == 0
        ), mod
    # shard balance: with exact pair boundaries the largest shard is
    # ~mean; without tie_key the v=7 mass collapses into one shard
    n_shards = 16
    sizes = (
        _sharded(df, F.col("v"), n_shards, 1, tie_key=F.col("id"))
        .groupBy(_PART).count().collect()
    )
    counts = [r["count"] for r in sizes]
    assert max(counts) / (n_rows / n_shards) <= 2.0, counts
    skewed = (
        _sharded(df, F.col("v"), n_shards, 1)
        .groupBy(_PART).count().collect()
    )
    assert max(r["count"] for r in skewed) >= 0.9 * n_rows  # the old shape
    # DESC with ties: negate BOTH key and tie
    order_d = [F.col("v").desc(), F.col("id").desc()]
    got = two_phase_row_number(
        df, order_d, -F.col("v"), "rn", tie_key=-F.col("id")
    )
    exp = df.select(
        "id", F.row_number().over(Window.orderBy(*order_d)).alias("ern")
    )
    assert got.select("id", "rn").join(exp, "id").where("rn != ern").count() == 0
    # tiny frame + default sampling -> EMPTY boundary sample: must
    # degrade to one shard (index clamp), never raise element_at(0)
    tiny = spark.createDataFrame(
        [(i, 7) for i in range(40)], "id long, v long"
    )
    got = two_phase_row_number(
        tiny, order, F.col("v"), "rn", tie_key=F.col("id")
    )
    assert sorted(r.rn for r in got.collect()) == list(range(1, 41))


def test_two_phase_running_agg_matches_global_window(spark):
    import random

    from pyspark.sql import Window

    from skdist_spark.functions import two_phase_running_agg

    random.seed(11)
    rows = [(i, random.randint(-20, 50), random.random()) for i in range(5003)]
    df = spark.createDataFrame(rows, "id long, v long, x double").repartition(16)
    order = [F.col("v").asc(), F.col("id").asc()]
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    for agg, col in (("sum", "v"), ("max", "x"), ("min", "x")):
        got = two_phase_running_agg(df, order, F.col("v"), col, agg, "r")
        exp = df.select(
            "id", getattr(F, agg)(col).over(w).alias("er")
        )
        assert (
            got.select("id", "r").join(exp, "id").where("r != er").count() == 0
        ), agg


def test_ntile_from_row_number_matches_spark_and_duckdb(spark):
    import duckdb

    from pyspark.sql import Window

    from skdist_spark.functions import ntile_from_row_number

    con = duckdb.connect()
    for n, k in ((10007, 5), (100, 6), (7, 7), (3, 7), (4, 4)):
        df = spark.range(1, n + 1).select(F.col("id").alias("rn"))
        mine = df.select(
            "rn", F.expr(ntile_from_row_number("rn", str(n), k)).alias("t")
        )
        ref = df.select(
            "rn", F.ntile(k).over(Window.orderBy("rn")).alias("t2")
        )
        assert mine.join(ref, "rn").where("t != t2").count() == 0, (n, k)
        duck = dict(
            con.execute(
                f"SELECT i, NTILE({k}) OVER (ORDER BY i)"
                f" FROM range(1, {n} + 1) t(i)"
            ).fetchall()
        )
        got = {r.rn: r.t for r in mine.collect()}
        assert got == duck, (n, k)


def test_two_phase_max_prefix_sum_matches_global_window(spark):
    import random

    from pyspark.sql import Window

    from skdist_spark.functions import two_phase_max_prefix_sum

    random.seed(13)
    rows = [(i, random.choice([1, -1]), random.randint(0, 400)) for i in range(4001)]
    df = spark.createDataFrame(rows, "id long, delta long, t long").repartition(16)
    order = [F.col("t").asc(), F.col("delta").asc(), F.col("id").asc()]
    got = two_phase_max_prefix_sum(df, order, F.col("t"), "delta").collect()[0]
    exp = (
        df.select(
            F.sum("delta")
            .over(Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0))
            .alias("run")
        )
        .agg(F.max("run").alias("mx"), F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )
    assert got["max_prefix"] == exp["mx"]
    assert got["n_rows"] == exp["n"]
