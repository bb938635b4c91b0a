"""Hypothesis property tests for the generic join and dedup operators:
random small inputs, compared against a brute-force pandas model of the
declared semantics. Few examples (Spark round-trip per example is
expensive) but each example is adversarially shrunk on failure.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from skdist_spark.operators.joins import asof_join, bloom_semi_join, interval_join

_BASE = dt.datetime(2024, 1, 1)

_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # key
        st.integers(min_value=0, max_value=3600),  # offset seconds
    ),
    min_size=1,
    max_size=25,
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _mk(spark, rows, extra=0):
    pdf = pd.DataFrame(
        {
            "key": [k for k, _ in rows],
            "ts": [_BASE + dt.timedelta(seconds=s + extra) for _, s in rows],
            "rid": list(range(len(rows))),
        }
    )
    return spark.createDataFrame(pdf)


@given(left=_events, right=_events)
@_SETTINGS
def test_asof_join_matches_brute_force(spark, left, right):
    ldf, rdf = _mk(spark, left), _mk(spark, right)
    got = {
        (r.rid, r.asof_ts)
        for r in asof_join(ldf, rdf, "key", "ts", "ts", value_cols=["ts"]).collect()
    }
    want = set()
    for i, (lk, ls) in enumerate(left):
        lts = _BASE + dt.timedelta(seconds=ls)
        prior = [
            _BASE + dt.timedelta(seconds=rs)
            for rk, rs in right
            if rk == lk and _BASE + dt.timedelta(seconds=rs) < lts
        ]
        want.add((i, max(prior) if prior else None))
    assert got == want


@given(left=_events, right=_events, lo=st.integers(-600, 0), span=st.integers(1, 1200))
@_SETTINGS
def test_interval_join_matches_brute_force(spark, left, right, lo, span):
    ldf, rdf = _mk(spark, left), _mk(spark, right)
    hi = lo + span
    got = sorted(
        (r.rid, r.right_ts)
        for r in interval_join(
            ldf, rdf.drop("rid"), "key", "ts", "ts", float(lo), float(hi)
        ).collect()
    )
    want = sorted(
        (i, _BASE + dt.timedelta(seconds=rs))
        for i, (lk, ls) in enumerate(left)
        for rk, rs in right
        if rk == lk and ls + lo <= rs <= ls + hi
    )
    assert got == want


@given(
    left=st.lists(st.integers(0, 50), min_size=1, max_size=40),
    right=st.lists(st.integers(0, 50), min_size=1, max_size=40),
)
@_SETTINGS
def test_bloom_semi_join_matches_set_semantics(spark, left, right):
    ldf = spark.createDataFrame(pd.DataFrame({"k": left, "rid": range(len(left))}))
    rdf = spark.createDataFrame(pd.DataFrame({"k": right}))
    got = sorted(r.rid for r in bloom_semi_join(ldf, rdf, "k", num_bits=1 << 12).collect())
    want = sorted(i for i, k in enumerate(left) if k in set(right))
    assert got == want


@given(
    left=st.lists(
        # power-law-ish: key 0 is hot
        st.integers(0, 6).map(lambda k: 0 if k > 3 else k),
        min_size=1,
        max_size=60,
    ),
    right=st.lists(st.integers(0, 6), min_size=0, max_size=10),
    how=st.sampled_from(["inner", "left"]),
)
@_SETTINGS
def test_salted_join_property(spark, left, right, how):
    from skdist_spark.operators.joins import salted_join

    ldf = spark.createDataFrame(
        pd.DataFrame({"k": left, "rid": range(len(left))})
    )
    rdf = spark.createDataFrame(pd.DataFrame({"k": right, "v": range(len(right))})) \
        if right else spark.createDataFrame(pd.DataFrame({"k": [], "v": []}),
                                            "k bigint, v bigint")
    plain = sorted(
        (r.rid, r.v) for r in ldf.join(rdf, "k", how).select("rid", "v").collect()
    )
    salted = sorted(
        (r.rid, r.v)
        for r in salted_join(ldf, rdf, "k", num_salts=4, how=how)
        .select("rid", "v")
        .collect()
    )
    assert plain == salted


@given(
    n=st.integers(min_value=50, max_value=300),
    num_salts=st.sampled_from([2, 4, 16]),
)
@_SETTINGS
def test_salted_agg_power_law_equivalence(spark, n, num_salts):
    """Two-stage salted aggregation over power-law (Zipf-shaped) keys
    must exactly equal the plain single-stage groupBy — the worst-case
    skew shape, where one key owns most rows."""
    import pandas as pd

    from skdist_spark.operators.aggregates import salted_agg

    # deterministic Zipf-ish keys: rank r gets ~ n/r rows
    rows = []
    rid = 0
    for rank in range(1, 8):
        for _ in range(max(n // rank, 1)):
            rows.append((rid, f"k{rank}", float((rid * 37) % 101) / 7.0))
            rid += 1
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["row_id", "k", "v"])
    )

    got = {
        r.k: (r.n_rows, round(r.sum_v, 6), r.min_v, r.max_v)
        for r in salted_agg(
            df, ["k"], sum_cols=["v"], min_cols=["v"], max_cols=["v"],
            salt_src="row_id", num_salts=num_salts,
        ).collect()
    }
    from pyspark.sql import functions as F

    want = {
        r.k: (r.n_rows, round(r.sum_v, 6), r.min_v, r.max_v)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("v").cast("decimal(28,6)")).cast("double").alias("sum_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
        .collect()
    }
    assert got == want
