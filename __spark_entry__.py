"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``skdist_spark``; this module only aggregates
the per-module query registries (each module keeps its DataFrame
builders and oracle SQL adjacent so they cannot drift).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from skdist_spark.operators import (  # noqa: E402
    clustering, dedup, graph, multimodal, similarity, sketches, text,
)
from skdist_spark import pipeline  # noqa: E402
from skdist_spark.plans import behavior, ml_queries, tpch, windows  # noqa: E402
from skdist_spark.streaming import ops as streaming_ops  # noqa: E402

_MODULES = [
    tpch, windows, behavior, dedup, graph, text, similarity, sketches,
    clustering, multimodal, ml_queries, streaming_ops, pipeline,
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    return tpch.q1(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLE_SQL)
    return out
