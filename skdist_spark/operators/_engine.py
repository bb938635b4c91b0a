"""Distributed task-grid execution engine.

The reference's core trick (skdist/distribute/search.py:410-437,
ensemble, multiclass, eliminate — all variants of it) is: enumerate a
grid of small independent training tasks, broadcast the training data
once, run one task per Spark task, collect small results.

This rebuild expresses that Spark-first: tasks become rows of a
DataFrame, range-partitioned one-task-per-partition, executed through
``mapInPandas`` (Arrow-batched), with results returned as pickled
payloads in a binary column. Compared to the reference's
``sc.parallelize(...).map``, the task set is visible to Catalyst/AQE,
results stream back through Arrow, and the same code path works on
Spark Connect clusters where raw RDDs are unavailable.

Scale posture: the collected payloads are (score, params, small
model) tuples — never training data — so driver memory stays O(#tasks),
and the broadcast is one copy per executor regardless of task count.
"""

from __future__ import annotations

import pickle
from collections.abc import Callable, Iterable, Sequence
from typing import Any

import numpy as np


def resolve_spark(sc) -> tuple[Any | None, Any | None]:
    """Accept SparkSession, SparkContext, or None.

    Returns (spark_session, spark_context); (None, None) -> run locally.
    The reference accepts a sparkContext argument everywhere; we keep
    that API but prefer a session when given one.
    """
    if sc is None:
        return None, None
    # SparkSession
    if hasattr(sc, "sparkContext"):
        return sc, sc.sparkContext
    # SparkContext -> find/create the session on top of it
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        spark = SparkSession(sc)
    return spark, sc


def parse_partitions(partitions, n_tasks: int) -> int:
    """'auto' -> one partition per task (reference base.py:53 behavior)."""
    if partitions in (None, "auto"):
        return max(1, n_tasks)
    return max(1, int(partitions))


def run_tasks(
    sc,
    tasks: Sequence[Any],
    work_fn: Callable[[Any, Any], Any],
    shared: Any = None,
    partitions="auto",
) -> list[Any]:
    """Run ``work_fn(task, shared)`` for every task, preserving order.

    With no Spark handle, runs serially (reference parity: joblib path).
    With Spark, broadcasts ``shared`` + the task list once and fans out
    via a task-id DataFrame -> mapInPandas.
    """
    tasks = list(tasks)
    if not tasks:
        return []
    spark, context = resolve_spark(sc)
    if spark is None:
        return [work_fn(t, shared) for t in tasks]

    n_parts = parse_partitions(partitions, len(tasks))
    # cloudpickle (vendored in pyspark) so closures/lambdas work as work_fn.
    # Register every skdist_spark module for BY-VALUE pickling: python
    # workers then need no skdist_spark on their PYTHONPATH — the code
    # travels inside the broadcast, like a self-shipping UDF.
    import sys

    from pyspark import cloudpickle

    if hasattr(cloudpickle, "register_pickle_by_value"):
        for mod_name, mod in list(sys.modules.items()):
            if mod_name.startswith("skdist_spark") and mod is not None:
                try:
                    cloudpickle.register_pickle_by_value(mod)
                except Exception:
                    pass

    bc = context.broadcast(cloudpickle.dumps((tasks, shared, work_fn)))

    def _run_batch(batches):
        import pandas as pd
        from pyspark import cloudpickle as cp

        tasks_l, shared_l, fn = pickle.loads(bc.value)
        for pdf in batches:
            ids = pdf["task_id"].tolist()
            # cloudpickle on the worker too: results may hold instances of
            # classes that traveled by value and differ from importables
            payloads = [cp.dumps(fn(tasks_l[i], shared_l)) for i in ids]
            yield pd.DataFrame({"task_id": ids, "payload": payloads})

    # spark.range with an explicit partition count already yields
    # CONTIGUOUS equal id ranges per partition — the repartitionByRange
    # this replaces paid a RangePartitioner SAMPLING job plus an
    # exchange+sort per run_tasks call to produce the same layout
    task_df = spark.range(0, len(tasks), 1, n_parts).withColumnRenamed(
        "id", "task_id"
    )
    out_rows = task_df.mapInPandas(
        _run_batch, schema="task_id long, payload binary"
    ).collect()
    bc.unpersist()
    results: list[Any] = [None] * len(tasks)
    for row in out_rows:
        results[row["task_id"]] = pickle.loads(bytes(row["payload"]))
    missing = [i for i, r in enumerate(results) if r is None]
    if missing:
        raise RuntimeError(f"distributed tasks lost results for ids {missing[:5]}...")
    return results


def safe_indexing(X, indices):
    """Row-subset numpy arrays, pandas frames, or python sequences."""
    if X is None:
        return None
    if hasattr(X, "iloc"):
        return X.iloc[indices]
    X = np.asarray(X) if not isinstance(X, np.ndarray) else X
    return X[indices]


def strip_spark(obj) -> None:
    """Remove spark handles so the fitted estimator pickles cleanly
    (reference behavior: `del self.sc` at end of every fit)."""
    for attr in ("sc", "_spark"):
        if hasattr(obj, attr):
            try:
                delattr(obj, attr)
            except AttributeError:
                pass
    inner = getattr(obj, "estimator", None)
    if inner is not None and hasattr(inner, "sc"):
        try:
            delattr(inner, "sc")
        except AttributeError:
            pass


def rankdata_min(values: np.ndarray) -> np.ndarray:
    """scipy.stats.rankdata(method='min') for 1-D arrays (ascending)."""
    values = np.asarray(values)
    order = np.argsort(values, kind="mergesort")
    ranks = np.empty(len(values), dtype=np.int32)
    rank = 1
    for i, idx in enumerate(order):
        if i > 0 and values[idx] != values[order[i - 1]]:
            rank = i + 1
        ranks[idx] = rank
    return ranks
