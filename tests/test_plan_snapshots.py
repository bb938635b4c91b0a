"""Physical-plan fingerprint regression.

Every oracle query's initial physical plan is reduced to a fingerprint
(counts of the operators that determine scale behavior: join
strategies, shuffles, expands, aggregates, scans). The committed
snapshot in ``plan_snapshots.json`` is the plan we ACCEPTED after
explain-auditing; this test fails when a code change silently flips a
broadcast join to sort-merge, adds a shuffle, or duplicates a scan.

Regenerate intentionally with:
    UPDATE_PLAN_SNAPSHOTS=1 python -m pytest tests/test_plan_snapshots.py -q
then review the JSON diff like any other code change.
"""

from __future__ import annotations

import json
import os
import re

import pytest

import __spark_entry__ as entry_mod

SNAPSHOT_PATH = os.path.join(os.path.dirname(__file__), "plan_snapshots.json")

# operators whose counts define the plan shape; order = display order
_OPS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "Exchange",
    "Expand",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "Window",
    "FileScan",
    "Generate",
)

# queries whose DataFrame *construction* runs Spark jobs with
# nondeterministic partition-dependent plans, or that sample at build
# time — excluded rather than flaky
_SKIP: set[str] = set()


def _fingerprint(plan: str) -> dict[str, int]:
    return {
        op: len(re.findall(rf"\b{op}\b", plan))
        for op in _OPS
        if len(re.findall(rf"\b{op}\b", plan)) > 0
    }


def _current(spark, sf_dir) -> dict[str, dict[str, int]]:
    queries = entry_mod.queries()
    out = {}
    for name in sorted(entry_mod.oracle_sql()):
        if name in _SKIP:
            continue
        # Compile every plan CACHE-FREE: lazy persist() registrations
        # (global_rank materialization, the KMeans centroid chain)
        # otherwise leak across queries AND across earlier tests in the
        # same session — CacheManager substitutes any registered
        # subtree into later matching plans, making fingerprints
        # depend on session history instead of the query.
        spark.catalog.clearCache()
        df = queries[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        out[name] = _fingerprint(plan)
    return out


@pytest.mark.slow  # whole-registry sweep / multi-minute fit: run with -m slow (r9 lane split)
def test_plan_snapshots(spark, sf_dir):
    current = _current(spark, sf_dir)
    if os.environ.get("UPDATE_PLAN_SNAPSHOTS") == "1" or not os.path.exists(
        SNAPSHOT_PATH
    ):
        with open(SNAPSHOT_PATH, "w") as f:
            json.dump(current, f, indent=1, sort_keys=True)
        pytest.skip("plan snapshots regenerated — review the JSON diff")
    with open(SNAPSHOT_PATH) as f:
        committed = json.load(f)
    diffs = []
    for name, fp in current.items():
        if name not in committed:
            diffs.append(f"{name}: NEW query — regenerate snapshots")
        elif committed[name] != fp:
            diffs.append(f"{name}: committed={committed[name]} current={fp}")
    for name in committed:
        if name not in current:
            diffs.append(f"{name}: removed — regenerate snapshots")
    assert not diffs, "physical plan drift:\n" + "\n".join(diffs)
