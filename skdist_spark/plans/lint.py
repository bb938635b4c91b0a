"""Physical-plan linting: the plan-hygiene rules this repo enforces on
its own queries (tests/test_plans.py, tests/test_plan_snapshots.py),
packaged as a reusable API so ANY DataFrame can be audited before it
ships to a 1000-executor cluster.

``plan_lint(df)`` inspects the compiled physical plan — not the code —
so it catches what review misses: a filter that silently stopped
pushing down after a refactor, a join that degraded to a cartesian
product, a Python UDF that fell off the Arrow path.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# (rule, severity, explanation)
RULES = {
    "cartesian-product": (
        "error",
        "CartesianProduct multiplies partitions of both sides; at scale "
        "this never finishes. Add an equi-join key or an explicit "
        "broadcast of a provably tiny side.",
    ),
    "nested-loop-join": (
        "warn",
        "BroadcastNestedLoopJoin evaluates the join predicate per row "
        "pair. Acceptable only when the broadcast side is a one-row "
        "aggregate or a bounded query set.",
    ),
    "filter-not-pushed": (
        "warn",
        "A scan evaluates data filters above the reader instead of "
        "pushing them into the parquet row-group index (PushedFilters "
        "is empty while DataFilters is not): the scan reads and then "
        "discards. Cast/udf-wrapped predicates are the usual cause.",
    ),
    "rowwise-python-udf": (
        "error",
        "BatchEvalPython is the row-at-a-time Python UDF path "
        "(~10-100x slower than Arrow). Use pandas_udf / mapInPandas.",
    ),
    "single-partition-exchange": (
        "warn",
        "Exchange SinglePartition funnels the whole dataset through one "
        "task (global window/sort/limit without a partitioner). Fine "
        "for one-row aggregates; a scale bug for anything data-sized.",
    ),
    "global-window": (
        "warn",
        "A Window with no PARTITION BY runs the whole input in ONE task "
        "(Spark's 'No Partition Defined' warning). Sanctioned only for "
        "provably bounded frames (calendar days, top-k lists, one row "
        "per shard); for data-sized total orders use "
        "functions.two_phase_row_number / two_phase_running_agg.",
    ),
}


def _global_windows(plan: str) -> int:
    """Count DISTINCT partition-less ORDERED Window operator instances.

    Plan-string shapes: ``Window [exprs], [partition], [order]`` (3
    groups — fine), ``Window [exprs], [partition]`` (2 groups, no
    order — partitioned, fine), ``Window [exprs], [order]`` (2 groups
    where the second carries ASC/DESC sort tokens — the global-sort
    single-task shape this rule exists for).

    Distinct, not raw matches: a persisted/cached subtree's plan is
    re-PRINTED once per consumer, so one physical Window operator can
    appear many times in the string.  Expression ids (``col#123``) are
    unique per operator instance, so the exact matched text identifies
    the instance — dedup counts operators, not printings."""
    seen: set[str] = set()
    for m in re.finditer(r"(?:^|\s)Window (\[.*)$", plan, re.MULTILINE):
        depth = 0
        groups: list[str] = []
        for ch in m.group(1):
            if ch == "[":
                if depth == 0:
                    groups.append("")
                depth += 1
            elif ch == "]":
                depth -= 1
            if depth > 0 and groups:
                groups[-1] += ch
        if len(groups) == 2 and re.search(
            r" (ASC|DESC) NULLS (FIRST|LAST)", groups[-1]
        ):
            seen.add(m.group(1))
    return len(seen)


def plan_lint(df: DataFrame) -> list[dict]:
    """Lint a DataFrame's compiled physical plan; returns
    [{rule, severity, detail, explanation}] (empty = clean).

    One-row-aggregate exchanges (the sanctioned scalar-broadcast
    shape) still report — the caller decides, the linter only sees
    the plan.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    findings: list[dict] = []

    def hit(rule: str, detail: str) -> None:
        sev, why = RULES[rule]
        findings.append(
            {"rule": rule, "severity": sev, "detail": detail, "explanation": why}
        )

    n = len(re.findall(r"\bCartesianProduct\b", plan))
    if n:
        hit("cartesian-product", f"{n} CartesianProduct node(s)")
    n = len(re.findall(r"\bBroadcastNestedLoopJoin\b", plan))
    if n:
        hit("nested-loop-join", f"{n} BroadcastNestedLoopJoin node(s)")
    n = len(re.findall(r"\bBatchEvalPython\b", plan))
    if n:
        hit("rowwise-python-udf", f"{n} BatchEvalPython node(s)")
    n = len(re.findall(r"Exchange SinglePartition", plan))
    if n:
        hit("single-partition-exchange", f"{n} SinglePartition exchange(s)")
    n = _global_windows(plan)
    if n:
        hit("global-window", f"{n} partition-less Window node(s)")
    for m in re.finditer(r"FileScan \w+ \[[^\]]*\][^\n]*", plan):
        scan = m.group(0)
        data_f = re.search(r"DataFilters: \[([^\]]*)\]", scan)
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", scan)
        if data_f and pushed and data_f.group(1).strip() and not pushed.group(1).strip():
            hit("filter-not-pushed", scan[:160])
    return findings


def assert_plan_clean(df: DataFrame, allow: tuple[str, ...] = ()) -> None:
    """Raise AssertionError when the plan has findings outside
    ``allow`` — the CI-gate form of ``plan_lint``."""
    bad = [f for f in plan_lint(df) if f["rule"] not in allow]
    assert not bad, "plan lint: " + "; ".join(
        f"{f['rule']} ({f['detail']})" for f in bad
    )
