"""Regenerate PLANS.md — the per-query physical-plan audit table.

Usage: python tools/gen_plans_md.py [sf_dir]
Builds every registry query's DataFrame at sf0.001 (no execution
beyond what construction itself triggers) and summarizes the initial
physical plan: exchange count, parquet scan count, join strategies,
and whether any PushedFilters reached a scan.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from skdist_spark.sources.session import get_session  # noqa: E402

_JOINS = (
    ("BroadcastHashJoin", "BHJ"),
    ("SortMergeJoin", "SMJ"),
    ("ShuffledHashJoin", "SHJ"),
    ("BroadcastNestedLoopJoin", "BNLJ"),
    ("CartesianProduct", "CART"),
)

HEADER = """# PLANS — per-query physical-plan audit (generated at sf0.001)

Columns: shuffles = hash/range exchanges in the initial plan;
scans = parquet FileScan count; joins = strategy x count
(BHJ broadcast-hash, SMJ sort-merge, BNLJ bounded broadcast-nested-loop);
pushed = a non-empty PushedFilters reached the scan.
Regenerate: python tools/gen_plans_md.py (fingerprints enforced in CI by
tests/test_plan_snapshots.py).
Integer-Lloyd queries (ml_kmeans_exact, ann_pq_exact,
dedup_semantic_exact) localCheckpoint each round, so their rows count
only the FINAL stage — the per-round assignment plans run eagerly at
construction and are lineage-truncated out of the audited plan.

| query | shuffles | scans | joins | pushed |
|---|---|---|---|---|
"""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("gen-plans")
    rows = []
    for name, fn in sorted(entry_mod.queries().items()):
        if name.startswith("stream_"):
            # running the micro-batch just to fingerprint its memory-sink
            # result frame would audit the wrong plan
            rows.append(f"| {name} | - | - | - | streaming (micro-batch plans) |")
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # streaming faces etc.
            print(f"# skip {name}: {exc}", file=sys.stderr)
            continue
        shuffles = len(re.findall(r"Exchange (?:hash|range)partitioning", plan))
        scans = len(re.findall(r"FileScan parquet", plan))
        joins = ",".join(
            f"{c}x{tag}"
            for op, tag in _JOINS
            if (c := len(re.findall(rf"\b{op}\b", plan))) > 0
        )
        pushed = "y" if re.search(r"PushedFilters: \[[^\]]", plan) else "-"
        rows.append(f"| {name} | {shuffles} | {scans} | {joins or '-'} | {pushed} |")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as fh:
        fh.write(HEADER + "\n".join(rows) + "\n")
    print(f"wrote {out}: {len(rows)} rows")
    spark.stop()


if __name__ == "__main__":
    main()
