"""Capture ``.explain("formatted")`` for named registry queries into
plans/r08/<query>_<suffix>.txt — the optimization round's plan-shape
evidence (Exchange count, join strategy, PushedFilters/ReadSchema,
BatchEvalPython/ArrowEvalPython nodes).

Usage: python tools/capture_plans.py before q1 dedup_semantic ...
       python tools/capture_plans.py after  q1

Streaming replays and driver-loop operators build their result
imperatively; for those the captured plan is the FINAL returned
DataFrame's (the composition stages are pinned by plan-snapshot tests
instead).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT_DIR = os.path.join(REPO, "plans", os.environ.get("PLANS_ROUND", "r09"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)

    import __spark_entry__ as entry_mod
    from skdist_spark.sources.session import get_session

    spark = get_session("skdist_spark-plan-capture")
    queries = entry_mod.queries()
    for name in names:
        if name not in queries:
            print(f"# unknown query {name}", file=sys.stderr)
            continue
        try:
            df = queries[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:
            print(f"# plan capture failed for {name}: {exc}", file=sys.stderr)
            continue
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"# wrote {path} ({plan.count('Exchange')} Exchange mentions)")
    spark.stop()


if __name__ == "__main__":
    main()
