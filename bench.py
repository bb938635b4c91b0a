"""Headline benchmark: runs the oracle-checked query suite at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line with per-query
wall seconds plus the total.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry_mod
    from skdist_spark.sources.session import get_session

    spark = get_session("skdist_spark-bench")
    queries = entry_mod.queries()

    # warm the JVM + parquet footers with the cheapest query once
    try:
        queries["q6"](spark, sf_dir).collect()
    except Exception:
        pass

    times: dict[str, float] = {}
    exchanges: dict[str, int] = {}
    t_all = time.perf_counter()
    for name in sorted(queries):
        t0 = time.perf_counter()
        try:
            df = queries[name](spark, sf_dir)
            df.collect()
            times[name] = round(time.perf_counter() - t0, 4)
            # static efficiency signal: shuffle count in the plan
            plan = df._jdf.queryExecution().executedPlan().toString()
            exchanges[name] = plan.count("Exchange hashpartitioning") + plan.count(
                "Exchange rangepartitioning"
            )
        except Exception as exc:  # pragma: no cover
            times[name] = -1.0
            print(f"# bench error {name}: {exc}", file=sys.stderr)
    total = round(time.perf_counter() - t_all, 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "suite_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": times,
                "plan_shuffles": exchanges,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
