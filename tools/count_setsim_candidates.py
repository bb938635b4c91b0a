"""Measure the set-similarity candidate cardinality per scale decade.

The `similar_doc_pairs` slope is candidate-bound on the synthetic
corpus (tiny shingle vocabulary -> long posting lists -> the PPJoin
prefix filter admits ~3,600x more candidates than true pairs).  This
ledger tool counts the PRUNED candidate pairs that enter the
array-verify join — 3 slim bigints per row, so the count itself never
pays the verify join's array shuffle — proving whether candidate
growth per decade is linear (copy-local duplicates: it should be).

Usage: python tools/count_setsim_candidates.py [sf_dir ...]
       (defaults to sf0.1, .localdata/sf1, .localdata/sf10)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from skdist_spark.operators.setsim import _setsim_candidates
    from skdist_spark.sources.catalog import load_table
    from skdist_spark.sources.session import get_session

    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        os.path.join(REPO, ".localdata", "sf1"),
        os.path.join(REPO, ".localdata", "sf10"),
    ]
    spark = get_session("skdist_spark-setsim-candidates")
    for sf_dir in dirs:
        if not os.path.isdir(sf_dir):
            print(f"# skip (no dir): {sf_dir}", file=sys.stderr)
            continue
        docs = load_table(spark, "documents", sf_dir)
        cand, _ = _setsim_candidates(docs)
        t0 = time.perf_counter()
        n = cand.count()
        print(json.dumps({
            "sf_dir": sf_dir,
            "pruned_candidates": n,
            "count_sec": round(time.perf_counter() - t0, 2),
        }))
    spark.stop()


if __name__ == "__main__":
    main()
