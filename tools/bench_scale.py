"""Two-point scale profile: run the full query registry at sf0.01 AND
sf0.1 in one session, record per-query wall seconds for both in
BENCH_SCALE.json, and regenerate the scale-slope table in SCALING.md
between the BENCH_SCALE markers — so the 10x-data growth evidence is
produced mechanically each round instead of by hand.

Usage:  python tools/bench_scale.py            # both SFs, ~15 min
        SPARK_GRAFT_QUERIES=q1,q6 python tools/bench_scale.py

A slope of ~1.0 means the query is fixed-overhead-bound at this scale;
the interesting tail is slopes approaching 10 (per-row work) or beyond
(superlinear — a plan that would not survive 100x).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_SMALL = "/root/testdata/sf0.01"
SF_BIG = "/root/testdata/sf0.1"
# second decade: repo-local 10x upsample of sf0.1 (tools/make_sf1.py);
# only the TOP_SF1 most expensive sf0.1 queries run there — the point
# is to re-rank the slope outliers on a decade where ~1 s queries are
# not fixed-cost noise
SF1 = os.environ.get(
    "SPARK_GRAFT_SF1_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".localdata", "sf1"),
)
# third decade: 100x upsample (tools/make_sf10.py); only the TOP_SF10
# most expensive sf1 queries run there
SF10 = os.environ.get(
    "SPARK_GRAFT_SF10_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".localdata", "sf10"),
)
TOP_SF1 = 30
TOP_SF10 = 15
MARK_LO = "<!-- BENCH_SCALE:begin -->"
MARK_HI = "<!-- BENCH_SCALE:end -->"
TOP_N = 15


PARTIAL = os.path.join(REPO, "BENCH_SCALE.partial.json")


def _run_suite(spark, queries, sf_dir, rows_out=None) -> dict[str, float]:
    import gc

    times: dict[str, float] = {}
    for qi, name in enumerate(sorted(queries)):
        if qi % 16 == 0:
            gc.collect()  # free prior queries' localCheckpoint blocks
        t0 = time.perf_counter()
        try:
            out = queries[name](spark, sf_dir).collect()
            times[name] = round(time.perf_counter() - t0, 4)
            if rows_out is not None:
                # output cardinality: the evidence behind every
                # "output-bound" slope claim (VERDICT r7 #8)
                rows_out[name] = len(out)
        except Exception as exc:  # pragma: no cover
            times[name] = -1.0
            print(f"# scale-bench error {name}@{sf_dir}: {exc}", file=sys.stderr)
        # checkpoint per query: a lane interrupted mid-run (the r8
        # first-session sf10 death) should not lose its measurements
        try:
            with open(PARTIAL, "a") as fh:
                fh.write(json.dumps(
                    {"sf_dir": sf_dir, "query": name, "sec": times[name],
                     "rows": (rows_out or {}).get(name)}) + "\n")
        except OSError:
            pass
    return times


def _from_partial(path: str) -> tuple:
    """Rebuild the per-SF time/row dicts from a (possibly interrupted)
    run's per-query checkpoint log — the reason the log exists: a lane
    whose Spark session dies mid-decade keeps every measurement it
    already took."""
    small: dict[str, float] = {}
    big: dict[str, float] = {}
    sf1: dict[str, float] = {}
    sf10: dict[str, float] = {}
    rows_big: dict[str, int] = {}
    rows_sf1: dict[str, int] = {}
    rows_sf10: dict[str, int] = {}
    buckets = {
        SF_SMALL: (small, None),
        SF_BIG: (big, rows_big),
        SF1: (sf1, rows_sf1),
        SF10: (sf10, rows_sf10),
    }
    with open(path) as fh:
        for line in fh:
            try:
                d = json.loads(line)
            except ValueError:
                continue
            times, rows = buckets.get(d.get("sf_dir"), (None, None))
            if times is None:
                continue
            times[d["query"]] = d["sec"]
            if rows is not None and d.get("rows") is not None:
                rows[d["query"]] = d["rows"]
    return small, big, sf1, sf10, rows_big, rows_sf1, rows_sf10


def main() -> None:
    if "--from-partial" in sys.argv:
        idx = sys.argv.index("--from-partial")
        src = sys.argv[idx + 1] if len(sys.argv) > idx + 1 else PARTIAL
        (small, big, sf1, sf10,
         rows_big, rows_sf1, rows_sf10) = _from_partial(src)
        _write_outputs(small, big, sf1, sf10,
                       rows_big, rows_sf1, rows_sf10, set(small))
        return

    import __spark_entry__ as entry_mod
    from skdist_spark.sources.session import get_session

    try:
        open(PARTIAL, "w").close()  # fresh checkpoint log per run
    except OSError:
        pass
    spark = get_session("skdist_spark-bench-scale")
    queries = entry_mod.queries()
    subset = os.environ.get("SPARK_GRAFT_QUERIES")
    if subset:
        wanted = {q.strip() for q in subset.split(",") if q.strip()}
        queries = {k: v for k, v in queries.items() if k in wanted}
    try:  # JVM + footer warmup
        queries.get("q6", next(iter(queries.values())))(spark, SF_SMALL).collect()
    except Exception:
        pass
    small = _run_suite(spark, queries, SF_SMALL)
    rows_big: dict[str, int] = {}
    big = _run_suite(spark, queries, SF_BIG, rows_big)

    # sf1 spot profile: the TOP_SF1 most expensive sf0.1 queries get a
    # second decade (sf0.1 -> sf1) so their slopes are data-dominated
    sf1: dict[str, float] = {}
    rows_sf1: dict[str, int] = {}
    if os.path.isdir(SF1):
        top = sorted(
            (n for n in queries if big.get(n, -1) > 0),
            key=lambda n: -big[n],
        )[:TOP_SF1]
        sf1 = _run_suite(spark, {n: queries[n] for n in top}, SF1, rows_sf1)
    else:
        print(f"# no sf1 dir at {SF1}; run tools/make_sf1.py for the"
              " second-decade profile", file=sys.stderr)

    # sf10 spot profile (third decade, VERDICT r7 #1): the TOP_SF10
    # most expensive sf1 queries at 100x sf0.1
    sf10: dict[str, float] = {}
    rows_sf10: dict[str, int] = {}
    if sf1 and os.path.isdir(SF10):
        top10 = sorted(
            (n for n in sf1 if sf1.get(n, -1) > 0),
            key=lambda n: -sf1[n],
        )[:TOP_SF10]
        sf10 = _run_suite(spark, {n: queries[n] for n in top10}, SF10,
                          rows_sf10)
    elif sf1:
        print(f"# no sf10 dir at {SF10}; run tools/make_sf10.py for the"
              " third-decade profile", file=sys.stderr)
    spark.stop()

    # SPARK_GRAFT_MERGE=1 (subset runs only): patch this run's
    # measurements into the existing BENCH_SCALE.json instead of
    # overwriting it, so a targeted re-measure after a fix refreshes
    # just its own rows while the slope table regenerates from the
    # full merged data
    if os.environ.get("SPARK_GRAFT_MERGE") and subset:
        try:
            with open(os.path.join(REPO, "BENCH_SCALE.json")) as fh:
                prev = json.load(fh)
        except (OSError, ValueError):
            prev = {}
        small = {**prev.get("times_small", {}), **small}
        big = {**prev.get("times_big", {}), **big}
        sf1 = {**prev.get("times_sf1", {}), **sf1}
        sf10 = {**prev.get("times_sf10", {}), **sf10}
        rows_big = {**prev.get("rows_big", {}), **rows_big}
        rows_sf1 = {**prev.get("rows_sf1", {}), **rows_sf1}
        rows_sf10 = {**prev.get("rows_sf10", {}), **rows_sf10}
        queries = {n: None for n in small}

    _write_outputs(small, big, sf1, sf10,
                   rows_big, rows_sf1, rows_sf10, set(queries))


def _write_outputs(small, big, sf1, sf10,
                   rows_big, rows_sf1, rows_sf10, names) -> None:
    slopes = {
        n: round(big[n] / small[n], 3)
        for n in names
        if small.get(n, -1) > 0 and big.get(n, -1) > 0
    }
    slopes_sf1 = {
        n: round(sf1[n] / big[n], 3)
        for n in sf1
        if sf1.get(n, -1) > 0 and big.get(n, -1) > 0
    }
    slopes_sf10 = {
        n: round(sf10[n] / sf1[n], 3)
        for n in sf10
        if sf10.get(n, -1) > 0 and sf1.get(n, -1) > 0
    }
    out = {
        "sf_small": 0.01,
        "sf_big": 0.1,
        "times_small": small,
        "times_big": big,
        "times_sf1": sf1,
        "times_sf10": sf10,
        "rows_big": rows_big,
        "rows_sf1": rows_sf1,
        "rows_sf10": rows_sf10,
        "slopes": slopes,
        "slopes_sf1": slopes_sf1,
        "slopes_sf10": slopes_sf10,
    }
    path = os.path.join(REPO, "BENCH_SCALE.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"# wrote {path}: {len(slopes)} slopes", file=sys.stderr)

    worst = sorted(slopes.items(), key=lambda kv: -kv[1])[:TOP_N]
    lines = [
        MARK_LO,
        "",
        "Generated by `python tools/bench_scale.py` (full per-query data",
        "in `BENCH_SCALE.json`). Wall-seconds at sf0.01 vs sf0.1 — 10x",
        "the data; a slope near 1 is fixed-overhead-bound, near 10 is",
        "per-row-bound, above 10 needs a look. The 15 steepest:",
        "",
        "| query | sf0.01 s | sf0.1 s | slope (10x data) |",
        "|---|---|---|---|",
    ]
    for n, sl in worst:
        lines.append(f"| {n} | {small[n]} | {big[n]} | {sl} |")
    med = sorted(slopes.values())[len(slopes) // 2] if slopes else -1
    lines += [
        "",
        f"Median slope across all {len(slopes)} queries: **{med}**.",
    ]
    if slopes_sf1:
        med1 = sorted(slopes_sf1.values())[len(slopes_sf1) // 2]
        lines += [
            "",
            f"Second decade (sf0.1 -> sf1, the {len(slopes_sf1)} most",
            "expensive sf0.1 queries, data from `tools/make_sf1.py`) —",
            "this is the decade where per-query fixed cost stops",
            "dominating, so these slopes re-rank the outliers above.",
            "The `rows` columns are each query's OUTPUT cardinality at",
            "that sf: a slope tracking its own output-row growth is",
            "output-bound by measurement, not by claim:",
            "",
            "| query | sf0.1 s | sf1 s | slope (10x data) "
            "| rows sf0.1 | rows sf1 |",
            "|---|---|---|---|---|---|",
        ]
        for n, sl in sorted(slopes_sf1.items(), key=lambda kv: -kv[1]):
            lines.append(
                f"| {n} | {big[n]} | {sf1[n]} | {sl} "
                f"| {rows_big.get(n, '')} | {rows_sf1.get(n, '')} |"
            )
        lines += ["", f"Median second-decade slope: **{med1}**."]
    if slopes_sf10:
        med10 = sorted(slopes_sf10.values())[len(slopes_sf10) // 2]
        lines += [
            "",
            f"Third decade (sf1 -> sf10, the {len(slopes_sf10)} most",
            "expensive sf1 queries, data from `tools/make_sf10.py` —",
            "100x the driver's sf0.1):",
            "",
            "| query | sf1 s | sf10 s | slope (10x data) "
            "| rows sf1 | rows sf10 |",
            "|---|---|---|---|---|---|",
        ]
        for n, sl in sorted(slopes_sf10.items(), key=lambda kv: -kv[1]):
            lines.append(
                f"| {n} | {sf1[n]} | {sf10[n]} | {sl} "
                f"| {rows_sf1.get(n, '')} | {rows_sf10.get(n, '')} |"
            )
        lines += ["", f"Median third-decade slope: **{med10}**."]
    lines += ["", MARK_HI]
    scaling = os.path.join(REPO, "SCALING.md")
    text = open(scaling).read()
    if MARK_LO in text and MARK_HI in text:
        head, rest = text.split(MARK_LO, 1)
        _, tail = rest.split(MARK_HI, 1)
        text = head + "\n".join(lines) + tail
    else:
        text = text.rstrip() + "\n\n## Measured 10x scale slopes\n\n" + "\n".join(lines) + "\n"
    with open(scaling, "w") as fh:
        fh.write(text)
    print("# SCALING.md slope table regenerated", file=sys.stderr)
    print(json.dumps({"metric": "scale_slope_median", "value": med,
                      "n": len(slopes)}, separators=(",", ":")))


if __name__ == "__main__":
    main()
