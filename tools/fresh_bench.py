#!/usr/bin/env python
"""Uncontended per-query re-measure: every sample runs in a FRESH JVM
(new subprocess), with queries interleaved across rounds so slow host
drift hits all compared queries equally (the PERF.md r5/r8 protocol,
now a reusable tool instead of an ad-hoc script).

Usage:
  python tools/fresh_bench.py --queries q_st_envelope_by_nation,q_st_extent_customers \
      --rounds 5 [--sf-dir /root/testdata/sf0.1] [--json out.json]

Each child process: builds a session, runs the query once as warmup,
then 3 timed collects; it reports the median and min. The parent
interleaves (round 1: qA, qB, control; round 2: qA, qB, control; ...)
and prints per-query sample series, medians, and the ratio to the
frozen q01 control measured in the same slots.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONTROL = "q01_pricing_summary"          # CPU/scan-bound (frozen since r1)
CONTROL_SHUFFLE = "q05_region_revenue"   # shuffle-bound (frozen since r1)


def child_main(query: str, sf_dir: str) -> None:
    sys.path.insert(0, REPO)
    import bench as bench_mod
    from datafusion_spatial_spark.session import get_spark

    spark = get_spark(app_name=f"fresh_bench_{query}")
    fn = bench_mod.bench_queries()[query]
    fn(spark, sf_dir).collect()  # warmup
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        samples.append(time.perf_counter() - t0)
    spark.stop()
    print(json.dumps({
        "median": round(statistics.median(samples), 4),
        "min": round(min(samples), 4),
        "samples": [round(s, 4) for s in samples],
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--json", default=None)
    ap.add_argument("--no-control", action="store_true")
    ap.add_argument("--shuffle-control", action="store_true",
                    help="also interleave the shuffle-bound q05 control "
                    "(r10: q01 is CPU-bound and blind to shuffle/IO "
                    "weather — compare shuffle-heavy queries to this one)")
    args = ap.parse_args()

    queries = [q for q in args.queries.split(",") if q]
    if CONTROL not in queries and not args.no_control:
        queries.append(CONTROL)
    if args.shuffle_control and CONTROL_SHUFFLE not in queries:
        queries.append(CONTROL_SHUFFLE)

    series: dict[str, list[dict]] = {q: [] for q in queries}
    for rnd in range(args.rounds):
        for q in queries:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", q,
                 "--sf-dir", args.sf_dir],
                capture_output=True, text=True, cwd=REPO,
            )
            line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else ""
            try:
                rec = json.loads(line)
            except (json.JSONDecodeError, IndexError):
                print(f"round {rnd} {q}: CHILD FAILED\n{p.stderr[-2000:]}",
                      file=sys.stderr)
                continue
            series[q].append(rec)
            print(f"round {rnd} {q}: median {rec['median']}s "
                  f"min {rec['min']}s samples {rec['samples']}")

    out = {}
    ctrl_med = None
    if CONTROL in series and series[CONTROL]:
        ctrl_med = statistics.median(r["median"] for r in series[CONTROL])
    shuf_med = None
    if CONTROL_SHUFFLE in series and series[CONTROL_SHUFFLE]:
        shuf_med = statistics.median(
            r["median"] for r in series[CONTROL_SHUFFLE]
        )
    for q, recs in series.items():
        if not recs:
            out[q] = {"error": "all children failed"}
            continue
        med = statistics.median(r["median"] for r in recs)
        out[q] = {
            "median_of_medians": round(med, 4),
            "min_of_mins": round(min(r["min"] for r in recs), 4),
            "per_jvm_medians": [r["median"] for r in recs],
            "vs_control": round(med / ctrl_med, 3) if ctrl_med else None,
        }
        if shuf_med:
            out[q]["vs_shuffle_control"] = round(med / shuf_med, 3)
    result = {"sf_dir": args.sf_dir, "rounds": args.rounds,
              "control": CONTROL, "control_shuffle": CONTROL_SHUFFLE,
              "queries": out}
    print(json.dumps(result, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        ap = argparse.ArgumentParser()
        ap.add_argument("--child", dest="query")
        ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
        a = ap.parse_args()
        child_main(a.query, a.sf_dir)
    else:
        main()
