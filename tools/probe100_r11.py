#!/usr/bin/env python
"""Round-11 factor-100 probe (VERDICT r10 "Next round" #2): the two
shuffle-heaviest pipeline ops — MinHash-LSH near-dedup and IVF/PQ ANN —
measured with the load-robust interleaved segment method from
SCALE_AUDIT_r10: every round times sf0.1, 30x and 100x back-to-back in
ONE session so box weather hits all sides equally. Records medians,
segment exponent alpha(30->100) = log(t100/t30)/log(100/30), full-range
alpha(0.1->100x) = log(t100/t01)/log(100), output rows per side, and the
100x physical plans (.scale/plans100_r11/).

Usage: python tools/probe100_r11.py [--rounds 3]
Writes .scale/probe100_r11.json.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
SF30 = os.path.join(REPO, ".scale", "sf30")
SF100 = os.path.join(REPO, ".scale", "sf100")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import bench as bench_mod
    import __spark_entry__ as entry_mod
    from datafusion_spatial_spark.session import get_spark

    spark = get_spark(app_name="probe100_r11")
    queries = {
        "q_minhash_lsh_dedup": dict(bench_mod.bench_queries())[
            "q_minhash_lsh_dedup"
        ],
        "q_ivf_ann_topk": entry_mod.queries()["q_ivf_ann_topk"],
    }
    sides = [("t01", SF01), ("t30", SF30), ("t100", SF100)]

    plans_dir = os.path.join(REPO, ".scale", "plans100_r11")
    os.makedirs(plans_dir, exist_ok=True)

    out: dict = {"rounds": args.rounds, "method": "interleaved"}
    samples: dict = {q: {s: [] for s, _ in sides} for q in queries}
    rows: dict = {q: {} for q in queries}

    # warmup every (query, side) once — JIT, shuffle files, file listing
    for name, fn in queries.items():
        for side, d in sides:
            rows[name][side] = fn(spark, d).count()
        with open(os.path.join(plans_dir, f"{name}.txt"), "w") as f:
            f.write(
                fn(spark, SF100)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")
                )
            )

    for r in range(args.rounds):
        for name, fn in queries.items():
            for side, d in sides:
                t0 = time.perf_counter()
                fn(spark, d).collect()
                dt = time.perf_counter() - t0
                samples[name][side].append(round(dt, 4))
                print(f"round {r} {name} {side}: {dt:.3f}s", flush=True)

    for name in queries:
        med = {s: statistics.median(samples[name][s]) for s, _ in sides}
        rec = {
            "samples": samples[name],
            "medians": {k: round(v, 4) for k, v in med.items()},
            "rows": rows[name],
            "segment_alpha_30_100": round(
                math.log(med["t100"] / med["t30"]) / math.log(100 / 30), 3
            ),
            "full_alpha_0p1_100": round(
                math.log(med["t100"] / med["t01"]) / math.log(100), 3
            ),
            "within_2x_gate": med["t100"] <= 2 * 100 * med["t01"],
        }
        out[name] = rec
        print(name, json.dumps(rec["medians"]), "seg_alpha",
              rec["segment_alpha_30_100"], "full_alpha",
              rec["full_alpha_0p1_100"], flush=True)

    with open(os.path.join(REPO, ".scale", "probe100_r11.json"), "w") as f:
        json.dump(out, f, indent=1)
    try:
        spark.stop()
    except Exception:
        pass
    os._exit(0)


if __name__ == "__main__":
    main()
