#!/usr/bin/env python
"""Round-11 follow-on factor-100 probe: the ITERATIVE op — corpus
connected-components dedup (q_dedup_corpus) — the one pipeline op class
never probed past bench scale. Iterative CC is the classic scale cliff
(rounds grow with component diameter; lineage with them). The scaling
model replicates components without linking copies, so component
diameter — and hence the CC round count — stays flat by construction
while data grows 100x; the probe checks the consequences: output rows
exactly linear and wall time sublinear.

Same load-robust interleaved method as tools/probe100_r11.py: each round
times sf0.1, 30x and 100x back-to-back in ONE session, medians over
--rounds. Writes .scale/probe100_cc_r11.json + the 100x plan.
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

SIDES = [
    ("t01", "/root/testdata/sf0.1"),
    ("t30", os.path.join(REPO, ".scale", "sf30")),
    ("t100", os.path.join(REPO, ".scale", "sf100")),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from datafusion_spatial_spark.session import get_spark

    spark = get_spark(app_name="probe100_cc_r11")
    fn = entry_mod.queries()["q_dedup_corpus"]

    plans_dir = os.path.join(REPO, ".scale", "plans100_r11")
    os.makedirs(plans_dir, exist_ok=True)

    rows: dict = {}
    for side, d in SIDES:  # warmup + row counts
        rows[side] = fn(spark, d).count()
    with open(os.path.join(plans_dir, "q_dedup_corpus.txt"), "w") as f:
        f.write(
            fn(spark, SIDES[2][1])._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")
            )
        )

    samples = {s: [] for s, _ in SIDES}
    for r in range(args.rounds):
        for side, d in SIDES:
            t0 = time.perf_counter()
            fn(spark, d).collect()
            dt = time.perf_counter() - t0
            samples[side].append(round(dt, 4))
            print(f"round {r} {side}: {dt:.3f}s", flush=True)

    med = {s: statistics.median(samples[s]) for s, _ in SIDES}
    out = {
        "query": "q_dedup_corpus",
        "rounds": args.rounds,
        "method": "interleaved",
        "samples": samples,
        "medians": {k: round(v, 4) for k, v in med.items()},
        "rows": rows,
        "segment_alpha_30_100": round(
            math.log(med["t100"] / med["t30"]) / math.log(100 / 30), 3
        ),
        "full_alpha_0p1_100": round(
            math.log(med["t100"] / med["t01"]) / math.log(100), 3
        ),
        "within_2x_gate": med["t100"] <= 2 * 100 * med["t01"],
    }
    print(json.dumps({k: out[k] for k in
                      ("medians", "rows", "segment_alpha_30_100",
                       "full_alpha_0p1_100")}), flush=True)
    with open(os.path.join(REPO, ".scale", "probe100_cc_r11.json"), "w") as f:
        json.dump(out, f, indent=1)
    try:
        spark.stop()
    except Exception:
        pass
    os._exit(0)


if __name__ == "__main__":
    main()
