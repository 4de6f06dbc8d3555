#!/usr/bin/env python
"""100x probe for duplicate_spans (the r12 ExactSubstr-class op): the
window explosion is one row per token position, so wall time must stay
~linear in corpus size and the plan free of cartesian joins. Production
hash path (xxhash64, 8-byte shuffle keys). Same interleaved
0.1/30x/100x single-session method as the other round probes. Appends
its block to .scale/probe100_r12.json ('duplicate_spans' key) and the
plan to .scale/plans100_r12/.
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

    from pyspark.sql import functions as F

    from datafusion_spatial_spark.operators.dedup import duplicate_spans
    from datafusion_spatial_spark.session import get_spark

    spark = get_spark(app_name="probe_spans_r12")

    def q(d):
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        spans = duplicate_spans(
            docs.select("doc_id", "text"), "text", "doc_id",
            k=20, min_doc_count=2, hash_fn="xxhash64",
        )
        return spans.agg(
            F.count("*").alias("n_spans"),
            F.sum("n_windows").alias("n_windows"),
            F.countDistinct("doc_id").alias("docs"),
        )

    rows = {}
    for side, d in SIDES:  # warmup + output capture
        rows[side] = [r.asDict() for r in q(d).collect()]
    plans_dir = os.path.join(REPO, ".scale", "plans100_r12")
    os.makedirs(plans_dir, exist_ok=True)
    with open(os.path.join(plans_dir, "duplicate_spans.txt"), "w") as f:
        f.write(
            q(SIDES[2][1])._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")
            )
        )

    samples = {s: [] for s, _ in SIDES}
    for r in range(args.rounds):
        for side, d in SIDES:
            t0 = time.perf_counter()
            q(d).collect()
            dt = time.perf_counter() - t0
            samples[side].append(round(dt, 4))
            print(f"round {r} duplicate_spans {side}: {dt:.3f}s", flush=True)

    med = {s: statistics.median(samples[s]) for s, _ in SIDES}
    block = {
        "samples": samples,
        "medians": {k: round(v, 4) for k, v in med.items()},
        "output": rows,
        "segment_alpha_30_100": round(
            math.log(med["t100"] / med["t30"]) / math.log(100 / 30), 3
        ),
        "full_alpha_0p1_100": round(
            math.log(med["t100"] / med["t01"]) / math.log(100), 3
        ),
    }
    print("duplicate_spans", json.dumps(block["medians"]),
          "seg", block["segment_alpha_30_100"],
          "full", block["full_alpha_0p1_100"], flush=True)

    path = os.path.join(REPO, ".scale", "probe100_r12.json")
    data = json.load(open(path)) if os.path.exists(path) else {}
    data["duplicate_spans"] = block
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    try:
        spark.stop()
    except Exception:
        pass
    os._exit(0)


if __name__ == "__main__":
    main()
