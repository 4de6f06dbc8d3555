#!/usr/bin/env python
"""Round-13 scale probes for the new corpus vocabulary operators
(token_counts / vocab / pair_counts — tokenizer-training preprocessing).

Shape expectation: map-only explode + ONE map-side-combined groupBy
(+ TakeOrderedAndProject for vocab) — wall time should scale sublinearly
with corpus size and the plan must show no extra exchange. Same
interleaved 0.1/30x/100x single-session method as the other audits.
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

    from datafusion_spatial_spark.operators.corpus import (
        pair_counts,
        vocab,
    )
    from datafusion_spatial_spark.session import get_spark

    spark = get_spark(app_name="probe100_r13_vocab")

    def docs(d):
        return spark.read.parquet(os.path.join(d, "documents.parquet"))

    def q_vocab(d):
        return vocab(docs(d).select("text"), "text", size=1000)

    def q_pairs(d):
        return pair_counts(docs(d).select("text"), "text").agg(
            F.count("*").alias("n_pairs"),
            F.sum("count").alias("occurrences"),
        )

    queries = {"vocab_top1000": q_vocab, "pair_counts": q_pairs}
    outputs: dict = {q: {} for q in queries}
    for name, fn in queries.items():
        for side, d in SIDES:
            outputs[name][side] = [r.asDict() for r in fn(d).collect()][:3]
            print(f"warmup {name} {side}", flush=True)
    plans_dir = os.path.join(REPO, ".scale", "plans100_r13")
    os.makedirs(plans_dir, exist_ok=True)
    for name, fn in queries.items():
        with open(os.path.join(plans_dir, f"{name}.txt"), "w") as f:
            f.write(
                fn(SIDES[2][1])._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")
                )
            )

    samples = {q: {s: [] for s, _ in SIDES} for q in queries}
    for r in range(args.rounds):
        for name, fn in queries.items():
            for side, d in SIDES:
                t0 = time.perf_counter()
                fn(d).collect()
                dt = time.perf_counter() - t0
                samples[name][side].append(round(dt, 4))
                print(f"round {r} {name} {side}: {dt:.3f}s", flush=True)

    out: dict = {"rounds": args.rounds, "method": "interleaved"}
    for name in queries:
        med = {s: statistics.median(samples[name][s]) for s, _ in SIDES}
        out[name] = {
            "samples": samples[name],
            "medians": {k: round(v, 4) for k, v in med.items()},
            "segment_alpha_30_100": round(
                math.log(med["t100"] / med["t30"]) / math.log(100 / 30), 3
            ),
            "full_alpha_0p1_100": round(
                math.log(med["t100"] / med["t01"]) / math.log(100), 3
            ),
        }
        print(name, json.dumps(out[name]["medians"]),
              "seg", out[name]["segment_alpha_30_100"], flush=True)
    with open(os.path.join(REPO, ".scale", "probe100_r13_vocab.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    try:
        spark.stop()
    except Exception:
        pass


if __name__ == "__main__":
    main()
