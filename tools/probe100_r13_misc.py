#!/usr/bin/env python
"""Round-13 completeness probes: the remaining pipeline-op classes with
no recorded 100x scale probe — exact dedup (canonical survivor),
SimHash fingerprints, and line_dedup boilerplate removal. All three are
single-equi-shuffle (or map-only) by construction; the probe records
that the wall-time exponent actually stays sublinear.

Same interleaved 0.1/30x/100x single-session method as the other
audits; documents tables in .scale/sf{30,100}.
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

    from datafusion_spatial_spark.operators.dedup import (
        dedup_exact_canonical,
        line_dedup,
        simhash,
    )
    from datafusion_spatial_spark.session import get_spark

    spark = get_spark(app_name="probe100_r13_misc")

    def docs(d):
        return spark.read.parquet(os.path.join(d, "documents.parquet"))

    def q_exact(d):
        return dedup_exact_canonical(
            docs(d).select("doc_id", "text"), "text", "doc_id"
        ).agg(F.count("*").alias("n"))

    def q_simhash(d):
        return simhash(docs(d).select("doc_id", "text"),
                       "text", "doc_id").agg(
            F.count("*").alias("n"),
            F.countDistinct("simhash").alias("nsig"),
        )

    def q_linededup(d):
        return line_dedup(
            docs(d).select("doc_id", "text"), "text", "doc_id",
            max_doc_freq=1, min_line_chars=5,
        ).agg(
            F.count("*").alias("n"),
            F.sum("n_dropped").alias("dropped"),
        )

    queries = {
        "dedup_exact_canonical": q_exact,
        "simhash": q_simhash,
        "line_dedup": q_linededup,
    }
    outputs: dict = {q: {} for q in queries}
    for name, fn in queries.items():
        for side, d in SIDES:
            outputs[name][side] = [r.asDict() for r in fn(d).collect()]
            print(f"warmup {name} {side}: {outputs[name][side]}", flush=True)

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
            "outputs": outputs[name],
            "segment_alpha_30_100": round(
                math.log(med["t100"] / med["t30"]) / math.log(100 / 30), 3
            ),
        }
        print(name, json.dumps(out[name]["medians"]),
              "seg", out[name]["segment_alpha_30_100"], flush=True)
    with open(os.path.join(REPO, ".scale", "probe100_r13_misc.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    try:
        spark.stop()
    except Exception:
        pass


if __name__ == "__main__":
    main()
