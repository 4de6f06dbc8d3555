#!/usr/bin/env python
"""Round-11 session-2 follow-on: 100x probes for the TWO ops introduced
this session — chunk_documents (map-only; the probe pins that the plan
stays Exchange-free and wall time stays ~linear-in-data / sublinear per
the parallelism headroom) and semantic_dedup (LSH bucket join + CC +
survivor anti-join; the probe pins the bucket shuffle does not go
superlinear). Same interleaved 0.1/30x/100x method as the other r11
probes. Writes .scale/probe100_newops_r11.json.
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

    from datafusion_spatial_spark.operators.corpus import chunk_documents
    from datafusion_spatial_spark.operators.simsearch import semantic_dedup
    from datafusion_spatial_spark.session import get_spark

    spark = get_spark(app_name="probe100_newops_r11")

    def q_chunk(d):
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        out = chunk_documents(
            docs.select("doc_id", "text"), "text", "doc_id", 64, 16
        )
        return out.agg(
            F.count("*").alias("n"), F.sum(F.length("chunk")).alias("s")
        )

    def q_semdedup(d):
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        out = semantic_dedup(emb, "embedding", "vec_id", threshold=0.95,
                             dims=64)
        return out.agg(F.count("*").alias("n"))

    queries = {"chunk_documents": q_chunk, "semantic_dedup": q_semdedup}
    plans_dir = os.path.join(REPO, ".scale", "plans100_r11")
    os.makedirs(plans_dir, exist_ok=True)

    rows: dict = {q: {} for q in queries}
    for name, fn in queries.items():
        for side, d in SIDES:  # warmup + output capture
            rows[name][side] = [r.asDict() for r in fn(d).collect()]
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
            "output": rows[name],
            "segment_alpha_30_100": round(
                math.log(med["t100"] / med["t30"]) / math.log(100 / 30), 3
            ),
            "full_alpha_0p1_100": round(
                math.log(med["t100"] / med["t01"]) / math.log(100), 3
            ),
        }
        print(name, json.dumps(out[name]["medians"]),
              "seg", out[name]["segment_alpha_30_100"],
              "full", out[name]["full_alpha_0p1_100"], flush=True)

    with open(os.path.join(REPO, ".scale", "probe100_newops_r11.json"), "w") as f:
        json.dump(out, f, indent=1)
    try:
        spark.stop()
    except Exception:
        pass
    os._exit(0)


if __name__ == "__main__":
    main()
