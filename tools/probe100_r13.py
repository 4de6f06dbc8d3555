#!/usr/bin/env python
"""Round-13 semantic_dedup re-probe (VERDICT r12 #5 close-out).

r12's banded path ran one bucket+join JOB per band and verified each
candidate pair once per band it surfaced in (200k-row median 161.7s —
sublinear at alpha 0.914 but ~13x comparable ops). r13 collapses the
bands into ONE self-join on the composite (band, bucket) key with
pre-verify pair dedup (operators/simsearch._near_dup_pairs_banded).

Same interleaved 0.1/30x/100x single-session method as SCALE_AUDIT_r10-
r12; sf0.1 still collapses to bands=1 (unchanged small-corpus path), so
the interesting medians are t30/t100. Survivors must stay exactly 2000
at every scale (the jittered corpus construction guarantees the true
answer). Writes .scale/probe100_r13.json + the t100 plan.
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

    from datafusion_spatial_spark.operators.simsearch import semantic_dedup
    from datafusion_spatial_spark.session import get_spark

    spark = get_spark(app_name="probe100_r13")

    def q(d):
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        out = semantic_dedup(emb, "embedding", "vec_id", threshold=0.95,
                             dims=64)
        return out.agg(F.count("*").alias("n"))

    survivors = {}
    for side, d in SIDES:  # warmup + survivor capture
        survivors[side] = q(d).collect()[0]["n"]
        print(f"warmup {side}: survivors {survivors[side]}", flush=True)
    plans_dir = os.path.join(REPO, ".scale", "plans100_r13")
    os.makedirs(plans_dir, exist_ok=True)
    with open(os.path.join(plans_dir, "semantic_dedup.txt"), "w") as f:
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
            print(f"round {r} {side}: {dt:.3f}s", flush=True)

    med = {s: statistics.median(samples[s]) for s, _ in SIDES}
    out = {
        "rounds": args.rounds,
        "method": "interleaved",
        "samples": samples,
        "medians": {k: round(v, 4) for k, v in med.items()},
        "survivors": survivors,
        "segment_alpha_30_100": round(
            math.log(med["t100"] / med["t30"]) / math.log(100 / 30), 3
        ),
        "full_alpha_0p1_100": round(
            math.log(med["t100"] / med["t01"]) / math.log(100), 3
        ),
        "r12_reference_medians": {"t01": 9.0, "t30": 59.961,
                                  "t100": 167.985},
    }
    print(json.dumps(out["medians"]), "seg", out["segment_alpha_30_100"],
          "full", out["full_alpha_0p1_100"], flush=True)
    with open(os.path.join(REPO, ".scale", "probe100_r13.json"), "w") as f:
        json.dump(out, f, indent=1)
    try:
        spark.stop()
    except Exception:
        pass


if __name__ == "__main__":
    main()
