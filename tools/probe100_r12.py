#!/usr/bin/env python
"""Round-12 100x scale probes (VERDICT r11 #7 + #3 close-out).

1. pack_sequences — the one remaining op with loop-shaped logic and no
   scale probe: a greedy sequential fold per shard via applyInPandas.
   The probe runs the REAL composition (shuffle_shards -> pack_sequences
   with shard_col) so the fold is distributed across shards exactly as
   the docstring prescribes for real corpora; shard count scales with
   the corpus so per-shard work stays bounded.
2. shuffle_shards alone — one rank window, pure Catalyst.
3. semantic_dedup re-probe after the r12 small-corpus band collapse:
   sf0.1 (2k rows) now takes the bands=1 path; 30x/100x (60k/200k) stay
   banded, so segment alpha(30->100) must stay < 1 and the sf0.1 cost
   should land near the single-band reference (~3.1s in the r11 audit).

Same interleaved 0.1/30x/100x single-session method as SCALE_AUDIT_r10/
r11. Writes .scale/probe100_r12.json + plans under .scale/plans100_r12/.
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
    ("t01", "/root/testdata/sf0.1", 8),
    ("t30", os.path.join(REPO, ".scale", "sf30"), 240),
    ("t100", os.path.join(REPO, ".scale", "sf100"), 800),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from datafusion_spatial_spark.operators.corpus import (
        pack_sequences,
        shuffle_shards,
    )
    from datafusion_spatial_spark.operators.simsearch import semantic_dedup
    from datafusion_spatial_spark.session import get_spark

    spark = get_spark(app_name="probe100_r12")

    def _docs(d):
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        return docs.select(
            "doc_id",
            F.size(F.split(F.col("text"), " ")).cast("long").alias("ntok"),
        )

    def q_shuffle(d, n_shards):
        out = shuffle_shards(_docs(d), "doc_id", n_shards)
        return out.agg(
            F.count("*").alias("n"),
            F.countDistinct("shard").alias("shards"),
            F.sum("shard_pos").alias("pos_sum"),
        )

    def q_pack(d, n_shards):
        sharded = shuffle_shards(_docs(d), "doc_id", n_shards)
        packed = pack_sequences(
            sharded, "doc_id", "ntok", budget=1024, shard_col="shard"
        )
        return packed.agg(
            F.count("*").alias("n"),
            F.max("seq_id").alias("max_seq"),
            F.sum("seq_offset").alias("off_sum"),
        )

    def q_semdedup(d, _n):
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        out = semantic_dedup(emb, "embedding", "vec_id", threshold=0.95,
                             dims=64)
        return out.agg(F.count("*").alias("n"))

    queries = {
        "shuffle_shards": q_shuffle,
        "pack_sequences": q_pack,
        "semantic_dedup_r12": q_semdedup,
    }
    plans_dir = os.path.join(REPO, ".scale", "plans100_r12")
    os.makedirs(plans_dir, exist_ok=True)

    rows: dict = {q: {} for q in queries}
    for name, fn in queries.items():
        for side, d, ns in SIDES:  # warmup + output capture
            rows[name][side] = [r.asDict() for r in fn(d, ns).collect()]
        with open(os.path.join(plans_dir, f"{name}.txt"), "w") as f:
            f.write(
                fn(SIDES[2][1], SIDES[2][2])._jdf.queryExecution()
                .explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")
                )
            )

    samples = {q: {s: [] for s, _, _ in SIDES} for q in queries}
    for r in range(args.rounds):
        for name, fn in queries.items():
            for side, d, ns in SIDES:
                t0 = time.perf_counter()
                fn(d, ns).collect()
                dt = time.perf_counter() - t0
                samples[name][side].append(round(dt, 4))
                print(f"round {r} {name} {side}: {dt:.3f}s", flush=True)

    out: dict = {"rounds": args.rounds, "method": "interleaved"}
    for name in queries:
        med = {s: statistics.median(samples[name][s]) for s, _, _ in SIDES}
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

    with open(os.path.join(REPO, ".scale", "probe100_r12.json"), "w") as f:
        json.dump(out, f, indent=1)
    try:
        spark.stop()
    except Exception:
        pass
    os._exit(0)


if __name__ == "__main__":
    main()
