#!/usr/bin/env python
"""Round-14 scale probes (VERDICT r13 #2, #4, #7).

1. ivf_production — the Spark ML k-means `ivf_index` + `write_ivf_partitioned`
   + `ivf_topk_from_storage` chain (only the deterministic pivot variant was
   probed before). Records build wall time, the max/median list-size balance
   ratio (skewed lists are the IVF scale-killer), and asserts the probe-side
   scan actually prunes partitions (inputFiles on the pruned read << full).
2. decontaminate — shingle-hash anti-join vs a benchmark corpus, both small
   (broadcast expected) and large/corpus-sized (AQE should pick a shuffle
   join), recording the executed join operator per scale so the plan flip is
   on the record.
3. bpe_round — per-merge-round cost of the r14 `bpe_train` loop (the
   distinct-word table build is amortized; each round is one groupBy + top-1).

Same interleaved t01(sf0.1)/t30/t100 single-session method, medians of
--rounds passes, as SCALE_AUDIT_r10-r13.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import shutil
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

    from datafusion_spatial_spark.operators.corpus import bpe_train
    from datafusion_spatial_spark.operators.dedup import decontaminate
    from datafusion_spatial_spark.operators.simsearch import (
        ivf_index,
        ivf_topk_from_storage,
        write_ivf_partitioned,
    )
    from datafusion_spatial_spark.session import get_spark

    spark = get_spark(app_name="probe100_r14")

    def docs(d):
        return spark.read.parquet(os.path.join(d, "documents.parquet"))

    def embs(d):
        return spark.read.parquet(os.path.join(d, "embeddings.parquet"))

    # fixed small benchmark corpus (does not scale with the side)
    bench_small = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("text")
        .limit(200)
        .cache()
    )
    bench_small.count()

    out: dict = {"rounds": args.rounds, "method": "interleaved t01/t30/t100"}

    # ---- 1. production IVF chain --------------------------------------
    ivf_stats: dict = {}
    ivf_dir = os.path.join(REPO, ".scale", "ivf_r14")
    for side, d in SIDES:
        samples = []
        for r in range(args.rounds):
            path = os.path.join(ivf_dir, side)
            t0 = time.perf_counter()
            assigned, centroids = ivf_index(
                embs(d), "embedding", "vec_id", n_lists=16, seed=7
            )
            write_ivf_partitioned(assigned, path, centroids)
            dt = time.perf_counter() - t0
            samples.append(round(dt, 4))
            print(f"ivf build {side} r{r}: {dt:.2f}s", flush=True)
        # list balance from the final layout
        sizes = [
            r["n"]
            for r in spark.read.parquet(path)
            .groupBy("list_id").agg(F.count("*").alias("n")).collect()
        ]
        sizes.sort()
        balance = sizes[-1] / statistics.median(sizes)
        # probe-side pruning: the nprobe=4 read must touch ~4/16 of files
        qrow = embs(d).filter(F.col("vec_id") == 0).collect()[0]
        query = [float(x) for x in qrow.embedding]
        pruned = ivf_topk_from_storage(
            spark, path, "embedding", "vec_id", query, k=10, nprobe=4
        )
        n_top = pruned.count()
        # partition pruning: read the EXECUTED scan's PartitionFilters +
        # numPartitions metric (DataFrame.inputFiles() ignores filters,
        # so it cannot see pruning — first probe attempt got this wrong)
        import re as _re

        pruned.collect()
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        pf = _re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        parts_read = None
        exec_plan = pruned._jdf.queryExecution().executedPlan()

        def walk(node):
            nonlocal parts_read
            if "Scan" in node.nodeName():
                it = node.metrics().iterator()
                while it.hasNext():
                    kv = it.next()
                    if kv._1() == "numPartitions":
                        parts_read = int(kv._2().value())
            ch = node.children()
            for i in range(ch.size()):
                walk(ch.apply(i))

        walk(exec_plan)
        ivf_stats[side] = {
            "build_samples_sec": samples,
            "build_median_sec": round(statistics.median(samples), 4),
            "n_lists": 16,
            "list_sizes_min_med_max": [
                sizes[0], statistics.median(sizes), sizes[-1]
            ],
            "max_over_median_balance": round(balance, 3),
            "partition_filters": pf.group(1) if pf else None,
            "partitions_read_of_16": parts_read,
            "partition_pruning_engaged": (
                pf is not None and parts_read is not None
                and parts_read < 16
            ),
            "topk_rows": n_top,
        }
        print(side, json.dumps(ivf_stats[side]), flush=True)
    med = {s: ivf_stats[s]["build_median_sec"] for s, _ in SIDES}
    out["ivf_production"] = {
        **ivf_stats,
        "segment_alpha_30_100": round(
            math.log(med["t100"] / med["t30"]) / math.log(100 / 30), 3
        ),
        "full_alpha_0p1_100": round(
            math.log(med["t100"] / med["t01"]) / math.log(100), 3
        ),
    }
    shutil.rmtree(ivf_dir, ignore_errors=True)

    # ---- 2. decontaminate: small-bench (broadcast) vs corpus-sized ----
    def decon_small(d):
        return decontaminate(
            docs(d).select("doc_id", "text"), "text", "doc_id",
            bench_small, "text",
        ).agg(F.count("*").alias("survivors"))

    def decon_large(d):
        # benchmark side scales with the corpus: every 7th document
        bench = docs(d).select("text").filter(F.col("doc_id") % 7 == 0)
        return decontaminate(
            docs(d).select("doc_id", "text"), "text", "doc_id",
            bench, "text", broadcast_bench=False,
        ).agg(F.count("*").alias("survivors"))

    decon_queries = {"decontam_small": decon_small,
                     "decontam_large": decon_large}
    dsamples = {q: {s: [] for s, _ in SIDES} for q in decon_queries}
    doutputs: dict = {q: {} for q in decon_queries}
    dplans: dict = {q: {} for q in decon_queries}
    for name, fn in decon_queries.items():
        for side, d in SIDES:
            df = fn(d)
            doutputs[name][side] = df.collect()[0]["survivors"]  # warmup
            plan = df._jdf.queryExecution().executedPlan().toString()
            dplans[name][side] = {
                k: plan.count(k)
                for k in ("BroadcastHashJoin", "SortMergeJoin",
                          "ShuffledHashJoin")
            }
            print(f"warmup {name} {side}", flush=True)
    for r in range(args.rounds):
        for name, fn in decon_queries.items():
            for side, d in SIDES:
                t0 = time.perf_counter()
                fn(d).collect()
                dt = time.perf_counter() - t0
                dsamples[name][side].append(round(dt, 4))
                print(f"round {r} {name} {side}: {dt:.3f}s", flush=True)
    for name in decon_queries:
        med = {s: statistics.median(dsamples[name][s]) for s, _ in SIDES}
        out[name] = {
            "samples": dsamples[name],
            "medians": {k: round(v, 4) for k, v in med.items()},
            "survivors": doutputs[name],
            "executed_joins": dplans[name],
            "segment_alpha_30_100": round(
                math.log(med["t100"] / med["t30"]) / math.log(100 / 30), 3
            ),
            "full_alpha_0p1_100": round(
                math.log(med["t100"] / med["t01"]) / math.log(100), 3
            ),
        }
        print(name, json.dumps(out[name]["medians"]), flush=True)

    # ---- 3. BPE per-round cost ----------------------------------------
    N_MERGES = 5
    bsamples = {s: [] for s, _ in SIDES}
    bmerges: dict = {}
    for side, d in SIDES:  # warmup
        m, _ = bpe_train(docs(d).select("text"), "text", n_merges=1)
        bmerges[side] = m
        print(f"warmup bpe {side}", flush=True)
    for r in range(args.rounds):
        for side, d in SIDES:
            t0 = time.perf_counter()
            m, _ = bpe_train(docs(d).select("text"), "text",
                             n_merges=N_MERGES)
            dt = time.perf_counter() - t0
            bsamples[side].append(round(dt, 4))
            bmerges[side] = m
            print(f"round {r} bpe {side}: {dt:.3f}s", flush=True)
    med = {s: statistics.median(bsamples[s]) for s, _ in SIDES}
    out["bpe_train_5_merges"] = {
        "samples": bsamples,
        "medians": {k: round(v, 4) for k, v in med.items()},
        "per_round_sec": {
            k: round(v / N_MERGES, 4) for k, v in med.items()
        },
        "first_merges": {
            s: [[a, b] for a, b, _ in bmerges[s][:3]] for s in bmerges
        },
        "segment_alpha_30_100": round(
            math.log(med["t100"] / med["t30"]) / math.log(100 / 30), 3
        ),
        "full_alpha_0p1_100": round(
            math.log(med["t100"] / med["t01"]) / math.log(100), 3
        ),
    }
    print("bpe", json.dumps(out["bpe_train_5_merges"]["medians"]), flush=True)

    with open(os.path.join(REPO, ".scale", "probe100_r14.json"), "w") as f:
        json.dump(out, f, indent=1)
    try:
        spark.stop()
    except Exception:
        pass


if __name__ == "__main__":
    main()
