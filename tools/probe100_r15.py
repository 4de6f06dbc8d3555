#!/usr/bin/env python
"""Round-15 scale probes (VERDICT r14 #1, #2, #4, #5, #7).

1. ivf_sample_train — A/B the r15 sample-trained coarse quantizer
   (train_sample_size=16384, engaged at t30/t100) against the full-corpus
   fit: build medians + alpha + list balance per arm, and recall@10 vs
   exact cosine for both arms so the sampling cost shows up in recall, not
   just wall time. Includes the #7 recall-vs-nprobe sweep (nprobe 2/4/6)
   at every scale on the .scale embeddings (clustered by construction:
   each base vector has ~N jittered copies, plus the generator's label
   clusters).
2. bpe_apply — encode throughput over the FULL corpus with a realistically
   sized merge table (300 merges trained once on sf0.01): rows/s,
   tokens/s, alpha, executed-plan map-only check (no Exchange), and the
   word-repetition ratio as the per-batch word-cache hit-rate proxy.
3. cc_dedup_corpus — A/B forest_reduce_passes 0 vs 2 for the OTHER big CC
   consumer (the minhash near-dup graph that dedup_corpus feeds), on a
   materialized pair list at t30/t100; flips the dedup_corpus default if
   the forest wins (r14 flipped semantic_dedup only).
4. streaming_state — the rate source driven at 1x/30x/100x rows/s through
   the canonical watermarked windowed aggregation with engineered late
   rows: state-rows plateau (watermark bounds state), eviction
   (numRowsRemoved > 0), late-row drops (numRowsDroppedByWatermark > 0),
   and keep-up (processing rate >= input rate) recorded straight from the
   progress listener.

Same interleaved t01(sf0.1)/t30/t100 single-session method, medians of
--rounds passes, as SCALE_AUDIT_r10-r14. Writes SCALE_AUDIT_r15.json.
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


def _alpha(med: dict, lo: str, hi: str, ratio: float) -> float:
    return round(math.log(med[hi] / med[lo]) / math.log(ratio), 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--cc-rounds", type=int, default=2)
    ap.add_argument("--skip", default="", help="comma list of probe names")
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(",")))

    from pyspark.sql import functions as F

    from datafusion_spatial_spark.operators.corpus import bpe_apply, bpe_train
    from datafusion_spatial_spark.operators.dedup import (
        connected_components,
        minhash_lsh_dedup_pairs,
    )
    from datafusion_spatial_spark.operators.simsearch import (
        cosine_topk,
        ivf_index,
        ivf_topk,
    )
    from datafusion_spatial_spark.session import get_spark

    spark = get_spark(app_name="probe100_r15")

    def docs(d):
        return spark.read.parquet(os.path.join(d, "documents.parquet"))

    def embs(d):
        return spark.read.parquet(os.path.join(d, "embeddings.parquet"))

    out: dict = {"round": 15, "rounds": args.rounds,
                 "method": "interleaved t01/t30/t100"}

    # ---- 1 + 5. IVF sample-train A/B + recall sweep --------------------
    if "ivf" not in skip:
        SAMPLE = 16_384  # < 60k so sampling engages at t30 and t100
        arms = {"full": None, "sample": SAMPLE}
        stats: dict = {a: {} for a in arms}
        for side, d in SIDES:
            e = embs(d)
            n = e.count()
            qrows = e.filter(F.col("vec_id").isin([0, 7, 13, 21, 34])).collect()
            queries = [[float(x) for x in r.embedding] for r in qrows]
            exact = {}
            for qi, q in enumerate(queries):
                exact[qi] = [
                    r.vec_id
                    for r in cosine_topk(e, "embedding", "vec_id", q, k=10).collect()
                ]
            for arm, tss in arms.items():
                samples = []
                for r in range(args.rounds):
                    t0 = time.perf_counter()
                    assigned, cents = ivf_index(
                        e, "embedding", "vec_id", n_lists=16, seed=7,
                        train_sample_size=tss,
                    )
                    assigned.localCheckpoint(eager=True).count()
                    dt = time.perf_counter() - t0
                    samples.append(round(dt, 4))
                    print(f"ivf {arm} {side} r{r}: {dt:.2f}s", flush=True)
                assigned, cents = ivf_index(
                    e, "embedding", "vec_id", n_lists=16, seed=7,
                    train_sample_size=tss,
                )
                assigned = assigned.localCheckpoint(eager=True)
                sizes = sorted(
                    r["n"]
                    for r in assigned.groupBy("list_id")
                    .agg(F.count("*").alias("n")).collect()
                )
                recalls = {}
                for nprobe in (2, 4, 6):
                    hits = 0
                    for qi, q in enumerate(queries):
                        approx = [
                            r.vec_id
                            for r in ivf_topk(
                                assigned, cents, "embedding", "vec_id",
                                q, k=10, nprobe=nprobe,
                            ).collect()
                        ]
                        hits += len(set(approx) & set(exact[qi]))
                    recalls[f"nprobe{nprobe}"] = round(
                        hits / (10 * len(queries)), 3
                    )
                stats[arm][side] = {
                    "rows": n,
                    "sampling_engaged": tss is not None and n > tss,
                    "build_samples_sec": samples,
                    "build_median_sec": round(statistics.median(samples), 4),
                    "list_sizes_min_med_max": [
                        sizes[0], statistics.median(sizes), sizes[-1]
                    ],
                    "max_over_median_balance": round(
                        sizes[-1] / statistics.median(sizes), 3
                    ),
                    "recall_at_10": recalls,
                }
                print(side, arm, json.dumps(stats[arm][side]), flush=True)
        entry: dict = {
            "what": (
                "r15 sample-trained ivf_index (train_sample_size=16384, "
                "VERDICT r14 #1) vs the full-corpus fit; recall@10 vs "
                "exact cosine at nprobe 2/4/6 per arm (VERDICT r14 #7); "
                ".scale embeddings are clustered by construction "
                "(jittered copies of 2000 base vectors + label clusters)"
            ),
        }
        for arm in arms:
            med = {s: stats[arm][s]["build_median_sec"] for s, _ in SIDES}
            entry[arm] = {
                **stats[arm],
                "build_medians_sec": {k: round(v, 4) for k, v in med.items()},
                "segment_alpha_30_100": _alpha(med, "t30", "t100", 100 / 30),
                "full_alpha_0p1_100": _alpha(med, "t01", "t100", 100),
            }
        entry["t100_speedup_sample_over_full"] = round(
            stats["full"]["t100"]["build_median_sec"]
            / stats["sample"]["t100"]["build_median_sec"], 2
        )
        out["ivf_sample_train_r15"] = entry

    # ---- 2. bpe_apply encode throughput --------------------------------
    if "bpe" not in skip:
        merges, _ = bpe_train(
            spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
            .select("text"),
            "text", n_merges=300,
        )
        print(f"trained merge table: {len(merges)} merges", flush=True)
        bstats: dict = {}
        bsamples = {s: [] for s, _ in SIDES}
        brows: dict = {}
        btoks: dict = {}
        bplan: dict = {}
        bcache: dict = {}
        for side, d in SIDES:  # warmup + plan + cache proxy
            df = bpe_apply(docs(d).select("text"), "text", merges)
            agg = df.agg(
                F.count("*").alias("rows"),
                F.sum(F.size("bpe_tokens")).alias("toks"),
            )
            row = agg.collect()[0]
            brows[side], btoks[side] = row["rows"], row["toks"]
            plan = agg._jdf.queryExecution().executedPlan().toString()
            # the encode stage itself must be map-only; the count/sum agg
            # adds exactly the one final single-partition exchange
            bplan[side] = {"exchanges": plan.count("Exchange")}
            w = (
                docs(d)
                .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
                .filter(F.length("w") > 0)
            )
            tot, dis = w.agg(
                F.count("*"), F.approx_count_distinct("w")
            ).collect()[0]
            bcache[side] = {
                "total_words": int(tot),
                "approx_distinct_words": int(dis),
                "repetition_ratio": round(1 - dis / tot, 4),
            }
            print(f"warmup bpe_apply {side}", flush=True)
        for r in range(args.rounds):
            for side, d in SIDES:
                df = bpe_apply(docs(d).select("text"), "text", merges)
                t0 = time.perf_counter()
                df.agg(
                    F.count("*"), F.sum(F.size("bpe_tokens"))
                ).collect()
                dt = time.perf_counter() - t0
                bsamples[side].append(round(dt, 4))
                print(f"round {r} bpe_apply {side}: {dt:.3f}s", flush=True)
        med = {s: statistics.median(bsamples[s]) for s, _ in SIDES}
        out["bpe_apply_r15"] = {
            "what": (
                "bpe_apply encode over the full corpus, 300-merge table "
                "(VERDICT r14 #2); the stage that runs at 100 TB in "
                "production (training was probed in r14)"
            ),
            "n_merges": len(merges),
            "samples_sec": bsamples,
            "medians_sec": {k: round(v, 4) for k, v in med.items()},
            "rows": brows,
            "tokens_out": {k: int(v) for k, v in btoks.items()},
            "rows_per_sec": {
                s: int(brows[s] / med[s]) for s, _ in SIDES
            },
            "tokens_per_sec": {
                s: int(btoks[s] / med[s]) for s, _ in SIDES
            },
            "executed_exchanges": bplan,
            "word_cache_proxy": bcache,
            "segment_alpha_30_100": _alpha(med, "t30", "t100", 100 / 30),
            "full_alpha_0p1_100": _alpha(med, "t01", "t100", 100),
        }
        print("bpe_apply", json.dumps(out["bpe_apply_r15"]["medians_sec"]),
              flush=True)

    # ---- 3. dedup_corpus CC forest A/B ---------------------------------
    if "cc" not in skip:
        cstats: dict = {}
        for side, d in [s for s in SIDES if s[0] != "t01"]:
            pairs = minhash_lsh_dedup_pairs(
                docs(d).select("doc_id", "text"), "text", "doc_id",
            ).localCheckpoint(eager=True)
            n_pairs = pairs.count()
            arms: dict = {}
            for passes in (0, 2):
                samples = []
                comps = None
                for r in range(args.cc_rounds):
                    t0 = time.perf_counter()
                    labels = connected_components(
                        pairs, forest_reduce_passes=passes
                    )
                    comps = labels.select("component").distinct().count()
                    dt = time.perf_counter() - t0
                    samples.append(round(dt, 4))
                    print(
                        f"cc {side} passes={passes} r{r}: {dt:.2f}s "
                        f"({comps} components)", flush=True,
                    )
                arms[f"passes{passes}"] = {
                    "samples_sec": samples,
                    "median_sec": round(statistics.median(samples), 4),
                    "components": comps,
                }
            cstats[side] = {"n_pairs": n_pairs, **arms}
        t100 = cstats.get("t100", {})
        win = (
            t100.get("passes2", {}).get("median_sec", 1)
            < t100.get("passes0", {}).get("median_sec", 0)
        )
        out["cc_dedup_corpus_forest_r15"] = {
            "what": (
                "A/B forest_reduce_passes 0 vs 2 on the minhash near-dup "
                "pair graph dedup_corpus feeds to connected_components "
                "(VERDICT r14 #5; r14 flipped semantic_dedup only)"
            ),
            **cstats,
            "forest_wins_at_t100": win,
        }

    # ---- 4. streaming state at 1x/30x/100x -----------------------------
    if "stream" not in skip:
        from pyspark.sql import types as T

        sstats: dict = {}
        for name, rate in (("t01", 1_000), ("t30", 30_000), ("t100", 100_000)):
            src = (
                spark.readStream.format("rate")
                .option("rowsPerSecond", rate)
                .option("numPartitions", 8)
                .load()
                # event time: mostly on-time, ~3% very late (90-120 s) so
                # the watermark provably drops rows; key space bounded
                .select(
                    F.when(
                        F.col("value") % 33 == 0,
                        F.col("timestamp") - F.expr(
                            "make_interval(0,0,0,0,0,0, 90 + value % 30)"
                        ),
                    )
                    .otherwise(
                        F.col("timestamp") - F.expr(
                            "make_interval(0,0,0,0,0,0, value % 10)"
                        )
                    )
                    .alias("ts"),
                    (F.col("value") % 20).alias("key"),
                    F.lit(1.0).alias("v"),
                )
            )
            agg = (
                src.withWatermark("ts", "30 seconds")
                .groupBy(F.window("ts", "10 seconds").alias("win"), "key")
                .agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
            )
            q = (
                agg.writeStream.format("memory")
                .queryName(f"probe_state_{name}")
                .outputMode("append")
                .trigger(processingTime="5 seconds")
                .start()
            )
            time.sleep(75)  # past watermark horizon: state must plateau
            prog = [
                json.loads(p.json if isinstance(p.json, str) else p.json())
                for p in q.recentProgress
            ]
            q.stop()
            datab = [p for p in prog if p.get("numInputRows", 0) > 0]
            st = [
                p["stateOperators"][0]
                for p in datab
                if p.get("stateOperators")
            ]
            rows_total = [s["numRowsTotal"] for s in st]
            tail = rows_total[-3:]
            sstats[name] = {
                "rows_per_sec_target": rate,
                "batches": len(datab),
                "input_rows": sum(p["numInputRows"] for p in datab),
                "state_rows_series": rows_total,
                "state_rows_final": rows_total[-1] if rows_total else None,
                # plateau: last three batches within 30% of each other
                "state_plateaued": (
                    len(tail) == 3
                    and max(tail) <= 1.3 * max(1, min(tail))
                ),
                "rows_evicted_total": sum(
                    s.get("numRowsRemoved", 0) for s in st
                ),
                "late_rows_dropped": sum(
                    s.get("numRowsDroppedByWatermark", 0) for s in st
                ),
                "keep_up": all(
                    p["durationMs"].get("triggerExecution", 0) < 5_000
                    for p in datab[2:]
                ),
                "out_rows": spark.table(f"probe_state_{name}").count(),
            }
            print(name, json.dumps(sstats[name]), flush=True)
        out["streaming_state_r15"] = {
            "what": (
                "rate source at 1k/30k/100k rows/s through the canonical "
                "watermarked windowed aggregation with ~3% engineered "
                "late rows (VERDICT r14 #4): state must plateau at the "
                "watermark horizon, evict closed windows, drop late rows, "
                "and keep up with the input rate"
            ),
            **sstats,
        }

    path = os.path.join(REPO, "SCALE_AUDIT_r15.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
