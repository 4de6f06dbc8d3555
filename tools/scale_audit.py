#!/usr/bin/env python
"""Scale audit (VERDICT r6 "Next round" #1): run the headline bench queries
plus the shuffle-heavy extension ops at sf0.1 AND the 10x-scaled sf1
directory (tools/scale_data.py), record per-query scaling exponents
alpha = log(T_10x / T_1x) / log(10), and dump each query's sf1 physical
plan for regression audit (AQE broadcast->SMJ switches, skew splits, LSH
band fan-out).

alpha ~ 1.0 is linear scaling; the VERDICT gate is T_10x <= 2x the
linearly-scaled sf0.1 time, i.e. alpha <= 1 + log10(2) ~= 1.30.

Usage: python tools/scale_audit.py [--runs 3] [--queries q01,...]
Writes .scale/audit.json and .scale/plans/<query>.txt.
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

SMALL = "/root/testdata/sf0.1"
BIG = os.path.join(REPO, ".scale", "sf1")
FACTOR = 10.0


def extra_queries():
    """Shuffle-heavy ops the bench harness doesn't cover."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from datafusion_spatial_spark.meta import GeometryMeta
    from datafusion_spatial_spark.functions.scalar import st_point
    from datafusion_spatial_spark.operators.spatial_join import (
        spatial_join_geography,
    )
    from datafusion_spatial_spark.sources.tables import load_table

    q = entry_mod.queries()

    def geography_join(spark, sf_dir):
        # customer/supplier keys mapped onto a lon/lat band incl. high
        # latitudes (up to ~84N) so the latitude-safe pad path is exercised
        pm = GeometryMeta(encoding="point", geometry_types=("Point",))
        cust = load_table(spark, sf_dir, "customer").select(
            "c_custkey",
            st_point(
                (F.col("c_acctbal") % 360.0) - 180.0,
                (F.col("c_custkey") % 168).cast("double") - 84.0,
            ).alias("geom"),
        )
        sup = load_table(spark, sf_dir, "supplier").select(
            "s_suppkey",
            st_point(
                (F.col("s_acctbal") % 360.0) - 180.0,
                (F.col("s_suppkey") % 168).cast("double") - 84.0,
            ).alias("geom"),
        )
        return spatial_join_geography(
            cust, sup, "geom", "geom", pm, pm, "c_custkey", "s_suppkey",
            meters=50_000.0,
        )

    def shard_pack(spark, sf_dir):
        from datafusion_spatial_spark.operators.corpus import (
            pack_sequences, shuffle_shards,
        )
        from datafusion_spatial_spark.operators.text import token_count

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", token_count("text").alias("n_tokens")
        )
        packed = pack_sequences(
            shuffle_shards(docs, "doc_id", 32), "doc_id", "n_tokens",
            4096, shard_col="shard",
        )
        return packed.groupBy("shard").agg(
            F.max("seq_id").alias("seqs"), F.count("*").alias("docs")
        )

    def decontam(spark, sf_dir):
        from datafusion_spatial_spark.operators.dedup import decontaminate

        docs = load_table(spark, sf_dir, "documents")
        bench = docs.filter(F.col("doc_id") % 97 == 0).select("text")
        return decontaminate(docs, "text", "doc_id", bench, "text").groupBy().count()

    return {
        "q_shard_pack": shard_pack,
        "q_decontaminate": decontam,
        "q_dedup_corpus": q["q_dedup_corpus"],
        "q_minhash_lsh_pairs": entry_mod._q_minhash_lsh,
        # r9 (advice fix): the historical q_spatial_grid_join series keeps
        # auditing the plain grid SQL it always measured (the r8 gate merge
        # made the gate a 3-part composite; timing the composite under the
        # old name would mask a real grid-join scaling regression). The
        # composite gets its own series.
        "q_spatial_grid_join": entry_mod._sql_query(
            entry_mod._Q_GRID_JOIN_SPARK, ("customer", "supplier")
        ),
        "q_sql_spatial_composite": q["q_sql_spatial_join"],
        "q_ngram_jaccard_pairs": entry_mod._q_ngram_jaccard,
        "q_ivf_ann_topk": q["q_ivf_ann_topk"],
        "q_line_dedup": q["q_line_dedup"],
        "q_geography_join": geography_join,
    }


def main() -> None:
    global FACTOR, BIG
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--queries", default="")
    ap.add_argument("--skip-small", action="store_true",
                    help="reuse small-side timings from an existing audit.json")
    ap.add_argument("--factor", type=float, default=FACTOR,
                    help="scale factor of --big relative to sf0.1 (alpha base)")
    ap.add_argument("--big", default=BIG,
                    help="scaled data dir (tools/scale_data.py output)")
    ap.add_argument("--audit-json", default=None,
                    help="output path (default .scale/audit.json)")
    args = ap.parse_args()
    FACTOR, BIG = args.factor, args.big

    sys.path.insert(0, REPO)
    import bench as bench_mod
    from datafusion_spatial_spark.session import get_spark

    spark = get_spark(app_name="scale_audit")
    queries = dict(bench_mod.bench_queries())
    queries.update(extra_queries())
    if args.queries:
        keep = set(args.queries.split(","))
        queries = {k: v for k, v in queries.items() if k in keep}

    audit_path = args.audit_json or os.path.join(REPO, ".scale", "audit.json")
    plans_dir = os.path.join(REPO, ".scale", "plans")
    os.makedirs(plans_dir, exist_ok=True)
    prior = {}
    if os.path.exists(audit_path):
        with open(audit_path) as f:
            prior = json.load(f).get("queries", {})

    def run_side(fn, sf_dir, runs):
        df = fn(spark, sf_dir)
        n = df.count()  # warmup + row count in one pass
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            samples.append(time.perf_counter() - t0)
        return round(statistics.median(samples), 4), n

    out = {}
    for name, fn in queries.items():
        rec = dict(prior.get(name, {}))
        try:
            if args.skip_small and "t_small" in rec:
                pass
            else:
                rec["t_small"], rec["rows_small"] = run_side(fn, SMALL, args.runs)
            rec["t_big"], rec["rows_big"] = run_side(fn, BIG, args.runs)
            rec["alpha"] = round(
                math.log(rec["t_big"] / rec["t_small"]) / math.log(FACTOR), 3
            )
            rec["within_2x_gate"] = rec["t_big"] <= 2 * FACTOR * rec["t_small"]
            with open(os.path.join(plans_dir, f"{name}.txt"), "w") as f:
                f.write(fn(spark, BIG)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted")))
            print(f"{name}: {rec['t_small']}s -> {rec['t_big']}s  "
                  f"alpha={rec['alpha']}  rows {rec['rows_small']}->{rec['rows_big']}")
        except Exception as e:  # keep going; record the failure
            rec["error"] = f"{type(e).__name__}: {e}"
            print(f"{name}: ERROR {rec['error']}", file=sys.stderr)
        out[name] = rec

    prior.update(out)
    with open(audit_path, "w") as f:
        json.dump({"factor": FACTOR, "queries": prior}, f, indent=1)
    try:
        spark.stop()
    except Exception:
        pass
    # py4j shutdown raced the gateway twice (process slept forever after
    # all results were written) — results are on disk, force the exit
    os._exit(0)


if __name__ == "__main__":
    main()
