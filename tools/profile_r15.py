#!/usr/bin/env python
"""Round-15 optimization profiler (guide §1: measure first).

For every bench query: Python/driver plan-build time, warmup, N timed
collect() runs (the bench's methodology), the Spark JOB COUNT per timed
run (extra jobs = hidden driver-side actions / sampling passes), and the
``explain("formatted")`` plan dumped to plans/r15/<name>_<tag>.txt.

Usage: python tools/profile_r15.py [tag] [query ...]
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    from datafusion_spatial_spark.session import get_spark
    import bench

    spark = get_spark(app_name="profile_r15")
    sc = spark.sparkContext
    queries = bench.bench_queries()
    out: dict[str, dict] = {}
    plans_dir = os.path.join(REPO, "plans", "r15")
    os.makedirs(plans_dir, exist_ok=True)

    for name, fn in queries.items():
        if only and name not in only:
            continue
        sc.setJobDescription(f"profile:{name}")
        # build (plan construction incl. any driver-side work in the fn)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t_build = time.perf_counter() - t0
        # plan capture (analysis happens here)
        t0 = time.perf_counter()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        t_explain = time.perf_counter() - t0
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        # warmup
        df.collect()
        samples, build_samples, job_counts = [], [], []
        for i in range(runs):
            group = f"{name}-{tag}-{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            d = fn(spark, sf_dir)
            t1 = time.perf_counter()
            d.collect()
            t2 = time.perf_counter()
            build_samples.append(t1 - t0)
            samples.append(t2 - t0)
            job_counts.append(len(sc.statusTracker().getJobIdsForGroup(group)))
        sc.setJobGroup("", "")
        exch = plan.count("Exchange")
        reused = plan.count("ReusedExchange")
        out[name] = {
            "total_median": round(statistics.median(samples), 4),
            "build_median": round(statistics.median(build_samples), 4),
            "build_first": round(t_build, 4),
            "explain_sec": round(t_explain, 4),
            "jobs_per_run": job_counts,
            "exchanges": exch - reused,
            "reused_exchanges": reused,
            "plan_nodes": {
                k: plan.count(k)
                for k in (
                    "SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                    "BroadcastNestedLoopJoin", "CartesianProduct",
                    "ArrowEvalPython", "BatchEvalPython", "FlatMapGroupsInPandas",
                    "MapInPandas", "Sort ", "WindowGroupLimit",
                )
                if plan.count(k)
            },
            "samples": [round(s, 4) for s in samples],
        }
        print(name, json.dumps(out[name]), flush=True)

    total = sum(v["total_median"] for v in out.values())
    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "total": round(total, 4)}))
    with open(os.path.join(REPO, ".scale", f"profile_r15_{tag}.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
