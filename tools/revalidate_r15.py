#!/usr/bin/env python
"""Re-validate the r15-optimized operators at scale (run once per tree):

  python tools/revalidate_r15.py <tree_path> <tag> [--scales t30,t100]

Measures, per scale:
  * dedup_corpus end-to-end wall (CC consumer; the r15 small-graph gate
    must not hurt at-scale behavior) + surviving row count,
  * spatial_join_geography build+collect wall + SPARK JOB COUNT for one
    dwithin-in-meters join (stats fusion: 2 jobs -> 1),
  * knn_join_geography build+collect wall + job count (loop-invariant
    stats hoist).
Appends {tag: {...}} into .scale/revalidate_r15_<tag>.json.
"""
import json
import os
import sys
import time

tree = sys.argv[1]
tag = sys.argv[2]
scales = (sys.argv[4] if len(sys.argv) > 4 else "t30,t100").split(",") \
    if len(sys.argv) > 3 and sys.argv[3] == "--scales" else ["t30", "t100"]
sys.path.insert(0, tree)
REPO = "/root/repo"
SIDES = {"t30": f"{REPO}/.scale/sf30", "t100": f"{REPO}/.scale/sf100"}

from datafusion_spatial_spark.session import get_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark = get_spark(app_name=f"revalidate_{tag}")
sc = spark.sparkContext
out = {}

from datafusion_spatial_spark.sources.tables import load_table  # noqa: E402
from datafusion_spatial_spark.operators.dedup import dedup_corpus  # noqa: E402
from datafusion_spatial_spark.operators.spatial_join import (  # noqa: E402
    spatial_join_geography,
)
from datafusion_spatial_spark.operators.spatial_knn import (  # noqa: E402
    knn_join_geography,
)
from datafusion_spatial_spark.functions.scalar import st_point  # noqa: E402
from datafusion_spatial_spark.meta import GeometryMeta  # noqa: E402

P = GeometryMeta(encoding="point", geometry_types=("Point",))


def timed_jobs(name, fn, runs=2):
    samples, jobs = [], []
    fn()  # warm
    for i in range(runs):
        group = f"{name}-{i}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        res = fn()
        samples.append(round(time.perf_counter() - t0, 3))
        jobs.append(len(sc.statusTracker().getJobIdsForGroup(group)))
    sc.setJobGroup("", "")
    return {"wall": sorted(samples)[len(samples) // 2], "jobs": jobs, "res": res}


for scale in scales:
    sf = SIDES[scale]
    docs = load_table(spark, sf, "documents")
    r = timed_jobs(
        f"dedup_corpus-{scale}",
        lambda: dedup_corpus(docs, "text", "doc_id").count(),
    )
    out[f"dedup_corpus_{scale}"] = {
        "wall_median": r["wall"], "jobs": r["jobs"], "rows": r["res"]}

    cust = load_table(spark, sf, "customer").select(
        "c_custkey",
        st_point(
            ((F.col("c_custkey") * 37) % 3000) / F.lit(10.0) - F.lit(150.0),
            ((F.col("c_custkey") * 53) % 1400) / F.lit(10.0) - F.lit(70.0),
        ).alias("geom"),
    )
    sup = load_table(spark, sf, "supplier").select(
        "s_suppkey",
        st_point(
            ((F.col("s_suppkey") * 41) % 3000) / F.lit(10.0) - F.lit(150.0),
            ((F.col("s_suppkey") * 59) % 1400) / F.lit(10.0) - F.lit(70.0),
        ).alias("geom"),
    )
    r = timed_jobs(
        f"geo_join-{scale}",
        lambda: spatial_join_geography(
            cust, sup, "geom", "geom", P, P, "c_custkey", "s_suppkey", 50_000.0
        ).count(),
    )
    out[f"geo_join_{scale}"] = {
        "wall_median": r["wall"], "jobs": r["jobs"], "pairs": r["res"]}

    probes = sup.limit(200)
    r = timed_jobs(
        f"gknn-{scale}",
        lambda: knn_join_geography(
            probes.select(F.col("s_suppkey").alias("pid"), "geom"),
            cust.select(F.col("c_custkey").alias("cid"), "geom"),
            "geom", "geom", P, P, "pid", "cid",
            k=3, radius_m=100_000.0, max_rounds=4,
        ).count(),
        runs=1,
    )
    out[f"gknn_{scale}"] = {
        "wall_median": r["wall"], "jobs": r["jobs"], "rows": r["res"]}
    print(scale, json.dumps({k: v for k, v in out.items() if scale in k}),
          flush=True)

with open(f"{REPO}/.scale/revalidate_r15_{tag}.json", "w") as f:
    json.dump(out, f, indent=1)
spark.stop()
