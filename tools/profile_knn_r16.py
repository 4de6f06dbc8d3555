#!/usr/bin/env python
"""Round-16 measurement: wall time + job count for the kNN query paths
(planar knn_join leg, geography knn_join_geography leg, and the composite
q_st_distance_topk) at a given SF dir. Usage:

    python tools/profile_knn_r16.py [sf_dir] [label]

Prints one JSON line per probe; job counts come from the status tracker
per job group (same protocol as tools/revalidate_r15.py).
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
label = sys.argv[2] if len(sys.argv) > 2 else "head"

from datafusion_spatial_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry  # noqa: E402

spark = get_spark(app_name="profile_knn_r16")
sc = spark.sparkContext


def timed_jobs(name, fn, runs=3):
    fn()  # warm
    samples, jobs = [], []
    for i in range(runs):
        group = f"{name}-{i}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        res = fn()
        samples.append(round(time.perf_counter() - t0, 3))
        jobs.append(len(sc.statusTracker().getJobIdsForGroup(group)))
    sc.setJobGroup("", "")
    return {"name": name, "label": label,
            "wall_median": sorted(samples)[len(samples) // 2],
            "walls": samples, "jobs": jobs, "res": res}


probes = {
    # geography kNN leg alone (the r15 residual: ~5.1 s at sf0.01)
    "gknn_leg": lambda: len(entry._geo_knn_rows(spark, sf_dir).collect()),
    # full composite gate query (planar + gknn)
    "q_st_distance_topk": lambda: len(
        entry.queries()["q_st_distance_topk"](spark, sf_dir).collect()
    ),
}

out = []
for name, fn in probes.items():
    r = timed_jobs(name, fn)
    out.append(r)
    print(json.dumps(r), flush=True)
spark.stop()
