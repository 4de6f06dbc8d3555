#!/usr/bin/env python
"""Split remaining build cost: Python Column construction (fn call) vs
Catalyst analysis (.schema) — relation cache ON."""
import os, statistics, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from datafusion_spatial_spark.session import get_spark
import bench

spark = get_spark(app_name="ab_build2_r15")
bq = bench.bench_queries()

for name, fn in bq.items():
    cons, anal = [], []
    for i in range(10):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.schema
        t2 = time.perf_counter()
        cons.append(t1 - t0); anal.append(t2 - t1)
    print(f"{name:28s} construct={min(cons[1:])*1e3:7.1f}ms analyze={min(anal[1:])*1e3:7.1f}ms")
spark.stop()
