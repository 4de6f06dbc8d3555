#!/usr/bin/env python
"""Same-JVM interleaved A/B of query BUILD (+first-action) cost with the
relation cache on/off. Only the plan-build side changes; execution is
identical, so we alternate cache modes per round and compare build times.
"""
import os, statistics, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from datafusion_spatial_spark.session import get_spark
import bench

spark = get_spark(app_name="ab_build_r15")
bq = bench.bench_queries()

ROUNDS = 7
res = {name: {"on": [], "off": []} for name in bq}
for r in range(ROUNDS):
    for mode in ("on", "off") if r % 2 == 0 else ("off", "on"):
        os.environ["SPARK_GRAFT_NO_RELATION_CACHE"] = "0" if mode == "on" else "1"
        for name, fn in bq.items():
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.schema  # force analysis
            res[name][mode].append(time.perf_counter() - t0)
os.environ.pop("SPARK_GRAFT_NO_RELATION_CACHE", None)

tot_on = tot_off = 0.0
for name, d in res.items():
    mon = statistics.median(d["on"][1:])
    moff = statistics.median(d["off"][1:])
    tot_on += mon; tot_off += moff
    print(f"{name:28s} build+analyze cache_on={mon*1e3:7.1f}ms  cache_off={moff*1e3:7.1f}ms  delta={(moff-mon)*1e3:+7.1f}ms")
print(f"{'TOTAL':28s} on={tot_on:.3f}s off={tot_off:.3f}s saved/pass={(tot_off-tot_on):.3f}s")
spark.stop()
