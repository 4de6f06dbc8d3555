#!/usr/bin/env python
"""Profile every declared gate query at sf0.01: build time vs collect time
(2 runs each, min), to find driver-side construction outliers."""
import json, os, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

from datafusion_spatial_spark.session import get_spark
import __spark_entry__ as entry

spark = get_spark(app_name="profile_gates_r16")
q = entry.queries()
out = {}
for name in sorted(q):
    fn = q[name]
    try:
        fn(spark, sf_dir).collect()  # warm
        builds, colls = [], []
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.collect()
            t2 = time.perf_counter()
            builds.append(t1 - t0); colls.append(t2 - t1)
        out[name] = (min(builds), min(colls))
        print(f"{name:28s} build={min(builds)*1e3:8.1f}ms collect={min(colls)*1e3:8.1f}ms", flush=True)
    except Exception as e:
        print(name, "ERR", str(e)[:200], flush=True)
with open(os.path.join(REPO, ".scale", "profile_gates_r16.json"), "w") as f:
    json.dump(out, f, indent=1)
tot_b = sum(v[0] for v in out.values()); tot_c = sum(v[1] for v in out.values())
print(f"TOTAL build={tot_b:.2f}s collect={tot_c:.2f}s")
spark.stop()
