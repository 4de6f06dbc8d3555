#!/usr/bin/env python
"""Dump explain('formatted') for selected gate queries to plans/r15/.
Usage: python tools/gate_plans_r15.py <tag> <out_dir> [query ...]
Run from any checkout (worktree for 'before', HEAD for 'after')."""
import os, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

tag = sys.argv[1]
out_dir = sys.argv[2]
names = sys.argv[3:]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

from datafusion_spatial_spark.session import get_spark
import __spark_entry__ as entry

spark = get_spark(app_name=f"gate_plans_{tag}")
os.makedirs(out_dir, exist_ok=True)
q = entry.queries()
for name in names:
    df = q[name](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
        f.write(plan)
    print("wrote", name, tag, len(plan))
spark.stop()
