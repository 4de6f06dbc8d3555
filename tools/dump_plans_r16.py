#!/usr/bin/env python
"""Dump .explain("formatted") for named gate queries to plans/r16/.

Usage: python tools/dump_plans_r16.py <suffix> <query> [query ...]
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
suffix = sys.argv[1]
names = sys.argv[2:]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

from datafusion_spatial_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry  # noqa: E402

spark = get_spark(app_name="dump_plans_r16")
q = entry.queries()
for name in names:
    df = q[name](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    out = os.path.join(REPO, "plans", "r16", f"{name}_{suffix}.txt")
    with open(out, "w") as f:
        f.write(plan)
    print("wrote", out, len(plan), "bytes")
spark.stop()
