#!/usr/bin/env python
"""Decompose the plan-BUILD cost of the worst bench offenders."""
import os, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from datafusion_spatial_spark.session import get_spark
from datafusion_spatial_spark.sources.tables import load_table, register_views
from pyspark.sql import functions as F

spark = get_spark(app_name="micro_build_r15")


def t(label, fn, n=5):
    # first call may include one-time imports; report first + steady median
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    times_s = sorted(times[1:])
    print(f"{label:55s} first={times[0]*1e3:8.1f}ms steady={times_s[len(times_s)//2]*1e3:8.1f}ms")


# 1. load_table repeated
t("load_table(customer)", lambda: load_table(spark, sf_dir, "customer"))
t("load_table(lineitem)", lambda: load_table(spark, sf_dir, "lineitem"))
t("load_table(events) [dtypes access]", lambda: load_table(spark, sf_dir, "events"))
t("register_views(6 tables q05)", lambda: register_views(
    spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"))

# 2. expression construction only (no spark action)
from datafusion_spatial_spark.functions import st_extent, st_point
from datafusion_spatial_spark.meta import GeometryMeta
meta = GeometryMeta(encoding="point", geometry_types=("Point",))
t("st_point column build", lambda: st_point(F.col("c_acctbal"), F.col("c_custkey").cast("double")))
t("st_extent column build", lambda: st_extent("geom", meta))

cust = load_table(spark, sf_dir, "customer")
pts = cust.select(st_point(F.col("c_acctbal"), F.col("c_custkey").cast("double")).alias("geom"))


def extent_agg():
    return pts.agg(st_extent("geom", meta).alias("e"))


t("pts.agg(st_extent) DataFrame build", extent_agg)
df = extent_agg()
t("schema access (analysis)", lambda: extent_agg().schema)

# 3. full query functions, decomposed
import __spark_entry__ as entry
t("q_st_extent fn build", lambda: entry.queries()["q_st_extent_customers"](spark, sf_dir))
t("q_st_envelope fn build", lambda: entry.queries()["q_st_envelope_by_nation"](spark, sf_dir))

import bench
bq = bench.bench_queries()
t("q05 fn build (register+sql)", lambda: bq["q05_region_revenue"](spark, sf_dir))
t("minhash_fast fn build", lambda: bq["q_minhash_lsh_dedup"](spark, sf_dir))
t("dwithin fn build", lambda: bq["q_spatial_dwithin_join"](spark, sf_dir))
t("text_stats fn build", lambda: bq["q_text_stats"](spark, sf_dir))
t("q01 fn build", lambda: bq["q01_pricing_summary"](spark, sf_dir))
t("asof fn build", lambda: bq["q_asof_join"](spark, sf_dir))
t("cosine fn build", lambda: bq["q_cosine_topk"](spark, sf_dir))

# 4. analysis cost of the built frames (schema forces analysis)
for name in ("q_minhash_lsh_dedup", "q_spatial_dwithin_join", "q05_region_revenue"):
    frame_fn = bq[name]
    t(f"{name} build+schema", lambda: frame_fn(spark, sf_dir).schema)

spark.stop()
