import json, sys, time
tree, scale = sys.argv[1], sys.argv[2]
sys.path.insert(0, tree)
from datafusion_spatial_spark.session import get_spark
from pyspark.sql import functions as F
from datafusion_spatial_spark.sources.tables import load_table
from datafusion_spatial_spark.operators.spatial_knn import knn_join_geography
from datafusion_spatial_spark.functions.scalar import st_point
from datafusion_spatial_spark.meta import GeometryMeta

P = GeometryMeta(encoding="point", geometry_types=("Point",))
sf = f"/root/repo/.scale/sf{scale[1:]}"
spark = get_spark(app_name="gknn_probe")
sc = spark.sparkContext
cust = load_table(spark, sf, "customer").select(
    "c_custkey",
    st_point(((F.col("c_custkey") * 37) % 3000) / F.lit(10.0) - F.lit(150.0),
             ((F.col("c_custkey") * 53) % 1400) / F.lit(10.0) - F.lit(70.0)).alias("geom"))
sup = load_table(spark, sf, "supplier").select(
    "s_suppkey",
    st_point(((F.col("s_suppkey") * 41) % 3000) / F.lit(10.0) - F.lit(150.0),
             ((F.col("s_suppkey") * 59) % 1400) / F.lit(10.0) - F.lit(70.0)).alias("geom"))
probes = sup.limit(200)

def run():
    return knn_join_geography(
        probes.select(F.col("s_suppkey").alias("pid"), "geom"),
        cust.select(F.col("c_custkey").alias("cid"), "geom"),
        "geom", "geom", P, P, "pid", "cid", k=3, radius_m=100_000.0, max_rounds=4,
    ).count()

rows = run()  # warm
samples = []
jobs = []
for i in range(2):
    sc.setJobGroup(f"g{i}", "gknn")
    t0 = time.perf_counter(); run(); samples.append(round(time.perf_counter() - t0, 2))
    jobs.append(len(sc.statusTracker().getJobIdsForGroup(f"g{i}")))
print(json.dumps({"tree": tree.split("/")[-1] or "repo", "scale": scale, "samples": samples, "jobs": jobs, "rows": rows}))
spark.stop()
