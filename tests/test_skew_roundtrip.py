"""Skew operators equivalence + GeoParquet write round-trip."""

from pyspark.sql import functions as F

from datafusion_spatial_spark import read_geoparquet, resolve_meta
from datafusion_spatial_spark.functions import st_astext
from datafusion_spatial_spark.operators import skew
from datafusion_spatial_spark.sources.geoparquet import write_geoparquet


def test_salted_count_sum_equivalence(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plain = {
        (r.l_returnflag,): (r.c, round(r.s, 2))
        for r in li.groupBy("l_returnflag")
        .agg(F.count("*").alias("c"), F.sum("l_quantity").alias("s"))
        .collect()
    }
    salted = {
        (r.l_returnflag,): (r["count"], round(r["sum_l_quantity"], 2))
        for r in skew.salted_count_sum(
            li, ["l_returnflag"], ["l_quantity"], salt_buckets=8
        ).collect()
    }
    assert plain == salted


def test_salted_join_equivalence(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(cust, "o_custkey").count()
    salted = skew.salted_join_skewed_left(orders, cust, "o_custkey", 8).count()
    assert plain == salted


def test_write_geoparquet_roundtrip(spark, tmp_path):
    src = read_geoparquet(
        spark, "/root/reference/data/data-multipolygon-encoding_native.parquet"
    )
    meta = resolve_meta(src, "geometry")
    out = str(tmp_path / "mp_out")
    write_geoparquet(src, out)
    back = read_geoparquet(spark, out)
    meta2 = resolve_meta(back, "geometry")
    assert meta2.encoding == meta.encoding
    assert meta2.geometry_types == meta.geometry_types
    a = [r.w for r in src.select(st_astext("geometry", meta).alias("w")).orderBy("col").collect()]
    b = [r.w for r in back.select(st_astext("geometry", meta2).alias("w")).orderBy("col").collect()]
    assert a == b
