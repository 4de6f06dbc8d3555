"""Spark-side tests for predicate/measure/constructive st_* UDFs and the
grid-bucketed spatial join."""

import pytest
from pyspark.sql import functions as F

from datafusion_spatial_spark import read_geoparquet, resolve_meta, wkb
from datafusion_spatial_spark.functions.predicates import (
    st_area,
    st_buffer,
    st_centroid,
    st_contains,
    st_convexhull,
    st_distance,
    st_dwithin,
    st_intersects,
    st_length,
)
from datafusion_spatial_spark.functions.scalar import st_geomfromtext
from datafusion_spatial_spark.meta import GeometryMeta
from datafusion_spatial_spark.operators.spatial_join import spatial_join

WKB_META = GeometryMeta(encoding="WKB")
REFDATA = "/root/reference/data"


@pytest.fixture(scope="module")
def pairs(spark):
    rows = [
        (1, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", "POINT (5 5)"),
        (2, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", "POINT (15 5)"),
        (3, "LINESTRING (0 0, 10 0)", "LINESTRING (5 -5, 5 5)"),
        (4, "POINT (0 0)", "POINT (3 4)"),
        (5, None, "POINT (1 1)"),
    ]
    df = spark.createDataFrame(rows, "id long, wa string, wb string")
    return df.select(
        "id",
        st_geomfromtext("wa").alias("ga"),
        st_geomfromtext("wb").alias("gb"),
    ).cache()


def test_st_intersects_and_distance(pairs):
    out = {
        r.id: (r.i, r.d)
        for r in pairs.select(
            "id",
            st_intersects("ga", "gb", WKB_META, WKB_META).alias("i"),
            st_distance("ga", "gb", WKB_META, WKB_META).alias("d"),
        ).collect()
    }
    assert out[1] == (True, 0.0)
    assert out[2] == (False, 5.0)
    assert out[3] == (True, 0.0)
    assert out[4] == (False, 5.0)
    assert out[5] == (None, None)


def test_st_contains_dwithin(pairs):
    out = {
        r.id: (r.c, r.w)
        for r in pairs.select(
            "id",
            st_contains("ga", "gb", WKB_META, WKB_META).alias("c"),
            st_dwithin("ga", "gb", 5.0, WKB_META, WKB_META).alias("w"),
        ).collect()
    }
    assert out[1] == (True, True)
    assert out[2] == (False, True)
    assert out[4] == (False, True)


def test_measures_on_fixture(spark):
    df = read_geoparquet(spark, f"{REFDATA}/data-polygon-encoding_native.parquet")
    meta = resolve_meta(df, "geometry")
    rows = (
        df.select(
            "col",
            st_area("geometry", meta).alias("area"),
            st_length("geometry", meta).alias("len"),
            st_centroid("geometry", meta).alias("cen"),
        )
        .orderBy("col")
        .collect()
    )
    # row 0: POLYGON ((30 10, 40 40, 20 40, 10 20, 30 10)) — shoelace by hand
    g0 = wkb.from_wkt("POLYGON ((30 10, 40 40, 20 40, 10 20, 30 10))")
    from datafusion_spatial_spark import geom_ops as G

    assert rows[0].area == G.area(g0)
    assert abs(rows[0].len - G.length(g0)) < 1e-9
    assert rows[0].cen.x is not None
    # EMPTY polygon -> zero measures
    assert rows[2].area == 0.0 and rows[2].len == 0.0


def test_constructive_roundtrip(pairs):
    rows = pairs.filter(F.col("id") == 1).select(
        st_convexhull("ga", WKB_META).alias("hull"),
        st_buffer("gb", 2.0, WKB_META).alias("buf"),
    ).collect()[0]
    hull = wkb.loads(bytes(rows.hull))
    assert hull.type_name == "Polygon"
    buf = wkb.loads(bytes(rows.buf))
    assert buf.type_name == "Polygon"
    from datafusion_spatial_spark import geom_ops as G

    assert abs(G.area(hull) - 100.0) < 1e-9


def test_spatial_join_points_in_polygons(spark):
    import random

    rng = random.Random(1)
    pts = [(i, rng.uniform(0, 100), rng.uniform(0, 100)) for i in range(300)]
    pts_df = spark.createDataFrame(pts, "pid long, x double, y double").select(
        "pid", "x", "y",
        F.struct(F.col("x").alias("x"), F.col("y").alias("y")).alias("geom"),
    )
    polys = [
        (1, "POLYGON ((0 0, 30 0, 30 30, 0 30, 0 0))"),
        (2, "POLYGON ((50 50, 90 50, 90 90, 50 90, 50 50))"),
    ]
    poly_df = spark.createDataFrame(polys, "gid long, w string").select(
        "gid", st_geomfromtext("w").alias("geom")
    )
    point_meta = GeometryMeta(encoding="point", geometry_types=("Point",))
    out = spatial_join(
        pts_df, poly_df, "geom", "geom", point_meta, WKB_META,
        "pid", "gid", cell_size=20.0, predicate="within",
    ).collect()
    got = {(r.pid, r.gid) for r in out}
    want = set()
    for pid, x, y in pts:
        if 0 < x < 30 and 0 < y < 30:
            want.add((pid, 1))
        if 50 < x < 90 and 50 < y < 90:
            want.add((pid, 2))
    assert got == want


def test_simplify_and_interpolate(spark):
    from datafusion_spatial_spark import wkb as W
    from datafusion_spatial_spark.functions.predicates import (
        st_lineinterpolatepoint,
        st_simplify,
    )

    df = spark.createDataFrame(
        [(1, "LINESTRING (0 0, 1 0.01, 2 0, 3 0.01, 4 0, 10 0, 10 10)")],
        "id long, w string",
    ).select("id", st_geomfromtext("w").alias("g"))
    row = df.select(
        st_simplify("g", 0.1, WKB_META).alias("s"),
        st_lineinterpolatepoint("g", 0.5, WKB_META).alias("p"),
    ).collect()[0]
    assert W.to_wkt(W.loads(bytes(row.s))) == "LINESTRING (0 0, 10 0, 10 10)"
    assert row.p is not None and abs(row.p.x - 10.0) < 0.02
