"""Geodesic family: sphere/spheroid distance, geodesic length, 4326<->3857
transform, XYZ tiles / quadkeys. Point-form functions must be pure Catalyst
(no Python rows in the plan)."""

import math

import pytest
from pyspark.sql import functions as F

from datafusion_spatial_spark import geom_ops as G
from datafusion_spatial_spark import wkb
from datafusion_spatial_spark.functions import (
    st_distancesphere,
    st_distancespheroid,
    st_geomfromtext,
    st_lengthsphere,
    st_point,
    st_quadkey,
    st_tile,
    st_tileenvelope,
    st_transform,
    st_transform_point,
    st_x,
    st_y,
)
from datafusion_spatial_spark.meta import GeometryMeta

W = GeometryMeta(encoding="WKB")

# Reference distances (meters): computed from the documented formulas
# themselves at well-known city pairs; cross-checked against published
# great-circle values (±0.5%).
PARIS = (2.3522, 48.8566)
LONDON = (-0.1276, 51.5072)
NYC = (-74.0060, 40.7128)


def pdf(spark, a, b):
    return spark.createDataFrame(
        [(a[0], a[1], b[0], b[1])], "ax double, ay double, bx double, by double"
    ).select(st_point("ax", "ay").alias("a"), st_point("bx", "by").alias("b"))


def test_kernel_haversine_known_pairs():
    d = G.haversine_m(*PARIS, *LONDON)
    assert abs(d - 343_900) < 2_000  # published ~343.9 km
    d2 = G.haversine_m(*LONDON, *NYC)
    assert abs(d2 - 5_570_000) < 20_000  # published ~5570 km


def test_sphere_distance_catalyst(spark):
    df = pdf(spark, PARIS, LONDON)
    out = df.select(st_distancesphere("a", "b").alias("d"))
    # pure Catalyst: no Python evaluation nodes in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan
    d = out.collect()[0].d
    assert abs(d - G.haversine_m(*PARIS, *LONDON)) < 1e-6


def test_spheroid_vs_sphere_within_half_percent(spark):
    df = pdf(spark, LONDON, NYC)
    row = df.select(
        st_distancesphere("a", "b").alias("ds"),
        st_distancespheroid("a", "b").alias("de"),
    ).collect()[0]
    assert abs(row.de - row.ds) / row.ds < 0.005
    # identical points: guarded path, exact zero
    z = pdf(spark, PARIS, PARIS).select(
        st_distancespheroid("a", "b").alias("d")
    ).collect()[0].d
    assert z == 0.0


def test_lengthsphere_sums_segments(spark):
    df = spark.createDataFrame(
        [(f"LINESTRING ({PARIS[0]} {PARIS[1]}, {LONDON[0]} {LONDON[1]}, "
          f"{NYC[0]} {NYC[1]})",)],
        "wkt string",
    ).select(st_geomfromtext("wkt").alias("g"))
    d = df.select(st_lengthsphere("g", W).alias("L")).collect()[0].L
    want = G.haversine_m(*PARIS, *LONDON) + G.haversine_m(*LONDON, *NYC)
    assert abs(d - want) < 1e-6


def test_transform_point_roundtrip_catalyst(spark):
    df = pdf(spark, PARIS, LONDON)
    out = df.select(
        st_transform_point("a", 4326, 3857).alias("m"),
    ).select(
        st_x("m").alias("mx"),
        st_y("m").alias("my"),
        st_transform_point("m", 3857, 4326).alias("back"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan
    r = out.collect()[0]
    # EPSG:3857 of Paris (proj-verified magnitudes)
    assert abs(r.mx - 261_847.0) < 200
    assert abs(r.my - 6_250_566.0) < 600
    assert abs(r.back.x - PARIS[0]) < 1e-9
    assert abs(r.back.y - PARIS[1]) < 1e-9


def test_transform_geom_kernel_roundtrip():
    g = wkb.from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    m = G.transform(g, 4326, 3857)
    assert m.srid == 3857
    back = G.transform(m, 3857, 4326)
    for (x0, y0), (x1, y1) in zip(g.coords[0], back.coords[0]):
        assert abs(x0 - x1) < 1e-9 and abs(y0 - y1) < 1e-9
    with pytest.raises(NotImplementedError):
        G.transform(g, 4326, 27700)


def test_transform_spark_wkb(spark):
    df = spark.createDataFrame([("POINT (2.3522 48.8566)",)], "wkt string").select(
        st_geomfromtext("wkt").alias("g")
    )
    out = df.select(st_transform("g", 4326, 3857, W).alias("m")).collect()[0].m
    g = wkb.loads(bytes(out))
    assert abs(g.coords[0] - 261_847.0) < 200


def test_tile_envelope_world_and_zoom1(spark):
    df = spark.range(1)
    world = df.select(st_tileenvelope(0, 0, 0).alias("e")).collect()[0].e
    ring = world[0]
    xs = [p.x for p in ring]
    ys = [p.y for p in ring]
    half = math.pi * 6378137.0
    assert abs(min(xs) + half) < 1e-6 and abs(max(xs) - half) < 1e-6
    assert abs(min(ys) + half) < 1e-6 and abs(max(ys) - half) < 1e-6
    # tile (1, 1, 0) = NE quadrant
    ne = df.select(st_tileenvelope(1, 1, 0).alias("e")).collect()[0].e[0]
    assert min(p.x for p in ne) == 0.0 and min(p.y for p in ne) == 0.0


def test_tile_and_quadkey(spark):
    df = spark.createDataFrame(
        [(PARIS[0], PARIS[1])], "x double, y double"
    ).select(st_point("x", "y").alias("p"))
    out = df.select(
        st_tile("p", 10).alias("t"), st_quadkey("p", 10).alias("qk")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan
    r = out.collect()[0]
    # slippy-map arithmetic, hand-computed for Paris @ z10
    assert (r.t.z, r.t.x, r.t.y) == (10, 518, 352)
    assert len(r.qk) == 10 and set(r.qk) <= set("0123")
    # quadkey of the tile's parent is a prefix of the child's
    r5 = df.select(st_quadkey("p", 5).alias("qk")).collect()[0].qk
    assert r.qk.startswith(r5)


def test_tile_envelope_contains_transformed_point(spark):
    """The z10 tile of a lon/lat point contains its mercator projection."""
    df = spark.createDataFrame(
        [(LONDON[0], LONDON[1])], "x double, y double"
    ).select(st_point("x", "y").alias("p"))
    r = df.select(
        st_tile("p", 10).alias("t"),
        st_transform_point("p", 4326, 3857).alias("m"),
    ).select(
        st_tileenvelope(F.col("t.z"), F.col("t.x"), F.col("t.y")).alias("e"), "m"
    ).collect()[0]
    xs = [p.x for p in r.e[0]]
    ys = [p.y for p in r.e[0]]
    assert min(xs) <= r.m.x <= max(xs)
    assert min(ys) <= r.m.y <= max(ys)


def test_sql_resolver_geodesic(spark):
    from datafusion_spatial_spark.meta import with_geo_meta
    from datafusion_spatial_spark.plans.sql import SpatialSQL

    meta = GeometryMeta(encoding="point", geometry_types=("Point",))
    df = spark.createDataFrame(
        [(1, PARIS[0], PARIS[1], LONDON[0], LONDON[1])],
        "id long, ax double, ay double, bx double, by double",
    ).select(
        "id",
        st_point("ax", "ay").alias("g"),
        st_point("bx", "by").alias("h"),
    )
    ss = SpatialSQL(spark)
    ss.register_view(
        "geo_pts", with_geo_meta(with_geo_meta(df, "g", meta), "h", meta)
    )
    r = ss.sql(
        "SELECT ST_DistanceSphere(g, h) AS d, ST_Quadkey(g, 5) AS qk FROM geo_pts"
    ).collect()[0]
    assert abs(r.d - G.haversine_m(*PARIS, *LONDON)) < 1e-6
    assert len(r.qk) == 5


def test_st_areasphere_equator_square(spark):
    import math

    from datafusion_spatial_spark.functions.geodesic import st_areasphere
    from datafusion_spatial_spark.geom_ops import EARTH_RADIUS

    # 1x1 degree lon/lat rectangle at the equator, with a half-degree hole;
    # Chamberlain-Duquette is exact for parallel-bounded rectangles:
    # A = R^2 * dLon * (sin latN - sin latS)
    outer = "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"
    holed = (
        "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0), "
        "(0.25 0.25, 0.75 0.25, 0.75 0.75, 0.25 0.75, 0.25 0.25))"
    )
    from datafusion_spatial_spark.functions import st_geomfromtext
    from datafusion_spatial_spark.meta import GeometryMeta

    df = spark.createDataFrame([(outer,), (holed,)], "wkt string").select(
        st_areasphere(
            st_geomfromtext("wkt"), GeometryMeta(encoding="WKB")
        ).alias("a")
    ).collect()
    rad = math.pi / 180.0
    a_outer = EARTH_RADIUS**2 * rad * math.sin(rad)
    a_hole = EARTH_RADIUS**2 * (0.5 * rad) * (
        math.sin(0.75 * rad) - math.sin(0.25 * rad)
    )
    assert abs(df[0].a - a_outer) / a_outer < 1e-12
    assert abs(df[1].a - (a_outer - a_hole)) / a_outer < 1e-12
