"""2-D analysis operations over XYZ / XYM input (r11).

The reference ships XYZ fixtures for all 7 types (generate_test_data.py),
so 3-D columns are first-class input. PostGIS defines the planar
predicates/measures/overlay on the XY projection; before r11 the engine
CRASHED on them (geom_ops.contains unpacked 2-tuples). Now every 2-D
analysis op projects Z/M away at the converter boundary
(predicates._converter force2d) while st_asbinary / st_asgeojson /
st_3ddistance / the structural accessors keep dims.
"""
import pandas as pd
import pytest
from pyspark.sql import functions as F

from datafusion_spatial_spark import geom_ops as G
from datafusion_spatial_spark import wkb
from datafusion_spatial_spark.functions import (
    st_area,
    st_asbinary,
    st_astext,
    st_buffer,
    st_centroid,
    st_contains,
    st_distance,
    st_equals,
    st_intersection,
    st_intersects,
    st_length,
    st_within,
)
from datafusion_spatial_spark.functions.accessors import st_perimeter, st_reverse
from datafusion_spatial_spark.meta import GeometryMeta

W = GeometryMeta(encoding="WKB")

POLY_Z = wkb.Geom(
    "Polygon",
    [[(0.0, 0.0, 1.0), (4.0, 0.0, 2.0), (4.0, 4.0, 3.0), (0.0, 4.0, 4.0),
      (0.0, 0.0, 1.0)]],
    has_z=True,
)
PT_IN_Z = wkb.Geom("Point", (1.0, 1.0, 99.0), has_z=True)
PT_OUT_Z = wkb.Geom("Point", (9.0, 1.0, 0.0), has_z=True)
LS_Z = wkb.Geom("LineString", [(0.0, 0.0, 0.0), (3.0, 4.0, 50.0)], has_z=True)
LS_M = wkb.Geom("LineString", [(0.0, 0.0, 7.0), (3.0, 4.0, 8.0)], has_m=True)


@pytest.fixture(scope="module")
def zdf(spark):
    rows = [
        ("in", wkb.dumps(POLY_Z), wkb.dumps(PT_IN_Z)),
        ("out", wkb.dumps(POLY_Z), wkb.dumps(PT_OUT_Z)),
    ]
    return spark.createDataFrame(rows, "k string, poly binary, pt binary")


def test_z_predicates_match_projection(zdf):
    got = {
        r.k: (r.c, r.w, r.i, r.e)
        for r in zdf.select(
            "k",
            st_contains("poly", "pt", W, W).alias("c"),
            st_within("pt", "poly", W, W).alias("w"),
            st_intersects("poly", "pt", W, W).alias("i"),
            st_equals("poly", "poly", W, W).alias("e"),
        ).collect()
    }
    assert got["in"] == (True, True, True, True)
    assert got["out"] == (False, False, False, True)
    # oracle: the scalar kernels on the explicit 2-D projection
    p2, i2, o2 = G.force_2d(POLY_Z), G.force_2d(PT_IN_Z), G.force_2d(PT_OUT_Z)
    assert got["in"][0] == G.contains(p2, i2)
    assert got["out"][2] == G.intersects(p2, o2)


def test_z_distance_and_measures(zdf):
    r = zdf.filter("k = 'out'").select(
        st_distance("poly", "pt", W, W).alias("d"),
        st_area("poly", W).alias("a"),
        st_perimeter("poly", W).alias("p"),
    ).collect()[0]
    assert r.d == 5.0  # planar: (9,1) is 5 right of x=4 edge... actually 5.0
    assert r.a == 16.0
    assert r.p == 16.0


def test_z_length_is_planar(spark):
    df = spark.createDataFrame(
        [(wkb.dumps(LS_Z),), (wkb.dumps(LS_M),)], "g binary"
    )
    vals = [r.l for r in df.select(st_length("g", W).alias("l")).collect()]
    assert vals == [5.0, 5.0]  # z=50 / m ignored


def test_z_constructive_projects(zdf):
    r = zdf.filter("k = 'in'").select(
        st_intersection("poly", "pt", W, W).alias("x"),
        st_buffer("pt", 1.0, W).alias("b"),
        st_centroid("poly", W).alias("c"),
    ).collect()[0]
    gx = wkb.loads(bytes(r.x))
    assert not gx.has_z and G.intersects(gx, G.force_2d(PT_IN_Z))
    gb = wkb.loads(bytes(r.b))
    assert not gb.has_z and G.area(gb) > 2.0
    assert (r.c.x, r.c.y) == G.centroid(G.force_2d(POLY_Z))


def test_dim_preserving_ops_keep_z(spark):
    """st_asbinary / st_astext / st_reverse keep Z — only the 2-D analysis
    kernels project."""
    df = spark.createDataFrame([(wkb.dumps(LS_Z),)], "g binary")
    r = df.select(
        st_astext("g", W).alias("t"),
        st_asbinary("g", W).alias("b"),
        st_reverse("g", W).alias("rv"),
    ).collect()[0]
    assert r.t == "LINESTRING Z (0 0 0, 3 4 50)"
    assert wkb.loads(bytes(r.b)).has_z
    grv = wkb.loads(bytes(r.rv))
    assert grv.has_z and grv.coords[0] == (3.0, 4.0, 50.0)


def test_z_3ddistance_still_3d(spark):
    from datafusion_spatial_spark.functions import st_3ddistance

    a = wkb.dumps(wkb.Geom("Point", (0.0, 0.0, 0.0), has_z=True))
    b = wkb.dumps(wkb.Geom("Point", (3.0, 4.0, 12.0), has_z=True))
    df = spark.createDataFrame([(a, b)], "a binary, b binary")
    r = df.select(st_3ddistance("a", "b", W, W).alias("d")).collect()[0]
    assert abs(r.d - 13.0) < 1e-12


def test_native_z_predicates(spark):
    """Native struct<x,y,z> columns through the flat-offsets transport:
    predicates work and match the projection."""
    pdf = pd.DataFrame({
        "pt": [
            {"x": 1.0, "y": 1.0, "z": 5.0},
            {"x": 9.0, "y": 1.0, "z": 5.0},
        ]
    })
    df = spark.createDataFrame(pdf)
    meta_pt = GeometryMeta(encoding="point", geometry_types=("Point Z",))
    lit = F.lit(wkb.dumps(POLY_Z))
    got = [
        r.i for r in df.select(
            st_intersects(lit, "pt", W, meta_pt).alias("i")
        ).collect()
    ]
    assert got == [True, False]
