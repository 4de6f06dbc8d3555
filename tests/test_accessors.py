"""Accessor family tests (PostGIS parity: NumGeometries/GeometryN/rings/
PointN/Start/End/Reverse/Perimeter/Azimuth) across WKB and native input."""

import math

import pytest
from pyspark.sql import functions as F

from datafusion_spatial_spark import wkb
from datafusion_spatial_spark.functions.accessors import (
    st_azimuth,
    st_endpoint,
    st_exteriorring,
    st_geometryn,
    st_interiorringn,
    st_numgeometries,
    st_numinteriorrings,
    st_perimeter,
    st_pointn,
    st_reverse,
    st_startpoint,
)
from datafusion_spatial_spark.functions.scalar import st_geomfromtext, st_point
from datafusion_spatial_spark.meta import GeometryMeta

W = GeometryMeta(encoding="WKB")
PT = GeometryMeta(encoding="point", geometry_types=("Point",))


@pytest.fixture(scope="module")
def geoms(spark):
    rows = [
        (1, "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 0)), ((10 10, 14 10, 14 14, 10 10)))"),
        (2, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"),
        (3, "LINESTRING (0 0, 5 0, 5 5)"),
        (4, "POINT (7 8)"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id long, w string")
    return df.select("id", st_geomfromtext("w").alias("g")).cache()


def _wkt(b):
    return None if b is None else wkb.to_wkt(wkb.loads(bytes(b)))


@pytest.mark.slow
def test_numgeometries_and_geometryn(geoms):
    out = {r.id: (r.n, _wkt(r.g2)) for r in geoms.select(
        "id",
        st_numgeometries("g", W).alias("n"),
        st_geometryn("g", 2, W).alias("g2"),
    ).collect()}
    assert out[1][0] == 2 and out[1][1].startswith("POLYGON ((10 10")
    assert out[2][0] == 1 and out[2][1] is None
    assert out[4] == (1, None)
    assert out[5] == (None, None)


def test_rings(geoms):
    out = {r.id: (_wkt(r.ext), r.nir, _wkt(r.ir1)) for r in geoms.select(
        "id",
        st_exteriorring("g", W).alias("ext"),
        st_numinteriorrings("g", W).alias("nir"),
        st_interiorringn("g", 1, W).alias("ir1"),
    ).collect()}
    assert out[2][0] == "LINESTRING (0 0, 10 0, 10 10, 0 10, 0 0)"
    assert out[2][1] == 1
    assert out[2][2] == "LINESTRING (4 4, 6 4, 6 6, 4 6, 4 4)"
    assert out[3] == (None, None, None)  # not a polygon


def test_line_vertices(geoms):
    out = {r.id: (_wkt(r.p2), _wkt(r.sp), _wkt(r.ep)) for r in geoms.select(
        "id",
        st_pointn("g", 2, W).alias("p2"),
        st_startpoint("g", W).alias("sp"),
        st_endpoint("g", W).alias("ep"),
    ).collect()}
    assert out[3] == ("POINT (5 0)", "POINT (0 0)", "POINT (5 5)")
    assert out[4] == (None, None, None)  # not a line


def test_reverse_and_perimeter(geoms):
    out = {r.id: (_wkt(r.rev), r.per) for r in geoms.select(
        "id",
        st_reverse("g", W).alias("rev"),
        st_perimeter("g", W).alias("per"),
    ).collect()}
    assert out[3][0] == "LINESTRING (5 5, 5 0, 0 0)"
    assert out[2][1] == 40.0 + 8.0  # shell + hole perimeters
    assert out[3][1] == 0.0  # lines have no perimeter
    # reverse round-trips: reverse(reverse(g)) == g
    g = wkb.from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    from datafusion_spatial_spark.functions.accessors import _reverse
    assert _reverse(_reverse(g)).coords == g.coords


def test_azimuth(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0, 0.0, 10.0), (0.0, 0.0, 10.0, 0.0),
         (0.0, 0.0, 0.0, -10.0), (0.0, 0.0, 0.0, 0.0)],
        "ax double, ay double, bx double, by double",
    ).select(
        st_point("ax", "ay").alias("a"), st_point("bx", "by").alias("b")
    )
    out = [r.az for r in df.select(
        st_azimuth("a", "b", PT, PT).alias("az")
    ).collect()]
    assert abs(out[0] - 0.0) < 1e-12            # due north
    assert abs(out[1] - math.pi / 2) < 1e-12    # due east
    assert abs(out[2] - math.pi) < 1e-12        # due south
    assert out[3] is None                        # coincident
