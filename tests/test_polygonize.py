"""ST_Polygonize / ST_Node / polygon ST_Split — face extraction over the
noded arrangement (overlay.polygonize_segments).

PostGIS semantics targeted:
- polygonize: every bounded face; nested rings give a holed outer polygon
  AND the inner polygon; dangles and cut edges are ignored.
- node: linework split at every crossing/touch, duplicates dissolved.
- split(polygon, line): faces of boundary+blade lying inside the input.
"""

import math

import pytest
from pyspark.sql import functions as F

from datafusion_spatial_spark import geom_ops as G
from datafusion_spatial_spark import wkb
from datafusion_spatial_spark.functions import (
    st_area,
    st_astext,
    st_geomfromtext,
    st_node,
    st_polygonize,
    st_split,
)
from datafusion_spatial_spark.meta import GeometryMeta

W = GeometryMeta(encoding="WKB")


def wdf(spark, *wkts):
    return spark.createDataFrame([(w,) for w in wkts], "wkt string").select(
        st_geomfromtext("wkt").alias("g")
    )


# -- kernel-level -------------------------------------------------------------


def lattice(n):
    lines = []
    for i in range(n + 1):
        lines.append([(i, 0.0), (i, float(n))])
        lines.append([(0.0, i), (float(n), i)])
    return wkb.Geom("MultiLineString", lines)


def test_polygonize_lattice_faces():
    faces = G.polygonize(lattice(3))
    assert len(faces) == 9
    assert all(abs(G.area(f) - 1.0) < 1e-9 for f in faces)


def test_polygonize_nested_rings_holed_outer_plus_inner():
    g = wkb.Geom(
        "MultiLineString",
        [
            [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)],
            [(1, 1), (3, 1), (3, 3), (1, 3), (1, 1)],
        ],
    )
    areas = sorted(round(G.area(f), 9) for f in G.polygonize(g))
    assert areas == [4.0, 12.0]  # inner face + annulus (outer with hole)


def test_polygonize_three_nested():
    g = wkb.Geom(
        "MultiLineString",
        [
            [(0, 0), (6, 0), (6, 6), (0, 6), (0, 0)],
            [(1, 1), (5, 1), (5, 5), (1, 5), (1, 1)],
            [(2, 2), (4, 2), (4, 4), (2, 4), (2, 2)],
        ],
    )
    areas = sorted(round(G.area(f), 9) for f in G.polygonize(g))
    # 36-16 annulus, 16-4 annulus, inner 4
    assert areas == [4.0, 12.0, 20.0]


def test_polygonize_ignores_dangles_and_bridges():
    g = wkb.Geom(
        "MultiLineString",
        [
            [(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)],
            [(1, 0.5), (2, 0.5)],  # bridge (cut edge)
            [(2, 0), (3, 0), (3, 1), (2, 1), (2, 0)],
            [(3, 0.5), (4, 0.5)],  # dangle
        ],
    )
    areas = sorted(round(G.area(f), 9) for f in G.polygonize(g))
    assert areas == [1.0, 1.0]


def test_polygonize_unnoded_input_is_noded_first():
    # two overlapping squares as raw rings -> 3 faces (A\B, A∩B, B\A)
    g = wkb.Geom(
        "MultiLineString",
        [
            [(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)],
            [(1, 1), (3, 1), (3, 3), (1, 3), (1, 1)],
        ],
    )
    areas = sorted(round(G.area(f), 9) for f in G.polygonize(g))
    assert areas == [1.0, 3.0, 3.0]


def test_polygonize_empty_and_degenerate():
    assert G.polygonize(wkb.Geom("MultiLineString", [])) == []
    # open linework only (no face)
    assert G.polygonize(wkb.Geom("LineString", [(0, 0), (1, 1), (2, 0)])) == []


def test_node_crossing_lines():
    g = wkb.Geom("MultiLineString", [[(0, 0), (2, 2)], [(0, 2), (2, 0)]])
    noded = G.node_lines(g)
    assert noded.type_name == "MultiLineString"
    assert len(noded.coords) == 4
    assert all(len(p) == 2 for p in noded.coords)
    # every part has the crossing node (1,1) as an endpoint
    for p in noded.coords:
        assert any(abs(x - 1) < 1e-9 and abs(y - 1) < 1e-9 for x, y in p)


def test_node_dissolves_duplicates():
    g = wkb.Geom(
        "MultiLineString", [[(0, 0), (2, 0)], [(0, 0), (2, 0)], [(1, 0), (3, 0)]]
    )
    noded = G.node_lines(g)
    total = sum(
        math.hypot(b[0] - a[0], b[1] - a[1])
        for part in noded.coords
        for a, b in zip(part, part[1:])
    )
    assert abs(total - 3.0) < 1e-9


def test_split_polygon_by_line():
    sq = wkb.from_wkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    blade = wkb.from_wkt("LINESTRING (1 -1, 1 3)")
    pieces = G.split(sq, blade)
    assert sorted(round(G.area(p), 9) for p in pieces) == [2.0, 2.0]


def test_split_polygon_diagonal_blade():
    sq = wkb.from_wkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    blade = wkb.from_wkt("LINESTRING (-1 -1, 3 3)")
    pieces = G.split(sq, blade)
    assert sorted(round(G.area(p), 9) for p in pieces) == [2.0, 2.0]


def test_split_holed_polygon_preserves_area():
    holed = wkb.from_wkt(
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))"
    )
    blade = wkb.from_wkt("LINESTRING (2 -1, 2 5)")
    pieces = G.split(holed, blade)
    assert len(pieces) == 2
    assert abs(sum(G.area(p) for p in pieces) - 12.0) < 1e-9


def test_split_polygon_noncrossing_blade_returns_input():
    sq = wkb.from_wkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    pieces = G.split(sq, wkb.from_wkt("LINESTRING (5 0, 6 1)"))
    assert len(pieces) == 1 and abs(G.area(pieces[0]) - 4.0) < 1e-9


def test_split_multipolygon():
    mp = wkb.from_wkt(
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((2 0, 4 0, 4 1, 2 1, 2 0)))"
    )
    blade = wkb.from_wkt("LINESTRING (3 -1, 3 2)")
    pieces = G.split(mp, blade)
    assert sorted(round(G.area(p), 9) for p in pieces) == [1.0, 1.0, 1.0]


def test_split_polygon_point_blade_raises():
    sq = wkb.from_wkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    with pytest.raises(NotImplementedError):
        G.split(sq, wkb.from_wkt("POINT (1 1)"))


# -- Spark column forms -------------------------------------------------------


def test_st_polygonize_spark(spark):
    df = wdf(
        spark,
        "MULTILINESTRING ((0 0, 2 0, 2 2, 0 2, 0 0), (1 0, 1 2))",
    )
    areas = (
        df.select(F.explode(st_polygonize("g", W)).alias("f"))
        .select(st_area("f", W).alias("a"))
        .collect()
    )
    assert sorted(round(r.a, 9) for r in areas) == [2.0, 2.0]


def test_st_node_spark(spark):
    df = wdf(spark, "MULTILINESTRING ((0 0, 2 2), (0 2, 2 0))")
    out = df.select(st_astext(st_node("g", W), W).alias("wkt")).collect()
    assert out[0].wkt.startswith("MULTILINESTRING")
    assert out[0].wkt.count("(") == 5  # outer + 4 parts


def test_st_split_polygon_spark(spark):
    df = wdf(spark, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    areas = (
        df.select(
            F.explode(st_split("g", "LINESTRING (1 -1, 1 3)", W)).alias("p")
        )
        .select(st_area("p", W).alias("a"))
        .collect()
    )
    assert sorted(round(r.a, 9) for r in areas) == [2.0, 2.0]


def test_sql_resolver_polygonize(spark):
    from datafusion_spatial_spark.meta import with_geo_meta
    from datafusion_spatial_spark.plans.sql import SpatialSQL

    df = wdf(spark, "MULTILINESTRING ((0 0, 1 0, 1 1, 0 1, 0 0))")
    ss = SpatialSQL(spark)
    ss.register_view("pz_lines", with_geo_meta(df, "g", W))
    out = ss.sql("SELECT ST_AsText(ST_Node(g)) AS n FROM pz_lines").collect()
    assert out[0].n.startswith("MULTILINESTRING")
