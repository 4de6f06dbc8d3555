"""Unit tests for the clean-room geometry kernels (pure Python, no Spark)."""

import math

import pytest

from datafusion_spatial_spark import geom_ops as G
from datafusion_spatial_spark.wkb import from_wkt


def g(wkt):
    return from_wkt(wkt)


SQUARE = g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
HOLED = g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")


class TestPredicates:
    def test_point_in_polygon(self):
        assert G.intersects(g("POINT (5 5)"), SQUARE)
        assert not G.intersects(g("POINT (15 5)"), SQUARE)
        assert G.intersects(g("POINT (0 5)"), SQUARE)  # boundary
        # hole
        assert not G.intersects(g("POINT (5 5)"), HOLED)
        assert G.intersects(g("POINT (2 2)"), HOLED)

    def test_line_polygon(self):
        assert G.intersects(g("LINESTRING (-5 5, 15 5)"), SQUARE)
        assert not G.intersects(g("LINESTRING (-5 -5, -1 15)"), SQUARE)
        assert G.intersects(g("LINESTRING (2 2, 3 3)"), SQUARE)  # fully inside

    def test_polygon_polygon(self):
        other = g("POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))")
        faraway = g("POLYGON ((20 20, 30 20, 30 30, 20 30, 20 20))")
        inner = g("POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))")
        assert G.intersects(SQUARE, other)
        assert not G.intersects(SQUARE, faraway)
        assert G.intersects(SQUARE, inner)  # containment, no edge crossing

    def test_multipart_component_containment(self):
        # Regression: a non-first component fully inside a polygon must be
        # detected by the containment fallback (no edge crossing exists).
        mls = g("MULTILINESTRING ((100 100, 110 110), (2 2, 3 3))")
        assert G.intersects(SQUARE, mls)
        assert G.intersects(mls, SQUARE)
        assert not G.disjoint(SQUARE, mls)
        assert G.distance(SQUARE, mls) == 0.0
        assert G.dwithin(SQUARE, mls, 0.5)
        # multipolygon with second polygon inside
        mp = g(
            "MULTIPOLYGON (((100 100, 101 100, 101 101, 100 101, 100 100)),"
            " ((2 2, 3 2, 3 3, 2 3, 2 2)))"
        )
        assert G.intersects(SQUARE, mp)
        assert G.intersects(mp, SQUARE)
        # second point of a multipoint inside
        mpt = g("MULTIPOINT ((100 100), (5 5))")
        assert G.intersects(mpt, SQUARE)
        # collection whose nested second member is inside
        gc = g(
            "GEOMETRYCOLLECTION (LINESTRING (100 100, 110 110),"
            " LINESTRING (2 2, 3 3))"
        )
        assert G.intersects(SQUARE, gc)
        # reverse direction: polygon's non-first part containing the probe side
        mp2 = g(
            "MULTIPOLYGON (((100 100, 110 100, 110 110, 100 110, 100 100)),"
            " ((0 0, 10 0, 10 10, 0 10, 0 0)))"
        )
        inner_line = g("LINESTRING (2 2, 3 3)")
        assert G.intersects(mp2, inner_line)
        assert G.intersects(inner_line, mp2)

    def test_contains_within(self):
        inner = g("POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))")
        assert G.contains(SQUARE, inner)
        assert G.within(inner, SQUARE)
        assert not G.contains(inner, SQUARE)
        assert G.contains(SQUARE, g("POINT (5 5)"))
        assert not G.contains(SQUARE, g("POINT (15 5)"))
        # boundary point is not contained (no interior intersection)
        assert not G.contains(SQUARE, g("POINT (0 5)"))
        # geometry crossing the hole is not contained
        assert not G.contains(HOLED, g("POINT (5 5)"))
        assert G.contains(g("LINESTRING (0 0, 10 10)"), g("POINT (5 5)"))
        assert G.contains(g("LINESTRING (0 0, 10 10)"), g("LINESTRING (2 2, 4 4)"))

    def test_equals(self):
        assert G.equals(SQUARE, g("POLYGON ((10 0, 10 10, 0 10, 0 0, 10 0))"))
        assert not G.equals(SQUARE, HOLED)
        assert G.equals(g("MULTIPOINT ((1 2), (3 4))"), g("MULTIPOINT ((3 4), (1 2))"))

    def test_disjoint(self):
        assert G.disjoint(g("POINT (100 100)"), SQUARE)
        assert not G.disjoint(g("POINT (5 5)"), SQUARE)


class TestDistance:
    def test_point_point(self):
        assert G.distance(g("POINT (0 0)"), g("POINT (3 4)")) == 5.0

    def test_point_polygon(self):
        assert G.distance(g("POINT (15 5)"), SQUARE) == 5.0
        assert G.distance(g("POINT (5 5)"), SQUARE) == 0.0

    def test_line_line(self):
        d = G.distance(g("LINESTRING (0 0, 10 0)"), g("LINESTRING (0 3, 10 3)"))
        assert d == 3.0

    def test_empty(self):
        assert G.distance(g("POINT EMPTY"), SQUARE) is None

    def test_dwithin(self):
        assert G.dwithin(g("POINT (15 5)"), SQUARE, 5.0)
        assert not G.dwithin(g("POINT (15 5)"), SQUARE, 4.9)


class TestMeasures:
    def test_area(self):
        assert G.area(SQUARE) == 100.0
        assert G.area(HOLED) == 96.0
        assert G.area(g("LINESTRING (0 0, 1 1)")) == 0.0

    def test_length(self):
        assert G.length(g("LINESTRING (0 0, 3 4)")) == 5.0
        # PostGIS/DuckDB contract: areal input has zero ST_Length;
        # perimeter is the separate ST_Perimeter measure
        assert G.length(SQUARE) == 0.0
        assert G.perimeter(SQUARE) == 40.0
        assert G.perimeter(HOLED) == 40.0 + 8.0

    def test_centroid(self):
        assert G.centroid(SQUARE) == (5.0, 5.0)
        cx, cy = G.centroid(g("LINESTRING (0 0, 10 0)"))
        assert (cx, cy) == (5.0, 0.0)
        assert G.centroid(g("MULTIPOINT ((0 0), (2 2))")) == (1.0, 1.0)
        assert G.centroid(g("POINT EMPTY")) is None
        # holed square stays symmetric
        assert G.centroid(HOLED) == (5.0, 5.0)


class TestConstructive:
    def test_convex_hull(self):
        h = G.convex_hull(g("MULTIPOINT ((0 0), (10 0), (10 10), (0 10), (5 5))"))
        assert h.type_name == "Polygon"
        assert G.area(h) == 100.0
        assert G.convex_hull(g("MULTIPOINT ((1 1))")).type_name == "Point"
        assert G.convex_hull(g("MULTIPOINT ((0 0), (1 1))")).type_name == "LineString"

    def test_buffer(self):
        b = G.buffer(g("POINT (0 0)"), 1.0)
        assert b.type_name == "Polygon"
        assert abs(G.area(b) - math.pi) < 0.01
        assert G.contains(b, g("POINT (0.5 0.5)"))
        assert not G.contains(b, g("POINT (1.5 0)"))

    def test_boundary(self):
        b = G.boundary(g("LINESTRING (0 0, 5 5)"))
        assert b.type_name == "MultiPoint" and len(b.coords) == 2
        assert G.boundary(SQUARE).type_name == "LineString"
        assert G.boundary(HOLED).type_name == "MultiLineString"
        assert G.boundary(g("POINT (1 1)")).type_name == "GeometryCollection"

    def test_is_simple(self):
        assert G.is_simple(g("LINESTRING (0 0, 1 1, 2 0)"))
        assert not G.is_simple(g("LINESTRING (0 0, 2 2, 2 0, 0 2)"))  # self-cross
        assert G.is_simple(g("MULTIPOINT ((1 1), (2 2))"))
        assert not G.is_simple(g("MULTIPOINT ((1 1), (1 1))"))


class TestProperBuffer:
    """Round-3 offset-curve buffer (Minkowski pieces + overlay union):
    closed-form areas, negative-radius erosion, holed operands."""

    def test_square_buffer_area(self):
        b = G.buffer(g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"), 2.0)
        expected = 100 + 4 * 10 * 2 + math.pi * 4  # sides + rounded corners
        assert b.type_name == "Polygon"
        assert abs(G.area(b) - expected) < 0.05
        assert G.contains(b, g("POINT (-1.5 5)"))
        assert not G.contains(b, g("POINT (-2.5 5)"))

    def test_line_buffer_area(self):
        b = G.buffer(g("LINESTRING (0 0, 10 0)"), 2.0)
        assert abs(G.area(b) - (2 * 2 * 10 + math.pi * 4)) < 0.05

    def test_negative_buffer_erodes(self):
        b = G.buffer(g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"), -2.0)
        assert abs(G.area(b) - 36.0) < 1e-6
        assert G.contains(b, g("POINT (5 5)"))
        assert not G.contains(b, g("POINT (1.5 1.5)"))

    def test_holed_polygon_buffer(self):
        b = G.buffer(
            g("POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0), "
              "(8 8, 12 8, 12 12, 8 12, 8 8))"), 1.0
        )
        # shell grows (+perimeter*r + pi r^2), 4x4 hole erodes to 2x2
        expected = 400 + 80 + math.pi - 4
        assert abs(G.area(b) - expected) < 0.05
        # hole shrinks 8..12 -> 9..11: (8.5,10) is newly covered,
        # the hole center (10,10) stays open
        assert G.contains(b, g("POINT (8.5 10)"))
        assert not G.contains(b, g("POINT (10 10)"))

    def test_multipoint_buffer_disjoint_discs(self):
        b = G.buffer(g("MULTIPOINT ((0 0), (100 0))"), 1.0)
        assert b.type_name == "MultiPolygon"
        assert abs(G.area(b) - 2 * math.pi) < 0.02

    def test_partial_collinear_retrace(self):
        # Hypothesis-found (r7): a polyline folding partway back over
        # itself makes opposite offset outlines exactly coincide; the
        # nudge-retry must recover a sane sausage, not raise.
        b = G.buffer(g("LINESTRING (0 0, 2 0, 1 0)"), 0.5)
        assert b.type_name in ("Polygon", "MultiPolygon")
        # effective covered path is the 0..2 segment
        expected = 2 * 2 * 0.5 + math.pi * 0.25
        assert abs(G.area(b) - expected) < 0.05
        assert G.contains(b, g("POINT (1 0.3)"))

    def test_full_retrace(self):
        b = G.buffer(g("LINESTRING (0 0, 3 0, 0 0, 3 0)"), 0.25)
        assert b.type_name in ("Polygon", "MultiPolygon")
        expected = 2 * 3 * 0.25 + math.pi * 0.0625
        assert abs(G.area(b) - expected) < 0.05

    def test_subnormal_segment_offset(self):
        # Hypothesis-found (r7): squared length of a 5e-324-long segment
        # underflows to exactly 0 in the collinear-split branch.
        from datafusion_spatial_spark.wkb import Geom
        gsub = Geom("LineString", [[0.0, 0.0], [5e-324, 0.0], [0.0, 0.0]],
                    False, 0, False)
        r = G.offset_curve(gsub, 1.0, 8)
        assert r.type_name in ("LineString", "MultiLineString")


class TestValidity:
    """OGC polygon validity (PostGIS ST_IsValid semantics)."""

    def test_valid_shapes(self):
        for w in [
            "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
            "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))",
            "POLYGON ((0 0, 5 0, 10 0, 10 10, 0 10, 0 0))",  # redundant vertex
            "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 0)), ((10 10, 14 10, 14 14, 10 10)))",
            "POINT (1 2)",
            "LINESTRING (0 0, 1 1, 0 1, 1 0)",  # self-crossing line IS valid
        ]:
            assert G.is_valid(g(w)), w

    def test_bowtie_invalid(self):
        assert not G.is_valid(g("POLYGON ((0 0, 10 10, 10 0, 0 10, 0 0))"))
        assert "self-intersecting" in G.invalid_reason(
            g("POLYGON ((0 0, 10 10, 10 0, 0 10, 0 0))")
        )

    def test_hole_outside_shell(self):
        w = ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
             "(20 20, 22 20, 22 22, 20 22, 20 20))")
        assert G.invalid_reason(g(w)) == "hole outside shell"

    def test_spike_invalid(self):
        assert not G.is_valid(
            g("POLYGON ((0 0, 10 0, 5 0, 5 10, 0 10, 0 0))")
        )

    def test_overlapping_multipolygon(self):
        w = ("MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0)), "
             "((5 5, 15 5, 15 15, 5 15, 5 5)))")
        assert G.invalid_reason(g(w)) == "overlapping multipolygon members"

    def test_degenerate_rings(self):
        assert G.invalid_reason(g("POLYGON ((0 0, 1 0, 0 0))")) is not None


class TestSubdivide:
    """ST_Subdivide: area-preserving, vertex-bounded recursive halving."""

    def test_area_preserved_and_bounded(self):
        n = 400
        ring = [
            (50 + 30 * math.cos(2 * math.pi * i / n),
             50 + 30 * math.sin(2 * math.pi * i / n))
            for i in range(n)
        ]
        poly = G.Geom("Polygon", [ring + [ring[0]]])
        parts = G.subdivide(poly, max_vertices=64)
        assert len(parts) > 1
        assert abs(sum(G.area(p) for p in parts) - G.area(poly)) < 1e-6
        assert max(sum(len(r) for r in p.coords) for p in parts) <= 64

    def test_holed_and_small(self):
        holed = g("POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0), "
                  "(8 8, 12 8, 12 12, 8 12, 8 8))")
        parts = G.subdivide(holed, max_vertices=8)
        assert abs(sum(G.area(p) for p in parts) - G.area(holed)) < 1e-9
        assert len(G.subdivide(SQUARE, 128)) == 1


class TestMakeValid:
    def test_bowtie_splits_into_lobes(self):
        bow = g("POLYGON ((0 0, 10 10, 10 0, 0 10, 0 0))")
        fixed = G.make_valid(bow)
        assert G.is_valid(fixed)
        assert fixed.type_name == "MultiPolygon"
        assert abs(G.area(fixed) - 50.0) < 1e-9  # two 25-area triangles

    def test_overlapping_members_dissolve(self):
        mp = g("MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0)), "
               "((5 5, 15 5, 15 15, 5 15, 5 5)))")
        fixed = G.make_valid(mp)
        assert G.is_valid(fixed)
        assert abs(G.area(fixed) - 175.0) < 1e-9  # union, not XOR

    def test_valid_input_unchanged(self):
        assert G.make_valid(SQUARE) is SQUARE
        line = g("LINESTRING (0 0, 1 1)")
        assert G.make_valid(line) is line

    def test_spike_removed(self):
        spiky = g("POLYGON ((0 0, 10 0, 5 0, 5 10, 0 10, 0 0))")
        fixed = G.make_valid(spiky)
        assert G.is_valid(fixed)
        assert abs(G.area(fixed) - 50.0) < 1e-9
