"""Mixed-dimension set operations (decompose-and-combine).

Covers the GEOS/JTS OverlayNG behavior the reference roadmap implies for
heterogeneous operands (reference README.md:31-34 set-op checklist):
GeometryCollection operands mixing dimensions, and cross-dimension combos
with partial overlap (polygon ∪ crossing line, polygon − interior point).
Regularization: union absorbs lower-dim pieces covered by higher-dim ones;
difference subtracts the closure of the subtrahend.
"""

import pytest

from datafusion_spatial_spark import geom_ops as G
from datafusion_spatial_spark.wkb import Geom, from_wkt, to_wkt


def g(w):
    return from_wkt(w)


SQ = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"


class TestCrossDimCombos:
    def test_union_polygon_crossing_line(self):
        u = G.union(g(SQ), g("LINESTRING (-1 2, 5 2)"))
        assert u.type_name == "GeometryCollection"
        assert G.area(u) == 16.0
        assert G.length(u) == 2.0  # only the two outside stubs survive

    def test_union_polygon_inside_line_absorbed(self):
        u = G.union(g(SQ), g("LINESTRING (1 1, 3 3)"))
        # line fully inside the closure -> absorbed
        assert G.area(u) == 16.0
        assert G.length(u) == 0.0

    def test_union_polygon_boundary_point_absorbed(self):
        u = G.union(g(SQ), g("POINT (4 2)"))
        assert list(G._points(u)) == []
        assert G.area(u) == 16.0

    def test_difference_polygon_minus_point(self):
        d = G.difference(g(SQ), g("POINT (1 1)"))
        assert d.type_name == "Polygon"
        assert G.area(d) == 16.0

    def test_union_line_and_off_point(self):
        u = G.union(g("LINESTRING (0 0, 2 0)"), g("POINT (5 5)"))
        assert u.type_name == "GeometryCollection"
        assert G.length(u) == 2.0
        assert len(list(G._points(u))) == 1

    def test_union_line_and_on_point_absorbed(self):
        u = G.union(g("LINESTRING (0 0, 2 0)"), g("POINT (1 0)"))
        assert G.length(u) == 2.0
        assert list(G._points(u)) == []


class TestMixedCollections:
    GC = (
        "GEOMETRYCOLLECTION (POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0)), "
        "LINESTRING (6 0, 8 0), POINT (10 10))"
    )

    def test_intersection_with_window(self):
        # window covers the square and half the line, excludes the point
        i = G.intersection(g(self.GC), g("POLYGON ((-1 -1, 7 -1, 7 5, -1 5, -1 -1))"))
        assert G.area(i) == 16.0
        assert G.length(i) == 1.0
        assert list(G._points(i)) == []

    def test_union_with_overlapping_polygon(self):
        u = G.union(g(self.GC), g("POLYGON ((3 3, 5 3, 5 5, 3 5, 3 3))"))
        # 16 + 4 - 1 overlap
        assert G.area(u) == 19.0
        assert G.length(u) == 2.0  # disjoint line kept
        assert len(list(G._points(u))) == 1  # disjoint point kept

    def test_difference_keeps_uncut_members(self):
        d = G.difference(g(self.GC), g("POLYGON ((2 -1, 9 -1, 9 9, 2 9, 2 -1))"))
        # square loses x>2 half; line swallowed; point survives
        assert G.area(d) == 8.0
        assert G.length(d) == 0.0
        assert len(list(G._points(d))) == 1

    def test_symdifference_mixed(self):
        a = Geom(
            "GeometryCollection",
            [g("LINESTRING (0 10, 4 10)"), g("POINT (10 10)")],
        )
        b = g("POLYGON ((2 9, 6 9, 6 11, 2 11, 2 9))")
        s = G.sym_difference(a, b)
        assert G.area(s) == 8.0
        assert G.length(s) == 2.0  # the stub left of x=2
        assert len(list(G._points(s))) == 1

    def test_mixed_gc_both_sides(self):
        a = Geom(
            "GeometryCollection",
            [g(SQ), g("POINT (6 6)")],
        )
        b = Geom(
            "GeometryCollection",
            [g("LINESTRING (2 -1, 2 5)"), g("POINT (6 6)")],
        )
        i = G.intersection(a, b)
        # vertical line crosses the square: 4 units inside; shared point
        assert G.length(i) == 4.0
        assert len(list(G._points(i))) == 1
        u = G.union(a, b)
        assert G.area(u) == 16.0
        assert G.length(u) == 2.0  # 1 below + 1 above the square
        assert len(list(G._points(u))) == 1  # deduplicated shared point

    def test_empty_results(self):
        i = G.intersection(g(self.GC), g("POLYGON ((20 20, 21 20, 21 21, 20 21, 20 20))"))
        assert i.is_empty

    def test_roundtrip_wkt(self):
        u = G.union(g(SQ), g("LINESTRING (-1 2, 5 2)"))
        rt = from_wkt(to_wkt(u))
        assert G.area(rt) == 16.0 and G.length(rt) == 2.0


class TestMeasureContracts:
    def test_length_is_linear_only(self):
        assert G.length(g(SQ)) == 0.0
        assert G.perimeter(g(SQ)) == 16.0

    def test_gc_measures(self):
        gc = g(TestMixedCollections.GC)
        assert G.area(gc) == 16.0
        assert G.length(gc) == 2.0
        assert G.perimeter(gc) == 16.0
