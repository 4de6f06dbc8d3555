"""Tests for set-theoretic geometry ops (intersection/difference/union/
sym_difference) — pure kernels + Spark UDF wrappers."""

import math

import pytest

from datafusion_spatial_spark import geom_ops as G
from datafusion_spatial_spark import wkb
from datafusion_spatial_spark.wkb import from_wkt as g


SQUARE = g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")


class TestIntersection:
    def test_points(self):
        got = G.intersection(g("MULTIPOINT ((5 5), (15 15), (2 2))"), SQUARE)
        assert wkb.to_wkt(got) == "MULTIPOINT ((2 2), (5 5))"
        assert G.intersection(g("POINT (15 15)"), SQUARE).is_empty

    def test_line_clip(self):
        got = G.intersection(g("LINESTRING (-5 5, 15 5)"), SQUARE)
        assert got.type_name == "LineString"
        assert got.coords[0] == (0.0, 5.0) and got.coords[-1] == (10.0, 5.0)
        # line entirely inside
        inner = G.intersection(g("LINESTRING (1 1, 2 2)"), SQUARE)
        assert inner.coords == [(1.0, 1.0), (2.0, 2.0)]
        # line crossing a holed polygon splits into two parts
        holed = g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
        parts = G.intersection(g("LINESTRING (-5 5, 15 5)"), holed)
        assert parts.type_name == "MultiLineString"
        assert len(parts.coords) == 2

    def test_line_line_points(self):
        got = G.intersection(g("LINESTRING (0 0, 10 10)"), g("LINESTRING (0 10, 10 0)"))
        assert wkb.to_wkt(got) == "POINT (5 5)"

    def test_polygon_convex_clip(self):
        other = g("POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))")
        got = G.intersection(SQUARE, other)
        assert got.type_name == "Polygon"
        assert abs(G.area(got) - 25.0) < 1e-9
        b = wkb.bbox(got)
        assert b == (5.0, 5.0, 10.0, 10.0)

    def test_polygon_containment_fast_path(self):
        inner = g("POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))")
        assert G.intersection(SQUARE, inner) is inner or G.area(
            G.intersection(SQUARE, inner)
        ) == G.area(inner)

    def test_concave_concave_overlay(self):
        concave = g("POLYGON ((0 0, 10 0, 10 10, 5 5, 0 10, 0 0))")
        other = g("POLYGON ((-1 -1, 11 -1, 11 4, 5 2, -1 4, -1 -1))")
        inter = G.intersection(concave, other)
        uni = G.union(concave, other)
        # Greiner-Hormann path: area identity A + B = A∩B + A∪B
        assert abs(
            (G.area(concave) + G.area(other)) - (G.area(inter) + G.area(uni))
        ) < 1e-9
        assert 0 < G.area(inter) < min(G.area(concave), G.area(other))


class TestDifferenceUnion:
    def test_point_difference(self):
        got = G.difference(g("MULTIPOINT ((5 5), (15 15))"), SQUARE)
        assert wkb.to_wkt(got) == "POINT (15 15)"

    def test_line_difference(self):
        got = G.difference(g("LINESTRING (-5 5, 15 5)"), SQUARE)
        assert got.type_name == "MultiLineString"
        assert len(got.coords) == 2

    def test_union_disjoint_polys(self):
        far = g("POLYGON ((20 20, 30 20, 30 30, 20 30, 20 20))")
        got = G.union(SQUARE, far)
        assert got.type_name == "MultiPolygon"
        assert abs(G.area(got) - 200.0) < 1e-9

    def test_union_containment(self):
        inner = g("POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))")
        assert G.area(G.union(SQUARE, inner)) == 100.0

    def test_union_points(self):
        got = G.union(g("MULTIPOINT ((1 1))"), g("MULTIPOINT ((2 2), (1 1))"))
        assert wkb.to_wkt(got) == "MULTIPOINT ((1 1), (2 2))"

    def test_sym_difference_points(self):
        got = G.sym_difference(
            g("MULTIPOINT ((1 1), (2 2))"), g("MULTIPOINT ((2 2), (3 3))")
        )
        assert wkb.to_wkt(got) == "MULTIPOINT ((1 1), (3 3))"

    def test_overlapping_polygons_overlay(self):
        other = g("POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))")
        assert abs(G.area(G.union(SQUARE, other)) - 175.0) < 1e-9
        assert abs(G.area(G.difference(SQUARE, other)) - 75.0) < 1e-9
        sym = G.sym_difference(SQUARE, other)
        assert abs(G.area(sym) - 150.0) < 1e-9

    def test_degenerate_shared_edge_union(self):
        # shared-edge contact (with a notch on the shared side) — the
        # hardened kernel dissolves the shared boundary correctly
        notched = g("POLYGON ((0 0, 10 0, 10 4, 8 5, 10 6, 10 10, 0 10, 0 0))")
        sharer = g("POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))")
        got = G.union(notched, sharer)
        assert abs(G.area(got) - 198.0) < 1e-9
        # the notch survives as boundary: intersection keeps only the
        # shared 1-D edge -> regularized empty
        inter = G.intersection(notched, sharer)
        assert G.area(inter) < 1e-9

    def test_holed_operands(self):
        holed = g(
            "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0),"
            " (4 4, 6 4, 6 6, 4 6, 4 4))"
        )
        band = g("POLYGON ((-2 3, 12 3, 12 7, -2 7, -2 3))")
        inter = G.intersection(holed, band)
        # band strip through the square (40) minus the hole part of the
        # band (2x2 hole fully inside the strip = 4)
        assert abs(G.area(inter) - 36.0) < 1e-9
        uni = G.union(holed, band)
        # square(100) - hole(4) + band(14*4=56) - overlap(36) = 116;
        # the hole's 3..6-y part is filled by the band: hole remainder 2
        assert abs(
            (G.area(holed) + G.area(band)) - (G.area(inter) + G.area(uni))
        ) < 1e-9
        diff = G.difference(holed, band)
        assert abs(G.area(diff) - (96.0 - 36.0)) < 1e-9
        sym = G.sym_difference(holed, band)
        assert abs(G.area(sym) - (G.area(uni) - G.area(inter))) < 1e-9

    def test_vertex_on_edge_contact(self):
        # triangle tip touching square edge from outside
        tri = g("POLYGON ((10 5, 14 3, 14 7, 10 5))")
        uni = G.union(SQUARE, tri)
        assert abs(G.area(uni) - 108.0) < 1e-9
        assert G.area(G.intersection(SQUARE, tri)) < 1e-9
        # collinear partial-overlap edges
        shifted = g("POLYGON ((5 0, 15 0, 15 10, 5 10, 5 0))")
        assert abs(G.area(G.union(SQUARE, shifted)) - 150.0) < 1e-9
        assert abs(G.area(G.intersection(SQUARE, shifted)) - 50.0) < 1e-9

    def test_multipolygon_operand(self):
        mp = g(
            "MULTIPOLYGON (((2 2, 4 2, 4 4, 2 4, 2 2)),"
            " ((12 2, 14 2, 14 4, 12 4, 12 2)))"
        )
        inter = G.intersection(mp, SQUARE)
        assert abs(G.area(inter) - 4.0) < 1e-9
        diff = G.difference(mp, SQUARE)
        assert abs(G.area(diff) - 4.0) < 1e-9
        uni = G.union(mp, SQUARE)
        assert abs(G.area(uni) - 104.0) < 1e-9


def test_spark_udf_wrappers(spark):
    from pyspark.sql import functions as F

    from datafusion_spatial_spark.functions.predicates import (
        st_area,
        st_intersection,
    )
    from datafusion_spatial_spark.functions.scalar import st_geomfromtext
    from datafusion_spatial_spark.meta import GeometryMeta

    WKB_META = GeometryMeta(encoding="WKB")
    df = spark.createDataFrame(
        [
            (1, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
             "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))"),
            (2, "LINESTRING (-5 5, 15 5)", "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),
        ],
        "id long, wa string, wb string",
    ).select("id", st_geomfromtext("wa").alias("a"), st_geomfromtext("wb").alias("b"))
    inter = df.select(
        "id", st_intersection("a", "b", WKB_META, WKB_META).alias("g")
    )
    out = {
        r.id: r.area
        for r in inter.select("id", st_area("g", WKB_META).alias("area")).collect()
    }
    assert abs(out[1] - 25.0) < 1e-9
    assert out[2] == 0.0  # line has zero area

class TestLineLineSetOps:
    """Round-3 noding kernel: collinear overlap yields 1-D results."""

    def _w(self, s):
        from datafusion_spatial_spark.wkb import from_wkt
        return from_wkt(s)

    def test_collinear_partial_overlap(self):
        from datafusion_spatial_spark import geom_ops as G
        a = self._w("LINESTRING (0 0, 10 0)")
        b = self._w("LINESTRING (5 0, 15 0)")
        assert G.length(G.intersection(a, b)) == 5.0
        assert G.length(G.union(a, b)) == 15.0
        assert G.length(G.difference(a, b)) == 5.0
        assert G.length(G.sym_difference(a, b)) == 10.0
        assert G.intersection(a, b).type_name == "LineString"

    def test_containment(self):
        from datafusion_spatial_spark import geom_ops as G
        a = self._w("LINESTRING (0 0, 10 0)")
        b = self._w("LINESTRING (2 0, 8 0)")
        assert G.length(G.intersection(a, b)) == 6.0
        assert G.length(G.union(a, b)) == 10.0
        d = G.difference(a, b)
        assert d.type_name == "MultiLineString" and G.length(d) == 4.0

    def test_crossing_is_point(self):
        from datafusion_spatial_spark import geom_ops as G
        a = self._w("LINESTRING (0 0, 10 0)")
        b = self._w("LINESTRING (5 -5, 5 5)")
        i = G.intersection(a, b)
        assert i.type_name == "Point" and i.coords == (5.0, 0.0)
        assert G.length(G.union(a, b)) == 20.0

    def test_mixed_dimension_collection(self):
        from datafusion_spatial_spark import geom_ops as G
        a = self._w("LINESTRING (0 0, 10 0)")
        b = self._w("MULTILINESTRING ((2 0, 4 0), (7 -1, 7 1))")
        i = G.intersection(a, b)
        assert i.type_name == "GeometryCollection"
        assert G.length(i) == 2.0
        assert G.length(G.sym_difference(a, b)) == 10.0

    def test_endpoint_touch_is_point(self):
        from datafusion_spatial_spark import geom_ops as G
        a = self._w("LINESTRING (0 0, 5 0)")
        b = self._w("LINESTRING (5 0, 10 0)")
        i = G.intersection(a, b)
        assert i.type_name == "Point" and i.coords == (5.0, 0.0)
        u = G.union(a, b)
        assert u.type_name == "LineString" and G.length(u) == 10.0


def test_line_setop_measure_identity_randomized():
    """Inclusion-exclusion on 1-D measure over random segment soups:
    len(A∪B) == len(A) + len(B) − len(A∩B) and sym == union − inter
    (0-D intersection parts carry no length)."""
    import random

    from datafusion_spatial_spark import geom_ops as G
    from datafusion_spatial_spark.wkb import Geom

    rng = random.Random(20260813)
    for trial in range(25):
        def soup():
            lines = []
            for _ in range(rng.randint(1, 3)):
                # axis-aligned integer segments make collinear overlap likely
                if rng.random() < 0.5:
                    y = rng.randint(0, 4)
                    x0, x1 = sorted(rng.sample(range(0, 10), 2))
                    lines.append([(float(x0), float(y)), (float(x1), float(y))])
                else:
                    x = rng.randint(0, 4)
                    y0, y1 = sorted(rng.sample(range(0, 10), 2))
                    lines.append([(float(x), float(y0)), (float(x), float(y1))])
            if len(lines) == 1:
                return Geom("LineString", lines[0])
            return Geom("MultiLineString", lines)

        a, b = soup(), soup()
        la, lb = G.length(a), G.length(b)
        li = G.length(G.intersection(a, b))
        lu = G.length(G.union(a, b))
        ls = G.length(G.sym_difference(a, b))
        assert abs(lu - (la + lb - li)) < 1e-6, (trial, a, b)
        assert abs(ls - (lu - li)) < 1e-6, (trial, a, b)
