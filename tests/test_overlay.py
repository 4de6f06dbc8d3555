"""Greiner–Hormann overlay: unit cases + randomized area-identity property
(A + B = A∩B + A∪B for every successful overlay)."""

import random

import pytest

from datafusion_spatial_spark import geom_ops as G
from datafusion_spatial_spark.overlay import OverlayDegeneracyError, overlay
from datafusion_spatial_spark.wkb import Geom


def ring_area(ring):
    s = 0.0
    for i in range(len(ring) - 1):
        s += ring[i][0] * ring[i + 1][1] - ring[i + 1][0] * ring[i][1]
    return abs(s) / 2


def poly_area(poly):
    """overlay() returns [[shell, hole...], ...]; holes subtract."""
    return ring_area(poly[0]) - sum(ring_area(h) for h in poly[1:])


SQ = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]
OFF = [(5.0, 5.0), (15.0, 5.0), (15.0, 15.0), (5.0, 15.0), (5.0, 5.0)]


def test_rect_cases():
    assert sum(poly_area(p) for p in overlay(SQ, OFF, "intersection")) == 25.0
    assert sum(poly_area(p) for p in overlay(SQ, OFF, "union")) == 175.0
    assert sum(poly_area(p) for p in overlay(SQ, OFF, "difference")) == 75.0
    # asymmetric difference
    assert sum(poly_area(p) for p in overlay(OFF, SQ, "difference")) == 75.0


def test_multi_piece_intersection():
    # deep notch dips below the band -> two disjoint intersection pieces
    arrow = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (5.0, 1.0), (0.0, 10.0), (0.0, 0.0)]
    band = [(-5.0, 2.0), (15.0, 2.0), (15.0, 8.0), (-5.0, 8.0), (-5.0, 2.0)]
    pieces = overlay(arrow, band, "intersection")
    assert len(pieces) == 2
    total = sum(poly_area(p) for p in pieces)
    uni = sum(poly_area(p) for p in overlay(arrow, band, "union"))
    assert abs((ring_area(arrow) + ring_area(band)) - (total + uni)) < 1e-9


def test_degeneracy_raises():
    adjacent = [(10.0, 0.0), (20.0, 0.0), (20.0, 10.0), (10.0, 10.0), (10.0, 0.0)]
    with pytest.raises(OverlayDegeneracyError):
        overlay(SQ, adjacent, "intersection")
    with pytest.raises(OverlayDegeneracyError):
        overlay(SQ, SQ, "union")  # identical: collinear overlap
    disjoint = [(50.0, 50.0), (60.0, 50.0), (60.0, 60.0), (50.0, 60.0), (50.0, 50.0)]
    with pytest.raises(OverlayDegeneracyError):
        overlay(SQ, disjoint, "intersection")  # no crossings: caller fast-path


def _random_convex(rng, cx, cy, r, n):
    angles = sorted(rng.uniform(0, 6.283) for _ in range(n))
    ring = [
        (cx + r * (1 + 0.2 * rng.random()) * __import__("math").cos(a),
         cy + r * (1 + 0.2 * rng.random()) * __import__("math").sin(a))
        for a in angles
    ]
    return ring + [ring[0]]


def test_area_identity_randomized():
    rng = random.Random(7)
    hits = 0
    for _ in range(60):
        a = _random_convex(rng, 0, 0, 5, rng.randint(3, 7))
        b = _random_convex(rng, rng.uniform(-3, 3), rng.uniform(-3, 3), 4, rng.randint(3, 7))
        try:
            inter = overlay(a, b, "intersection")
            uni = overlay(a, b, "union")
        except OverlayDegeneracyError:
            continue
        hits += 1
        lhs = ring_area(a) + ring_area(b)
        rhs = sum(poly_area(p) for p in inter) + sum(poly_area(p) for p in uni)
        assert abs(lhs - rhs) < 1e-6, (a, b)
    assert hits >= 30  # most random pairs overlap properly


def test_geom_ops_integration():
    concave = Geom("Polygon", [[(0, 0), (10, 0), (10, 10), (5, 3), (0, 10), (0, 0)]])
    band = Geom("Polygon", [[(-5, 2), (15, 2), (15, 8), (-5, 8), (-5, 2)]])
    inter = G.intersection(concave, band)
    assert inter.type_name in ("Polygon", "MultiPolygon")
    lhs = G.area(concave) + G.area(band)
    rhs = G.area(inter) + G.area(G.union(concave, band))
    assert abs(lhs - rhs) < 1e-9
    # sym_difference through the GH path
    sym = G.sym_difference(concave, band)
    assert abs(G.area(sym) - (lhs - 2 * G.area(inter))) < 1e-9
