"""Property pins for the round-13 accessor families: algebraic
invariants that must hold on RANDOM geometries, complementing the
closed-form battery columns (which pin exact values on constructed
shapes).

Kernel-level (fast, no Spark): involution of SwapOrdinates, orientation
idempotence of ForcePolygonCW/CCW, dump conservation laws, Weiszfeld
optimality vs the centroid, SimplifyVW identity at zero tolerance.
"""
from __future__ import annotations

import math
import random

import pytest

from datafusion_spatial_spark import geom_ops as G
from datafusion_spatial_spark import wkb as W


def _rand_geom(rng, gt, npts=6):
    if gt == 1:
        return W.Geom("Point", (rng.uniform(-100, 100), rng.uniform(-100, 100)))
    if gt == 2:
        return W.Geom(
            "LineString",
            [(rng.uniform(-100, 100), rng.uniform(-100, 100))
             for _ in range(rng.randint(2, npts))],
        )
    if gt == 3:
        cx, cy, r = rng.uniform(-50, 50), rng.uniform(-50, 50), rng.uniform(1, 20)
        ring = [
            (cx + r * math.cos(2 * math.pi * k / npts),
             cy + r * math.sin(2 * math.pi * k / npts))
            for k in range(npts)
        ]
        ring.append(ring[0])
        return W.Geom("Polygon", [ring])
    if gt == 4:
        return W.Geom(
            "MultiPoint",
            [(rng.uniform(-100, 100), rng.uniform(-100, 100))
             for _ in range(rng.randint(1, 4))],
        )
    if gt == 5:
        return W.Geom(
            "MultiLineString",
            [[(rng.uniform(-100, 100), rng.uniform(-100, 100))
              for _ in range(rng.randint(2, 4))]
             for _ in range(rng.randint(1, 3))],
        )
    return W.Geom(
        "MultiPolygon",
        [_rand_geom(rng, 3).coords for _ in range(rng.randint(1, 3))],
    )


@pytest.mark.parametrize("gt", [1, 2, 3, 4, 5, 6])
def test_swap_ordinates_is_an_involution(gt):
    rng = random.Random(gt)
    for _ in range(30):
        g = _rand_geom(rng, gt)
        swapped = G.swap_ordinates(g, "xy")
        back = G.swap_ordinates(swapped, "xy")
        assert W.dumps(back) == W.dumps(g)
        # and the swap really moved the ordinates
        ex = [(p[1], p[0]) for p in G._all_coords(g)]
        got = [(p[0], p[1]) for p in G._all_coords(swapped)]
        assert got == ex


@pytest.mark.parametrize("gt", [3, 6])
def test_force_polygon_orientation_idempotent_and_area_preserving(gt):
    rng = random.Random(10 + gt)
    for _ in range(30):
        g = _rand_geom(rng, gt)
        cw = G.force_polygon_cw(g)
        ccw = G.force_polygon_ccw(g)
        assert G.is_polygon_cw(cw) is True
        assert G.is_polygon_ccw(ccw) is True
        # idempotent
        assert W.dumps(G.force_polygon_cw(cw)) == W.dumps(cw)
        assert W.dumps(G.force_polygon_ccw(ccw)) == W.dumps(ccw)
        # area invariant under orientation (up to fold-order ulps: the
        # reversed ring folds its shoelace terms in the opposite order)
        assert math.isclose(G.area(cw), G.area(g), rel_tol=1e-12)
        assert math.isclose(G.area(ccw), G.area(g), rel_tol=1e-12)


@pytest.mark.parametrize("gt", [2, 3, 5, 6])
def test_dump_segments_conserves_total_length(gt):
    """sum of dumped 2-point segment lengths == length + perimeter of
    the source (every path/ring segment appears exactly once)."""
    rng = random.Random(20 + gt)
    for _ in range(30):
        g = _rand_geom(rng, gt)
        segs = G.dump_segments(g)
        total = sum(G.length(s) for s in segs)
        want = G.length(g) + G.perimeter(g)
        assert math.isclose(total, want, rel_tol=1e-12), (gt, total, want)


def test_dump_rings_counts_match_structure():
    rng = random.Random(31)
    outer = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]
    hole = [(4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0)]
    g = W.Geom("Polygon", [outer, hole])
    rings = G.dump_rings(g)
    assert len(rings) == 2
    assert all(r.type_name == "Polygon" for r in rings)
    mp = W.Geom("MultiPolygon", [[outer, hole], [ [
        (20.0, 0.0), (25.0, 0.0), (25.0, 5.0), (20.0, 0.0)] ]])
    assert len(G.dump_rings(mp)) == 3
    del rng


@pytest.mark.parametrize("gt", [4])
def test_geometric_median_beats_centroid_on_distance_sum(gt):
    """Weiszfeld output must not lose to the centroid on its own
    objective (sum of Euclidean distances to the points)."""
    rng = random.Random(47)

    def dsum(p, pts):
        return sum(math.hypot(p[0] - q[0], p[1] - q[1]) for q in pts)

    for _ in range(30):
        g = _rand_geom(rng, gt)
        pts = [(float(p[0]), float(p[1])) for p in g.coords]
        med = G.geometric_median(g)
        cen = G.centroid(g)
        assert med is not None and cen is not None
        assert dsum(med, pts) <= dsum(cen, pts) + 1e-9


@pytest.mark.parametrize("gt", [2, 3, 5])
def test_simplify_vw_zero_tolerance_keeps_all_vertices(gt):
    rng = random.Random(60 + gt)
    for _ in range(20):
        g = _rand_geom(rng, gt)
        out = G.simplify_vw(g, 0.0)
        assert len(list(G._all_coords(out))) == len(list(G._all_coords(g)))


@pytest.mark.parametrize("gt", [2, 3])
def test_simplify_vw_monotone_vertex_count(gt):
    """Vertex count is non-increasing in the tolerance."""
    rng = random.Random(70 + gt)
    for _ in range(20):
        g = _rand_geom(rng, gt, npts=10)
        counts = [
            len(list(G._all_coords(G.simplify_vw(g, t))))
            for t in (0.0, 0.5, 5.0, 50.0, 5000.0)
        ]
        assert counts == sorted(counts, reverse=True), counts


def test_isvaliddetail_agrees_with_isvalid_and_reason():
    rng = random.Random(81)
    for _ in range(40):
        gt = rng.choice([1, 2, 3, 4, 5, 6])
        g = _rand_geom(rng, gt)
        ok, reason, loc = G.invalid_detail(g)
        assert ok == G.is_valid(g)
        if ok:
            assert reason is None and loc is None
        else:
            assert reason == G.invalid_reason(g)


# heavy battery file: certification tier only (r15 tiering, VERDICT r14 #9)
pytestmark = pytest.mark.slow
