"""Regularized overlay kernel: unit cases, degenerate contact, holed and
multi-ring operands, + randomized area-identity property
(A + B = A∩B + A∪B for every overlay)."""

import random

from datafusion_spatial_spark import geom_ops as G
from datafusion_spatial_spark.overlay import overlay, overlay_multi
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


def test_degenerate_cases_resolve():
    # adjacency: intersection is the shared 1-D edge -> regularized empty;
    # union dissolves the shared boundary
    adjacent = [(10.0, 0.0), (20.0, 0.0), (20.0, 10.0), (10.0, 10.0), (10.0, 0.0)]
    assert overlay(SQ, adjacent, "intersection") == []
    assert sum(poly_area(p) for p in overlay(SQ, adjacent, "union")) == 200.0
    # identical operands
    assert sum(poly_area(p) for p in overlay(SQ, SQ, "union")) == 100.0
    assert sum(poly_area(p) for p in overlay(SQ, SQ, "intersection")) == 100.0
    assert overlay(SQ, SQ, "difference") == []
    assert overlay(SQ, SQ, "symdifference") == []
    # disjoint
    disjoint = [(50.0, 50.0), (60.0, 50.0), (60.0, 60.0), (50.0, 60.0), (50.0, 50.0)]
    assert overlay(SQ, disjoint, "intersection") == []
    assert sum(poly_area(p) for p in overlay(SQ, disjoint, "union")) == 200.0


def test_corner_touching_union_separates_shells():
    # squares touching at one corner: union = two simple shells, not a
    # self-touching figure-eight (pinch-node CCW-turn rule)
    other = [(10.0, 10.0), (20.0, 10.0), (20.0, 20.0), (10.0, 20.0), (10.0, 10.0)]
    polys = overlay(SQ, other, "union")
    assert len(polys) == 2
    assert sum(poly_area(p) for p in polys) == 200.0


def test_union_with_enclosed_hole():
    # C-shape closed by a second polygon -> union has a real hole
    c_shape = [(0.0, 0.0), (10.0, 0.0), (10.0, 3.0), (3.0, 3.0), (3.0, 7.0),
               (10.0, 7.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]
    lid = [(8.0, 2.0), (12.0, 2.0), (12.0, 8.0), (8.0, 8.0), (8.0, 2.0)]
    polys = overlay(c_shape, lid, "union")
    # one shell with one hole (the 3..7 x 3..7-ish pocket enclosed)
    assert len(polys) == 1
    assert len(polys[0]) == 2
    c_area = ring_area(c_shape)
    lid_area = ring_area(lid)
    inter = sum(poly_area(p) for p in overlay(c_shape, lid, "intersection"))
    assert abs(sum(poly_area(p) for p in polys) - (c_area + lid_area - inter)) < 1e-9


def test_holed_multi_ring_operands():
    outer = [(0.0, 0.0), (20.0, 0.0), (20.0, 20.0), (0.0, 20.0), (0.0, 0.0)]
    hole = [(5.0, 5.0), (15.0, 5.0), (15.0, 15.0), (5.0, 15.0), (5.0, 5.0)]
    donut = [[outer, hole]]  # area 400-100=300
    plug = [[[(8.0, 8.0), (12.0, 8.0), (12.0, 12.0), (8.0, 12.0), (8.0, 8.0)]]]
    inter = overlay_multi(donut, plug, "intersection")
    assert inter == []  # plug sits fully inside the hole
    uni = overlay_multi(donut, plug, "union")
    total = sum(poly_area(p) for p in uni)
    assert abs(total - 316.0) < 1e-9  # donut 300 + island 16
    # difference removes nothing
    diff = overlay_multi(donut, plug, "difference")
    assert abs(sum(poly_area(p) for p in diff) - 300.0) < 1e-9
    # band crossing the donut
    band = [[[(-2.0, 9.0), (22.0, 9.0), (22.0, 11.0), (-2.0, 11.0), (-2.0, 9.0)]]]
    binter = overlay_multi(donut, band, "intersection")
    # band inside outer: 40; minus hole crossing 10*2=20 -> 20
    assert abs(sum(poly_area(p) for p in binter) - 20.0) < 1e-9


def _random_convex(rng, cx, cy, r, n):
    """Convex hull of random points — guaranteed simple+convex (the old
    sorted-angle jittered-radius generator could emit self-intersecting
    rings, which are invalid polygon input)."""
    math = __import__("math")
    pts = sorted(
        (cx + r * (1 + 0.2 * rng.random()) * math.cos(a),
         cy + r * (1 + 0.2 * rng.random()) * math.sin(a))
        for a in [rng.uniform(0, 6.283) for _ in range(max(n, 3) + 2)]
    )

    def half(seq):
        out = []
        for p in seq:
            while len(out) >= 2 and (
                (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
            ) <= 0:
                out.pop()
            out.append(p)
        return out[:-1]

    hull = half(pts) + half(pts[::-1])
    if len(hull) < 3:
        return _random_convex(rng, cx, cy, r, n + 2)
    return hull + [hull[0]]


def test_area_identity_randomized():
    rng = random.Random(7)
    hits = 0
    for _ in range(60):
        a = _random_convex(rng, 0, 0, 5, rng.randint(3, 7))
        b = _random_convex(rng, rng.uniform(-3, 3), rng.uniform(-3, 3), 4, rng.randint(3, 7))
        inter = overlay(a, b, "intersection")
        uni = overlay(a, b, "union")
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


def _random_star(rng, cx, cy, rmax, n=10):
    """Star-shaped (hence simple) concave polygon: sorted angles around a
    center, arbitrary radii."""
    math = __import__("math")
    angles = sorted({rng.uniform(0, 2 * math.pi) for _ in range(n)})
    if len(angles) < 4:
        return _random_star(rng, cx, cy, rmax, n + 3)
    ring = []
    for a in angles:
        r = rng.uniform(0.3, 1.0) * rmax  # ONE radius per vertex
        ring.append((cx + r * math.cos(a), cy + r * math.sin(a)))
    return ring + [ring[0]]


def test_area_identity_concave_star():
    rng = random.Random(11)
    for _ in range(40):
        a = _random_star(rng, 0, 0, 5)
        b = _random_star(rng, rng.uniform(-2, 2), rng.uniform(-2, 2), 4)
        inter = sum(poly_area(p) for p in overlay(a, b, "intersection"))
        uni = sum(poly_area(p) for p in overlay(a, b, "union"))
        diff = sum(poly_area(p) for p in overlay(a, b, "difference"))
        sym = sum(poly_area(p) for p in overlay(a, b, "symdifference"))
        la, lb = ring_area(a), ring_area(b)
        assert abs((la + lb) - (inter + uni)) < 1e-7, (a, b)
        assert abs(diff - (la - inter)) < 1e-7, (a, b)
        assert abs(sym - (uni - inter)) < 1e-7, (a, b)


def test_integer_grid_rects_exact():
    """Axis-aligned integer rectangles: shared edges / corners / identical
    boxes constantly; expected areas are closed-form."""
    rng = random.Random(13)
    for _ in range(120):
        x0, y0 = rng.randint(0, 6), rng.randint(0, 6)
        x1, y1 = x0 + rng.randint(1, 6), y0 + rng.randint(1, 6)
        u0, v0 = rng.randint(0, 6), rng.randint(0, 6)
        u1, v1 = u0 + rng.randint(1, 6), v0 + rng.randint(1, 6)
        A = [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]
        B = [(u0, v0), (u1, v0), (u1, v1), (u0, v1), (u0, v0)]
        A = [(float(x), float(y)) for x, y in A]
        B = [(float(x), float(y)) for x, y in B]
        iw = max(0, min(x1, u1) - max(x0, u0))
        ih = max(0, min(y1, v1) - max(y0, v0))
        exp_inter = float(iw * ih)
        area_a = float((x1 - x0) * (y1 - y0))
        area_b = float((u1 - u0) * (v1 - v0))
        inter = sum(poly_area(p) for p in overlay(A, B, "intersection"))
        uni = sum(poly_area(p) for p in overlay(A, B, "union"))
        diff = sum(poly_area(p) for p in overlay(A, B, "difference"))
        assert abs(inter - exp_inter) < 1e-9, (A, B)
        assert abs(uni - (area_a + area_b - exp_inter)) < 1e-9, (A, B)
        assert abs(diff - (area_a - exp_inter)) < 1e-9, (A, B)


class TestScaleAndPerformance:
    """Round-3: grid-indexed fragmentation + chain classification must keep
    high-vertex overlays fast, and extent-relative rescaling must keep
    micro/planetary-scale inputs from collapsing under the node snap."""

    @staticmethod
    def _ring(cx, cy, r, n):
        import math
        pts = [
            (cx + r * math.cos(2 * math.pi * i / n),
             cy + r * math.sin(2 * math.pi * i / n))
            for i in range(n)
        ]
        return pts + [pts[0]]

    @staticmethod
    def _area(polys):
        total = 0.0
        for rings in polys:
            for rg in rings:
                total += sum(
                    rg[j][0] * rg[j + 1][1] - rg[j + 1][0] * rg[j][1]
                    for j in range(len(rg) - 1)
                ) / 2
        return total

    def test_1000_vertex_pair_under_100ms(self):
        import math
        import time

        from datafusion_spatial_spark.overlay import overlay_multi

        a = [[self._ring(0, 0, 10, 1000)]]
        b = [[self._ring(7, 0, 10, 1000)]]
        t0 = time.perf_counter()
        out = overlay_multi(a, b, "intersection")
        elapsed = time.perf_counter() - t0
        d, r = 7.0, 10.0
        lens = 2 * r * r * math.acos(d / (2 * r)) - d / 2 * math.sqrt(4 * r * r - d * d)
        assert abs(self._area(out) - lens) < 0.01
        assert elapsed < 0.5, f"overlay took {elapsed*1000:.0f}ms"

    def test_10k_vertex_overlay_subquadratic(self):
        """Round-5 budget: the grid-indexed fragmentation must keep a
        10k-vertex overlay both under an absolute wall-time cap and
        sub-quadratic relative to the 1k case (quadratic would be 100×;
        we demand <35× and observe ~14×)."""
        import math
        import time

        from datafusion_spatial_spark.overlay import overlay_multi

        def run(n):
            a = [[self._ring(0, 0, 10, n)]]
            b = [[self._ring(7, 0, 10, n)]]
            t0 = time.perf_counter()
            out = overlay_multi(a, b, "intersection")
            return time.perf_counter() - t0, out

        t1k, _ = run(1000)
        t10k, out = run(10000)
        d, r = 7.0, 10.0
        lens = 2 * r * r * math.acos(d / (2 * r)) - d / 2 * math.sqrt(4 * r * r - d * d)
        assert abs(self._area(out) - lens) < 0.01
        assert t10k < 8.0, f"10k overlay took {t10k:.1f}s"
        assert t10k < 35 * max(t1k, 0.05), (
            f"scaling 1k→10k is {t10k / t1k:.0f}× — super-quadratic"
        )

    def test_10k_vertex_buffer_budget(self):
        """The offset-loop buffer (one sausage loop per ring, miter joins
        on the converging side) must stay O(n): 10k vertices under an
        absolute cap, and within ~linear scaling of the 1k case. The
        former Minkowski decomposition was quadratic in r/spacing (~25
        minutes for this input)."""
        import math
        import time

        from datafusion_spatial_spark.geom_ops import area, buffer
        from datafusion_spatial_spark.wkb import Geom

        def run(n, rad):
            g = Geom("Polygon", [self._ring(0, 0, 10, n)])
            t0 = time.perf_counter()
            out = buffer(g, rad, 4)
            return time.perf_counter() - t0, out

        t1k, _ = run(1000, 0.5)
        t10k, out = run(10000, 0.5)
        assert abs(area(out) - math.pi * 10.5**2) < 0.05
        assert t10k < 10.0, f"10k buffer took {t10k:.1f}s"
        assert t10k < 35 * max(t1k, 0.05), (
            f"scaling 1k→10k is {t10k / t1k:.0f}× — super-quadratic"
        )
        te, eroded = run(10000, -0.5)
        assert abs(area(eroded) - math.pi * 9.5**2) < 0.05
        assert te < 15.0, f"10k erode took {te:.1f}s"

    def test_union_pieces_one_pass(self):
        """N-ary one-pass union: overlapping pieces dissolve in a single
        arrangement (per-piece parity OR'd — a global even-odd would
        cancel double-covered regions), duplicates collapse, and a piece
        strictly inside another contributes nothing."""
        from datafusion_spatial_spark.overlay import union_pieces

        sq = lambda x0, y0, s: [  # noqa: E731
            [(x0, y0), (x0 + s, y0), (x0 + s, y0 + s), (x0, y0 + s), (x0, y0)]
        ]
        # chain of 50% overlapping unit squares: union area = 1 + 9*0.5
        out = union_pieces([sq(i * 0.5, 0, 1) for i in range(10)])
        assert abs(self._area(out) - (1 + 9 * 0.5)) < 1e-9
        # exact duplicates + fully-contained piece
        out = union_pieces([sq(0, 0, 4), sq(0, 0, 4), sq(1, 1, 1)])
        assert abs(self._area(out) - 16.0) < 1e-9
        # disjoint pieces stay separate shells
        out = union_pieces([sq(0, 0, 1), sq(5, 5, 1), sq(10, 0, 1)])
        assert len(out) == 3
        assert abs(self._area(out) - 3.0) < 1e-9

    def test_union_pieces_random_rectangles_exact_area(self):
        """Randomized oracle for the one-pass n-ary union: the union area
        of random axis-aligned rectangles equals the exact
        coordinate-compression (grid sweep) area."""
        import random

        from datafusion_spatial_spark.overlay import union_pieces

        rng = random.Random(17)
        for trial in range(5):
            rects = []
            for _ in range(rng.randint(3, 40)):
                x0 = rng.randint(0, 60)
                y0 = rng.randint(0, 60)
                w = rng.randint(1, 25)
                h = rng.randint(1, 25)
                rects.append((float(x0), float(y0), float(x0 + w), float(y0 + h)))
            xs = sorted({v for r in rects for v in (r[0], r[2])})
            ys = sorted({v for r in rects for v in (r[1], r[3])})
            exact = 0.0
            for i in range(len(xs) - 1):
                for j in range(len(ys) - 1):
                    cx = (xs[i] + xs[i + 1]) / 2
                    cy = (ys[j] + ys[j + 1]) / 2
                    if any(r[0] <= cx <= r[2] and r[1] <= cy <= r[3] for r in rects):
                        exact += (xs[i + 1] - xs[i]) * (ys[j + 1] - ys[j])
            pieces = [
                [[(r[0], r[1]), (r[2], r[1]), (r[2], r[3]), (r[0], r[3]), (r[0], r[1])]]
                for r in rects
            ]
            got = self._area(union_pieces(pieces))
            assert abs(got - exact) < 1e-6, (trial, got, exact)

    def test_buffer_convex_random_property(self):
        """Property: for a CONVEX polygon the round-join buffer area is
        exactly A + P·r + πr² (Steiner formula) and erosion of a polygon
        containing a centered disc of radius r has area ≥ A - P·r. Random
        convex hulls of random point clouds, several radii."""
        import math
        import random

        from datafusion_spatial_spark.geom_ops import (
            area,
            buffer,
            convex_hull,
            perimeter,
        )
        from datafusion_spatial_spark.wkb import Geom

        rng = random.Random(99)
        for trial in range(8):
            pts = [
                (rng.uniform(-50, 50), rng.uniform(-50, 50))
                for _ in range(rng.randint(5, 40))
            ]
            hull = convex_hull(Geom("MultiPoint", pts))
            a = area(hull)
            p = perimeter(hull)
            if a < 1.0:
                continue
            for r in (0.1, 1.0, 7.5):
                segs = 16
                got = area(buffer(hull, r, segs))
                # n-gon arcs under-approximate the circle: pi r^2 becomes
                # (n/2) sin(2pi/n) r^2 for an n-gon of n=segs*4 sides
                n = segs * 4
                disc_lo = (n / 2) * math.sin(2 * math.pi / n) * r * r
                exact = a + p * r + math.pi * r * r
                approx = a + p * r + disc_lo
                assert approx - 1e-6 <= got <= exact + 1e-6, (
                    trial, r, got, approx, exact,
                )

    def test_buffer_nonconvex_random_probes(self):
        """Randomized ground-truth check on star (reflex-vertex) polygons:
        a probe point is in buffer(P, r) iff dist(probe, P) < r, and in
        buffer(P, -r) iff it's inside P at depth > r — skipping a ±5%
        band around the arc-approximated boundary."""
        import math
        import random

        from datafusion_spatial_spark import geom_ops as G
        from datafusion_spatial_spark.wkb import Geom

        rng = random.Random(5)
        for trial in range(4):
            n = rng.randint(6, 25)
            angs = sorted(rng.uniform(0, 2 * math.pi) for _ in range(n))
            ring = [
                (12 * math.cos(a) * rng.uniform(0.3, 1.0),
                 12 * math.sin(a) * rng.uniform(0.3, 1.0))
                for a in angs
            ]
            ring.append(ring[0])
            poly = Geom("Polygon", [ring])
            boundary = Geom("LineString", ring)
            r = 1.5
            buf = G.buffer(poly, r, 16)
            ero = G.buffer(poly, -r, 16)
            for _ in range(200):
                p = (rng.uniform(-16, 16), rng.uniform(-16, 16))
                pt = Geom("Point", p)
                d = G.distance(pt, poly)
                if abs(d - r) >= 0.05 * r:
                    assert G.contains(buf, pt) == (d < r), (trial, p, d)
                db = G.distance(pt, boundary)
                inside = G.contains(poly, pt)
                if abs(db - r) >= 0.05 * r and not (
                    ero.is_empty and not inside
                ):
                    want = inside and db > r
                    if ero.is_empty:
                        assert not want, (trial, p)
                    else:
                        assert G.contains(ero, pt) == want, (trial, p, db)

    def test_micro_scale_union_not_empty(self):
        from datafusion_spatial_spark.overlay import overlay_multi

        sq = lambda x0, y0, s: [  # noqa: E731
            [(x0, y0), (x0 + s, y0), (x0 + s, y0 + s), (x0, y0 + s), (x0, y0)]
        ]
        u = overlay_multi([sq(0, 0, 1e-8)], [sq(5e-9, 5e-9, 1e-8)], "union")
        assert u, "micro-scale union must not vanish under quantization"
        assert abs(self._area(u) - 1.75e-16) < 1e-19

    def test_planetary_scale(self):
        from datafusion_spatial_spark.overlay import overlay_multi

        sq = lambda x0, y0, s: [  # noqa: E731
            [(x0, y0), (x0 + s, y0), (x0 + s, y0 + s), (x0, y0 + s), (x0, y0)]
        ]
        inter = overlay_multi(
            [sq(0, 0, 2e7)], [sq(1e7, 1e7, 2e7)], "intersection"
        )
        assert abs(self._area(inter) - 1e14) < 1.0
