"""Bit-exact parity pins for the round-8 vectorized refine kernels
(_fastpath.predicate_fastpath / distance_fastpath vs the geom_ops scalar
kernels). The fast paths mirror ring_contains_point / _on_segment /
point_seg_dist2 expression-for-expression, so every battery below must
agree EXACTLY with the scalar loop — including boundary points, EPS-window
points, holes, multipolygon parts, empties, and nulls."""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd
import pytest

from datafusion_spatial_spark import geom_ops, wkb
from datafusion_spatial_spark.functions._fastpath import (
    distance_fastpath,
    predicate_fastpath,
)

EPS = 1e-12


def _poly(*rings):
    return wkb.dumps(wkb.Geom("Polygon", [list(r) for r in rings]))


def _mpoly(polys):
    return wkb.dumps(wkb.Geom("MultiPolygon", [[list(r) for r in p] for p in polys]))


def _line(pts):
    return wkb.dumps(wkb.Geom("LineString", list(pts)))


def _pt(x, y):
    return wkb.dumps(wkb.Geom("Point", (x, y)))


BOX = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
HOLE = [(1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0), (1.0, 1.0)]
TRI = [(0.0, 0.0), (8.0, 1.0), (1.0, 8.0), (0.0, 0.0)]

# point battery: interior / vertex / edge / just-outside within EPS /
# just-outside beyond EPS / far outside / hole boundary / inside hole /
# empty / null
POINTS = [
    (2.0, 0.5),              # interior (between hole and shell)
    (0.0, 0.0),              # shell vertex
    (2.0, 0.0),              # shell edge midpoint
    (-EPS / 2, 2.0),         # outside but inside the EPS pad -> boundary
    (-1e-9, 2.0),            # outside beyond EPS
    (100.0, 100.0),          # far outside
    (1.0, 2.0),              # hole boundary
    (2.0, 2.0),              # inside the hole
    (float("nan"), float("nan")),  # POINT EMPTY
    None,
]


def _pt_series(points):
    return pd.Series(
        [None if p is None else _pt(*p) for p in points], dtype=object
    )


def _scalar(fn, sa, sb):
    out = []
    for va, vb in zip(sa, sb):
        ga = wkb.loads(bytes(va)) if va is not None else None
        gb = wkb.loads(bytes(vb)) if vb is not None else None
        out.append(None if ga is None or gb is None else fn(ga, gb))
    return out


MODES = {
    "intersects": geom_ops.intersects,
    "disjoint": geom_ops.disjoint,
    "contains": geom_ops.contains,
    "within": geom_ops.within,
}


@pytest.mark.parametrize("poly_bytes", [
    _poly(BOX),
    _poly(BOX, HOLE),
    _mpoly([[BOX], [[(10.0, 10.0), (12.0, 10.0), (12.0, 12.0), (10.0, 10.0)]]]),
    _poly(TRI),
    wkb.dumps(wkb.Geom("Polygon", [])),  # POLYGON EMPTY
])
@pytest.mark.parametrize("mode", list(MODES))
def test_point_vs_polygon_parity(poly_bytes, mode):
    pts = _pt_series(POINTS)
    polys = pd.Series([poly_bytes] * len(POINTS), dtype=object)
    if mode == "contains":
        sa, sb = polys, pts
        exp = _scalar(MODES[mode], sa, sb)
    else:
        sa, sb = pts, polys
        exp = _scalar(MODES[mode], sa, sb)
    got = predicate_fastpath(sa, sb, mode, "wkb", "wkb")
    assert got is not None, "fast path must engage for a 1-unique batch"
    assert list(got) == exp


@pytest.mark.parametrize("mode", ["intersects", "disjoint"])
def test_point_vs_polygon_symmetric_orientation(mode):
    """Symmetric predicates engage with the polygon on either side."""
    pts = _pt_series(POINTS)
    polys = pd.Series([_poly(BOX, HOLE)] * len(POINTS), dtype=object)
    got = predicate_fastpath(polys, pts, mode, "wkb", "wkb")
    assert got is not None
    assert list(got) == _scalar(MODES[mode], polys, pts)


def test_point_point_modes_parity():
    a = [(1.0, 2.0), (1.0, 2.0), (1.0, 2.0), (float("nan"), float("nan")),
         (float("nan"), float("nan")), None, (0.0, 0.0)]
    b = [(1.0, 2.0), (1.0 + 5e-13, 2.0), (5.0, 5.0),
         (float("nan"), float("nan")), (1.0, 1.0), (1.0, 1.0), None]
    sa, sb = _pt_series(a), _pt_series(b)
    for mode, fn in list(MODES.items()) + [("equals", geom_ops.equals)]:
        got = predicate_fastpath(sa, sb, mode, "wkb", "wkb")
        assert got is not None, mode
        assert list(got) == _scalar(fn, sa, sb), mode


def test_native_struct_points_parity():
    """The _prep native depth-0 shape (DataFrame of xs/ys lists)."""
    df = pd.DataFrame(
        {
            "xs": [[2.0], [0.0], [float("nan")], None],
            "ys": [[0.5], [0.0], [float("nan")], None],
        }
    )
    polys = pd.Series([_poly(BOX)] * 4, dtype=object)
    got = predicate_fastpath(df, polys, "within", "point", "wkb")
    assert got is not None
    # scalar expectations: interior True, vertex (boundary) False,
    # empty False, null None
    assert list(got) == [True, False, False, None]


def test_random_battery_all_modes():
    rng = random.Random(8)
    pts, polys = [], []
    shapes = [
        _poly(BOX), _poly(BOX, HOLE), _poly(TRI),
        _mpoly([[BOX], [[(6.0, 6.0), (9.0, 6.0), (9.0, 9.0), (6.0, 6.0)]]]),
    ]
    for _ in range(400):
        # half-integer grid hits vertices/edges/interiors exactly
        pts.append((rng.randint(-2, 10) / 2, rng.randint(-2, 10) / 2))
        polys.append(shapes[rng.randrange(len(shapes))])
    sa, sb = _pt_series(pts), pd.Series(polys, dtype=object)
    for mode, fn in MODES.items():
        a, b = (sb, sa) if mode == "contains" else (sa, sb)
        got = predicate_fastpath(a, b, mode, "wkb", "wkb")
        assert got is not None
        assert list(got) == _scalar(fn, a, b), mode


def test_fallbacks():
    pts = _pt_series([(1.0, 1.0)] * 12)
    # high uniqueness: 12 distinct polygons in a 12-row batch exceeds the
    # max(8, n//4) group-evaluate threshold
    distinct = pd.Series(
        [_poly([(float(i), 0.0), (i + 1.0, 0.0), (i + 1.0, 1.0), (float(i), 0.0)])
         for i in range(0, 120, 10)],
        dtype=object,
    )
    assert predicate_fastpath(pts, distinct, "within", "wkb", "wkb") is None
    pts4 = _pt_series([(1.0, 1.0)] * 4)
    # r11: a LINE container engages the kernel's line branch instead of
    # falling back (point on the line -> within True)
    lines = pd.Series([_line([(0.0, 0.0), (5.0, 5.0)])] * 4, dtype=object)
    got = predicate_fastpath(pts4, lines, "within", "wkb", "wkb")
    assert got is not None
    assert list(got) == _scalar(MODES["within"], pts4, lines) == [True] * 4
    # equals never takes the polygon branch
    polys = pd.Series([_poly(BOX)] * 4, dtype=object)
    assert predicate_fastpath(pts4, polys, "equals", "wkb", "wkb") is None
    # 'other' kinds fall back
    assert predicate_fastpath(pts4, polys, "within", "other", "wkb") is None


def _scalar_dist(sa, sb):
    out = []
    for va, vb in zip(sa, sb):
        ga = wkb.loads(bytes(va)) if va is not None else None
        gb = wkb.loads(bytes(vb)) if vb is not None else None
        out.append(None if ga is None or gb is None else geom_ops.distance(ga, gb))
    return out


def test_distance_point_line_polygon_parity():
    pts = _pt_series(POINTS)
    for geom in [
        _line([(0.0, 0.0), (4.0, 0.0), (4.0, 4.0)]),
        _poly(BOX, HOLE),
        _poly(TRI),
        wkb.dumps(wkb.Geom("LineString", [])),  # LINESTRING EMPTY
    ]:
        gs = pd.Series([geom] * len(POINTS), dtype=object)
        got = distance_fastpath(pts, gs, "wkb", "wkb")
        assert got is not None
        exp = _scalar_dist(pts, gs)
        for g, e in zip(got, exp):
            if e is None:
                assert math.isnan(g)
            else:
                assert g == e, (g, e)


def test_distance_native_point_pairs():
    df_a = pd.DataFrame({"xs": [[0.0], [1.0], None], "ys": [[0.0], [1.0], None]})
    df_b = pd.DataFrame({"xs": [[3.0], [1.0], [2.0]], "ys": [[4.0], [1.0], [2.0]]})
    got = distance_fastpath(df_a, df_b, "point", "point")
    assert got is not None
    assert got[0] == 5.0 and got[1] == 0.0 and math.isnan(got[2])


def test_distance_mixed_native_wkb():
    df_a = pd.DataFrame({"xs": [[0.0]], "ys": [[0.0]]})
    s_b = _pt_series([(3.0, 4.0)])
    got = distance_fastpath(df_a, s_b, "point", "wkb")
    assert got is not None and got[0] == 5.0


def test_distance_eps_close_points_snap_to_zero():
    """Review fix (r8): the scalar kernel routes through intersects()
    first, which snaps EPS-close point pairs to 0.0 — the vectorized path
    must agree exactly."""
    pairs = [
        ((0.0, 0.0), (1e-13, 0.0)),        # inside EPS -> 0.0
        ((0.0, 0.0), (EPS, 0.0)),          # exactly EPS -> 0.0
        ((0.0, 0.0), (2e-12, 0.0)),        # beyond EPS -> true distance
        ((1.0, 1.0), (1.0, 1.0)),          # identical
    ]
    sa = _pt_series([p[0] for p in pairs])
    sb = _pt_series([p[1] for p in pairs])
    got = distance_fastpath(sa, sb, "wkb", "wkb")
    assert got is not None
    exp = _scalar_dist(sa, sb)
    for g, e in zip(got, exp):
        assert g == e, (g, e)
    assert got[0] == 0.0 and got[1] == 0.0 and got[2] == 2e-12

    # native shape takes the same snap
    df_a = pd.DataFrame({"xs": [[0.0]], "ys": [[0.0]]})
    df_b = pd.DataFrame({"xs": [[1e-13]], "ys": [[0.0]]})
    got_n = distance_fastpath(df_a, df_b, "point", "point")
    assert got_n is not None and got_n[0] == 0.0


def test_distance_segmentless_geometry_is_null():
    """Review fix (r8): a non-empty but segment-less geometry (single-
    vertex LineString) must yield SQL NULL like the scalar kernel, not
    +Infinity."""
    one_vertex = wkb.dumps(wkb.Geom("LineString", [(1.0, 1.0)]))
    pts = _pt_series([(0.0, 0.0), (5.0, 5.0)])
    gs = pd.Series([one_vertex] * 2, dtype=object)
    got = distance_fastpath(pts, gs, "wkb", "wkb")
    assert got is not None
    exp = _scalar_dist(pts, gs)
    assert exp[0] is None and exp[1] is None
    assert math.isnan(got[0]) and math.isnan(got[1])


def test_random_distance_battery():
    """Randomized differential battery for distance_fastpath: random
    points (half-integer grid for exact vertex/edge hits, plus irrational
    offsets) against random line/polygon shapes — bit-identical to the
    scalar kernel everywhere."""
    rng = random.Random(88)
    shapes = [
        _poly(BOX), _poly(BOX, HOLE), _poly(TRI),
        _mpoly([[BOX], [[(6.0, 6.0), (9.0, 6.0), (9.0, 9.0), (6.0, 6.0)]]]),
        _line([(0.0, 0.0), (4.0, 0.0), (4.0, 4.0)]),
        _line([(0.0, 0.0), (3.0, 3.0)]),
        wkb.dumps(wkb.Geom(
            "MultiLineString",
            [[(0.0, 0.0), (1.0, 0.0)], [(2.0, 2.0), (5.0, 2.0), (5.0, 5.0)]],
        )),
        wkb.dumps(wkb.Geom("LineString", [])),
    ]
    pts, geoms = [], []
    for i in range(600):
        if i % 3 == 0:
            pts.append((rng.randint(-4, 12) / 2, rng.randint(-4, 12) / 2))
        else:
            # genuinely irrational x offsets (scaled by sqrt(2), range kept)
            pts.append(
                (rng.uniform(-1.5, 7.0) * math.sqrt(2), rng.uniform(-2, 10))
            )
        geoms.append(shapes[rng.randrange(len(shapes))])
    sa = _pt_series(pts)
    sb = pd.Series(geoms, dtype=object)
    got = distance_fastpath(sa, sb, "wkb", "wkb")
    assert got is not None
    exp = _scalar_dist(sa, sb)
    for i, (g, e) in enumerate(zip(got, exp)):
        if e is None:
            assert math.isnan(g), (i, g)
        else:
            assert g == e, (i, g, e)


# ---------------------------------------------------------------------------
# round-9: line-batch sweep parity (segment-heavy refine — VERDICT r8 #3)


def _mline(parts):
    return wkb.dumps(wkb.Geom("MultiLineString", [list(p) for p in parts]))


LINE_FACT_SHAPES = [
    _poly(BOX),
    _poly(BOX, HOLE),
    _poly(TRI),
    _mpoly([[BOX], [[(6.0, 6.0), (9.0, 6.0), (9.0, 9.0), (6.0, 6.0)]]]),
    _line([(0.0, 0.0), (4.0, 0.0), (4.0, 4.0)]),
    _mline([[(0.0, 0.0), (1.0, 0.0)], [(2.0, 2.0), (5.0, 2.0), (5.0, 5.0)]]),
    wkb.dumps(wkb.Geom("LineString", [])),  # empty operand
]


def _rand_lines(rng, n):
    """LineString batch: grid + irrational vertices, EPS-shifted edge
    riders, degenerate 1-vertex and empty rows, nulls."""
    out = []
    for i in range(n):
        r = i % 10
        if r == 0:
            out.append(None)
        elif r == 1:
            out.append(_line([]))  # empty
        elif r == 2:
            out.append(_line([(rng.randint(-2, 10) / 2, rng.randint(-2, 10) / 2)]))
        elif r == 3:
            # collinear rider along the BOX bottom edge, within the EPS pad
            x0 = rng.randint(-2, 10) / 2
            out.append(_line([(x0, EPS / 3), (x0 + 1.5, EPS / 3)]))
        else:
            k = rng.randint(2, 6)
            pts = []
            for _ in range(k):
                if rng.random() < 0.5:
                    pts.append(
                        (rng.randint(-4, 12) / 2, rng.randint(-4, 12) / 2)
                    )
                else:
                    pts.append(
                        (
                            rng.uniform(-1.5, 7.0) * math.sqrt(2),
                            rng.uniform(-2.0, 10.0),
                        )
                    )
            out.append(_line(pts))
    return pd.Series(out, dtype=object)


def test_line_battery_predicates_parity():
    rng = random.Random(99)
    lines = _rand_lines(rng, 400)
    geoms = pd.Series(
        [LINE_FACT_SHAPES[rng.randrange(len(LINE_FACT_SHAPES))] for _ in range(400)],
        dtype=object,
    )
    for mode in ("intersects", "disjoint"):
        fn = MODES[mode]
        for a, b in ((lines, geoms), (geoms, lines)):
            got = predicate_fastpath(a, b, mode, "wkb", "wkb")
            assert got is not None, (mode, "fastpath did not engage")
            assert list(got) == _scalar(fn, a, b), mode


def test_line_battery_distance_parity():
    rng = random.Random(77)
    lines = _rand_lines(rng, 400)
    geoms = pd.Series(
        [LINE_FACT_SHAPES[rng.randrange(len(LINE_FACT_SHAPES))] for _ in range(400)],
        dtype=object,
    )
    for a, b in ((lines, geoms), (geoms, lines)):
        got = distance_fastpath(a, b, "wkb", "wkb")
        assert got is not None, "fastpath did not engage"
        exp = _scalar_dist(a, b)
        for i, (g, e) in enumerate(zip(got, exp)):
            if e is None:
                assert math.isnan(g), (i, g)
            else:
                assert g == e, (i, g, e)


def test_line_targeted_topologies():
    """Hand-picked relations: edge-rider, crossing, fully inside, inside
    the hole, vertex-touch, EPS-parallel, far away — both predicates and
    distance, against every factorized shape that exercises the case."""
    cases = [
        _line([(1.0, 0.0), (3.0, 0.0)]),          # along BOX bottom edge
        _line([(2.0, -1.0), (2.0, 5.0)]),         # crosses BOX
        _line([(0.2, 0.2), (0.8, 0.6)]),          # inside BOX (outside HOLE)
        _line([(1.5, 1.5), (2.5, 2.5)]),          # inside the HOLE
        _line([(4.0, 4.0), (6.0, 6.0)]),          # vertex touch at (4,4)
        _line([(0.0, -EPS / 2), (4.0, -EPS / 2)]),  # EPS-parallel to edge
        _line([(20.0, 20.0), (30.0, 30.0)]),      # far away
        _line([(-2.0, -2.0), (-1.0, -2.0)]),      # near but disjoint
    ]
    n = len(cases)
    for shape in LINE_FACT_SHAPES:
        lines = pd.Series(cases, dtype=object)
        geoms = pd.Series([shape] * n, dtype=object)
        for mode in ("intersects", "disjoint"):
            got = predicate_fastpath(lines, geoms, mode, "wkb", "wkb")
            assert got is not None
            assert list(got) == _scalar(MODES[mode], lines, geoms)
        got = distance_fastpath(lines, geoms, "wkb", "wkb")
        assert got is not None
        exp = _scalar_dist(lines, geoms)
        for i, (g, e) in enumerate(zip(got, exp)):
            if e is None:
                assert math.isnan(g), (i, g)
            else:
                assert g == e, (i, g, e)


def test_line_fastpath_fallbacks():
    lines = pd.Series([_line([(0.0, 0.0), (1.0, 1.0)])] * 12, dtype=object)
    # high uniqueness on BOTH sides -> neither orientation factorizes
    # (a duplicate-heavy side on either end legitimately engages the sweep)
    distinct_a = pd.Series(
        [_line([(float(i), 0.0), (i + 1.0, 2.0)]) for i in range(12)],
        dtype=object,
    )
    distinct_b = pd.Series(
        [_line([(float(i), 5.0), (i + 2.0, 7.0)]) for i in range(12)],
        dtype=object,
    )
    assert predicate_fastpath(distinct_a, distinct_b, "intersects", "wkb", "wkb") is None
    assert distance_fastpath(distinct_a, distinct_b, "wkb", "wkb") is None
    # GeometryCollection uniques never FACTORIZE (not a _LINE_FACT_TYPES
    # member) — but since the lines side here is duplicate-heavy, the
    # orientation flips and the GC column engages the r10 mixed BATCH
    # sweep instead, matching the scalar kernel exactly
    gc = pd.Series(
        [wkb.dumps(wkb.Geom("GeometryCollection",
                            [wkb.Geom("Point", (1.0, 1.0))]))] * 12,
        dtype=object,
    )
    got = predicate_fastpath(lines, gc, "intersects", "wkb", "wkb")
    assert got is not None
    assert list(got) == _scalar(geom_ops.intersects, lines, gc)
    # ...and with BOTH sides high-uniqueness GC batches still fall back
    distinct_gc = pd.Series(
        [wkb.dumps(wkb.Geom("GeometryCollection",
                            [wkb.Geom("Point", (float(i), 1.0))]))
         for i in range(12)],
        dtype=object,
    )
    assert (
        predicate_fastpath(distinct_a, distinct_gc, "intersects", "wkb", "wkb")
        is None
    )
    # contains/within now engage when the factorized side is the
    # container (r9c) — and must match the scalar kernel
    box = pd.Series([_poly(BOX)] * 12, dtype=object)
    got = predicate_fastpath(lines, box, "within", "wkb", "wkb")
    assert got is not None
    assert list(got) == _scalar(geom_ops.within, lines, box)
    # ...but NOT when the container side is high-uniqueness (per-row
    # distinct containers don't factorize) — falls back to scalar
    distinct_containers = pd.Series(
        [_poly([(float(i), 0.0), (i + 4.0, 0.0), (i + 4.0, 4.0),
                (float(i), 4.0), (float(i), 0.0)]) for i in range(12)],
        dtype=object,
    )
    assert predicate_fastpath(lines, distinct_containers, "within", "wkb", "wkb") is None
    # NaN-vertex batch -> scalar kernel decides
    nanline = pd.Series(
        [_line([(float("nan"), 0.0), (1.0, 1.0)])] * 12, dtype=object
    )
    assert predicate_fastpath(nanline, box, "intersects", "wkb", "wkb") is None


def test_line_distance_segmentless_factorized_side_is_null():
    """Factorized geometries with no segments (1-vertex line, degenerate
    1-vertex ring): the scalar kernel returns None (best stays inf) — the
    sweep must emit NULL, not infinity (r9 self-review fix)."""
    lines = pd.Series(
        [_line([(0.0, 0.0), (1.0, 1.0)]), _line([(5.0, 5.0), (6.0, 5.0)])] * 6,
        dtype=object,
    )
    for degenerate in (
        _line([(2.0, 2.0)]),
        wkb.dumps(wkb.Geom("Polygon", [[(1.0, 1.0)]])),
    ):
        geoms = pd.Series([degenerate] * 12, dtype=object)
        got = distance_fastpath(lines, geoms, "wkb", "wkb")
        assert got is not None
        exp = _scalar_dist(lines, geoms)
        for i, (g, e) in enumerate(zip(got, exp)):
            if e is None:
                assert math.isnan(g), (i, g)
            else:
                assert g == e, (i, g, e)
        # predicates agree too (False/True, never an error)
        for mode in ("intersects", "disjoint"):
            gotp = predicate_fastpath(lines, geoms, mode, "wkb", "wkb")
            assert gotp is not None
            assert list(gotp) == _scalar(MODES[mode], lines, geoms)


# ---------------------------------------------------------------------------
# round-9b: polygon-batch sweep parity (the batch side is Polygon WKB;
# per-ring segments + both containment probes incl. shell/hole precedence)


def _rand_polys(rng, n):
    """Polygon batch: boxes/triangles on the half-integer grid (exact
    vertex/edge coincidences) and irrational offsets, some with holes,
    degenerate 1-vertex rings, empties, nulls."""
    out = []
    for i in range(n):
        r = i % 12
        if r == 0:
            out.append(None)
        elif r == 1:
            out.append(_poly())  # POLYGON EMPTY
        elif r == 2:
            out.append(wkb.dumps(wkb.Geom("Polygon", [[(2.0, 2.0)]])))
        else:
            if rng.random() < 0.5:
                x0 = rng.randint(-4, 12) / 2
                y0 = rng.randint(-4, 12) / 2
            else:
                x0 = rng.uniform(-2.0, 6.0) * math.sqrt(2)
                y0 = rng.uniform(-2.0, 8.0)
            w = rng.randint(1, 8) / 2
            h = rng.randint(1, 8) / 2
            shell = [(x0, y0), (x0 + w, y0), (x0 + w, y0 + h),
                     (x0, y0 + h), (x0, y0)]
            rings = [shell]
            if r % 3 == 0 and w >= 1.0 and h >= 1.0:
                rings.append([
                    (x0 + w / 4, y0 + h / 4), (x0 + 3 * w / 4, y0 + h / 4),
                    (x0 + 3 * w / 4, y0 + 3 * h / 4),
                    (x0 + w / 4, y0 + 3 * h / 4), (x0 + w / 4, y0 + h / 4),
                ])
            out.append(_poly(*rings))
    return pd.Series(out, dtype=object)


def test_polygon_batch_predicates_parity():
    rng = random.Random(55)
    polys = _rand_polys(rng, 400)
    geoms = pd.Series(
        [LINE_FACT_SHAPES[rng.randrange(len(LINE_FACT_SHAPES))] for _ in range(400)],
        dtype=object,
    )
    for mode in ("intersects", "disjoint"):
        fn = MODES[mode]
        for a, b in ((polys, geoms), (geoms, polys)):
            got = predicate_fastpath(a, b, mode, "wkb", "wkb")
            assert got is not None, (mode, "fastpath did not engage")
            assert list(got) == _scalar(fn, a, b), mode


def test_polygon_batch_distance_parity():
    rng = random.Random(66)
    polys = _rand_polys(rng, 400)
    geoms = pd.Series(
        [LINE_FACT_SHAPES[rng.randrange(len(LINE_FACT_SHAPES))] for _ in range(400)],
        dtype=object,
    )
    for a, b in ((polys, geoms), (geoms, polys)):
        got = distance_fastpath(a, b, "wkb", "wkb")
        assert got is not None, "fastpath did not engage"
        exp = _scalar_dist(a, b)
        for i, (g, e) in enumerate(zip(got, exp)):
            if e is None:
                assert math.isnan(g), (i, g)
            else:
                assert g == e, (i, g, e)


def test_polygon_batch_containment_topologies():
    """The cases only probe 2 can decide: the factorized geometry entirely
    INSIDE a batch polygon (no edge crossing), inside its hole, a small
    line in the hole, plus a tiny factorized polygon CONTAINING a batch
    polygon (probe 1 direction)."""
    rows = [
        _poly(BOX),                       # g inside -> probe 2
        _poly(BOX, HOLE),                 # g inside the hole -> disjoint
        _poly([(1.9, 1.9), (2.1, 1.9), (2.1, 2.1), (1.9, 2.1), (1.9, 1.9)]),
        # tiny polygon inside g's interior -> probe 1
        _poly([(100.0, 100.0), (101.0, 100.0), (101.0, 101.0), (100.0, 100.0)]),
        None,
        _poly(),
    ]
    inner_line = _line([(1.8, 1.8), (2.2, 2.2)])     # crosses HOLE boundary rgn
    inner_poly = _poly([(1.5, 1.5), (2.5, 1.5), (2.5, 2.5), (1.5, 2.5), (1.5, 1.5)])
    big_poly = _poly([(-10.0, -10.0), (110.0, -10.0), (110.0, 110.0),
                      (-10.0, 110.0), (-10.0, -10.0)])
    for fact in (inner_line, inner_poly, big_poly):
        a = pd.Series(rows, dtype=object)
        b = pd.Series([fact] * len(rows), dtype=object)
        for mode in ("intersects", "disjoint"):
            got = predicate_fastpath(a, b, mode, "wkb", "wkb")
            assert got is not None
            assert list(got) == _scalar(MODES[mode], a, b), (mode, fact[:20])
        got = distance_fastpath(a, b, "wkb", "wkb")
        assert got is not None
        exp = _scalar_dist(a, b)
        for i, (g, e) in enumerate(zip(got, exp)):
            if e is None:
                assert math.isnan(g), (i, g)
            else:
                assert g == e, (i, g, e)


# ---------------------------------------------------------------------------
# round-9c: contains/within with the factorized side as container


def test_containment_line_and_polygon_batches_parity():
    rng = random.Random(44)
    lines = _rand_lines(rng, 300)
    polys = _rand_polys(rng, 300)
    containers = [
        _poly(BOX),
        _poly(BOX, HOLE),
        _poly(TRI),
        _mpoly([[BOX], [[(6.0, 6.0), (9.0, 6.0), (9.0, 9.0), (6.0, 6.0)]]]),
        _line([(0.0, 0.0), (4.0, 0.0), (4.0, 4.0)]),
        _mline([[(0.0, 0.0), (4.0, 4.0)], [(0.0, 4.0), (4.0, 0.0)]]),
        wkb.dumps(wkb.Geom("Polygon", [])),
    ]
    for batch in (lines, polys):
        cont = pd.Series(
            [containers[rng.randrange(len(containers))] for _ in range(300)],
            dtype=object,
        )
        # contains(container, batch) and within(batch, container)
        got = predicate_fastpath(cont, batch, "contains", "wkb", "wkb")
        assert got is not None, "containment sweep did not engage"
        assert list(got) == _scalar(geom_ops.contains, cont, batch)
        got = predicate_fastpath(batch, cont, "within", "wkb", "wkb")
        assert got is not None
        assert list(got) == _scalar(geom_ops.within, batch, cont)


def test_containment_targeted_topologies():
    """Interior, boundary-riding (all-boundary fallback), crossing out,
    inside-the-hole, line-on-line, line-off-line — vs the scalar kernel."""
    box = _poly(BOX)
    boxhole = _poly(BOX, HOLE)
    diag = _line([(0.0, 0.0), (4.0, 4.0)])
    line_cases = [
        # (container, containee) — batch side all LineStrings (the sweep
        # requires a uniform-gtype batch)
        (box, _line([(0.5, 0.5), (1.5, 0.5)])),        # strictly inside
        (box, _line([(0.0, 0.0), (4.0, 0.0)])),        # rides the boundary
        (box, _line([(2.0, 2.0), (6.0, 2.0)])),        # crosses out
        (boxhole, _line([(1.5, 1.5), (2.5, 2.5)])),    # inside the hole
        (boxhole, _line([(0.5, 0.5), (0.5, 3.5)])),    # in the ring area
        (diag, _line([(1.0, 1.0), (2.0, 2.0)])),       # sub-line of a line
        (diag, _line([(1.0, 1.0), (2.0, 2.5)])),       # leaves the line
        (box, _line([])),                               # empty containee
        (box, None),                                    # null containee
    ]
    poly_cases = [
        (box, _poly([(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0)])),
        (box, box),                                     # equal polygons
        (boxhole, _poly(HOLE)),                         # b == the hole ring
        (boxhole, boxhole),                             # holed self-containment
        (box, _poly()),                                 # empty containee
    ]
    for cases in (line_cases, poly_cases):
        cont = pd.Series([c for c, _ in cases], dtype=object)
        batch = pd.Series([b for _, b in cases], dtype=object)
        got = predicate_fastpath(cont, batch, "contains", "wkb", "wkb")
        assert got is not None
        assert list(got) == _scalar(geom_ops.contains, cont, batch)
        got = predicate_fastpath(batch, cont, "within", "wkb", "wkb")
        assert got is not None
        assert list(got) == _scalar(geom_ops.within, batch, cont)


# ---------------------------------------------------------------------------
# round-9d: MultiLineString / MultiPolygon BATCHES take the sweep too


def _rand_mlines(rng, n):
    out = []
    for i in range(n):
        r = i % 10
        if r == 0:
            out.append(None)
        elif r == 1:
            out.append(_mline([]))  # MULTILINESTRING EMPTY
        elif r == 2:
            # degenerate single-vertex part next to a real part
            out.append(_mline([[(1.0, 1.0)], [(0.0, 0.0), (2.0, 2.0)]]))
        else:
            parts = []
            for _ in range(rng.randint(1, 3)):
                k = rng.randint(2, 4)
                parts.append([
                    (rng.randint(-4, 12) / 2, rng.randint(-4, 12) / 2)
                    if rng.random() < 0.5
                    else (rng.uniform(-1.5, 7.0) * math.sqrt(2),
                          rng.uniform(-2.0, 10.0))
                    for _ in range(k)
                ])
            out.append(_mline(parts))
    return pd.Series(out, dtype=object)


def _rand_mpolys(rng, n):
    out = []
    for i in range(n):
        r = i % 10
        if r == 0:
            out.append(None)
        elif r == 1:
            out.append(_mpoly([]))  # MULTIPOLYGON EMPTY
        else:
            polys = []
            for _ in range(rng.randint(1, 3)):
                if rng.random() < 0.5:
                    x0 = rng.randint(-4, 12) / 2
                    y0 = rng.randint(-4, 12) / 2
                else:
                    x0 = rng.uniform(-2.0, 6.0) * math.sqrt(2)
                    y0 = rng.uniform(-2.0, 8.0)
                w = rng.randint(1, 6) / 2
                h = rng.randint(1, 6) / 2
                shell = [(x0, y0), (x0 + w, y0), (x0 + w, y0 + h),
                         (x0, y0 + h), (x0, y0)]
                rings = [shell]
                if r % 4 == 0 and w >= 1.0 and h >= 1.0:
                    rings.append([
                        (x0 + w / 4, y0 + h / 4),
                        (x0 + 3 * w / 4, y0 + h / 4),
                        (x0 + 3 * w / 4, y0 + 3 * h / 4),
                        (x0 + w / 4, y0 + 3 * h / 4),
                        (x0 + w / 4, y0 + h / 4),
                    ])
                polys.append(rings)
            out.append(_mpoly(polys))
    return pd.Series(out, dtype=object)


@pytest.mark.parametrize("maker", [_rand_mlines, _rand_mpolys])
def test_multi_batch_predicates_and_distance_parity(maker):
    rng = random.Random(hash(maker.__name__) % 1000)
    batch = maker(rng, 300)
    geoms = pd.Series(
        [LINE_FACT_SHAPES[rng.randrange(len(LINE_FACT_SHAPES))] for _ in range(300)],
        dtype=object,
    )
    for mode in ("intersects", "disjoint"):
        for a, b in ((batch, geoms), (geoms, batch)):
            got = predicate_fastpath(a, b, mode, "wkb", "wkb")
            assert got is not None, (mode, "did not engage")
            assert list(got) == _scalar(MODES[mode], a, b), mode
    for a, b in ((batch, geoms), (geoms, batch)):
        got = distance_fastpath(a, b, "wkb", "wkb")
        assert got is not None
        exp = _scalar_dist(a, b)
        for i, (g, e) in enumerate(zip(got, exp)):
            if e is None:
                assert math.isnan(g), (i, g)
            else:
                assert g == e, (i, g, e)


@pytest.mark.parametrize("maker", [_rand_mlines, _rand_mpolys])
def test_multi_batch_containment_parity(maker):
    rng = random.Random(13)
    batch = maker(rng, 200)
    for cont_bytes in (_poly(BOX), _poly(BOX, HOLE),
                       _line([(0.0, 0.0), (4.0, 4.0)])):
        cont = pd.Series([cont_bytes] * 200, dtype=object)
        got = predicate_fastpath(cont, batch, "contains", "wkb", "wkb")
        assert got is not None
        assert list(got) == _scalar(geom_ops.contains, cont, batch)
        got = predicate_fastpath(batch, cont, "within", "wkb", "wkb")
        assert got is not None
        assert list(got) == _scalar(geom_ops.within, batch, cont)


def test_multi_batch_component_probes():
    """The cases only per-COMPONENT representatives get right: a
    MultiLineString whose SECOND part is inside the polygon (first part
    far away → crossing-free), and a MultiPolygon whose second member
    contains the factorized geometry."""
    mls = _mline([[(100.0, 100.0), (101.0, 101.0)], [(1.0, 1.0), (1.5, 1.5)]])
    box_wkb = _poly([(0.0, 0.0), (3.0, 0.0), (3.0, 3.0), (0.0, 3.0), (0.0, 0.0)])
    a = pd.Series([mls] * 6, dtype=object)
    b = pd.Series([box_wkb] * 6, dtype=object)
    got = predicate_fastpath(a, b, "intersects", "wkb", "wkb")
    assert got is not None and list(got) == [True] * 6
    assert _scalar(geom_ops.intersects, a, b) == [True] * 6

    mp = _mpoly([
        [[(50.0, 50.0), (51.0, 50.0), (51.0, 51.0), (50.0, 50.0)]],
        [[(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]],
    ])
    tiny = _line([(4.0, 4.0), (5.0, 5.0)])  # inside the SECOND member
    a = pd.Series([mp] * 6, dtype=object)
    b = pd.Series([tiny] * 6, dtype=object)
    for mode in ("intersects", "disjoint"):
        got = predicate_fastpath(a, b, mode, "wkb", "wkb")
        assert got is not None
        assert list(got) == _scalar(MODES[mode], a, b)
    got = distance_fastpath(a, b, "wkb", "wkb")
    assert got is not None and list(got) == [0.0] * 6


# ---------------------------------------------------------------------------
# round-9e: MultiPoint batches (isolated member points: on-segment + locate
# probes, point_seg_dist2 distance fold)


def _mpt(pts):
    return wkb.dumps(wkb.Geom("MultiPoint", [tuple(p) for p in pts]))


def _rand_mpts(rng, n):
    out = []
    for i in range(n):
        r = i % 10
        if r == 0:
            out.append(None)
        elif r == 1:
            out.append(_mpt([]))  # MULTIPOINT EMPTY
        elif r == 2:
            # a member exactly on the BOX edge + one inside the HOLE
            out.append(_mpt([(2.0, 0.0), (2.0, 2.0)]))
        else:
            out.append(_mpt([
                (rng.randint(-4, 12) / 2, rng.randint(-4, 12) / 2)
                if rng.random() < 0.5
                else (rng.uniform(-1.5, 7.0) * math.sqrt(2),
                      rng.uniform(-2.0, 10.0))
                for _ in range(rng.randint(1, 4))
            ]))
    return pd.Series(out, dtype=object)


def test_multipoint_batch_predicates_and_distance_parity():
    rng = random.Random(21)
    batch = _rand_mpts(rng, 300)
    geoms = pd.Series(
        [LINE_FACT_SHAPES[rng.randrange(len(LINE_FACT_SHAPES))] for _ in range(300)],
        dtype=object,
    )
    for mode in ("intersects", "disjoint"):
        for a, b in ((batch, geoms), (geoms, batch)):
            got = predicate_fastpath(a, b, mode, "wkb", "wkb")
            assert got is not None, (mode, "did not engage")
            assert list(got) == _scalar(MODES[mode], a, b), mode
    for a, b in ((batch, geoms), (geoms, batch)):
        got = distance_fastpath(a, b, "wkb", "wkb")
        assert got is not None
        exp = _scalar_dist(a, b)
        for i, (g, e) in enumerate(zip(got, exp)):
            if e is None:
                assert math.isnan(g), (i, g)
            else:
                assert g == e, (i, g, e)


def test_multipoint_batch_containment_parity():
    rng = random.Random(23)
    batch = _rand_mpts(rng, 200)
    for cont_bytes in (_poly(BOX), _poly(BOX, HOLE),
                       _line([(0.0, 0.0), (4.0, 4.0)])):
        cont = pd.Series([cont_bytes] * 200, dtype=object)
        got = predicate_fastpath(cont, batch, "contains", "wkb", "wkb")
        assert got is not None
        assert list(got) == _scalar(geom_ops.contains, cont, batch)
        got = predicate_fastpath(batch, cont, "within", "wkb", "wkb")
        assert got is not None
        assert list(got) == _scalar(geom_ops.within, batch, cont)


# ---------------------------------------------------------------------------
# round-10: GeometryCollection batch sides complete the sweep's type matrix


def _gc(members):
    return wkb.dumps(wkb.Geom("GeometryCollection", list(members)))


def _rand_gcs(rng, n):
    """Uniform GeometryCollection batches with heterogeneous members —
    points, lines, polygons (with holes), all three multi types, NESTED
    collections, empty members, GEOMETRYCOLLECTION EMPTY, and nulls."""

    def rand_coord():
        return (
            (rng.randint(-4, 12) / 2, rng.randint(-4, 12) / 2)
            if rng.random() < 0.5
            else (rng.uniform(-1.5, 7.0) * math.sqrt(2), rng.uniform(-2.0, 10.0))
        )

    def rand_pt():
        return wkb.Geom("Point", rand_coord())

    def rand_line():
        return wkb.Geom(
            "LineString", [rand_coord() for _ in range(rng.randint(1, 4))]
        )

    def rand_poly():
        x0, y0 = rand_coord()
        w, h = rng.randint(1, 6) / 2, rng.randint(1, 6) / 2
        rings = [[(x0, y0), (x0 + w, y0), (x0 + w, y0 + h),
                  (x0, y0 + h), (x0, y0)]]
        if rng.random() < 0.3 and w >= 1.0 and h >= 1.0:
            rings.append([
                (x0 + w / 4, y0 + h / 4), (x0 + 3 * w / 4, y0 + h / 4),
                (x0 + 3 * w / 4, y0 + 3 * h / 4), (x0 + w / 4, y0 + 3 * h / 4),
                (x0 + w / 4, y0 + h / 4),
            ])
        return wkb.Geom("Polygon", rings)

    def rand_multi():
        k = rng.randint(1, 2)
        t = rng.randrange(3)
        if t == 0:
            return wkb.Geom("MultiPoint", [rand_coord() for _ in range(k + 1)])
        if t == 1:
            return wkb.Geom(
                "MultiLineString", [rand_line().coords for _ in range(k)]
            )
        return wkb.Geom("MultiPolygon", [rand_poly().coords for _ in range(k)])

    def rand_member():
        r = rng.random()
        if r < 0.25:
            return rand_pt()
        if r < 0.5:
            return rand_line()
        if r < 0.75:
            return rand_poly()
        return rand_multi()

    out = []
    for i in range(n):
        r = i % 12
        if r == 0:
            out.append(None)
        elif r == 1:
            out.append(_gc([]))  # GEOMETRYCOLLECTION EMPTY
        elif r == 2:
            # empty members only (no coordinates at all)
            out.append(_gc([wkb.Geom("LineString", []),
                            wkb.Geom("Polygon", []),
                            wkb.Geom("MultiPoint", [])]))
        elif r == 3:
            # nested collection + a sibling: flattening must be exact
            out.append(_gc([
                wkb.Geom("GeometryCollection", [rand_member(), rand_pt()]),
                rand_line(),
            ]))
        elif r == 4:
            # degenerate 1-vertex line member next to a real polygon
            out.append(_gc([
                wkb.Geom("LineString", [rand_coord()]), rand_poly(),
            ]))
        else:
            out.append(_gc([rand_member() for _ in range(rng.randint(1, 3))]))
    return pd.Series(out, dtype=object)


def test_gc_batch_predicates_and_distance_parity():
    rng = random.Random(29)
    batch = _rand_gcs(rng, 300)
    geoms = pd.Series(
        [LINE_FACT_SHAPES[rng.randrange(len(LINE_FACT_SHAPES))] for _ in range(300)],
        dtype=object,
    )
    for mode in ("intersects", "disjoint"):
        for a, b in ((batch, geoms), (geoms, batch)):
            got = predicate_fastpath(a, b, mode, "wkb", "wkb")
            assert got is not None, (mode, "did not engage")
            assert list(got) == _scalar(MODES[mode], a, b), mode
    for a, b in ((batch, geoms), (geoms, batch)):
        got = distance_fastpath(a, b, "wkb", "wkb")
        assert got is not None
        exp = _scalar_dist(a, b)
        for i, (g, e) in enumerate(zip(got, exp)):
            if e is None:
                assert math.isnan(g), (i, g)
            else:
                assert g == e, (i, g, e)


def test_gc_batch_containment_parity():
    rng = random.Random(31)
    batch = _rand_gcs(rng, 200)
    for cont_bytes in (_poly(BOX), _poly(BOX, HOLE),
                       _line([(0.0, 0.0), (4.0, 4.0)])):
        cont = pd.Series([cont_bytes] * 200, dtype=object)
        got = predicate_fastpath(cont, batch, "contains", "wkb", "wkb")
        assert got is not None
        assert list(got) == _scalar(geom_ops.contains, cont, batch)
        got = predicate_fastpath(batch, cont, "within", "wkb", "wkb")
        assert got is not None
        assert list(got) == _scalar(geom_ops.within, batch, cont)


def test_gc_targeted_topologies():
    """The decisions only specific probe classes get right: an isolated
    point member ON the factorized line / INSIDE the polygon (no segment
    crossing), a second member wholly inside the region, a GC polygon
    member CONTAINING the factorized geometry, and a point-only GC."""
    box_wkb = _poly(BOX)
    cases = [
        _gc([wkb.Geom("Point", (2.0, 2.0))]),             # pt inside box
        _gc([wkb.Geom("Point", (2.0, 0.0))]),             # pt on box edge
        _gc([wkb.Geom("Point", (50.0, 50.0))]),           # far pt
        _gc([wkb.Geom("LineString", [(50.0, 50.0), (51.0, 51.0)]),
             wkb.Geom("Point", (1.0, 1.0))]),             # 2nd member inside
        _gc([wkb.Geom("Polygon", [[(-10.0, -10.0), (20.0, -10.0),
                                   (20.0, 20.0), (-10.0, 20.0),
                                   (-10.0, -10.0)]])]),   # member engulfs box
        _gc([wkb.Geom("MultiPoint", [(0.5, 0.5), (60.0, 60.0)])]),
    ]
    n = 6
    for case in cases:
        a = pd.Series([case] * n, dtype=object)
        b = pd.Series([box_wkb] * n, dtype=object)
        for mode in ("intersects", "disjoint"):
            for x, y in ((a, b), (b, a)):
                got = predicate_fastpath(x, y, mode, "wkb", "wkb")
                assert got is not None
                assert list(got) == _scalar(MODES[mode], x, y), (mode, case[:20])
        got = distance_fastpath(a, b, "wkb", "wkb")
        assert got is not None
        exp = _scalar_dist(a, b)
        for g, e in zip(got, exp):
            assert (e is None and math.isnan(g)) or g == e, (case[:20], g, e)


GC_FACT_SHAPES = [
    # line/poly-only collections: legal factorized-side uniques (r10)
    _gc([wkb.Geom("Polygon", [BOX]), wkb.Geom("LineString", [(6.0, 6.0), (9.0, 9.0)])]),
    _gc([wkb.Geom("Polygon", [BOX, HOLE])]),
    _gc([wkb.Geom("MultiLineString", [[(0.0, 0.0), (4.0, 0.0)], [(1.0, 5.0), (5.0, 5.0)]]),
         wkb.Geom("GeometryCollection", [wkb.Geom("Polygon", [TRI])])]),  # nested
    _gc([]),  # GEOMETRYCOLLECTION EMPTY
    # r11 (VERDICT r10 #3): point-leaf collections engage too — the
    # kernel's point-member tests ride the sweep (EPS point-point,
    # on-segment vs the batch, probe-2 containment)
    _gc([wkb.Geom("Polygon", [BOX]), wkb.Geom("Point", (2.0, 2.0))]),
    _gc([wkb.Geom("MultiPoint", [(0.0, 0.0), (6.0, 6.0)]),
         wkb.Geom("LineString", [(1.0, 5.0), (5.0, 5.0)])]),
    _gc([wkb.Geom("Point", (2.0, 0.0)),
         wkb.Geom("GeometryCollection", [wkb.Geom("Point", (3.5, 3.5))])]),
]


def test_gc_factorized_side_predicates_and_distance_parity():
    """r10: line/poly-only GeometryCollection UNIQUES on the factorized
    side engage the sweep (segments + the kernel's partial _polygons
    recursion for both probes); r11 removes the last gate — point-leaf
    collections (three GC_FACT_SHAPES entries) ride the same battery."""
    rng = random.Random(43)
    for maker in (_rand_lines, _rand_polys, _rand_gcs, _rand_mpts):
        batch = maker(rng, 200)
        fact = pd.Series(
            [GC_FACT_SHAPES[rng.randrange(len(GC_FACT_SHAPES))] for _ in range(200)],
            dtype=object,
        )
        for mode in ("intersects", "disjoint"):
            for a, b in ((batch, fact), (fact, batch)):
                got = predicate_fastpath(a, b, mode, "wkb", "wkb")
                assert got is not None, (maker.__name__, mode, "did not engage")
                assert list(got) == _scalar(MODES[mode], a, b), (maker.__name__, mode)
        for a, b in ((batch, fact), (fact, batch)):
            got = distance_fastpath(a, b, "wkb", "wkb")
            assert got is not None, maker.__name__
            exp = _scalar_dist(a, b)
            for i, (g, e) in enumerate(zip(got, exp)):
                if e is None:
                    assert math.isnan(g), (maker.__name__, i, g)
                else:
                    assert g == e, (maker.__name__, i, g, e)


def test_gc_factorized_container_containment_parity():
    rng = random.Random(47)
    # container: GC with a polygon member (kernel's polygonal branch) AND
    # a line member the kernel's contains() ignores
    cont_bytes = _gc([
        wkb.Geom("Polygon", [[(-.5, -.5), (4.5, -.5), (4.5, 4.5), (-.5, 4.5), (-.5, -.5)]]),
        wkb.Geom("LineString", [(50.0, 50.0), (60.0, 60.0)]),
    ])
    for maker in (_rand_lines, _rand_polys, _rand_gcs):
        batch = maker(rng, 150)
        cont = pd.Series([cont_bytes] * 150, dtype=object)
        got = predicate_fastpath(cont, batch, "contains", "wkb", "wkb")
        assert got is not None, maker.__name__
        assert list(got) == _scalar(geom_ops.contains, cont, batch), maker.__name__
        got = predicate_fastpath(batch, cont, "within", "wkb", "wkb")
        assert got is not None, maker.__name__
        assert list(got) == _scalar(geom_ops.within, batch, cont), maker.__name__
    # line-only GC container: kernel contains() returns False for the GC
    # type — the sweep's default-False path must agree
    line_gc = _gc([wkb.Geom("LineString", [(0.0, 0.0), (4.0, 4.0)])])
    batch = _rand_lines(rng, 60)
    cont = pd.Series([line_gc] * 60, dtype=object)
    got = predicate_fastpath(cont, batch, "contains", "wkb", "wkb")
    assert got is not None
    assert list(got) == _scalar(geom_ops.contains, cont, batch)
    # r11: a container with POINT leaves alongside its polygon — the
    # kernel's polygonal branch ignores them; the sweep must too
    pt_cont = pd.Series([_gc([
        wkb.Geom("Polygon", [[(-.5, -.5), (4.5, -.5), (4.5, 4.5), (-.5, 4.5), (-.5, -.5)]]),
        wkb.Geom("Point", (100.0, 100.0)),
    ])] * 60, dtype=object)
    for maker in (_rand_lines, _rand_polys):
        b2 = maker(rng, 60)
        got = predicate_fastpath(pt_cont, b2, "contains", "wkb", "wkb")
        assert got is not None, maker.__name__
        assert list(got) == _scalar(geom_ops.contains, pt_cont, b2)


def test_point_batch_vs_gc_factorized_parity_and_gates():
    pts = _pt_series([(2.0, 2.0), (2.0, 0.0), (50.0, 50.0), (2.5, 2.5),
                      (1.0, 1.0), None] * 20)
    # all-polygonal GC: the point predicate AND distance paths engage
    poly_gc = _gc([wkb.Geom("Polygon", [BOX, HOLE]),
                   wkb.Geom("MultiPolygon", [[TRI]])])
    fact = pd.Series([poly_gc] * 120, dtype=object)
    for mode in ("intersects", "disjoint", "within"):
        sa, sb = (pts, fact) if mode != "contains" else (fact, pts)
        got = predicate_fastpath(sa, sb, mode, "wkb", "wkb")
        assert got is not None, mode
        assert list(got) == _scalar(MODES[mode], sa, sb), mode
    got = distance_fastpath(pts, fact, "wkb", "wkb")
    assert got is not None
    exp = _scalar_dist(pts, fact)
    for g, e in zip(got, exp):
        assert (e is None and math.isnan(g)) or g == e
    # MIXED line+poly GC: distance engages (segments + partial polys,
    # incl. zeroing for points INSIDE the polygon member) ...
    mixed_gc = _gc([wkb.Geom("Polygon", [BOX]),
                    wkb.Geom("LineString", [(10.0, 10.0), (20.0, 20.0)])])
    factm = pd.Series([mixed_gc] * 120, dtype=object)
    got = distance_fastpath(pts, factm, "wkb", "wkb")
    assert got is not None
    exp = _scalar_dist(pts, factm)
    for g, e in zip(got, exp):
        assert (e is None and math.isnan(g)) or g == e
    # r11 (VERDICT r10 #3): the point PREDICATE path now engages for
    # mixed collections too — line-member segments get the kernel's
    # _on_segment test, point leaves the EPS point-point window
    for mode in ("intersects", "disjoint", "within"):
        sa, sb = (pts, factm) if mode != "contains" else (factm, pts)
        got = predicate_fastpath(sa, sb, mode, "wkb", "wkb")
        assert got is not None, mode
        assert list(got) == _scalar(MODES[mode], sa, sb), mode
    # point-leaf GC on the factorized side: ALL paths engage (r11)
    pt_gc = _gc([wkb.Geom("Polygon", [BOX]), wkb.Geom("Point", (1.0, 1.0))])
    factp = pd.Series([pt_gc] * 120, dtype=object)
    lines = _rand_lines(random.Random(3), 120)
    got = predicate_fastpath(lines, factp, "intersects", "wkb", "wkb")
    assert got is not None
    assert list(got) == _scalar(MODES["intersects"], lines, factp)
    got = distance_fastpath(pts, factp, "wkb", "wkb")
    assert got is not None
    exp = _scalar_dist(pts, factp)
    for g, e in zip(got, exp):
        assert (e is None and math.isnan(g)) or g == e


def test_gc_flat_coords_and_bbox_parity():
    """flat_coords_batch on a GC batch: the vertex stream/counts match the
    per-row codec, and the st_bbox consumer path gives the kernel bbox."""
    from datafusion_spatial_spark.functions._fastpath import flat_coords_batch

    rng = random.Random(37)
    batch = _rand_gcs(rng, 200)
    flat = flat_coords_batch(batch)
    assert flat is not None
    xs, ys, counts = flat
    pos = 0
    for i, v in enumerate(batch):
        if v is None:
            assert counts[i] == 0
            continue
        g = wkb.loads(bytes(v))
        exp = [(p[0], p[1]) for p in geom_ops._all_coords(g)]
        assert counts[i] == len(exp), i
        got = list(zip(xs[pos : pos + counts[i]], ys[pos : pos + counts[i]]))
        assert got == exp, i
        pos += counts[i]


# ---------------------------------------------------------------------------
# round-10: native flat-offsets struct batches route into the same sweep
# (VERDICT r9 #4) — the _prep shape is already coordinate arrays, so the
# structure tables build with no WKB decode at all.

_NATIVE_DEPTH_T = {
    "LineString": 1, "MultiPoint": 1,
    "Polygon": 2, "MultiLineString": 2, "MultiPolygon": 3,
}


def _native_df(series_of_wkb, tname):
    """Convert a WKB batch into the native flat-offsets struct DataFrame
    _prep ships to the UDF (xs/ys [+ring_counts/part_counts])."""
    depth = _NATIVE_DEPTH_T[tname]
    rows = {"xs": [], "ys": []}
    if depth >= 2:
        rows["ring_counts"] = []
    if depth == 3:
        rows["part_counts"] = []
    for v in series_of_wkb:
        if v is None:
            for k in rows:
                rows[k].append(None)
            continue
        g = wkb.loads(bytes(v))
        if depth == 1:
            pts, rc, pc = list(g.coords), None, None
        elif depth == 2:
            pts = [p for ring in g.coords for p in ring]
            rc, pc = [len(r) for r in g.coords], None
        else:
            pts = [p for poly in g.coords for ring in poly for p in ring]
            rc = [len(r) for poly in g.coords for r in poly]
            pc = [len(poly) for poly in g.coords]
        rows["xs"].append(np.array([p[0] for p in pts], np.float64))
        rows["ys"].append(np.array([p[1] for p in pts], np.float64))
        if depth >= 2:
            rows["ring_counts"].append(np.array(rc, np.int64))
        if depth == 3:
            rows["part_counts"].append(np.array(pc, np.int64))
    return pd.DataFrame(rows)


_NATIVE_MAKERS = [
    ("LineString", _rand_lines),
    ("Polygon", _rand_polys),
    ("MultiLineString", _rand_mlines),
    ("MultiPolygon", _rand_mpolys),
    ("MultiPoint", _rand_mpts),
]


@pytest.mark.parametrize("tname,maker", _NATIVE_MAKERS)
def test_native_batch_predicates_and_distance_parity(tname, maker):
    rng = random.Random(hash(tname) % 700)
    wkb_batch = maker(rng, 300)
    native = _native_df(wkb_batch, tname)
    nk = f"native:{tname}"
    geoms = pd.Series(
        [LINE_FACT_SHAPES[rng.randrange(len(LINE_FACT_SHAPES))] for _ in range(300)],
        dtype=object,
    )
    for mode in ("intersects", "disjoint"):
        for (a, ka), (b, kb) in (
            ((native, nk), (geoms, "wkb")),
            ((geoms, "wkb"), (native, nk)),
        ):
            got = predicate_fastpath(a, b, mode, ka, kb)
            assert got is not None, (tname, mode, "did not engage")
            sa = wkb_batch if ka == nk else geoms
            sb = wkb_batch if kb == nk else geoms
            assert list(got) == _scalar(MODES[mode], sa, sb), (tname, mode)
    for (a, ka), (b, kb) in (
        ((native, nk), (geoms, "wkb")),
        ((geoms, "wkb"), (native, nk)),
    ):
        got = distance_fastpath(a, b, ka, kb)
        assert got is not None, tname
        exp = _scalar_dist(wkb_batch, geoms)
        for i, (g, e) in enumerate(zip(got, exp)):
            if e is None:
                assert math.isnan(g), (tname, i, g)
            else:
                assert g == e, (tname, i, g, e)


@pytest.mark.parametrize("tname,maker", _NATIVE_MAKERS)
def test_native_batch_containment_parity(tname, maker):
    rng = random.Random(hash(tname) % 900)
    wkb_batch = maker(rng, 200)
    native = _native_df(wkb_batch, tname)
    nk = f"native:{tname}"
    for cont_bytes in (_poly(BOX), _poly(BOX, HOLE),
                       _line([(0.0, 0.0), (4.0, 4.0)])):
        cont = pd.Series([cont_bytes] * 200, dtype=object)
        got = predicate_fastpath(cont, native, "contains", "wkb", nk)
        assert got is not None, tname
        assert list(got) == _scalar(geom_ops.contains, cont, wkb_batch), tname
        got = predicate_fastpath(native, cont, "within", nk, "wkb")
        assert got is not None, tname
        assert list(got) == _scalar(geom_ops.within, wkb_batch, cont), tname


def test_native_batch_fallback_gates():
    from datafusion_spatial_spark.functions._fastpath import (
        _native_sweep_batch,
    )

    # Z column present -> participates since r11 (xs/ys-only projection,
    # matching the scalar kernels' force2d)
    df = pd.DataFrame({
        "xs": [np.array([0.0, 1.0])], "ys": [np.array([0.0, 1.0])],
        "zs": [np.array([0.0, 0.0])],
    })
    assert _native_sweep_batch(df, "LineString") is not None
    # NaN vertex -> scalar path decides parity
    df = pd.DataFrame({
        "xs": [np.array([float("nan"), 1.0])], "ys": [np.array([0.0, 1.0])],
    })
    assert _native_sweep_batch(df, "LineString") is None
    # inconsistent ring_counts -> fall back, never mis-slice
    df = pd.DataFrame({
        "xs": [np.array([0.0, 1.0, 1.0, 0.0])],
        "ys": [np.array([0.0, 0.0, 1.0, 0.0])],
        "ring_counts": [np.array([3])],
    })
    assert _native_sweep_batch(df, "Polygon") is None
    # all-null batch
    df = pd.DataFrame({"xs": [None, None], "ys": [None, None]})
    assert _native_sweep_batch(df, "LineString") is None


# ---------------------------------------------------------------------------
# round-9f: vectorized st_area / st_length (sequential-order folds)

from datafusion_spatial_spark.functions._fastpath import measure_fastpath


@pytest.mark.parametrize("maker", [
    _rand_lines, _rand_polys, _rand_mlines, _rand_mpolys, _rand_mpts,
    _rand_gcs,
])
def test_measure_fastpath_parity(maker):
    rng = random.Random(hash(maker.__name__) % 500)
    batch = maker(rng, 300)
    for mode, fn in (("area", geom_ops.area), ("length", geom_ops.length),
                     ("perimeter", geom_ops.perimeter)):
        got = measure_fastpath(batch, mode)
        assert got is not None, (maker.__name__, mode, "did not engage")
        exp = [
            None if v is None else fn(wkb.loads(bytes(v))) for v in batch
        ]
        for i, (g, e) in enumerate(zip(got, exp)):
            if e is None:
                assert math.isnan(g), (mode, i, g)
            else:
                assert g == e, (mode, i, g, e)  # BIT-exact, not approx


def test_measure_fastpath_known_values():
    vals = pd.Series([
        _poly(BOX),                      # area 16, length 0
        _poly(BOX, HOLE),                # area 16-4=12
        _line([(0.0, 0.0), (3.0, 4.0)]),
    ], dtype=object)
    # mixed types don't engage; per-type batches do
    a = measure_fastpath(pd.Series([_poly(BOX), _poly(BOX, HOLE)], dtype=object), "area")
    assert list(a) == [16.0, 12.0]
    ln = measure_fastpath(
        pd.Series([_line([(0.0, 0.0), (3.0, 4.0)])] * 2, dtype=object), "length"
    )
    assert list(ln) == [5.0, 5.0]
    # polygons have zero ST_Length; lines zero ST_Area (PostGIS contract)
    z = measure_fastpath(pd.Series([_poly(BOX)] * 2, dtype=object), "length")
    assert list(z) == [0.0, 0.0]
    z = measure_fastpath(
        pd.Series([_line([(0.0, 0.0), (3.0, 4.0)])] * 2, dtype=object), "area"
    )
    assert list(z) == [0.0, 0.0]
    # perimeter: ring lengths (shell + hole); 0 for lines (r10)
    pm = measure_fastpath(
        pd.Series([_poly(BOX), _poly(BOX, HOLE)], dtype=object), "perimeter"
    )
    assert list(pm) == [16.0, 24.0]
    z = measure_fastpath(
        pd.Series([_line([(0.0, 0.0), (3.0, 4.0)])] * 2, dtype=object),
        "perimeter",
    )
    assert list(z) == [0.0, 0.0]


def test_measure_spark_path(spark):
    """st_area/st_length through the real pandas-UDF path on a
    MultiPolygon column — equal to the kernel row-by-row."""
    from datafusion_spatial_spark.functions.predicates import st_area, st_length
    from datafusion_spatial_spark.meta import GeometryMeta

    rng = random.Random(3)
    rows = []
    for i in range(200):
        g = wkb.loads(bytes(_rand_mpolys(rng, 1)[0] or _mpoly([])))
        rows.append((i, bytearray(wkb.dumps(g)),
                     float(geom_ops.area(g)), float(geom_ops.length(g))))
    m = GeometryMeta(encoding="WKB", geometry_types=("MultiPolygon",))
    df = spark.createDataFrame(rows, "id int, geom binary, ea double, el double")
    out = df.select(
        "id", "ea", "el",
        st_area("geom", m).alias("a"), st_length("geom", m).alias("l"),
    ).collect()
    for r in out:
        assert r.a == r.ea and r.l == r.el, r.id


# ---------------------------------------------------------------------------
# round-9g: vectorized st_centroid

from datafusion_spatial_spark.functions._fastpath import centroid_fastpath


@pytest.mark.parametrize("maker", [
    _rand_lines, _rand_polys, _rand_mlines, _rand_mpolys, _rand_mpts,
    _rand_gcs,
])
def test_centroid_fastpath_parity(maker):
    rng = random.Random(hash(maker.__name__) % 300)
    batch = maker(rng, 300)
    got = centroid_fastpath(batch)
    assert got is not None, (maker.__name__, "did not engage")
    for i, v in enumerate(batch):
        gx, gy = got["x"].iloc[i], got["y"].iloc[i]
        if v is None:
            assert math.isnan(gx) and math.isnan(gy), i
            continue
        c = geom_ops.centroid(wkb.loads(bytes(v)))
        if c is None:
            assert math.isnan(gx) and math.isnan(gy), i
        else:
            assert gx == c[0] and gy == c[1], (i, (gx, gy), c)


def test_centroid_fastpath_fallthrough_and_known():
    # zero-area polygon falls through to the LENGTH centroid (kernel
    # stage 2), exactly like the scalar kernel
    sliver = _poly([(0.0, 0.0), (4.0, 0.0), (0.0, 0.0)])
    box = _poly(BOX)
    holed = _poly(BOX, HOLE)
    for g_bytes in (sliver, box, holed):
        s = pd.Series([g_bytes] * 3, dtype=object)
        got = centroid_fastpath(s)
        exp = geom_ops.centroid(wkb.loads(bytes(g_bytes)))
        assert (got["x"].iloc[0], got["y"].iloc[0]) == exp, g_bytes[:9]
    assert geom_ops.centroid(wkb.loads(bytes(box))) == (2.0, 2.0)


def test_centroid_spark_path(spark):
    from datafusion_spatial_spark.functions.predicates import st_centroid
    from datafusion_spatial_spark.meta import GeometryMeta

    rng = random.Random(17)
    rows = []
    for i in range(150):
        v = _rand_mpolys(rng, 1)[0]
        if v is None:
            continue
        c = geom_ops.centroid(wkb.loads(bytes(v)))
        rows.append((i, bytearray(v), None if c is None else c[0],
                     None if c is None else c[1]))
    m = GeometryMeta(encoding="WKB", geometry_types=("MultiPolygon",))
    df = spark.createDataFrame(rows, "id int, geom binary, ex double, ey double")
    out = df.select("id", "ex", "ey", st_centroid("geom", m).alias("c")).collect()
    for r in out:
        if r.ex is None:
            assert r.c is None, r.id
        else:
            assert r.c.x == r.ex and r.c.y == r.ey, r.id


# ---------------------------------------------------------------------------
# round-10: native batches through the unary fastpaths + the real UDF path


@pytest.mark.parametrize("tname,maker", _NATIVE_MAKERS)
def test_native_measure_and_centroid_parity(tname, maker):
    from datafusion_spatial_spark.functions._fastpath import (
        centroid_fastpath, measure_fastpath,
    )

    rng = random.Random(hash(tname) % 400)
    wkb_batch = maker(rng, 250)
    native = _native_df(wkb_batch, tname)
    nk = f"native:{tname}"
    for mode, fn in (("area", geom_ops.area), ("length", geom_ops.length),
                     ("perimeter", geom_ops.perimeter)):
        got = measure_fastpath(native, mode, nk)
        assert got is not None, (tname, mode, "did not engage")
        for i, v in enumerate(wkb_batch):
            e = None if v is None else fn(wkb.loads(bytes(v)))
            g = got.iloc[i]
            if e is None:
                assert math.isnan(g), (tname, mode, i)
            else:
                assert g == e, (tname, mode, i, g, e)
    got = centroid_fastpath(native, nk)
    assert got is not None, tname
    for i, v in enumerate(wkb_batch):
        gx, gy = got["x"].iloc[i], got["y"].iloc[i]
        c = None if v is None else geom_ops.centroid(wkb.loads(bytes(v)))
        if c is None:
            assert math.isnan(gx) and math.isnan(gy), (tname, i)
        else:
            assert gx == c[0] and gy == c[1], (tname, i, (gx, gy), c)


def test_native_polygon_spark_path(spark):
    """End-to-end: a NATIVE-encoded polygon column (array<array<struct>>)
    through st_intersects/st_within/st_distance/st_area/st_centroid — the
    UDFs must route the struct batch into the sweep and match the scalar
    kernels row-for-row against the WKB twin column."""
    from pyspark.sql import functions as F

    from datafusion_spatial_spark.functions.predicates import (
        st_area, st_centroid, st_distance, st_intersects, st_within,
    )
    from datafusion_spatial_spark.meta import GeometryMeta

    rng = random.Random(41)
    box_g = wkb.loads(bytes(_poly(BOX)))
    rows = []
    for i in range(200):
        v = _rand_polys(rng, 1)[0]
        if v is None:
            rows.append((i, None, None, None, None, None, None))
            continue
        g = wkb.loads(bytes(v))
        coords = [[(float(p[0]), float(p[1])) for p in ring] for ring in g.coords]
        c = geom_ops.centroid(g)
        rows.append((
            i,
            coords,
            geom_ops.intersects(g, box_g),
            geom_ops.distance(g, box_g),
            float(geom_ops.area(g)),
            None if c is None else c[0],
            geom_ops.within(g, box_g),
        ))
    schema = (
        "id int, geom array<array<struct<x double, y double>>>, "
        "ei boolean, ed double, ea double, ecx double, ew boolean"
    )
    df = spark.createDataFrame(rows, schema)
    m = GeometryMeta(encoding="polygon", geometry_types=("Polygon",))
    mw = GeometryMeta(encoding="WKB", geometry_types=("Polygon",))
    box_col = F.lit(bytearray(_poly(BOX)))
    out = df.select(
        "id", "ei", "ed", "ea", "ecx", "ew",
        st_intersects("geom", box_col, m, mw).alias("i"),
        st_within("geom", box_col, m, mw).alias("w"),
        st_distance("geom", box_col, m, mw).alias("d"),
        st_area("geom", m).alias("a"),
        st_centroid("geom", m).alias("c"),
    ).collect()
    assert len(out) == 200
    for r in out:
        if r.ei is None:
            assert r.i is None and r.d is None and r.a is None and r.c is None
            continue
        assert r.i == r.ei and r.w == r.ew, r.id
        assert r.a == r.ea, r.id
        if r.ed is None:
            assert r.d is None, r.id
        else:
            assert r.d == r.ed, r.id
        if r.ecx is None:
            assert r.c is None, r.id
        else:
            assert r.c.x == r.ecx, r.id


def test_gc_empty_and_hollow_through_every_consumer():
    """r10 self-review pins: GEOMETRYCOLLECTION EMPTY (is_empty True) and a
    'hollow' collection of empty members (is_empty FALSE but zero
    coordinates) must match the kernel through every fastpath consumer —
    the counts==0 skip paths carry the kernel-matching defaults."""
    gc_empty = _gc([])
    gc_hollow = _gc([wkb.Geom("LineString", []), wkb.Geom("Polygon", [])])
    assert wkb.loads(gc_empty).is_empty
    assert not wkb.loads(gc_hollow).is_empty
    batch = pd.Series([gc_empty, gc_hollow, None], dtype=object)
    fact = pd.Series([_poly(BOX)] * 3, dtype=object)
    for mode in ("intersects", "disjoint", "within"):
        got = predicate_fastpath(batch, fact, mode, "wkb", "wkb")
        assert got is not None, mode
        assert list(got) == _scalar(MODES[mode], batch, fact), mode
    got = distance_fastpath(batch, fact, "wkb", "wkb")
    assert got is not None
    for g, e in zip(got, _scalar_dist(batch, fact)):
        assert (e is None and math.isnan(g)) or g == e
    for m in ("area", "length", "perimeter"):
        got = measure_fastpath(batch, m)
        assert got is not None, m
        for g, v in zip(got, batch):
            e = None if v is None else getattr(geom_ops, m)(wkb.loads(bytes(v)))
            assert (e is None and math.isnan(g)) or g == e, m
    c = centroid_fastpath(batch)
    assert c is not None and all(math.isnan(v) for v in list(c["x"]))
    # an EMPTY collection unique mixed among real ones on the factorized
    # side: per-unique skip, other uniques still evaluated
    fact2 = pd.Series(
        [gc_empty, _gc([wkb.Geom("Polygon", [BOX])])] * 30, dtype=object
    )
    lines = pd.Series([_line([(1.0, 1.0), (2.0, 2.0)])] * 60, dtype=object)
    got = predicate_fastpath(lines, fact2, "intersects", "wkb", "wkb")
    assert got is not None
    assert list(got) == _scalar(geom_ops.intersects, lines, fact2)


def test_skew_guard_through_public_measure_api():
    """r10 advice-fix integration pin: a skewed batch (one 30k-vertex ring
    among thousands of small ones) through the PUBLIC measure fastpath —
    the guard must keep it fast (pre-fix: O(maxlen x rows) masked steps,
    minutes) and bit-exact."""
    import time

    big_ring = [(math.cos(i / 5000.0) * 100.0, math.sin(i / 5000.0) * 100.0)
                for i in range(30_000)]
    big_ring.append(big_ring[0])
    rows = [wkb.dumps(wkb.Geom("Polygon", [big_ring]))]
    for i in range(3000):
        x = float(i % 50)
        rows.append(_poly([(x, 0.0), (x + 1.0, 0.0), (x + 1.0, 1.0),
                           (x, 1.0), (x, 0.0)]))
    s = pd.Series(rows, dtype=object)
    t0 = time.perf_counter()
    got = measure_fastpath(s, "area")
    elapsed = time.perf_counter() - t0
    assert got is not None
    assert elapsed < 10.0, elapsed  # pre-fix this shape ran for minutes
    assert got.iloc[0] == geom_ops.area(wkb.loads(bytes(rows[0])))
    assert got.iloc[1] == 1.0
