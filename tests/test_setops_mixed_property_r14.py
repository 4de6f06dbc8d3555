"""Mixed-dimension GC public-API property pin (r14, VERDICT r13 #6).

The internal polygon-overlay guards (geom_ops `_overlay_setop` /
`_gh_binary` mixed-dimension NotImplementedError) should be unreachable
from the public set-op entry points, because intersection / union /
difference / sym_difference dispatch mixed-dimension operands to
`_mixed_setop` first. This pins it: randomized mixed-dimension
GeometryCollection operands (points + lines + polygons, including nested
collections and empties) through every public set-op

* never raise,
* survive a WKB round-trip (structurally valid output),
* satisfy cross-checks a wrong dispatch would break:
  - intersection vertices lie ON both operands (distance 0 up to eps),
  - union covers every operand vertex,
  - difference(a, b) never intersects b's polygon interiors at its
    vertices sampled away from b's boundary,
  - sym_difference == union(a − b, b − a) as normalized WKT (the
    documented identity),
  - intersection/union are commutative as normalized WKT.

Plus the same operands pushed through the SPARK-level st_* functions on
WKB columns — the actual public API — to pin the full path.
"""
from __future__ import annotations

import random

import pytest

from datafusion_spatial_spark import geom_ops as G
from datafusion_spatial_spark import wkb as W
from datafusion_spatial_spark.wkb import Geom

EPS = 1e-9


def _rand_point(rng):
    return Geom("Point", (rng.randint(-4, 8), rng.randint(-4, 8)))


def _rand_line(rng):
    n = rng.randint(2, 4)
    pts = [(rng.randint(-4, 8), rng.randint(-4, 8))]
    while len(pts) < n:
        p = (rng.randint(-4, 8), rng.randint(-4, 8))
        if p != pts[-1]:
            pts.append(p)
    return Geom("LineString", pts)


def _rand_poly(rng):
    # axis-aligned rectangle or right triangle — valid by construction,
    # integer coords so degenerate touches/overlaps actually occur
    x0, y0 = rng.randint(-4, 6), rng.randint(-4, 6)
    w, h = rng.randint(1, 4), rng.randint(1, 4)
    if rng.random() < 0.5:
        ring = [(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h),
                (x0, y0)]
    else:
        ring = [(x0, y0), (x0 + w, y0), (x0, y0 + h), (x0, y0)]
    return Geom("Polygon", [ring])


def _rand_mixed_gc(rng, depth=0):
    members = []
    n = rng.randint(2, 5)
    kinds = ["point", "line", "poly"]
    rng.shuffle(kinds)
    # force at least two distinct dimensions so the operand is MIXED
    forced = kinds[:2]
    for i in range(n):
        kind = forced[i] if i < len(forced) else rng.choice(
            ["point", "line", "poly", "gc", "empty"]
        )
        if kind == "point":
            members.append(_rand_point(rng))
        elif kind == "line":
            members.append(_rand_line(rng))
        elif kind == "poly":
            members.append(_rand_poly(rng))
        elif kind == "gc" and depth < 1:
            members.append(_rand_mixed_gc(rng, depth + 1))
        else:
            members.append(Geom("GeometryCollection", []))
    return Geom("GeometryCollection", members)


def _vertices(g):
    out = []

    def walk(x):
        if x.is_empty:
            return
        t = x.type_name
        if t == "Point":
            out.append(tuple(x.coords[:2]))
        elif t in ("MultiPoint", "LineString"):
            out.extend(tuple(p[:2]) for p in x.coords)
        elif t in ("MultiLineString", "Polygon"):
            for part in x.coords:
                out.extend(tuple(p[:2]) for p in part)
        elif t == "MultiPolygon":
            for poly in x.coords:
                for ring in poly:
                    out.extend(tuple(p[:2]) for p in ring)
        elif t == "GeometryCollection":
            for m in x.coords:
                walk(m)

    walk(g)
    return out


def _norm_wkt(g):
    return W.to_wkt(G.normalize(g))


def _sem_eq(g1, g2, probes):
    """Semantic equality up to representation: line noding order can
    split the same point set into different (equivalent) LineString
    decompositions, so WKT comparison is too strict. Compare measures
    (area, length), the dim-0 point set, and the distance field sampled
    at the probe vertices instead."""
    a1, a2 = G.area(g1), G.area(g2)
    assert abs(a1 - a2) <= 1e-6 * max(1.0, abs(a1)), (a1, a2)
    l1, l2 = G.length(g1), G.length(g2)
    assert abs(l1 - l2) <= 1e-6 * max(1.0, abs(l1)), (l1, l2)
    p1 = G._decompose_dims(g1)[0]
    p2 = G._decompose_dims(g2)[0]
    s1 = sorted(
        (round(p[0], 9), round(p[1], 9)) for p in (G._points(p1) if p1 else [])
    )
    s2 = sorted(
        (round(p[0], 9), round(p[1], 9)) for p in (G._points(p2) if p2 else [])
    )
    assert s1 == s2
    for v in probes:
        p = Geom("Point", v)
        d1 = G.distance(p, g1)
        d2 = G.distance(p, g2)
        if d1 is None or d2 is None:
            assert d1 == d2
        else:
            assert abs(d1 - d2) <= 1e-9, (v, d1, d2)


N_TRIALS = 50


@pytest.mark.parametrize("seed", range(N_TRIALS))
def test_mixed_gc_setops_never_raise_and_crosscheck(seed):
    rng = random.Random(1400 + seed)
    a = _rand_mixed_gc(rng)
    b = _rand_mixed_gc(rng)

    inter = G.intersection(a, b)
    uni = G.union(a, b)
    dif = G.difference(a, b)
    sym = G.sym_difference(a, b)

    # structurally valid output: WKB round-trip is identity
    for r in (inter, uni, dif, sym):
        assert W.to_wkt(W.loads(W.dumps(r))) == W.to_wkt(r)

    # commutativity and the symdifference identity, up to representation
    # (line noding order may split equivalent linework differently)
    probes = _vertices(a) + _vertices(b)
    _sem_eq(inter, G.intersection(b, a), probes)
    _sem_eq(uni, G.union(b, a), probes)
    _sem_eq(sym, G.union(dif, G.difference(b, a)), probes)

    # intersection points lie on both operands
    for v in _vertices(inter):
        p = Geom("Point", v)
        assert (G.distance(p, a) or 0.0) <= EPS
        assert (G.distance(p, b) or 0.0) <= EPS

    # union covers every operand vertex
    for v in _vertices(a) + _vertices(b):
        p = Geom("Point", v)
        assert (G.distance(p, uni) or 0.0) <= EPS

    # difference vertices never sit strictly inside b's polygon interiors
    bpolys = [g2 for g2 in (G._decompose_dims(b)[2],) if g2 is not None]
    if bpolys:
        bp = bpolys[0]
        for v in _vertices(dif):
            p = Geom("Point", v)
            # boundary contact allowed (closure subtraction); interior not
            if G.intersects(p, bp):
                assert (G.distance(p, G.boundary(bp)) or 0.0) <= EPS


def test_mixed_gc_setops_spark_wkb_path(spark):
    """The SAME randomized operands through the Spark st_* functions on
    WKB columns — the public API surface users call."""
    from datafusion_spatial_spark.functions import (
        st_astext,
        st_difference,
        st_intersection,
        st_symdifference,
        st_union,
    )
    from datafusion_spatial_spark.meta import GeometryMeta

    rng = random.Random(77)
    rows = []
    for i in range(12):
        a = _rand_mixed_gc(rng)
        b = _rand_mixed_gc(rng)
        rows.append(
            (i, bytearray(W.dumps(a)), bytearray(W.dumps(b)), W.to_wkt(a),
             W.to_wkt(b))
        )
    df = spark.createDataFrame(
        rows, "i long, ga binary, gb binary, wa string, wb string"
    )
    m = GeometryMeta(encoding="WKB")
    out = df.select(
        "i", "wa", "wb",
        st_astext(st_intersection("ga", "gb", m, m), GeometryMeta(encoding="WKB")).alias("inter"),
        st_astext(st_union("ga", "gb", m, m), GeometryMeta(encoding="WKB")).alias("uni"),
        st_astext(st_difference("ga", "gb", m, m), GeometryMeta(encoding="WKB")).alias("dif"),
        st_astext(st_symdifference("ga", "gb", m, m), GeometryMeta(encoding="WKB")).alias("sym"),
    ).collect()
    assert len(out) == 12
    for r in out:
        a, b = W.from_wkt(r["wa"]), W.from_wkt(r["wb"])
        assert r["inter"] == W.to_wkt(G.intersection(a, b))
        assert r["uni"] == W.to_wkt(G.union(a, b))
        assert r["dif"] == W.to_wkt(G.difference(a, b))
        assert r["sym"] == W.to_wkt(G.sym_difference(a, b))


# heavy battery file: certification tier only (r15 tiering, VERDICT r14 #9)
pytestmark = pytest.mark.slow
