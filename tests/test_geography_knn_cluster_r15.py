"""Geography kNN + clustering battery vs brute-force haversine (r15,
VERDICT r14 #3).

`knn_join_geography` and the new `cluster_within_geography` /
`cluster_dbscan_geography` all build their pair graphs through
`spatial_join_geography`, so the antimeridian seam legs and polar-cap
legs apply — these tests pin that with engineered dateline rows, >80°
rows, and randomized bands checked against an all-pairs haversine oracle
computed in plain Python.
"""
from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from datafusion_spatial_spark.geom_ops import EARTH_RADIUS
from datafusion_spatial_spark.meta import GeometryMeta
from datafusion_spatial_spark.operators.spatial_cluster import (
    cluster_dbscan_geography,
    cluster_within_geography,
)
from datafusion_spatial_spark.operators.spatial_knn import knn_join_geography

PM = GeometryMeta(encoding="point", geometry_types=("Point",))


def _pdf(spark, rows, idn):
    return spark.createDataFrame(
        rows, f"{idn} long, x double, y double"
    ).select(
        idn,
        F.struct(F.col("x").alias("x"), F.col("y").alias("y")).alias("geom"),
    )


def _hav(lon1, lat1, lon2, lat2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dl = math.radians(lon2 - lon1)
    h = (
        math.sin((p2 - p1) / 2) ** 2
        + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    )
    return 2 * EARTH_RADIUS * math.asin(min(1.0, math.sqrt(h)))


def _knn_oracle(a, b, k):
    """Brute-force per-left top-k (distance asc, right id asc)."""
    want = {}
    for ai, ax, ay in a:
        ranked = sorted(
            ((_hav(ax, ay, bx, by), bi) for bi, bx, by in b),
            key=lambda t: (t[0], t[1]),
        )[:k]
        want[ai] = [(bi, d) for d, bi in ranked]
    return want


def _check_knn(out_rows, want, tol=1e-6):
    got = {}
    for r in sorted(out_rows, key=lambda r: (r[0], r[3])):
        got.setdefault(r[0], []).append((r[1], r[2]))
    assert set(got) == set(want)
    for lid in want:
        gids = [bi for bi, _ in got[lid]]
        wids = [bi for bi, _ in want[lid]]
        assert gids == wids, (lid, got[lid], want[lid])
        for (gb, gd), (wb, wd) in zip(got[lid], want[lid]):
            assert abs(gd - wd) < tol, (lid, gb, gd, wd)


def test_knn_geography_seam_battery(spark):
    """Random mid-band points clustered around ±180: exact top-3 per
    left row must equal the all-pairs haversine oracle — including pairs
    whose nearest neighbors sit on the other side of the dateline."""
    rng = random.Random(15)
    wrap = lambda x: ((x + 180.0) % 360.0) - 180.0
    a = [
        (i, wrap(rng.uniform(178.5, 181.5)), rng.uniform(30.0, 34.0))
        for i in range(40)
    ]
    b = [
        (i, wrap(rng.uniform(178.5, 181.5)), rng.uniform(30.0, 34.0))
        for i in range(60)
    ]
    out = knn_join_geography(
        _pdf(spark, a, "aid"), _pdf(spark, b, "bid"),
        "geom", "geom", PM, PM, "aid", "bid", k=3, radius_m=20_000.0,
        max_rounds=6,
    )
    rows = [
        (r.aid, r.bid, r.distance_m, r.rank, r.resolved) for r in out.collect()
    ]
    assert all(r[4] for r in rows)  # radius doubling resolved everything
    _check_knn(rows, _knn_oracle(a, b, 3))
    # the oracle must actually contain cross-seam nearest neighbors
    lon_a = {i: x for i, x, _ in a}
    lon_b = {i: x for i, x, _ in b}
    want = _knn_oracle(a, b, 3)
    assert any(
        (lon_a[ai] > 179 and lon_b[bi] < -179)
        or (lon_a[ai] < -179 and lon_b[bi] > 179)
        for ai, nbrs in want.items()
        for bi, _ in nbrs
    )


def test_knn_geography_polar_battery(spark):
    """Rows above 80° route through the polar-cap stereographic leg; the
    kNN on top must still match the haversine oracle exactly."""
    rng = random.Random(151)
    a = [
        (i, rng.uniform(-180.0, 180.0), rng.uniform(83.0, 89.5))
        for i in range(25)
    ]
    b = [
        (i, rng.uniform(-180.0, 180.0), rng.uniform(83.0, 89.5))
        for i in range(40)
    ]
    out = knn_join_geography(
        _pdf(spark, a, "aid"), _pdf(spark, b, "bid"),
        "geom", "geom", PM, PM, "aid", "bid", k=2, radius_m=50_000.0,
        max_rounds=6,
    )
    rows = [
        (r.aid, r.bid, r.distance_m, r.rank, r.resolved) for r in out.collect()
    ]
    assert all(r[4] for r in rows)
    _check_knn(rows, _knn_oracle(a, b, 2))


def _cc_oracle(pts, meters):
    """Brute-force union-find components under haversine ≤ meters;
    labels = min member id."""
    parent = {i: i for i, _, _ in pts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, xi, yi in pts:
        for j, xj, yj in pts:
            if i < j and _hav(xi, yi, xj, yj) <= meters:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    return {i: find(i) for i, _, _ in pts}


def test_cluster_within_geography_seam_chain(spark):
    """A chain of points stepping across the dateline must form ONE
    cluster — the planar degree grid would cut it at ±180."""
    pts = [
        (0, 179.0, 45.0),
        (1, 179.6, 45.0),
        (2, -179.8, 45.0),  # across the seam from 1 (~47 km)
        (3, -179.2, 45.0),
        (4, 170.0, 45.0),  # isolated singleton
        (5, -170.0, 45.0),  # isolated singleton
    ]
    out = cluster_within_geography(
        _pdf(spark, pts, "pid"), "geom", PM, 60_000.0, id_col="pid"
    )
    got = {r.pid: r.cluster_id for r in out.collect()}
    assert got == _cc_oracle(pts, 60_000.0)
    assert got[0] == got[1] == got[2] == got[3] == 0
    assert got[4] == 4 and got[5] == 5


def test_cluster_within_geography_random_band(spark):
    rng = random.Random(152)
    wrap = lambda x: ((x + 180.0) % 360.0) - 180.0
    pts = [
        (i, wrap(rng.uniform(178.0, 182.0)), rng.uniform(-35.0, -30.0))
        for i in range(80)
    ]
    meters = 40_000.0
    out = cluster_within_geography(
        _pdf(spark, pts, "pid"), "geom", PM, meters, id_col="pid"
    )
    got = {r.pid: r.cluster_id for r in out.collect()}
    assert got == _cc_oracle(pts, meters)


def test_cluster_dbscan_geography(spark):
    """Core/border/noise in meters across the seam: two dense knots on
    opposite sides of ±180 within eps of each other merge; a far
    singleton is noise."""
    pts = [
        # knot A (east side) — 3 points within ~15 km of each other
        (0, 179.92, 10.0), (1, 179.97, 10.02), (2, 179.90, 10.05),
        # knot B (west side) — within ~25 km of knot A across the seam
        (3, -179.95, 10.0), (4, -179.90, 10.03),
        # noise far away
        (5, 150.0, 10.0),
    ]
    out = cluster_dbscan_geography(
        _pdf(spark, pts, "pid"), "geom", PM, eps_m=30_000.0, min_points=3,
        id_col="pid",
    )
    got = {r.pid: r.cluster_id for r in out.collect()}
    # brute-force DBSCAN oracle
    ids = [i for i, _, _ in pts]
    nbr = {
        i: {
            j
            for j, xj, yj in pts
            if j != i and _hav(xi, yi, xj, yj) <= 30_000.0
        }
        for i, xi, yi in pts
    }
    core = {i for i in ids if len(nbr[i]) + 1 >= 3}
    assert core  # fixture sanity
    parent = {i: i for i in core}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in core:
        for j in nbr[i]:
            if j in core:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    want = {i: find(i) for i in core}
    for i in ids:
        if i not in core:
            adj = sorted(want[j] for j in nbr[i] if j in core)
            want[i] = adj[0] if adj else None
    assert got == want
    assert got[5] is None  # noise
    # the seam merge actually happened
    assert got[0] == got[3]


def test_knn_geography_mixed_hemisphere_and_validation(spark):
    a = _pdf(spark, [(1, 0.0, 0.0)], "aid")
    b = _pdf(spark, [(1, 0.1, 0.0), (2, 0.0, 0.2)], "bid")
    out = knn_join_geography(
        a, b, "geom", "geom", PM, PM, "aid", "bid", k=2, radius_m=5_000.0,
        max_rounds=6,
    )
    rows = sorted(
        ((r.aid, r.bid, r.rank) for r in out.collect()), key=lambda t: t[2]
    )
    assert [(bid, rk) for _, bid, rk in rows] == [(1, 1), (2, 2)]
    with pytest.raises(ValueError):
        knn_join_geography(
            a, b, "geom", "geom", PM, PM, "aid", "bid", k=0, radius_m=1.0
        )


def test_knn_geography_sparse_global_cross_fallback(spark):
    """Sparse global data: the doubling ring exceeds the 89.9-deg pad
    limit, which raises in plain spatial_join_geography — the kNN loop
    opts into the exact cross refine (wide_pad='cross') and must still
    match the brute-force haversine oracle."""
    a = [(0, 0.0, 0.0), (1, 120.0, 40.0), (2, -120.0, -40.0)]
    b = [
        (0, 10.0, 5.0), (1, 100.0, 30.0), (2, -100.0, -30.0),
        (3, 60.0, -20.0), (4, -170.0, 10.0),
    ]
    out = knn_join_geography(
        _pdf(spark, a, "aid"), _pdf(spark, b, "bid"),
        "geom", "geom", PM, PM, "aid", "bid", k=3, radius_m=200_000.0,
        max_rounds=9,
    )
    rows = [
        (r.aid, r.bid, r.distance_m, r.rank, r.resolved) for r in out.collect()
    ]
    assert all(r[4] for r in rows)
    _check_knn(rows, _knn_oracle(a, b, 3), tol=1e-4)


def test_spatial_join_geography_wide_pad_cross(spark):
    """wide_pad='cross' answers planet-scale thresholds exactly where
    the default raises."""
    from datafusion_spatial_spark.operators.spatial_join import (
        spatial_join_geography,
    )

    a = [(1, 10.0, 79.5), (2, -170.0, -60.0)]
    b = [(1, 11.0, 79.5), (2, 170.0, -55.0), (3, 0.0, 0.0)]
    meters = 7_000_000.0
    with pytest.raises(ValueError, match="seam-slice limit"):
        spatial_join_geography(
            _pdf(spark, a, "aid"), _pdf(spark, b, "bid"),
            "geom", "geom", PM, PM, "aid", "bid", meters,
        )
    out = spatial_join_geography(
        _pdf(spark, a, "aid"), _pdf(spark, b, "bid"),
        "geom", "geom", PM, PM, "aid", "bid", meters,
        with_distance=True, wide_pad="cross",
    )
    got = {(r.aid, r.bid): r.distance_m for r in out.collect()}
    want = {
        (ai, bi): _hav(ax, ay, bx, by)
        for ai, ax, ay in a
        for bi, bx, by in b
        if _hav(ax, ay, bx, by) <= meters
    }
    assert set(got) == set(want) and got  # non-trivial
    for key, d in want.items():
        assert abs(got[key] - d) < 1e-4


# heavy battery file: certification tier only (r15 tiering, VERDICT r14 #9)
pytestmark = pytest.mark.slow


def test_cluster_within_geography_polygons_arc_kernel(spark):
    """Meters clustering over WKB POLYGONS (not points): the pair graph
    refines through the exact spherical arc kernel, and boundary-to-
    boundary distance (not centroid distance) decides the chain."""
    from datafusion_spatial_spark import geom_ops as GO
    from datafusion_spatial_spark import wkb as W

    def sq(pid, lon, lat, half_deg=0.05):
        ring = [
            (lon - half_deg, lat - half_deg), (lon + half_deg, lat - half_deg),
            (lon + half_deg, lat + half_deg), (lon - half_deg, lat + half_deg),
            (lon - half_deg, lat - half_deg),
        ]
        return pid, W.Geom("Polygon", [ring])

    polys = [
        sq(0, 10.00, 40.0),
        sq(1, 10.25, 40.0),   # edge gap ~0.15 deg ~ 12.8 km at lat 40
        sq(2, 10.50, 40.0),   # chains through 1
        sq(3, 12.00, 40.0),   # isolated
    ]
    pm = GeometryMeta(encoding="WKB", geometry_types=("Polygon",))
    df = spark.createDataFrame(
        [(pid, bytearray(W.dumps(g))) for pid, g in polys],
        "pid long, geom binary",
    )
    out = cluster_within_geography(
        df, "geom", pm, 15_000.0, id_col="pid"
    )
    got = {r.pid: r.cluster_id for r in out.collect()}
    # oracle on exact spherical geometry distance
    parent = {pid: pid for pid, _ in polys}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, gi in polys:
        for j, gj in polys:
            if i < j and GO.distance_sphere_geom(gi, gj) <= 15_000.0:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    want = {pid: find(pid) for pid, _ in polys}
    assert got == want
    assert got[0] == got[1] == got[2] == 0  # the chain formed
    assert got[3] == 3
    # centroid distance 0<->1 is ~23 km > 15 km: only boundary distance
    # (~12.8 km) links them — proves the arc kernel, not a point proxy
    c0 = W.Geom("Point", (10.00, 40.0))
    c1 = W.Geom("Point", (10.25, 40.0))
    assert GO.distance_sphere_geom(c0, c1) > 15_000.0


def test_cluster_geography_wide_pad_threading(spark):
    """r15 review fix: the cluster wrappers thread wide_pad down to
    spatial_join_geography, so wide-eps clustering on seam-reaching data
    can opt into the exact cross fallback instead of dying on the
    seam-slice guard."""
    pts = [(0, 179.9, 70.0), (1, -179.9, 70.0), (2, 0.0, 0.0)]
    df = _pdf(spark, pts, "pid")
    meters = 4_000_000.0  # pad_lon ~ 129 deg at lat 70
    with pytest.raises(ValueError, match="seam-slice limit"):
        cluster_within_geography(
            df, "geom", PM, meters, id_col="pid"
        ).collect()
    out = cluster_within_geography(
        df, "geom", PM, meters, id_col="pid", wide_pad="cross"
    )
    got = {r.pid: r.cluster_id for r in out.collect()}
    assert got == _cc_oracle(pts, meters)
    assert got[0] == got[1] == 0 and got[2] == 2
