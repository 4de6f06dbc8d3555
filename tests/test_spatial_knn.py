"""Distributed k-NN spatial join: radius-doubling over the grid join,
exactness checked against a brute-force oracle computed in the test."""

import math

import pytest
from pyspark.sql import functions as F

from datafusion_spatial_spark.meta import GeometryMeta
from datafusion_spatial_spark.operators.spatial_knn import knn_join

PT = GeometryMeta(encoding="point", geometry_types=("Point",))


def pdf(spark, name, pts):
    from datafusion_spatial_spark.functions import st_point

    return spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        f"{name}_id bigint, x double, y double",
    ).select(f"{name}_id", st_point("x", "y").alias("g"))


def brute_knn(left_pts, right_pts, k):
    out = {}
    for i, (lx, ly) in enumerate(left_pts):
        ds = sorted(
            (math.hypot(lx - rx, ly - ry), j)
            for j, (rx, ry) in enumerate(right_pts)
        )
        out[i] = [(j, d) for d, j in ds[:k]]
    return out


LEFT = [(0, 0), (10, 10), (55, 0), (100, 100)]
RIGHT = [(1, 0), (2, 0), (3, 0), (9, 9), (12, 12), (50, 0), (60, 0),
         (99, 99), (98, 98), (97, 97), (200, 200)]


def test_knn_matches_bruteforce(spark):
    lf = pdf(spark, "l", LEFT)
    rf = pdf(spark, "r", RIGHT)
    # farthest needed neighbor is d=52 from (55,0): radius 2 needs six
    # doublings to cover it
    got = knn_join(
        lf, rf, "g", "g", PT, PT, "l_id", "r_id", k=3, radius=2.0,
        max_rounds=8,
    ).collect()
    expect = brute_knn(LEFT, RIGHT, 3)
    by_left = {}
    for r in got:
        by_left.setdefault(r.l_id, []).append((r.rank, r.r_id, r.distance, r.resolved))
    assert set(by_left) == set(range(len(LEFT)))
    for lid, rows in by_left.items():
        rows.sort()
        assert [rid for _, rid, _, _ in rows] == [j for j, _ in expect[lid]]
        for (_, _, d, resolved), (_, ed) in zip(rows, expect[lid]):
            assert abs(d - ed) < 1e-9
            assert resolved is True


def test_knn_k1_nearest(spark):
    lf = pdf(spark, "l", [(0, 0)])
    rf = pdf(spark, "r", [(5, 0), (3, 0), (8, 0)])
    got = knn_join(
        lf, rf, "g", "g", PT, PT, "l_id", "r_id", k=1, radius=1.0
    ).collect()
    assert len(got) == 1
    assert got[0].r_id == 1 and abs(got[0].distance - 3.0) < 1e-12


def test_knn_unresolved_flag(spark):
    # neighbor at distance 100; radius 1 with a single round can't resolve
    lf = pdf(spark, "l", [(0, 0)])
    rf = pdf(spark, "r", [(100, 0)])
    got = knn_join(
        lf, rf, "g", "g", PT, PT, "l_id", "r_id", k=1, radius=1.0,
        max_rounds=2,
    ).collect()
    # rounds reach radius 2 — neighbor not found; unresolved tail is empty
    # because no candidate was ever seen
    assert got == []
    got2 = knn_join(
        lf, rf, "g", "g", PT, PT, "l_id", "r_id", k=1, radius=1.0,
        max_rounds=8,
    ).collect()
    assert len(got2) == 1 and got2[0].resolved is True
    assert abs(got2[0].distance - 100.0) < 1e-9


# heavy battery file: certification tier only (r15 tiering, VERDICT r14 #9)
pytestmark = pytest.mark.slow
