"""Antimeridian seam legs in the mid-band geography join (r14).

Found while building the r14 `geo` oracle leg (VERDICT r13 #3): the
mid-band degree grid is a plain number line, so a pair straddling ±180°
(lon +179.95 vs −179.97, 6 km apart) landed in far-apart cells and was
silently dropped. spatial_join_geography now adds two tiny seam legs —
the east slice (bbox.xmax ≥ 180 − pad) shifted by −360° and re-joined
against the west slice (bbox.xmin ≤ −180 + pad), in both left/right
directions — whose pairs are disjoint from the main leg by construction
(cell keys on opposite signs never collide; no row is in both slices).
"""
from __future__ import annotations

import pytest

import math
import random

from pyspark.sql import functions as F

from datafusion_spatial_spark.geom_ops import EARTH_RADIUS
from datafusion_spatial_spark.meta import GeometryMeta
from datafusion_spatial_spark.operators.spatial_join import (
    spatial_join_geography,
)

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


def test_seam_pair_found_both_directions(spark):
    a = _pdf(spark, [(1, 179.95, 40.0), (2, -179.99, 41.0)], "aid")
    b = _pdf(spark, [(1, -179.97, 40.0), (2, 179.2, 41.0)], "bid")
    out = spatial_join_geography(
        a, b, "geom", "geom", PM, PM, "aid", "bid", 150_000.0,
        with_distance=True,
    )
    got = {(r.aid, r.bid): r.distance_m for r in out.collect()}
    # (1,1): left-east x right-west; (2,2): left-west x right-east;
    # (1,2) and (2,1) are same-side pairs the main leg finds
    assert set(got) == {(1, 1), (1, 2), (2, 2), (2, 1)}
    assert abs(got[(1, 1)] - _hav(179.95, 40.0, -179.97, 40.0)) < 1e-6
    assert abs(got[(2, 2)] - _hav(-179.99, 41.0, 179.2, 41.0)) < 1e-6


def test_seam_ground_truth_random_band(spark):
    """Random points clustered around ±180 at mid latitudes: the join
    must equal the all-pairs haversine truth exactly (each pair once)."""
    rng = random.Random(14)
    n = 120
    a = [
        (
            i,
            ((rng.uniform(178.0, 182.0) + 180.0) % 360.0) - 180.0,
            rng.uniform(30.0, 35.0),
        )
        for i in range(n)
    ]
    b = [
        (
            i,
            ((rng.uniform(178.0, 182.0) + 180.0) % 360.0) - 180.0,
            rng.uniform(30.0, 35.0),
        )
        for i in range(n)
    ]
    meters = 60_000.0
    out = spatial_join_geography(
        _pdf(spark, a, "aid"), _pdf(spark, b, "bid"),
        "geom", "geom", PM, PM, "aid", "bid", meters,
    )
    rows = [(r.aid, r.bid) for r in out.collect()]
    got = set(rows)
    assert len(rows) == len(got)  # seam legs are pair-disjoint from main
    want = {
        (ai, bi)
        for ai, ax, ay in a
        for bi, bx, by in b
        if _hav(ax, ay, bx, by) <= meters
    }
    assert got == want
    # the truth set must actually contain cross-seam pairs for this to
    # test anything
    lon = {i: x for i, x, _ in a}
    lon_b = {i: x for i, x, _ in b}
    assert any(
        (lon[ai] > 170 and lon_b[bi] < -170)
        or (lon[ai] < -170 and lon_b[bi] > 170)
        for ai, bi in want
    )


def test_no_seam_legs_for_inland_data(spark):
    """Data nowhere near ±180 must keep the single-leg plan (no Union,
    no extra joins) — the seam legs are gated on collected lon stats."""
    a = _pdf(spark, [(1, 10.0, 40.0), (2, 11.0, 41.0)], "aid")
    b = _pdf(spark, [(1, 10.01, 40.0), (2, 50.0, 41.0)], "bid")
    out = spatial_join_geography(
        a, b, "geom", "geom", PM, PM, "aid", "bid", 150_000.0
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan
    assert {(r.aid, r.bid) for r in out.collect()} == {(1, 1), (2, 1)}


def test_seam_self_join_same_object(spark):
    """r15 ADVICE fix: with the SAME DataFrame object on both sides, leg
    routing must use an explicit direction flag — identity routing
    (`a_df is left`) sent leg 2 down the leg-1 branch, duplicating
    east-west cross-seam pairs and never emitting the mirrored ones."""
    pts = [(1, 179.95, 40.0), (2, -179.97, 40.0), (3, 178.5, 40.5)]
    df = _pdf(spark, pts, "pid")
    left = df.withColumnRenamed("pid", "aid")
    right = df.withColumnRenamed("pid", "bid")
    meters = 150_000.0
    # distinct-object reference result
    ref = spatial_join_geography(
        left, right, "geom", "geom", PM, PM, "aid", "bid", meters,
    )
    want = {
        (ai, bi)
        for ai, ax, ay in pts
        for bi, bx, by in pts
        if _hav(ax, ay, bx, by) <= meters
    }
    ref_rows = [(r.aid, r.bid) for r in ref.collect()]
    assert len(ref_rows) == len(set(ref_rows))
    assert set(ref_rows) == want
    assert (1, 2) in want and (2, 1) in want  # cross-seam both ways
    # true self-join: identical plan object on both sides must produce
    # the SAME pair set, each pair exactly once (the pre-fix identity
    # routing duplicated one direction and dropped the other)
    shared = df.select(F.col("pid").alias("k"), "geom")
    out = spatial_join_geography(
        shared, shared, "geom", "geom", PM, PM, "k", "k", meters,
    )
    out_rows = [tuple(r) for r in out.collect()]
    assert len(out_rows) == len(set(out_rows))
    assert set(out_rows) == want


def test_seam_self_join_shared_plan_object(spark):
    """Same-object self-join: cross-seam pairs appear exactly once in
    EACH direction (the pre-fix bug emitted (east,west) twice and
    (west,east) never)."""
    pts = [(1, 179.95, 40.0), (2, -179.97, 40.0)]
    df = _pdf(spark, pts, "pid")
    out = spatial_join_geography(
        df, df, "geom", "geom", PM, PM, "pid", "pid", 150_000.0,
    )
    rows = [tuple(r) for r in out.collect()]
    assert len(rows) == len(set(rows))
    assert set(rows) == {(1, 1), (2, 2), (1, 2), (2, 1)}


def test_pad_wider_than_seam_slice_raises_only_near_seam(spark):
    """r15 ADVICE fix + review fix: a prefilter pad over 89.9 deg used
    to be silently clamped (under-covering the seam slices), then
    briefly raised unconditionally. The contract: raise ONLY when a
    seam leg would actually run (data reaches the seam strips) — the
    main grid leg is complete for every non-wrapping pair at any pad,
    so wide thresholds on data away from ±180 keep working."""
    import pytest

    # seam-reaching wide threshold: must raise
    a = _pdf(spark, [(1, 179.9, 79.5)], "aid")
    b = _pdf(spark, [(1, -179.9, 79.5)], "bid")
    with pytest.raises(ValueError, match="seam-slice limit"):
        spatial_join_geography(
            a, b, "geom", "geom", PM, PM, "aid", "bid", 7_000_000.0,
        ).collect()

    # inland wide threshold (pad_lon > 89.9 deg at lat 60, 5000 km):
    # no seam strip is populated -> complete answer, no raise
    a2 = _pdf(spark, [(1, 0.0, 60.0), (2, 40.0, 60.0)], "aid")
    b2 = _pdf(spark, [(1, 40.0, 60.0), (2, 0.0, -60.0)], "bid")
    meters = 5_000_000.0
    out = spatial_join_geography(
        a2, b2, "geom", "geom", PM, PM, "aid", "bid", meters,
    )
    got = {(r.aid, r.bid) for r in out.collect()}
    want = {
        (ai, bi)
        for ai, ax, ay in [(1, 0.0, 60.0), (2, 40.0, 60.0)]
        for bi, bx, by in [(1, 40.0, 60.0), (2, 0.0, -60.0)]
        if _hav(ax, ay, bx, by) <= meters
    }
    assert got == want and (1, 1) in got and (1, 2) not in got


# heavy battery file: certification tier only (r15 tiering, VERDICT r14 #9)
pytestmark = pytest.mark.slow
