"""SPCS83 US state-plane family (r15, VERDICT r14 #8).

43 built-in NAD83 state-plane meter-code zones: LCC zones ride
`geom_ops._LCC_CODES` (GRS80, k0=1, 2-SP) and TM zones ride
`geom_ops._TM_CODES`, so both the Python kernels and the pure-Catalyst
`st_transform_point` twins dispatch with zero new projection code.

The projection MATH is pinned against the published EPSG Guidance Note
7-2 worked example (Lambert Conic Conformal 2SP, NAD27 Texas South
Central, Clarke 1866, US survey feet: 28°30'N 96°00'W →
E 2,963,503.91 ftUS, N 254,759.80 ftUS). Zone constants are checked by
projection invariants that a wrong defining parameter breaks: the grid
origin must land exactly on (FE, FN), the point scale factor must be 1
on both standard parallels (LCC) / k0 on the central meridian (TM), and
round trips must close to 1e-9 degrees.
"""
from __future__ import annotations

import math

import pytest

from datafusion_spatial_spark import geom_ops as G

CLARKE_A_FT = 20925832.164  # Clarke 1866 a in US survey feet (GN7-2)
CLARKE_F = 1 / 294.97869821


def test_gn7_2_lcc_worked_example():
    """EPSG Guidance Note 7, part 2 — Lambert Conic Conformal (2SP)
    worked example, reproduced to the published 0.01 ft."""
    params = (G._dm(28, 23), G._dm(30, 17), G._dm(27, 50), -99.0,
              2_000_000.0, 0.0)
    x, y = G._lcc_fwd(-96.0, 28.5, params, a=CLARKE_A_FT, f=CLARKE_F)
    assert abs(x - 2_963_503.91) < 5e-3
    assert abs(y - 254_759.80) < 5e-3
    lo, la = G._lcc_inv(x, y, params, a=CLARKE_A_FT, f=CLARKE_F)
    assert abs(lo - -96.0) < 1e-9 and abs(la - 28.5) < 1e-9


def _parallel_scale(fwd, lon, lat):
    """Numerical point scale along the parallel: projected distance of a
    tiny east-west step over its ellipsoidal arc length (conformal maps
    are isotropic, so this is THE scale factor)."""
    d = 1e-5
    x1, y1 = fwd(lon - d / 2, lat)
    x2, y2 = fwd(lon + d / 2, lat)
    s = math.sin(math.radians(lat))
    e2 = G.GRS80_F * (2 - G.GRS80_F)
    arc = (
        math.radians(d)
        * G.GRS80_A
        * math.cos(math.radians(lat))
        / math.sqrt(1 - e2 * s * s)
    )
    return math.hypot(x2 - x1, y2 - y1) / arc


@pytest.mark.parametrize("srid", sorted(G._SPCS83_LCC))
def test_spcs_lcc_zone_invariants(srid):
    lat1, lat2, lat0, lon0, FE, FN = G._SPCS83_LCC[srid]
    fwd = G._lookup_transform(4326, srid)
    inv = G._lookup_transform(srid, 4326)
    # grid origin: exactly the false origin
    x, y = fwd(lon0, lat0)
    assert abs(x - FE) < 1e-6 and abs(y - FN) < 1e-6
    # unit scale on BOTH standard parallels (breaks if lat1/lat2 wrong)
    assert abs(_parallel_scale(fwd, lon0 + 0.7, lat1) - 1.0) < 1e-6
    assert abs(_parallel_scale(fwd, lon0 - 1.1, lat2) - 1.0) < 1e-6
    # scale > 1 outside the parallels, < 1 between (the conic signature)
    assert _parallel_scale(fwd, lon0, max(lat1, lat2) + 0.8) > 1.0 + 1e-7
    assert _parallel_scale(fwd, lon0, (lat1 + lat2) / 2) < 1.0 - 1e-7
    # round trips across the zone
    for dlon, dlat in ((0.0, 0.0), (1.9, 0.7), (-2.1, -0.4), (0.8, 1.2)):
        lon, lat = lon0 + dlon, (lat1 + lat2) / 2 + dlat
        lo, la = inv(*fwd(lon, lat))
        assert abs(lo - lon) < 1e-9 and abs(la - lat) < 1e-9


@pytest.mark.parametrize("srid", sorted(G._SPCS83_TM))
def test_spcs_tm_zone_invariants(srid):
    lat0, lon0, k0, FE, FN, a, f, datum = G._TM_CODES[srid]
    assert datum is None and a == G.GRS80_A and f == G.GRS80_F
    fwd = G._lookup_transform(4326, srid)
    inv = G._lookup_transform(srid, 4326)
    x, y = fwd(lon0, lat0)
    assert abs(x - FE) < 1e-6 and abs(y - FN) < 1e-6
    # central-meridian scale == k0 (breaks if k0 or lon0 wrong)
    mid = lat0 + 3.0
    assert abs(_parallel_scale(fwd, lon0, mid) - k0) < 1e-6
    # scale grows away from the central meridian
    assert _parallel_scale(fwd, lon0 + 1.5, mid) > k0 + 1e-7
    for dlon, dlat in ((0.0, 2.0), (0.9, 4.1), (-1.1, 1.3)):
        lon, lat = lon0 + dlon, lat0 + dlat
        lo, la = inv(*fwd(lon, lat))
        # 5e-9 deg ~ 0.5 mm: the TM inverse series' closure this far
        # north of lat0
        assert abs(lo - lon) < 5e-9 and abs(la - lat) < 5e-9


def test_spcs_city_sanity_bounds():
    """Coarse geography pins: known cities land in the right part of
    their zone grid (catches sign/axis/false-origin mistakes without
    trusting memorized coordinates to the meter)."""
    cases = [
        # (srid, lon, lat, xlo, xhi, ylo, yhi)
        (26945, -118.2437, 34.0522, 1_930_000, 2_000_000, 540_000, 600_000),   # LA / CA-5
        (26943, -122.4194, 37.7749, 1_800_000, 1_880_000, 580_000, 660_000),   # SF / CA-3
        (32139, -97.7431, 30.2672, 920_000, 1_000_000, 3_050_000, 3_130_000),  # Austin / TX-C
        (32118, -73.9857, 40.7484, 295_000, 310_000, 55_000, 75_000),          # NYC / NY-LI
        (26986, -71.0589, 42.3601, 230_000, 245_000, 890_000, 910_000),        # Boston / MA
        (26971, -87.6298, 41.8781, 340_000, 370_000, 570_000, 590_000),        # Chicago / IL-E
        (32148, -122.3321, 47.6062, 380_000, 400_000, 60_000, 80_000),         # Seattle / WA-N
        (26954, -104.9903, 39.7392, 950_000, 965_000, 510_000, 530_000),       # Denver / CO-C
    ]
    for srid, lon, lat, xlo, xhi, ylo, yhi in cases:
        x, y = G._lookup_transform(4326, srid)(lon, lat)
        assert xlo < x < xhi and ylo < y < yhi, (srid, x, y)


def test_spcs_catalyst_twin_matches_kernel(spark):
    """st_transform_point (pure Catalyst) equals the Python kernel for a
    sample of LCC and TM zones, both directions."""
    from pyspark.sql import functions as F

    from datafusion_spatial_spark.functions.geodesic import (
        POINT_META,
        st_transform_point,
    )
    from datafusion_spatial_spark.functions.scalar import st_point

    cases = [
        (26945, -118.2437, 34.0522),
        (32139, -97.7431, 30.2672),
        (26958, -80.1918, 25.7617),
        (32116, -75.1638, 39.9526),
        (32148, -122.3321, 47.6062),
    ]
    for srid, lon, lat in cases:
        kx, ky = G._lookup_transform(4326, srid)(lon, lat)
        df = spark.range(1).select(st_point(F.lit(lon), F.lit(lat)).alias("g"))
        p = df.select(
            st_transform_point("g", 4326, srid, POINT_META).alias("p")
        ).collect()[0]["p"]
        assert abs(p.x - kx) < 1e-6 and abs(p.y - ky) < 1e-6, srid
        back = df.select(
            st_transform_point(
                st_transform_point("g", 4326, srid, POINT_META),
                srid, 4326, POINT_META,
            ).alias("b")
        ).collect()[0]["b"]
        assert abs(back.x - lon) < 1e-7 and abs(back.y - lat) < 1e-7, srid


def test_spcs_nj_ny_east_share_parameters():
    assert G._TM_CODES[32111] == G._TM_CODES[32115]


def test_unknown_srid_error_mentions_spcs():
    g = G.Geom("Point", (1.0, 2.0))
    with pytest.raises(NotImplementedError, match="SPCS83"):
        G.transform(g, 4326, 999_999)
