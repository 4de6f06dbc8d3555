"""register_datum (r11, VERDICT r10 #5): any EPSG with a published
7-param/3-param Helmert registers without pyproj — the generalization of
the built-in 27700 OSGB bridge. TM and geographic registrations also get
the pure-Catalyst st_transform_point path (Helmert + Bowring expressions);
LCC stays kernel-side.
"""
import math

import pytest

from datafusion_spatial_spark import geom_ops as G
from datafusion_spatial_spark import wkb
from datafusion_spatial_spark.functions.geodesic import (
    st_transform,
    st_transform_point,
)
from datafusion_spatial_spark.functions.scalar import st_point
from datafusion_spatial_spark.meta import GeometryMeta

# TM65 / Irish Grid (EPSG:29902): Airy Modified ellipsoid + the published
# OSNI position-vector Helmert (TM65 -> WGS84 direction published; we pass
# the WGS84 -> local direction, i.e. the negated small-shift convention is
# NOT used — register_datum wants the published WGS84->local params, so we
# use the exact Cramer-inverted sense by negating the published values,
# which is itself only convention-accurate; for the TESTS only internal
# consistency matters, not agreement with OSi grids).
AIRY_MOD = (6377340.189, 1.0 / 299.3249646)
WGS84_TO_TM65 = (482.5, -130.6, 564.6, -1.042, -0.214, -0.631, 8.15)
IRISH = dict(lat0=53.5, lon0=-8.0, k0=1.000035, fe=200_000.0, fn=250_000.0)

CLARKE_1866 = (6378206.4, 1.0 / 294.9786982)
WGS84_TO_NAD27 = (8.0, -160.0, -176.0)  # 3-param (CONUS)


@pytest.fixture
def irish_grid():
    G.register_datum(29902, WGS84_TO_TM65, AIRY_MOD, "tm", **IRISH)
    yield 29902
    G.unregister_crs(29902)


@pytest.fixture
def nad27_geographic():
    G.register_datum(4267, WGS84_TO_NAD27, CLARKE_1866, "geographic")
    yield 4267
    G.unregister_crs(4267)


def test_tm_datum_kernel_roundtrip_and_shift(irish_grid):
    fwd = G._lookup_transform(4326, 29902)
    inv = G._lookup_transform(29902, 4326)
    lon, lat = -6.26, 53.35  # Dublin
    x, y = fwd(lon, lat)
    # Irish Grid puts Dublin in the eastern-central grid area
    assert 250_000 < x < 400_000 and 150_000 < y < 300_000, (x, y)
    lon2, lat2 = inv(x, y)
    # same bound as the r10 named-TM round-trip pin: the Snyder series
    # truncates around 1e-7 deg at service-area edges
    assert abs(lon2 - lon) < 1e-6 and abs(lat2 - lat) < 1e-6
    # the datum shift is real: vs the datum-free projection, tens of m
    xn, yn = G._tm_fwd(lon, lat, IRISH["lon0"], False, *AIRY_MOD,
                       IRISH["k0"], IRISH["fe"], IRISH["fn"], IRISH["lat0"])
    assert 20.0 < math.hypot(x - xn, y - yn) < 500.0


@pytest.mark.slow
def test_tm_datum_catalyst_twin_matches_kernel(spark, irish_grid):
    df = spark.createDataFrame(
        [(-6.26, 53.35), (-8.48, 51.9), (-7.31, 54.99)],
        "lon double, lat double",
    ).select(st_point("lon", "lat").alias("g"), "lon", "lat")
    out = df.select(st_transform_point("g", 4326, 29902).alias("p"),
                    "lon", "lat")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan
    fwd = G._lookup_transform(4326, 29902)
    for r in out.collect():
        kx, ky = fwd(r.lon, r.lat)
        assert abs(r.p.x - kx) < 1e-6 and abs(r.p.y - ky) < 1e-6
    back = df.select(
        st_transform_point(
            st_transform_point("g", 4326, 29902), 29902, 4326
        ).alias("b"), "lon", "lat",
    )
    for r in back.collect():
        assert abs(r.b.x - r.lon) < 1e-6 and abs(r.b.y - r.lat) < 1e-6


def test_geographic_datum_bridge(spark, nad27_geographic):
    fwd = G._lookup_transform(4326, 4267)
    inv = G._lookup_transform(4267, 4326)
    lon, lat = -98.5, 39.8  # Kansas
    lon_n, lat_n = fwd(lon, lat)
    # NAD27 vs WGS84 differs by tens of meters in CONUS
    d_m = math.hypot((lon_n - lon) * 111320 * math.cos(math.radians(lat)),
                     (lat_n - lat) * 111320)
    assert 5.0 < d_m < 300.0, d_m
    lon2, lat2 = inv(lon_n, lat_n)
    # Cramer-exact Helmert + Bowring latitude: nanodegree round trips
    assert abs(lon2 - lon) < 1e-8 and abs(lat2 - lat) < 1e-8
    # Catalyst twin agrees with the kernel
    df = spark.createDataFrame([(lon, lat)], "lon double, lat double").select(
        st_point("lon", "lat").alias("g")
    )
    out = df.select(st_transform_point("g", 4326, 4267).alias("p"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    r = out.collect()[0]
    assert abs(r.p.x - lon_n) < 1e-9 and abs(r.p.y - lat_n) < 1e-9  # twin == kernel


def test_st_transform_udf_path_uses_registration(spark, irish_grid):
    m = GeometryMeta(encoding="point", geometry_types=("Point",))
    df = spark.createDataFrame([(-6.26, 53.35)], "lon double, lat double").select(
        st_point("lon", "lat").alias("geometry")
    )
    out = df.select(st_transform("geometry", 4326, 29902, m).alias("g"))
    g = wkb.loads(bytes(out.collect()[0].g))
    kx, ky = G._lookup_transform(4326, 29902)(-6.26, 53.35)
    assert abs(g.coords[0] - kx) < 1e-6 and abs(g.coords[1] - ky) < 1e-6


def test_lcc_datum_kernel_and_catalyst_twin(spark):
    # NTF-style LCC registration: kernel path round-trips AND the
    # Catalyst point twin matches it (r11 — the conformal-series LCC
    # inverse + the Helmert/Bowring bridge, _let-bound)
    G.register_datum(
        99101, (-168.0, -60.0, 320.0), (6378249.2, 1 / 293.466),
        "lcc", lat1=46.8, lat0=46.8, lon0=2.337229, fe=600_000.0,
        fn=200_000.0, k0=0.99987742,
    )
    try:
        fwd = G._lookup_transform(4326, 99101)
        inv = G._lookup_transform(99101, 4326)
        x, y = fwd(2.35, 48.85)
        lon2, lat2 = inv(x, y)
        assert abs(lon2 - 2.35) < 1e-6 and abs(lat2 - 48.85) < 1e-6
        df = spark.createDataFrame(
            [(2.35, 48.85), (5.4, 43.3)], "lon double, lat double"
        ).select(st_point("lon", "lat").alias("g"), "lon", "lat")
        out = df.select(
            st_transform_point("g", 4326, 99101).alias("p"), "lon", "lat"
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan
        for r in out.collect():
            kx, ky = fwd(r.lon, r.lat)
            assert abs(r.p.x - kx) < 1e-6 and abs(r.p.y - ky) < 1e-6
        back = df.select(
            st_transform_point(
                st_transform_point("g", 4326, 99101), 99101, 4326
            ).alias("b"), "lon", "lat",
        )
        for r in back.collect():
            assert abs(r.b.x - r.lon) < 1e-6 and abs(r.b.y - r.lat) < 1e-6
    finally:
        G.unregister_crs(99101)


def test_ntf_zone_catalyst_twin(spark):
    """The built-in NTF Lambert zones (27571-3) get the datum-LCC twin."""
    fwd = G._lookup_transform(4326, 27572)
    df = spark.createDataFrame(
        [(2.35, 48.85), (-1.55, 47.2)], "lon double, lat double"
    ).select(st_point("lon", "lat").alias("g"), "lon", "lat")
    out = df.select(st_transform_point("g", 4326, 27572).alias("p"),
                    "lon", "lat")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    for r in out.collect():
        kx, ky = fwd(r.lon, r.lat)
        assert abs(r.p.x - kx) < 1e-6 and abs(r.p.y - ky) < 1e-6
    back = df.select(
        st_transform_point(
            st_transform_point("g", 4326, 27572), 27572, 4326
        ).alias("b"), "lon", "lat",
    )
    for r in back.collect():
        assert abs(r.b.x - r.lon) < 1e-6 and abs(r.b.y - r.lat) < 1e-6


def test_register_datum_validation():
    with pytest.raises(ValueError, match="tx,ty,tz"):
        G.register_datum(99102, (1.0, 2.0), (6378137.0, 1 / 298.25), "tm",
                         lon0=0.0)
    with pytest.raises(ValueError, match="unknown projection"):
        G.register_datum(99102, (1.0, 2.0, 3.0), (6378137.0, 1 / 298.25),
                         "mercator")
    with pytest.raises(ValueError, match="unused"):
        G.register_datum(99102, (1.0, 2.0, 3.0), (6378137.0, 1 / 298.25),
                         "tm", lon0=0.0, bogus=1)
    assert 99102 not in G._CUSTOM_CRS and 99102 not in G._CUSTOM_DATUM_CRS


def test_unregister_clears_both_registries():
    G.register_datum(99103, (10.0, 20.0, 30.0), (6378137.0, 1 / 298.25),
                     "geographic")
    assert 99103 in G._CUSTOM_CRS and 99103 in G._CUSTOM_DATUM_CRS
    G.unregister_crs(99103)
    assert 99103 not in G._CUSTOM_CRS and 99103 not in G._CUSTOM_DATUM_CRS
