"""Geodesic family: sphere/spheroid distance, geodesic length, 4326<->3857
transform, XYZ tiles / quadkeys. Point-form functions must be pure Catalyst
(no Python rows in the plan)."""

import math

import pytest
from pyspark.sql import functions as F

from datafusion_spatial_spark import geom_ops as G
from datafusion_spatial_spark import wkb
from datafusion_spatial_spark.functions import (
    st_distancesphere,
    st_distancespheroid,
    st_geomfromtext,
    st_lengthsphere,
    st_point,
    st_quadkey,
    st_tile,
    st_tileenvelope,
    st_transform,
    st_transform_point,
    st_x,
    st_y,
)
from datafusion_spatial_spark.meta import GeometryMeta

W = GeometryMeta(encoding="WKB")

# Reference distances (meters): computed from the documented formulas
# themselves at well-known city pairs; cross-checked against published
# great-circle values (±0.5%).
PARIS = (2.3522, 48.8566)
LONDON = (-0.1276, 51.5072)
NYC = (-74.0060, 40.7128)


def pdf(spark, a, b):
    return spark.createDataFrame(
        [(a[0], a[1], b[0], b[1])], "ax double, ay double, bx double, by double"
    ).select(st_point("ax", "ay").alias("a"), st_point("bx", "by").alias("b"))


def test_kernel_haversine_known_pairs():
    d = G.haversine_m(*PARIS, *LONDON)
    assert abs(d - 343_900) < 2_000  # published ~343.9 km
    d2 = G.haversine_m(*LONDON, *NYC)
    assert abs(d2 - 5_570_000) < 20_000  # published ~5570 km


def test_sphere_distance_catalyst(spark):
    df = pdf(spark, PARIS, LONDON)
    out = df.select(st_distancesphere("a", "b").alias("d"))
    # pure Catalyst: no Python evaluation nodes in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan
    d = out.collect()[0].d
    assert abs(d - G.haversine_m(*PARIS, *LONDON)) < 1e-6


def test_spheroid_vs_sphere_within_half_percent(spark):
    df = pdf(spark, LONDON, NYC)
    row = df.select(
        st_distancesphere("a", "b").alias("ds"),
        st_distancespheroid("a", "b").alias("de"),
    ).collect()[0]
    assert abs(row.de - row.ds) / row.ds < 0.005
    # identical points: guarded path, exact zero
    z = pdf(spark, PARIS, PARIS).select(
        st_distancespheroid("a", "b").alias("d")
    ).collect()[0].d
    assert z == 0.0


def test_lengthsphere_sums_segments(spark):
    df = spark.createDataFrame(
        [(f"LINESTRING ({PARIS[0]} {PARIS[1]}, {LONDON[0]} {LONDON[1]}, "
          f"{NYC[0]} {NYC[1]})",)],
        "wkt string",
    ).select(st_geomfromtext("wkt").alias("g"))
    d = df.select(st_lengthsphere("g", W).alias("L")).collect()[0].L
    want = G.haversine_m(*PARIS, *LONDON) + G.haversine_m(*LONDON, *NYC)
    assert abs(d - want) < 1e-6


def test_transform_point_roundtrip_catalyst(spark):
    df = pdf(spark, PARIS, LONDON)
    out = df.select(
        st_transform_point("a", 4326, 3857).alias("m"),
    ).select(
        st_x("m").alias("mx"),
        st_y("m").alias("my"),
        st_transform_point("m", 3857, 4326).alias("back"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan
    r = out.collect()[0]
    # EPSG:3857 of Paris (proj-verified magnitudes)
    assert abs(r.mx - 261_847.0) < 200
    assert abs(r.my - 6_250_566.0) < 600
    assert abs(r.back.x - PARIS[0]) < 1e-9
    assert abs(r.back.y - PARIS[1]) < 1e-9


def test_transform_geom_kernel_roundtrip():
    g = wkb.from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    m = G.transform(g, 4326, 3857)
    assert m.srid == 3857
    back = G.transform(m, 3857, 4326)
    for (x0, y0), (x1, y1) in zip(g.coords[0], back.coords[0]):
        assert abs(x0 - x1) < 1e-9 and abs(y0 - y1) < 1e-9
    with pytest.raises(NotImplementedError):
        G.transform(g, 4326, 2056)


def test_transform_spark_wkb(spark):
    df = spark.createDataFrame([("POINT (2.3522 48.8566)",)], "wkt string").select(
        st_geomfromtext("wkt").alias("g")
    )
    out = df.select(st_transform("g", 4326, 3857, W).alias("m")).collect()[0].m
    g = wkb.loads(bytes(out))
    assert abs(g.coords[0] - 261_847.0) < 200


def test_tile_envelope_world_and_zoom1(spark):
    df = spark.range(1)
    world = df.select(st_tileenvelope(0, 0, 0).alias("e")).collect()[0].e
    ring = world[0]
    xs = [p.x for p in ring]
    ys = [p.y for p in ring]
    half = math.pi * 6378137.0
    assert abs(min(xs) + half) < 1e-6 and abs(max(xs) - half) < 1e-6
    assert abs(min(ys) + half) < 1e-6 and abs(max(ys) - half) < 1e-6
    # tile (1, 1, 0) = NE quadrant
    ne = df.select(st_tileenvelope(1, 1, 0).alias("e")).collect()[0].e[0]
    assert min(p.x for p in ne) == 0.0 and min(p.y for p in ne) == 0.0


def test_tile_and_quadkey(spark):
    df = spark.createDataFrame(
        [(PARIS[0], PARIS[1])], "x double, y double"
    ).select(st_point("x", "y").alias("p"))
    out = df.select(
        st_tile("p", 10).alias("t"), st_quadkey("p", 10).alias("qk")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan
    r = out.collect()[0]
    # slippy-map arithmetic, hand-computed for Paris @ z10
    assert (r.t.z, r.t.x, r.t.y) == (10, 518, 352)
    assert len(r.qk) == 10 and set(r.qk) <= set("0123")
    # quadkey of the tile's parent is a prefix of the child's
    r5 = df.select(st_quadkey("p", 5).alias("qk")).collect()[0].qk
    assert r.qk.startswith(r5)


def test_tile_envelope_contains_transformed_point(spark):
    """The z10 tile of a lon/lat point contains its mercator projection."""
    df = spark.createDataFrame(
        [(LONDON[0], LONDON[1])], "x double, y double"
    ).select(st_point("x", "y").alias("p"))
    r = df.select(
        st_tile("p", 10).alias("t"),
        st_transform_point("p", 4326, 3857).alias("m"),
    ).select(
        st_tileenvelope(F.col("t.z"), F.col("t.x"), F.col("t.y")).alias("e"), "m"
    ).collect()[0]
    xs = [p.x for p in r.e[0]]
    ys = [p.y for p in r.e[0]]
    assert min(xs) <= r.m.x <= max(xs)
    assert min(ys) <= r.m.y <= max(ys)


def test_sql_resolver_geodesic(spark):
    from datafusion_spatial_spark.meta import with_geo_meta
    from datafusion_spatial_spark.plans.sql import SpatialSQL

    meta = GeometryMeta(encoding="point", geometry_types=("Point",))
    df = spark.createDataFrame(
        [(1, PARIS[0], PARIS[1], LONDON[0], LONDON[1])],
        "id long, ax double, ay double, bx double, by double",
    ).select(
        "id",
        st_point("ax", "ay").alias("g"),
        st_point("bx", "by").alias("h"),
    )
    ss = SpatialSQL(spark)
    ss.register_view(
        "geo_pts", with_geo_meta(with_geo_meta(df, "g", meta), "h", meta)
    )
    r = ss.sql(
        "SELECT ST_DistanceSphere(g, h) AS d, ST_Quadkey(g, 5) AS qk FROM geo_pts"
    ).collect()[0]
    assert abs(r.d - G.haversine_m(*PARIS, *LONDON)) < 1e-6
    assert len(r.qk) == 5


def test_st_areasphere_equator_square(spark):
    import math

    from datafusion_spatial_spark.functions.geodesic import st_areasphere
    from datafusion_spatial_spark.geom_ops import EARTH_RADIUS

    # 1x1 degree lon/lat rectangle at the equator, with a half-degree hole;
    # Chamberlain-Duquette is exact for parallel-bounded rectangles:
    # A = R^2 * dLon * (sin latN - sin latS)
    outer = "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"
    holed = (
        "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0), "
        "(0.25 0.25, 0.75 0.25, 0.75 0.75, 0.25 0.75, 0.25 0.25))"
    )
    from datafusion_spatial_spark.functions import st_geomfromtext
    from datafusion_spatial_spark.meta import GeometryMeta

    df = spark.createDataFrame([(outer,), (holed,)], "wkt string").select(
        st_areasphere(
            st_geomfromtext("wkt"), GeometryMeta(encoding="WKB")
        ).alias("a")
    ).collect()
    rad = math.pi / 180.0
    a_outer = EARTH_RADIUS**2 * rad * math.sin(rad)
    a_hole = EARTH_RADIUS**2 * (0.5 * rad) * (
        math.sin(0.75 * rad) - math.sin(0.25 * rad)
    )
    assert abs(df[0].a - a_outer) / a_outer < 1e-12
    assert abs(df[1].a - (a_outer - a_hole)) / a_outer < 1e-12


# ---------------------------------------------------------------------------
# General CRS transforms: UTM (EPSG:326zz/327zz) + LAEA (EPSG:3035)


def test_utm_structural_truths():
    # central meridian -> easting exactly 500000; equator -> northing 0
    assert G._tm_fwd(3.0, 0.0, 3.0, False) == (500_000.0, 0.0)
    # scale at the central meridian is k0 = 0.9996: northing delta over a
    # short meridian arc (exact ellipsoidal arc via the M series)
    _, y1 = G._tm_fwd(3.0, 45.0, 3.0, False)
    _, y2 = G._tm_fwd(3.0, 45.01, 3.0, False)
    e2 = G.WGS84_F * (2 - G.WGS84_F)
    c0, c2, c4, c6 = G._merid_coeffs(e2)

    def M(lat):
        p = math.radians(lat)
        return G.WGS84_A * (
            c0 * p - c2 * math.sin(2 * p) + c4 * math.sin(4 * p)
            - c6 * math.sin(6 * p)
        )

    assert abs((y2 - y1) / (M(45.01) - M(45.0)) - 0.9996) < 1e-12
    # southern hemisphere: false northing 10,000,000 at the equator
    xs, ys = G._tm_fwd(151.0, -0.001, 151.0 - (151.0 % 6) + 3.0, True)
    assert ys < 10_000_000.0 and ys > 9_999_000.0


def test_utm_kernel_roundtrip_and_zone_codes():
    for lon, lat, srid in [
        (2.2945, 48.8584, 32631),      # Paris, 31N
        (151.2093, -33.8688, 32756),   # Sydney, 56S
        (-74.0060, 40.7128, 32618),    # NYC, 18N
    ]:
        zone, south = G.utm_zone_of(srid)
        x, y = G._tm_fwd(lon, lat, G.utm_lon0(zone), south)
        # in-zone plausibility: easting within [100km, 900km]
        assert 100_000 < x < 900_000
        lon2, lat2 = G._tm_inv(x, y, G.utm_lon0(zone), south)
        assert abs(lon2 - lon) < 1e-7 and abs(lat2 - lat) < 1e-7
    assert G.utm_zone_of(4326) is None
    assert G.utm_zone_of(32661) is None  # UPS codes are NOT UTM


def test_laea_equal_area_and_center():
    # projection center maps exactly to the false origin
    assert G._laea_fwd(10.0, 52.0) == (4_321_000.0, 3_210_000.0)
    # EQUAL AREA: planar shoelace area of a projected graticule cell equals
    # the exact ellipsoidal area  a^2 * dlam * (q2 - q1) / 2
    lon1, lon2, lat1, lat2 = 8.0, 12.0, 50.0, 54.0
    n = 200
    ring = (
        [(lon1 + (lon2 - lon1) * i / n, lat1) for i in range(n)]
        + [(lon2, lat1 + (lat2 - lat1) * i / n) for i in range(n)]
        + [(lon2 - (lon2 - lon1) * i / n, lat2) for i in range(n)]
        + [(lon1, lat2 - (lat2 - lat1) * i / n) for i in range(n)]
    )
    proj = [G._laea_fwd(lo, la) for lo, la in ring]
    s = 0.0
    for (x1, y1), (x2, y2) in zip(proj, proj[1:] + proj[:1]):
        s += x1 * y2 - x2 * y1
    planar = abs(s) / 2
    e2 = G.GRS80_F * (2 - G.GRS80_F)
    e = math.sqrt(e2)
    q1 = G._laea_q(math.radians(lat1), e, e2)
    q2 = G._laea_q(math.radians(lat2), e, e2)
    exact = G.GRS80_A**2 * math.radians(lon2 - lon1) * (q2 - q1) / 2
    assert abs(planar - exact) / exact < 1e-6
    # roundtrip
    for lo, la in [(2.2945, 48.8584), (24.9, 60.2), (-3.7, 40.4)]:
        x, y = G._laea_fwd(lo, la)
        lo2, la2 = G._laea_inv(x, y)
        assert abs(lo2 - lo) < 1e-7 and abs(la2 - la) < 1e-7


def test_transform_catalyst_matches_kernel_and_duckdb(spark):
    """Three-way agreement at mm level: python kernel == pure-Catalyst
    expression == a DuckDB mirror of the same Snyder series (the
    value-exact SQL-oracle leg)."""
    import duckdb

    pts = [(2.2945, 48.8584), (5.9, 45.1), (0.1, 52.0), (2.999, 0.001)]
    df = spark.createDataFrame(pts, "lon double, lat double").select(
        st_point("lon", "lat").alias("g"), "lon", "lat"
    )
    out = df.select(
        "lon", "lat",
        st_transform_point("g", 4326, 32631).alias("utm"),
        st_transform_point("g", 4326, 3035).alias("laea"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan
    rows = out.collect()
    for r in rows:
        kx, ky = G._tm_fwd(r.lon, r.lat, G.utm_lon0(31), False)
        assert abs(r.utm.x - kx) < 1e-6 and abs(r.utm.y - ky) < 1e-6
        lx, ly = G._laea_fwd(r.lon, r.lat)
        assert abs(r.laea.x - lx) < 1e-6 and abs(r.laea.y - ly) < 1e-6

    # DuckDB mirror of the UTM forward series with the same shared literals
    e2 = G.WGS84_F * (2 - G.WGS84_F)
    ep2 = e2 / (1 - e2)
    c0, c2, c4, c6 = G._merid_coeffs(e2)
    a, k0, fe = G.WGS84_A, G._UTM_K0, G._UTM_FE
    lam0 = math.radians(G.utm_lon0(31))
    sql = f"""
WITH p AS (SELECT radians(lat) AS phi, radians(lon) AS lam, lon, lat FROM pts),
t AS (
  SELECT lon, lat,
         {a} / sqrt(1 - {e2} * sin(phi) * sin(phi)) AS N,
         tan(phi) * tan(phi) AS T,
         {ep2} * cos(phi) * cos(phi) AS C,
         (lam - {lam0}) * cos(phi) AS A,
         {a} * ({c0} * phi - {c2} * sin(2 * phi) + {c4} * sin(4 * phi)
                - {c6} * sin(6 * phi)) AS M,
         tan(phi) AS tphi
  FROM p
)
SELECT lon, lat,
       {fe} + {k0} * N * (A + (1 - T + C) * A * A * A / 6
           + (5 - 18 * T + T * T + 72 * C - {58 * ep2}) * A * A * A * A * A / 120) AS x,
       {k0} * (M + N * tphi * (A * A / 2
           + (5 - T + 9 * C + 4 * C * C) * A * A * A * A / 24
           + (61 - 58 * T + T * T + 600 * C - {330 * ep2}) * A * A * A * A * A * A / 720)) AS y
FROM t
"""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pts (lon DOUBLE, lat DOUBLE)"
    )
    con.executemany("INSERT INTO pts VALUES (?, ?)", pts)
    duck = {(r[0], r[1]): (r[2], r[3]) for r in con.execute(sql).fetchall()}
    for r in rows:
        dx, dy = duck[(r.lon, r.lat)]
        assert abs(r.utm.x - dx) < 1e-3 and abs(r.utm.y - dy) < 1e-3


def test_transform_wkb_kernel_utm_laea():
    g = wkb.from_wkt("LINESTRING (2 48, 3 49, 4 50)")
    m = G.transform(g, 4326, 32631)
    assert m.srid == 32631
    back = G.transform(m, 32631, 4326)
    for (x0, y0), (x1, y1) in zip(g.coords, back.coords):
        assert abs(x0 - x1) < 1e-7 and abs(y0 - y1) < 1e-7
    # chained pair that pivots through 4326 (3857 -> 3035)
    merc = G.transform(g, 4326, 3857)
    eu = G.transform(merc, 3857, 3035)
    direct = G.transform(g, 4326, 3035)
    for (x0, y0), (x1, y1) in zip(eu.coords, direct.coords):
        assert abs(x0 - x1) < 1e-6 and abs(y0 - y1) < 1e-6


def test_sql_resolver_st_transform(spark):
    from datafusion_spatial_spark.meta import with_geo_meta
    from datafusion_spatial_spark.plans.sql import SpatialSQL

    df = spark.createDataFrame([(2.2945, 48.8584)], "lon double, lat double")
    df = df.select(st_point("lon", "lat").alias("geometry"))
    df = with_geo_meta(
        df, "geometry",
        GeometryMeta(encoding="point", geometry_types=("Point",)),
    )
    ssql = SpatialSQL(spark)
    ssql.register_view("t", df)
    out = ssql.sql(
        "SELECT ST_Transform(geometry, 4326, 32631) AS g FROM t"
    ).collect()[0].g
    got = wkb.loads(bytes(out))
    kx, ky = G._tm_fwd(2.2945, 48.8584, G.utm_lon0(31), False)
    assert abs(got.coords[0] - kx) < 1e-6 and abs(got.coords[1] - ky) < 1e-6


def test_buffer_geography_meter_true(spark):
    """ST_BufferGeography: meter-radius buffer of lon/lat geometries via
    the local UTM pivot — every boundary vertex sits ~1000 m (haversine)
    from the center, both hemispheres; SQL form works; zone-spanning
    input raises."""
    import math

    from datafusion_spatial_spark.functions.geodesic import (
        st_buffergeography,
    )
    from datafusion_spatial_spark.meta import with_geo_meta
    from datafusion_spatial_spark.plans.sql import SpatialSQL

    pm = GeometryMeta(encoding="point", geometry_types=("Point",))
    df = spark.createDataFrame(
        [(1, 2.3522, 48.8566), (2, 151.2093, -33.8688)],
        "id long, lon double, lat double",
    ).select("id", st_point("lon", "lat").alias("g"))
    rows = df.select(
        "id", st_buffergeography("g", 1000.0, pm).alias("b")
    ).collect()
    R = 6371008.8

    def hav(lon1, lat1, lon2, lat2):
        p1, p2 = math.radians(lat1), math.radians(lat2)
        dl = math.radians(lon2 - lon1)
        h = (
            math.sin((p2 - p1) / 2) ** 2
            + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
        )
        return 2 * R * math.asin(math.sqrt(h))

    centers = {1: (2.3522, 48.8566), 2: (151.2093, -33.8688)}
    for r in rows:
        g = wkb.loads(bytes(r.b))
        assert g.type_name == "Polygon"
        lon0, lat0 = centers[r.id]
        ds = [hav(lon0, lat0, p[0], p[1]) for p in g.coords[0]]
        assert 990 < min(ds) and max(ds) < 1010, (r.id, min(ds), max(ds))
    ssql = SpatialSQL(spark)
    ssql.register_view("geo_b", with_geo_meta(df, "g", pm))
    out = ssql.sql(
        "SELECT ST_Area(ST_Transform(ST_BufferGeography(g, 500.0), "
        "4326, 32631)) AS a FROM geo_b WHERE id = 1"
    ).collect()[0]
    assert abs(out.a - math.pi * 500 * 500) < 0.01 * math.pi * 500 * 500
    wide = wkb.Geom("LineString", [(0.0, 0.0), (30.0, 0.0)])
    with pytest.raises(ValueError, match="UTM zone"):
        G.buffer_geography(wide, 100.0)


def test_buffer_geography_zone_straddling(spark):
    """Round-6 fix (advisor finding): a geometry straddling a UTM zone
    boundary used to buffer in the centroid's zone with up to ~6° of
    meridian distance (~0.3-0.5% scale error). It now pivots through a
    centroid-centered custom transverse Mercator, so the meter radius
    stays ~0.1%-true across the zone seam."""
    import math

    from datafusion_spatial_spark import geom_ops as G
    from datafusion_spatial_spark import wkb
    from datafusion_spatial_spark.geom_ops import EARTH_RADIUS

    def hav(a, b):
        p1, p2 = math.radians(a[1]), math.radians(b[1])
        dl = math.radians(b[0] - a[0])
        h = (
            math.sin((p2 - p1) / 2) ** 2
            + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
        )
        return 2 * EARTH_RADIUS * math.asin(math.sqrt(h))

    # zone 31/32 seam at lon 6: point buffers stay meter-true
    for lon, lat in ((5.999, 48.0), (6.001, -33.0)):
        pt = wkb.Geom("Point", (lon, lat))
        ring = G.buffer_geography(
            wkb.Geom("LineString", [(lon - 0.11, lat), (lon + 0.11, lat)]),
            5000.0,
        ).coords[0]
        ds = [
            min(hav(v, (lon - 0.11, lat)), hav(v, (lon + 0.11, lat)))
            for v in ring
        ]
        # cap vertices sit ~radius from the nearer endpoint
        assert 5000.0 * 0.99 < min(ds) < 5000.0 * 1.01
        # and a plain point at the seam still round-trips
        out = G.buffer_geography(pt, 1000.0)
        dd = [hav(v, (lon, lat)) for v in out.coords[0]]
        assert all(abs(d - 1000.0) < 10.0 for d in dd)


def test_st_distancesphere_dispatches_on_geometry_kind(spark):
    """Round-6: ST_DistanceSphere on non-point columns must dispatch to
    the exact geometry kernel, not ride the point x/y extraction. Point
    inputs keep the pure-Catalyst haversine plan (no Python)."""
    import math

    from datafusion_spatial_spark import wkb as W
    from datafusion_spatial_spark.functions.geodesic import st_distancesphere
    from datafusion_spatial_spark.functions.scalar import st_point
    from datafusion_spatial_spark.geom_ops import EARTH_RADIUS
    from datafusion_spatial_spark.meta import GeometryMeta

    line_meta = GeometryMeta(encoding="WKB", geometry_types=("LineString",))
    pm = GeometryMeta(encoding="point", geometry_types=("Point",))
    df = spark.createDataFrame(
        [(1, bytearray(W.dumps(W.Geom("LineString", [(0.0, 0.0), (10.0, 0.0)]))),
          5.0, 1.0)],
        "id long, line binary, px double, py double",
    ).select("id", "line", st_point(F.col("px"), F.col("py")).alias("p"))
    d = df.select(
        st_distancesphere("line", "p", line_meta, pm).alias("d")
    ).collect()[0].d
    assert abs(d - math.radians(1.0) * EARTH_RADIUS) < 1e-6
    # point x point stays Catalyst (no Python eval in the plan)
    out = df.select(st_distancesphere("p", "p", pm, pm).alias("d"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_distance_sphere_geom_fast_parity(spark):
    """The numpy-vectorized spherical distance kernel must agree with the
    scalar reference on random point/line/polygon pairs (the join refine
    routes through the fast path)."""
    import math
    import random

    from datafusion_spatial_spark import geom_ops as GO
    from datafusion_spatial_spark import wkb as W

    rng = random.Random(2)

    def mk():
        k = rng.randrange(3)
        if k == 0:
            return W.Geom("Point", (rng.uniform(-10, 10), rng.uniform(40, 60)))
        if k == 1:
            n = rng.randint(2, 30)
            x, y = rng.uniform(-10, 10), rng.uniform(40, 60)
            pts = [(x, y)]
            for _ in range(n - 1):
                x += rng.uniform(-0.3, 0.3)
                y += rng.uniform(-0.3, 0.3)
                pts.append((x, y))
            return W.Geom("LineString", pts)
        x, y = rng.uniform(-10, 10), rng.uniform(40, 60)
        r = rng.uniform(0.05, 0.5)
        ring = [
            (x + r * math.cos(t * 2 * math.pi / 8),
             y + r * math.sin(t * 2 * math.pi / 8))
            for t in range(8)
        ]
        return W.Geom("Polygon", [ring + [ring[0]]])

    for trial in range(150):
        a, b = mk(), mk()
        d1 = GO.distance_sphere_geom(a, b)
        d2 = GO.distance_sphere_geom_fast(a, b)
        assert (d1 is None) == (d2 is None)
        if d1 is not None:
            assert abs(d1 - d2) <= 1e-6 * max(1.0, d1), (trial, d1, d2)


class TestCustomCRS:
    """register_crs / custom= escape hatch (VERDICT r7 item 8): arbitrary
    targets without pyproj — callables pivot through lon/lat, affine
    registrations additionally get a pure-Catalyst point path. The oracle
    is the closed-form LAEA twin (4326->3035)."""

    SRID_CB = 990_001   # callable registration (LAEA twins)
    SRID_AFF = 990_002  # affine registration

    @pytest.fixture(autouse=True)
    def _registry(self):
        from datafusion_spatial_spark.functions import (
            register_crs, similarity_affine, unregister_crs,
        )

        register_crs(
            self.SRID_CB, to_lonlat=G._laea_inv, from_lonlat=G._laea_fwd
        )
        register_crs(
            self.SRID_AFF,
            affine=similarity_affine(2.0, 30.0, tx=100.0, ty=-50.0),
        )
        yield
        unregister_crs(self.SRID_CB)
        unregister_crs(self.SRID_AFF)

    def _pts(self, spark):
        rows = [(2.3522, 48.8566), (-0.1276, 51.5072), (24.94, 60.17)]
        return spark.createDataFrame(rows, "x double, y double").select(
            st_point("x", "y").alias("g")
        )

    def test_callable_matches_laea_builtin(self, spark):
        df = self._pts(spark)
        m = GeometryMeta(encoding="point", geometry_types=("Point",))
        out = df.select(
            st_transform("g", 4326, self.SRID_CB, m).alias("custom"),
            st_transform("g", 4326, 3035, m).alias("builtin"),
        ).collect()
        for r in out:
            assert r.custom == r.builtin  # bit-identical WKB

    def test_callable_roundtrip(self, spark):
        df = self._pts(spark)
        m = GeometryMeta(encoding="point", geometry_types=("Point",))
        wkb_meta = GeometryMeta(encoding="WKB")
        back = df.select(
            F.col("g.x").alias("x0"), F.col("g.y").alias("y0"),
            st_transform(
                st_transform("g", 4326, self.SRID_CB, m),
                self.SRID_CB, 4326, wkb_meta,
            ).alias("rt"),
        ).collect()
        for r in back:
            g = wkb.loads(bytes(r.rt))
            # tolerance is the LAEA series inverse's own precision (~1 cm)
            assert abs(g.coords[0] - r.x0) < 1e-7
            assert abs(g.coords[1] - r.y0) < 1e-7

    def test_callable_pivots_through_builtin_pair(self, spark):
        # 3857 -> custom chains web-mercator-inverse then the callable
        df = self._pts(spark)
        m = GeometryMeta(encoding="point", geometry_types=("Point",))
        merc = df.select(st_transform_point("g", 4326, 3857, m).alias("g"))
        via = merc.select(
            st_transform("g", 3857, self.SRID_CB, m).alias("w")
        ).collect()
        direct = df.select(
            st_transform("g", 4326, self.SRID_CB, m).alias("w")
        ).collect()
        for a, b in zip(via, direct):
            ga, gb = wkb.loads(bytes(a.w)), wkb.loads(bytes(b.w))
            assert abs(ga.coords[0] - gb.coords[0]) < 1e-6
            assert abs(ga.coords[1] - gb.coords[1]) < 1e-6

    def test_affine_point_pure_catalyst_roundtrip(self, spark):
        df = self._pts(spark)
        m = GeometryMeta(encoding="point", geometry_types=("Point",))
        out = df.select(
            "g",
            st_transform_point("g", 4326, self.SRID_AFF, m).alias("t"),
        ).select(
            "g", "t",
            st_transform_point("t", self.SRID_AFF, 4326, m).alias("rt"),
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan
        for r in out.collect():
            # similarity(2.0, 30deg, 100, -50) applied by hand
            c, s = 2.0 * math.cos(math.radians(30)), 2.0 * math.sin(
                math.radians(30)
            )
            ex = c * r.g.x - s * r.g.y + 100.0
            ey = s * r.g.x + c * r.g.y - 50.0
            assert abs(r.t.x - ex) < 1e-9 and abs(r.t.y - ey) < 1e-9
            assert abs(r.rt.x - r.g.x) < 1e-9 and abs(r.rt.y - r.g.y) < 1e-9

    def test_affine_wkb_kernel_agrees_with_catalyst(self, spark):
        df = self._pts(spark)
        m = GeometryMeta(encoding="point", geometry_types=("Point",))
        rows = df.select(
            st_transform("g", 4326, self.SRID_AFF, m).alias("w"),
            st_transform_point("g", 4326, self.SRID_AFF, m).alias("p"),
        ).collect()
        for r in rows:
            g = wkb.loads(bytes(r.w))
            assert abs(g.coords[0] - r.p.x) < 1e-12
            assert abs(g.coords[1] - r.p.y) < 1e-12

    def test_custom_kwarg_direct_pair(self, spark):
        # custom= bypasses the registry entirely: direct 4326 -> LAEA fn
        df = self._pts(spark)
        m = GeometryMeta(encoding="point", geometry_types=("Point",))
        out = df.select(
            st_transform("g", 4326, 999_999, m, custom=G._laea_fwd).alias("c"),
            st_transform("g", 4326, 3035, m).alias("b"),
        ).collect()
        for r in out:
            assert r.c == r.b

    def test_kernel_lines_and_collections(self):
        ls = wkb.loads(wkb.dumps(G.Geom(
            "LineString", [(2.3522, 48.8566), (24.94, 60.17)]
        )))
        a = G.transform(ls, 4326, self.SRID_CB)
        b = G.transform(ls, 4326, 3035)
        assert a.coords == b.coords

    def test_unregistered_still_raises(self, spark):
        m = GeometryMeta(encoding="point", geometry_types=("Point",))
        df = self._pts(spark)
        with pytest.raises(Exception, match="not supported|no pure-Catalyst"):
            df.select(st_transform("g", 4326, 123_456, m)).collect()
        with pytest.raises(NotImplementedError, match="register_crs"):
            df.select(st_transform_point("g", 4326, 123_456, m))

    def test_register_validation(self):
        from datafusion_spatial_spark.functions import register_crs

        with pytest.raises(ValueError, match="singular"):
            register_crs(990_009, affine=(1.0, 2.0, 2.0, 4.0, 0.0, 0.0))
        with pytest.raises(ValueError, match="both"):
            register_crs(990_009, to_lonlat=lambda x, y: (x, y))


class TestConicProjections:
    """Albers equal-area (5070/3310/3577) + Lambert conformal conic
    (2154/3978) closed forms (VERDICT r8 item 4). Truth checks: exact
    false-origin identity, sub-1e-9-degree round trips across each
    projection's service area, unit scale on the first standard parallel
    against ellipsoidal reference distances, the defining property of
    each family (area preservation / conformality), and the SQL surface."""

    AREAS = {
        5070: (-124, -67, 25, 49), 3310: (-124, -114, 32, 42),
        3577: (113, 154, -44, -10), 2154: (-5, 9, 41, 51),
        3978: (-140, -50, 40, 84),
    }

    @staticmethod
    def _ellipsoid_ew(lon, lat, dlon):
        e2 = G.GRS80_F * (2 - G.GRS80_F)
        phi = math.radians(lat)
        N = G.GRS80_A / math.sqrt(1 - e2 * math.sin(phi) ** 2)
        return N * math.cos(phi) * math.radians(dlon)

    def test_false_origin_identity(self):
        for srid, p in G._ALBERS_CODES.items():
            x, y = G._aea_fwd(p[3], p[2], p)
            assert abs(x - p[4]) < 1e-6 and abs(y - p[5]) < 1e-6, srid
        for srid, p in G._LCC_CODES.items():
            x, y = G._lcc_fwd(p[3], p[2], p)
            assert abs(x - p[4]) < 1e-6 and abs(y - p[5]) < 1e-6, srid

    def test_roundtrip_service_areas(self):
        import random

        rng = random.Random(9)
        for srid, (lo1, lo2, la1, la2) in self.AREAS.items():
            fwd = G._lookup_transform(4326, srid)
            inv = G._lookup_transform(srid, 4326)
            for _ in range(120):
                lon, lat = rng.uniform(lo1, lo2), rng.uniform(la1, la2)
                x, y = fwd(lon, lat)
                lon2, lat2 = inv(x, y)
                assert abs(lon2 - lon) < 1e-9 and abs(lat2 - lat) < 1e-9, srid

    def test_unit_scale_on_standard_parallel(self):
        sp1 = {5070: (-96, 29.5), 3310: (-120, 34.0), 3577: (132, -18.0),
               2154: (3, 49.0), 3978: (-95, 49.0)}
        for srid, (lon, lat) in sp1.items():
            fwd = G._lookup_transform(4326, srid)
            x1, y1 = fwd(lon, lat)
            x2, y2 = fwd(lon + 0.01, lat)
            r = math.hypot(x2 - x1, y2 - y1) / self._ellipsoid_ew(lon, lat, 0.01)
            assert abs(r - 1) < 2e-5, (srid, r)

    def test_albers_preserves_area(self):
        # planar shoelace area of a projected graticule cell equals the
        # exact ellipsoidal area a^2 * dlam * (q2 - q1) / 2 (same identity
        # the LAEA test uses — it defines "equal-area")
        e2 = G.GRS80_F * (2 - G.GRS80_F)
        e = math.sqrt(e2)
        for srid, (lon0, lat0) in {5070: (-100.0, 38.0), 3577: (140.0, -30.0)}.items():
            p = G._ALBERS_CODES[srid]
            lon1, lon2, lat1, lat2 = lon0, lon0 + 4.0, lat0, lat0 + 4.0
            n = 200
            ring = (
                [(lon1 + (lon2 - lon1) * i / n, lat1) for i in range(n)]
                + [(lon2, lat1 + (lat2 - lat1) * i / n) for i in range(n)]
                + [(lon2 - (lon2 - lon1) * i / n, lat2) for i in range(n)]
                + [(lon1, lat2 - (lat2 - lat1) * i / n) for i in range(n)]
            )
            proj = [G._aea_fwd(lo, la, p) for lo, la in ring]
            s = 0.0
            for (x1, y1), (x2, y2) in zip(proj, proj[1:] + proj[:1]):
                s += x1 * y2 - x2 * y1
            planar = abs(s) / 2
            q1 = G._laea_q(math.radians(lat1), e, e2)
            q2 = G._laea_q(math.radians(lat2), e, e2)
            exact = G.GRS80_A**2 * math.radians(lon2 - lon1) * abs(q2 - q1) / 2
            assert abs(planar - exact) / exact < 1e-6, srid

    def test_lcc_is_conformal(self):
        # conformal: at any point the E-W and N-S scale factors agree
        e2 = G.GRS80_F * (2 - G.GRS80_F)
        for srid, (lon, lat) in {2154: (5.0, 44.5), 3978: (-110.0, 62.0)}.items():
            fwd = G._lookup_transform(4326, srid)
            x0, y0 = fwd(lon, lat)
            xe, ye = fwd(lon + 1e-4, lat)
            xn, yn = fwd(lon, lat + 1e-4)
            phi = math.radians(lat)
            N = G.GRS80_A / math.sqrt(1 - e2 * math.sin(phi) ** 2)
            M = G.GRS80_A * (1 - e2) / (1 - e2 * math.sin(phi) ** 2) ** 1.5
            k_ew = math.hypot(xe - x0, ye - y0) / (
                N * math.cos(phi) * math.radians(1e-4))
            k_ns = math.hypot(xn - x0, yn - y0) / (M * math.radians(1e-4))
            assert abs(k_ew / k_ns - 1) < 1e-6, srid

    def test_known_city_coordinates(self):
        # generous boxes around published values (EPSG-registry-style
        # sanity, not mm assertions): Paris in Lambert-93, Denver in
        # Conus Albers
        x, y = G._lookup_transform(4326, 2154)(2.3522, 48.8566)
        assert 650_000 < x < 656_000 and 6_859_000 < y < 6_866_000
        x, y = G._lookup_transform(4326, 5070)(-104.99, 39.74)
        assert -800_000 < x < -750_000 and 1_850_000 < y < 1_990_000

    def test_spark_and_sql_surface(self, spark):
        from datafusion_spatial_spark.meta import with_geo_meta
        from datafusion_spatial_spark.plans.sql import SpatialSQL

        m = GeometryMeta(encoding="point", geometry_types=("Point",))
        df = spark.createDataFrame(
            [(2.3522, 48.8566)], "lon double, lat double"
        ).select(st_point("lon", "lat").alias("geometry"))
        out = df.select(st_transform("geometry", 4326, 2154, m).alias("g"))
        got = wkb.loads(bytes(out.collect()[0].g))
        kx, ky = G._lcc_fwd(2.3522, 48.8566, G._LCC_CODES[2154])
        assert abs(got.coords[0] - kx) < 1e-6 and abs(got.coords[1] - ky) < 1e-6
        ssql = SpatialSQL(spark)
        ssql.register_view("t_conic", with_geo_meta(df, "geometry", m))
        g2 = ssql.sql(
            "SELECT ST_Transform(geometry, 4326, 5070) AS g FROM t_conic"
        ).collect()[0].g
        got2 = wkb.loads(bytes(g2))
        ax, ay = G._aea_fwd(2.3522, 48.8566, G._ALBERS_CODES[5070])
        assert abs(got2.coords[0] - ax) < 1e-6 and abs(got2.coords[1] - ay) < 1e-6

    def test_error_message_lists_conics(self):
        g = G.Geom("Point", (1.0, 2.0))
        with pytest.raises(NotImplementedError, match="5070.*2154|Albers"):
            G.transform(g, 4326, 123_456)


class TestPolarStereoAndNamedTM:
    """r10 closed-form additions: ellipsoidal polar stereographic
    (3031/3413/3976 variant B, 5041/5042 UPS variant A) and named
    transverse Mercator codes (27700 OSGB incl. the OS 7-param Helmert
    datum shift, 2180 Poland CS92). Same truth standards as the conic
    class: exact pole/false-origin identities, sub-1e-9-degree round
    trips across service areas, the family-defining properties
    (conformality; unit scale on the standard parallel; k0 at the pole),
    a published worked example pinned to the millimeter, and the SQL
    surface."""

    PST_AREAS = {
        3031: (-180, 180, -88, -60), 3413: (-180, 180, 60, 88),
        3976: (-180, 180, -88, -60), 5041: (-180, 180, 60, 88),
        5042: (-180, 180, -88, -60),
    }

    def test_pole_maps_to_false_origin_exactly(self):
        for srid, p in G._PSTEREO_CODES.items():
            pole = -90.0 if p[5] else 90.0
            for lon in (-135.0, 0.0, 77.0):
                x, y = G._pst_fwd(lon, pole, p)
                assert x == p[3] and y == p[4], (srid, lon)

    def test_pst_roundtrip_service_areas(self):
        import random

        rng = random.Random(11)
        for srid, (lo1, lo2, la1, la2) in self.PST_AREAS.items():
            fwd = G._lookup_transform(4326, srid)
            inv = G._lookup_transform(srid, 4326)
            for _ in range(120):
                lon, lat = rng.uniform(lo1, lo2), rng.uniform(la1, la2)
                x, y = fwd(lon, lat)
                lon2, lat2 = inv(x, y)
                dl = abs((lon2 - lon + 180.0) % 360.0 - 180.0)
                assert dl < 1e-9 and abs(lat2 - lat) < 1e-9, srid

    @staticmethod
    def _wgs_parallel_radius(lat):
        e2 = G.WGS84_F * (2 - G.WGS84_F)
        phi = math.radians(lat)
        N = G.WGS84_A / math.sqrt(1 - e2 * math.sin(phi) ** 2)
        return N * math.cos(phi)

    def test_unit_scale_on_standard_parallel(self):
        # variant B's defining property: k = 1 exactly at lat_ts
        for srid in (3031, 3413, 3976):
            p = G._PSTEREO_CODES[srid]
            lat = p[0]
            fwd = G._lookup_transform(4326, srid)
            x1, y1 = fwd(20.0, lat)
            x2, y2 = fwd(20.01, lat)
            true = self._wgs_parallel_radius(lat) * math.radians(0.01)
            k = math.hypot(x2 - x1, y2 - y1) / true
            assert abs(k - 1) < 1e-6, (srid, k)

    def test_ups_scale_at_pole_is_k0(self):
        # variant A's defining property: k -> 0.994 at the pole (measure
        # just off the pole where the limit is already taken to 1e-6)
        for srid, pole in ((5041, 90.0), (5042, -90.0)):
            fwd = G._lookup_transform(4326, srid)
            lat = pole - math.copysign(0.01, pole)
            x1, y1 = fwd(0.0, lat)
            x2, y2 = fwd(0.01, lat)
            true = self._wgs_parallel_radius(lat) * math.radians(0.01)
            k = math.hypot(x2 - x1, y2 - y1) / true
            assert abs(k - 0.994) < 1e-6, (srid, k)

    def test_pst_is_conformal(self):
        e2 = G.WGS84_F * (2 - G.WGS84_F)
        for srid, (lon, lat) in {3031: (45.0, -75.0), 3413: (-100.0, 72.0),
                                 5041: (30.0, 80.0)}.items():
            fwd = G._lookup_transform(4326, srid)
            x0, y0 = fwd(lon, lat)
            xe, ye = fwd(lon + 1e-4, lat)
            xn, yn = fwd(lon, lat + 1e-4)
            phi = math.radians(lat)
            N = G.WGS84_A / math.sqrt(1 - e2 * math.sin(phi) ** 2)
            M = G.WGS84_A * (1 - e2) / (1 - e2 * math.sin(phi) ** 2) ** 1.5
            k_ew = math.hypot(xe - x0, ye - y0) / (
                N * math.cos(phi) * math.radians(1e-4))
            k_ns = math.hypot(xn - x0, yn - y0) / (M * math.radians(1e-4))
            assert abs(k_ew / k_ns - 1) < 1e-6, srid

    def test_pst_azimuthal_symmetry(self):
        # equal |rho| for equal latitude at any longitude
        for srid, p in G._PSTEREO_CODES.items():
            fwd = G._lookup_transform(4326, srid)
            lat = -75.0 if p[5] else 75.0
            rhos = set()
            for lon in (-120.0, -30.0, 0.0, 64.0, 177.0):
                x, y = fwd(lon, lat)
                rhos.add(round(math.hypot(x - p[3], y - p[4]), 6))
            assert len(rhos) == 1, (srid, rhos)

    def test_osgb_published_worked_example_projection(self):
        # the Ordnance Survey guide's worked example (OSGB36-native
        # coordinates, so the PROJECTION alone is exercised — no datum
        # shift): 52°39'27.2531"N 1°43'4.5177"E -> E 651409.903 N 313177.270
        lat = 52 + 39 / 60 + 27.2531 / 3600
        lon = 1 + 43 / 60 + 4.5177 / 3600
        x, y = G._tm_fwd(lon, lat, -2.0, False, G.AIRY_A, G.AIRY_F,
                         0.9996012717, 400_000.0, -100_000.0, 49.0)
        assert abs(x - 651409.903) < 1e-3 and abs(y - 313177.270) < 1e-3

    def test_named_tm_false_origin_identity(self):
        for srid, p in G._TM_CODES.items():
            lat0, lon0, k0, fe, fn, a, f, _ = p
            x, y = G._tm_fwd(lon0, lat0, lon0, False, a, f, k0, fe, fn, lat0)
            assert abs(x - fe) < 1e-6 and abs(y - fn) < 1e-6, srid

    def test_named_tm_roundtrips(self):
        import random

        rng = random.Random(13)
        areas = {27700: (-7.5, 1.8, 50.0, 60.8), 2180: (14.1, 24.2, 49.0, 54.9)}
        for srid, (lo1, lo2, la1, la2) in areas.items():
            fwd = G._lookup_transform(4326, srid)
            inv = G._lookup_transform(srid, 4326)
            for _ in range(120):
                lon, lat = rng.uniform(lo1, lo2), rng.uniform(la1, la2)
                x, y = fwd(lon, lat)
                lon2, lat2 = inv(x, y)
                # the Snyder TM series truncates at (dlon·cosφ)^6: ~1e-7 deg
                # at the service-area edges, far below the datum accuracy
                assert abs(lon2 - lon) < 1e-6 and abs(lat2 - lat) < 1e-6, srid

    def test_helmert_exact_inverse_and_shift_magnitude(self):
        # the Cramer-rule inverse makes fwd∘inv exact to float precision
        for X, Y, Z in ((3980000.0, -10000.0, 4970000.0),
                        (3875000.0, 116000.0, 5047000.0)):
            x2, y2, z2 = G._helmert_invert(
                *G._helmert_apply(X, Y, Z, G._WGS84_TO_OSGB36),
                G._WGS84_TO_OSGB36,
            )
            assert abs(x2 - X) < 1e-7 and abs(y2 - Y) < 1e-7 and abs(z2 - Z) < 1e-7
        # WGS84->OSGB36 moves a London point by the well-known ~120 m
        fwd = G._lookup_transform(4326, 27700)
        x, y = fwd(-0.1278, 51.5074)
        xn, yn = G._tm_fwd(-0.1278, 51.5074, -2.0, False, G.AIRY_A, G.AIRY_F,
                           0.9996012717, 400_000.0, -100_000.0, 49.0)
        shift = math.hypot(x - xn, y - yn)
        assert 80.0 < shift < 180.0, shift
        # and the WGS84 London point lands in the published BNG box
        assert 528_000 < x < 532_000 and 178_000 < y < 182_500, (x, y)

    def test_spark_and_sql_surface(self, spark):
        from datafusion_spatial_spark.meta import with_geo_meta
        from datafusion_spatial_spark.plans.sql import SpatialSQL

        m = GeometryMeta(encoding="point", geometry_types=("Point",))
        df = spark.createDataFrame(
            [(-0.1278, 51.5074)], "lon double, lat double"
        ).select(st_point("lon", "lat").alias("geometry"))
        out = df.select(st_transform("geometry", 4326, 27700, m).alias("g"))
        got = wkb.loads(bytes(out.collect()[0].g))
        kx, ky = G._tm_named_fwd(-0.1278, 51.5074, G._TM_CODES[27700])
        assert abs(got.coords[0] - kx) < 1e-6 and abs(got.coords[1] - ky) < 1e-6
        ssql = SpatialSQL(spark)
        ssql.register_view("t_pst", with_geo_meta(df, "geometry", m))
        g2 = ssql.sql(
            "SELECT ST_Transform(geometry, 4326, 3413) AS g FROM t_pst"
        ).collect()[0].g
        got2 = wkb.loads(bytes(g2))
        px, py = G._pst_fwd(-0.1278, 51.5074, G._PSTEREO_CODES[3413])
        assert abs(got2.coords[0] - px) < 1e-6 and abs(got2.coords[1] - py) < 1e-6

    def test_error_message_lists_new_families(self):
        g = G.Geom("Point", (1.0, 2.0))
        with pytest.raises(NotImplementedError, match="3031|stereographic"):
            G.transform(g, 4326, 123_456)


class TestFrenchLegacyLambert:
    """r10: NTF (Paris) / Lambert zones I-III (EPSG 27571/27572/27573) —
    the one-standard-parallel conic variant (lat1 = lat2 = lat0 with a k0
    multiplier) on Clarke 1880 IGN, bridged to WGS84 by the published
    EPSG 3-parameter NTF shift (the exact inverse of proj's
    ``+towgs84=-168,-60,320``). The Paris prime meridian folds into the
    Greenwich-referenced central meridian 2°20'14.025\" E."""

    def _proj_only(self, lon, lat, srid):
        lat0, k0, fn = G._NTF_LAMBERT_CODES[srid]
        return G._lcc_fwd(
            lon, lat, (lat0, lat0, lat0, G._PARIS_LON0, 600_000.0, fn),
            G.CLARKE1880IGN_A, G.CLARKE1880IGN_F, k0,
        )

    def test_false_origin_identity(self):
        for srid, (lat0, k0, fn) in G._NTF_LAMBERT_CODES.items():
            x, y = self._proj_only(G._PARIS_LON0, lat0, srid)
            assert abs(x - 600_000.0) < 1e-6 and abs(y - fn) < 1e-6, srid

    def test_k0_scale_on_standard_parallel(self):
        e2 = G.CLARKE1880IGN_F * (2 - G.CLARKE1880IGN_F)
        for srid, (lat0, k0, fn) in G._NTF_LAMBERT_CODES.items():
            x1, y1 = self._proj_only(3.0, lat0, srid)
            x2, y2 = self._proj_only(3.01, lat0, srid)
            N = G.CLARKE1880IGN_A / math.sqrt(
                1 - e2 * math.sin(math.radians(lat0)) ** 2)
            true = N * math.cos(math.radians(lat0)) * math.radians(0.01)
            got = math.hypot(x2 - x1, y2 - y1) / true
            assert abs(got - k0) < 1e-6, (srid, got, k0)

    def test_roundtrips_full_path(self):
        import random

        rng = random.Random(17)
        bands = {27571: (48.15, 51.1), 27572: (45.45, 48.15),
                 27573: (42.3, 45.45)}
        for srid, (la1, la2) in bands.items():
            fwd = G._lookup_transform(4326, srid)
            inv = G._lookup_transform(srid, 4326)
            for _ in range(100):
                lon, lat = rng.uniform(-4.5, 8.2), rng.uniform(la1, la2)
                x, y = fwd(lon, lat)
                lo, la = inv(x, y)
                assert abs(lo - lon) < 1e-8 and abs(la - lat) < 1e-8, srid

    def test_conformal(self):
        e2 = G.CLARKE1880IGN_F * (2 - G.CLARKE1880IGN_F)
        x0, y0 = self._proj_only(4.0, 47.3, 27572)
        xe, ye = self._proj_only(4.0 + 1e-4, 47.3, 27572)
        xn, yn = self._proj_only(4.0, 47.3 + 1e-4, 27572)
        phi = math.radians(47.3)
        N = G.CLARKE1880IGN_A / math.sqrt(1 - e2 * math.sin(phi) ** 2)
        M = G.CLARKE1880IGN_A * (1 - e2) / (1 - e2 * math.sin(phi) ** 2) ** 1.5
        k_ew = math.hypot(xe - x0, ye - y0) / (N * math.cos(phi) * math.radians(1e-4))
        k_ns = math.hypot(xn - x0, yn - y0) / (M * math.radians(1e-4))
        assert abs(k_ew / k_ns - 1) < 1e-6

    def test_datum_shift_and_paris_box(self):
        fwd = G._lookup_transform(4326, 27572)
        x, y = fwd(2.3522, 48.8566)
        # the full path (with the NTF datum) differs from the
        # projection-only result by the Paris-area NTF<->WGS84 ground
        # shift (tens of metres, not zero and not hundreds)
        xn, yn = self._proj_only(2.3522, 48.8566, 27572)
        shift = math.hypot(x - xn, y - yn)
        assert 20.0 < shift < 150.0, shift
        # Paris center in Lambert II étendu: the well-known coordinate
        # neighbourhood (X ~600-606 km, Y ~2.425-2.433 Mm)
        assert 598_000 < x < 606_000 and 2_424_000 < y < 2_433_000, (x, y)

    def test_helmert_translation_only_is_exact_inverse(self):
        for pt in ((4_200_000.0, 170_000.0, 4_780_000.0),
                   (4_300_000.0, -50_000.0, 4_690_000.0)):
            out = G._helmert_invert(
                *G._helmert_apply(*pt, G._WGS84_TO_NTF), G._WGS84_TO_NTF
            )
            for a, b in zip(out, pt):
                assert abs(a - b) < 1e-9


def test_etrs89_utm_codes():
    """r10: EPSG 25828-25838 (ETRS89 / UTM) — same TM core on GRS80.
    Round trips across each zone band; values agree with the WGS84 UTM
    twin to well under the ellipsoid-difference scale (sub-mm: GRS80 and
    WGS84 flattenings differ in the 9th decimal); code bounds honored."""
    import random

    rng = random.Random(19)
    for srid in (25828, 25832, 25838):
        zone = srid - 25800
        lon0 = G.utm_lon0(zone)
        fwd = G._lookup_transform(4326, srid)
        inv = G._lookup_transform(srid, 4326)
        for _ in range(60):
            lon = rng.uniform(lon0 - 2.8, lon0 + 2.8)
            lat = rng.uniform(35.0, 70.0)
            x, y = fwd(lon, lat)
            lo, la = inv(x, y)
            # Snyder series truncation reaches ~6e-9 deg (sub-mm) at the
            # zone edge x high latitude; 1e-7 is still ~1 cm
            assert abs(lo - lon) < 1e-7 and abs(la - lat) < 1e-7, srid
            wx, wy = G._tm_fwd(lon, lat, lon0, False)  # WGS84 twin
            assert abs(x - wx) < 1e-3 and abs(y - wy) < 1e-3, srid
    assert G.etrs89_utm_zone_of(25827) is None
    assert G.etrs89_utm_zone_of(25839) is None
    g = G.Geom("Point", (9.0, 48.0))
    out = G.transform(g, 4326, 25832)
    assert out.srid == 25832 and 400_000 < out.coords[0] < 600_000


@pytest.mark.slow
def test_transform_point_catalyst_twins_all_families(spark):
    """r10: st_transform_point covers the conic/stereographic/named-TM
    families pure-Catalyst. Forward twins are expression-for-expression
    with the kernels (exact agreement at these magnitudes); inverse twins
    use the authalic/conformal SERIES in place of the kernels' iteration
    (an unrolled fixed-point explodes Catalyst codegen — the 8-step
    Albers unroll generated >16k lines of Java), so round trips are
    pinned instead. Plans must stay Python-free."""
    pts = {
        5070: (-104.99, 39.74), 3310: (-118.2, 36.7), 3577: (140.0, -25.0),
        2154: (2.35, 48.85), 3978: (-110.0, 62.0),
        3031: (45.0, -75.0), 3413: (-100.0, 72.0), 3976: (10.0, -70.0),
        5041: (30.0, 80.0), 5042: (-120.0, -80.0),
        2180: (19.5, 52.2), 25832: (9.0, 48.0),
    }
    df = spark.createDataFrame(
        [(lon, lat, srid) for srid, (lon, lat) in pts.items()],
        "lon double, lat double, srid int",
    )
    for srid, (lon, lat) in pts.items():
        one = df.filter(f"srid = {srid}").select(
            st_point("lon", "lat").alias("g"), "lon", "lat"
        )
        out = one.select(st_transform_point("g", 4326, srid).alias("p"))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan, srid
        r = out.collect()[0]
        kx, ky = G._lookup_transform(4326, srid)(lon, lat)
        assert abs(r.p.x - kx) < 1e-6 and abs(r.p.y - ky) < 1e-6, srid
        back = one.select(
            st_transform_point(
                st_transform_point("g", 4326, srid), srid, 4326
            ).alias("b")
        ).collect()[0]
        assert abs(back.b.x - lon) < 1e-6 and abs(back.b.y - lat) < 1e-6, srid


def test_transform_point_catalyst_twin_27700(spark):
    """r11 (VERDICT r10 #4): the OSGB Helmert bridge in Catalyst. The
    7-param position-vector transform and Cramer inverse are plain
    algebra; the kernel's fixed-point XYZ→geodetic becomes BOWRING's
    closed-form latitude (agreement ~1e-14 deg for near-ellipsoid
    heights — measured, pinned below), so the tree stays codegen-safe.
    Forward must match the kernel at the OS worked-example city point;
    plan must be Python-free; round trip through the exact Helmert
    inverse within the series truncation."""
    pts = [(-0.1278, 51.5074), (-3.19, 55.95), (1.3, 52.63), (-5.93, 54.6)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    one = df.select(st_point("lon", "lat").alias("g"), "lon", "lat")
    out = one.select(st_transform_point("g", 4326, 27700).alias("p"), "lon", "lat")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan
    for r in out.collect():
        kx, ky = G._lookup_transform(4326, 27700)(r.lon, r.lat)
        # kernel iterates the latitude; Bowring differs by ~1e-14 deg
        # (~nanometers) — pin well under a micrometer on the grid
        assert abs(r.p.x - kx) < 1e-6 and abs(r.p.y - ky) < 1e-6, (r.lon, r.lat)
    back = one.select(
        st_transform_point(
            st_transform_point("g", 4326, 27700), 27700, 4326
        ).alias("b"), "lon", "lat",
    )
    for r in back.collect():
        assert abs(r.b.x - r.lon) < 1e-6 and abs(r.b.y - r.lat) < 1e-6
    # London lands in the published BNG box (same pin as the kernel test)
    first = out.collect()[0]
    assert 528_000 < first.p.x < 532_000 and 178_000 < first.p.y < 182_500


def test_r11_oceania_crs_codes():
    """NZTM 2193, GDA94/MGA 283xx, GDA2020/MGA 78xx, GA Lambert 3112 —
    plate-fixed datums treated WGS84-coincident like the ETRS89 rows.
    Melbourne MGA zone 55 is pinned to the published grid value."""
    from datafusion_spatial_spark import geom_ops as G

    # GDA94 / MGA zone 55, Melbourne GPO (published ~320704 E, 5812911 N)
    x, y = G._lookup_transform(4326, 28355)(144.9631, -37.8136)
    assert abs(x - 320704.4) < 1.0 and abs(y - 5812911.7) < 1.0
    # GDA2020 zone rows share the math (datum difference < 2 m is inside
    # the documented approximation class): same point, same zone code base
    x20, y20 = G._lookup_transform(4326, 7855)(144.9631, -37.8136)
    assert abs(x20 - x) < 1e-6 and abs(y20 - y) < 1e-6
    # central-meridian invariants: lon0 = 6·zone - 183, FE on the CM
    for code, zone in ((28349, 49), (28356, 56), (7846, 46), (7859, 59)):
        lon0 = 6.0 * zone - 183.0
        fx, fy = G._lookup_transform(4326, code)(lon0, -30.0)
        assert abs(fx - 500_000.0) < 1e-6, code
        assert fy < 10_000_000.0  # south: FN minus the meridian arc
    # NZTM: CM/FE invariant + tight roundtrip at Wellington
    fx, fy = G._lookup_transform(4326, 2193)(173.0, -41.0)
    assert abs(fx - 1_600_000.0) < 1e-6
    x2, y2 = G._lookup_transform(4326, 2193)(174.7772, -41.2889)
    lon, lat = G._lookup_transform(2193, 4326)(x2, y2)
    assert abs(lon - 174.7772) < 1e-9 and abs(lat + 41.2889) < 1e-9
    # 3112 southern cone: origin maps to (0, 0)-ish FE/FN, roundtrip exact
    ox, oy = G._lookup_transform(4326, 3112)(134.0, 0.0)
    assert abs(ox) < 1e-6 and abs(oy) < 1e-6
    x3, y3 = G._lookup_transform(4326, 3112)(133.8807, -23.698)
    lon3, lat3 = G._lookup_transform(3112, 4326)(x3, y3)
    assert abs(lon3 - 133.8807) < 1e-9 and abs(lat3 + 23.698) < 1e-9


def test_r11_oceania_catalyst_twins(spark):
    """The named-TM and LCC Catalyst twins read _TM_CODES/_LCC_CODES
    dynamically — the new rows must produce Python-free plans that match
    the scalar kernels."""
    from datafusion_spatial_spark import geom_ops as G
    from datafusion_spatial_spark.functions.scalar import st_point
    from datafusion_spatial_spark.meta import GeometryMeta

    P = GeometryMeta(encoding="point", geometry_types=("Point",))
    pts = [(144.9631, -37.8136), (145.5, -38.2), (151.2093, -33.8688)]
    df = spark.createDataFrame(pts, "lon double, lat double").select(
        st_point("lon", "lat").alias("p"), "lon", "lat"
    )
    for srid in (28355, 2193, 3112, 7856):
        out = df.select("lon", "lat", st_transform_point("p", 4326, srid).alias("t"))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "BatchEval" not in plan, srid
        for r in out.collect():
            kx, ky = G._lookup_transform(4326, srid)(r.lon, r.lat)
            assert abs(r.t.x - kx) < 1e-6 and abs(r.t.y - ky) < 1e-6, srid


def test_r11_ease_grid_cea(spark):
    """EPSG:6933 EASE-Grid 2.0 (cylindrical equal-area, WGS84, φ1=30°):
    pinned to the published global x extent ±17367530.45 m; Catalyst twin
    parity with a Python-free plan; equal-area column scaling."""
    from datafusion_spatial_spark import geom_ops as G
    from datafusion_spatial_spark.functions.scalar import st_point
    from datafusion_spatial_spark.meta import GeometryMeta

    fn = G._lookup_transform(4326, 6933)
    inv = G._lookup_transform(6933, 4326)
    assert fn(0.0, 0.0) == (0.0, 0.0)
    assert abs(fn(180.0, 0.0)[0] - 17367530.445161372) < 1e-6
    x, y = fn(77.5, 12.3)
    lon, lat = inv(x, y)
    assert abs(lon - 77.5) < 1e-12 and abs(lat - 12.3) < 1e-9
    # equal-area property: the strip [0,30°]x[0,1°lon] has the same area
    # in projection as on the (authalic) sphere band ratio — verify the q
    # mapping is monotone and symmetric instead of trusting one number
    assert abs(fn(0.0, 30.0)[1] + fn(0.0, -30.0)[1]) < 1e-7  # ±2 ULP at 3.6e6 m
    assert fn(0.0, 60.0)[1] - fn(0.0, 30.0)[1] < fn(0.0, 30.0)[1]  # shrinks

    P = GeometryMeta(encoding="point", geometry_types=("Point",))
    pts = [(77.5, 12.3), (-120.0, 45.0), (179.9, -60.0)]
    df = spark.createDataFrame(pts, "lon double, lat double").select(
        st_point("lon", "lat").alias("p"), "lon", "lat"
    )
    out = df.select("lon", "lat", st_transform_point("p", 4326, 6933).alias("t"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan
    for r in out.collect():
        kx, ky = fn(r.lon, r.lat)
        assert abs(r.t.x - kx) < 1e-6 and abs(r.t.y - ky) < 1e-6
    back = out.select("lon", "lat", st_transform_point("t", 6933, 4326).alias("b"))
    for r in back.collect():
        assert abs(r.b.x - r.lon) < 1e-7 and abs(r.b.y - r.lat) < 1e-7


def test_nad83_utm_codes_r14():
    """r14 (VERDICT r13 #9): EPSG 26901-26923 (NAD83 / UTM) + 4269
    (NAD83 geographic) — the standard CRS family of US federal open
    data. Same GRS80 TM core as the ETRS89 rows; round trips across the
    conus zone band; values agree with the WGS84 UTM twin to well under
    the ellipsoid-difference scale; code bounds honored; 4269 is the
    documented WGS84-coincident identity."""
    import random

    rng = random.Random(41)
    for srid in (26901, 26910, 26915, 26923):
        zone = srid - 26900
        lon0 = G.utm_lon0(zone)
        fwd = G._lookup_transform(4326, srid)
        inv = G._lookup_transform(srid, 4326)
        for _ in range(40):
            lon = rng.uniform(lon0 - 2.8, lon0 + 2.8)
            lat = rng.uniform(18.0, 70.0)  # PR to Alaska
            x, y = fwd(lon, lat)
            lo, la = inv(x, y)
            assert abs(lo - lon) < 1e-7 and abs(la - lat) < 1e-7, srid
            wx, wy = G._tm_fwd(lon, lat, lon0, False)  # WGS84 twin
            assert abs(x - wx) < 1e-3 and abs(y - wy) < 1e-3, srid
    assert G.nad83_utm_zone_of(26900) is None
    assert G.nad83_utm_zone_of(26924) is None
    # published sanity pin: Denver (-104.99, 39.74) in 26913 (zone 13)
    x, y = G._lookup_transform(4326, 26913)(-104.99, 39.74)
    assert 400_000 < x < 600_000 and 4_300_000 < y < 4_500_000
    # 4269 identity both directions
    f = G._lookup_transform(4269, 4326)
    b = G._lookup_transform(4326, 4269)
    assert f(-104.99, 39.74) == (-104.99, 39.74)
    assert b(-104.99, 39.74) == (-104.99, 39.74)
    # chained pair without a 4326 endpoint: NAD83 UTM -> ETRS89 UTM
    chain = G._lookup_transform(26915, 25832)
    assert chain is not None
    g = G.Geom("Point", (-93.2, 45.0))
    out = G.transform(g, 4326, 26915)
    assert out.srid == 26915 and 400_000 < out.coords[0] < 600_000


def test_nad83_utm_catalyst_twin_r14(spark):
    """st_transform_point covers the NAD83/UTM zones + 4269 identity in
    pure Catalyst, matching the kernel forward exactly."""
    from datafusion_spatial_spark.functions.geodesic import (
        POINT_META,
        st_transform_point,
    )

    df = spark.createDataFrame(
        [(-93.2, 45.0)], "lon double, lat double"
    ).select(st_point("lon", "lat").alias("g"), "lon", "lat")
    got = df.select(
        st_transform_point("g", 4326, 26915, POINT_META).alias("p")
    ).collect()[0]["p"]
    kx, ky = G._lookup_transform(4326, 26915)(-93.2, 45.0)
    assert abs(got["x"] - kx) < 1e-6 and abs(got["y"] - ky) < 1e-6
    ident = df.select(
        st_transform_point("g", 4269, 4326, POINT_META).alias("p")
    ).collect()[0]["p"]
    assert (ident["x"], ident["y"]) == (-93.2, 45.0)
