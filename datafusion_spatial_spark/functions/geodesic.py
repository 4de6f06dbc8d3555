"""Geodesic functions: coordinates as lon/lat degrees on WGS84.

Parity family: PostGIS ``ST_DistanceSphere`` / ``ST_DistanceSpheroid`` /
``ST_LengthSpheroid`` / ``ST_Transform`` / ``ST_TileEnvelope`` (the
reference's roadmap, README.md, stops at planar predicates — this is
parity-plus surface every PostGIS user expects when the data is lon/lat).

Scale design: the point-to-point distance forms and the tile functions are
**pure Catalyst** (trig expressions over ``st_x``/``st_y``) — whole-stage
codegen, no Python in the hot path, safe inside join conditions at 100 TB.
Only whole-geometry reprojection and per-vertex geodesic length drop to an
Arrow-batched kernel UDF.

Constants (documented so oracle SQL can mirror them exactly):
sphere radius 6371008.8 m (IUGG mean), WGS84 a=6378137, f=1/298.257223563.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datafusion_spatial_spark import geom_ops
from datafusion_spatial_spark.functions.accessors import _geom_out, _unary
from datafusion_spatial_spark.functions.scalar import POINT_META, st_point, st_x, st_y
from datafusion_spatial_spark.meta import GeometryMeta

EARTH_RADIUS = geom_ops.EARTH_RADIUS
WGS84_A = geom_ops.WGS84_A
WGS84_F = geom_ops.WGS84_F
_MERC_R = geom_ops._MERC_R


def _haversine_expr(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """Great-circle meters between two lon/lat pairs, pure Catalyst."""
    p1, p2 = F.radians(y1), F.radians(y2)
    dp, dl = p2 - p1, F.radians(x2 - x1)
    h = F.pow(F.sin(dp / 2), 2) + F.cos(p1) * F.cos(p2) * F.pow(F.sin(dl / 2), 2)
    return 2.0 * F.lit(EARTH_RADIUS) * F.asin(F.least(F.lit(1.0), F.sqrt(h)))


def st_distancesphere(
    a: Column | str,
    b: Column | str,
    meta_a: GeometryMeta = POINT_META,
    meta_b: GeometryMeta = POINT_META,
) -> Column:
    """PostGIS ST_DistanceSphere for point inputs: haversine meters on the
    mean-radius sphere. Pure Catalyst (via st_x/st_y; WKB point inputs pay
    one decode UDF per side, native points none)."""
    return _haversine_expr(
        st_x(a, meta_a), st_y(a, meta_a), st_x(b, meta_b), st_y(b, meta_b)
    )


def st_distancespheroid(
    a: Column | str,
    b: Column | str,
    meta_a: GeometryMeta = POINT_META,
    meta_b: GeometryMeta = POINT_META,
) -> Column:
    """PostGIS ST_DistanceSpheroid for point inputs on WGS84 — Andoyer's
    first-order flattening correction (~meter accuracy at continental
    range), pure Catalyst.

    Accuracy note: the first-order series degrades near antipodal pairs
    (omega → π/2, where c → 0 and the h2 term blows up); those pairs, and
    the exactly-coincident/polar ones (s·c == 0), fall back to spheroid-
    scaled haversine (good to ~0.5% — the flattening magnitude — which
    beats a divergent series)."""
    lat1, lat2 = F.radians(st_y(a, meta_a)), F.radians(st_y(b, meta_b))
    lon1, lon2 = F.radians(st_x(a, meta_a)), F.radians(st_x(b, meta_b))
    fm = (lat1 + lat2) / 2  # F
    gm = (lat1 - lat2) / 2  # G
    lm = (lon1 - lon2) / 2  # lambda
    s = F.pow(F.sin(gm), 2) * F.pow(F.cos(lm), 2) + F.pow(F.cos(fm), 2) * F.pow(F.sin(lm), 2)
    c = F.pow(F.cos(gm), 2) * F.pow(F.cos(lm), 2) + F.pow(F.sin(fm), 2) * F.pow(F.sin(lm), 2)
    omega = F.atan(F.sqrt(s / c))
    r3 = F.sqrt(s * c) / omega  # guarded below for omega == 0
    d = 2 * omega * F.lit(WGS84_A)
    h1 = (3 * r3 - 1) / (2 * c)
    h2 = (3 * r3 + 1) / (2 * s)
    corr = 1 + F.lit(WGS84_F) * (
        h1 * F.pow(F.sin(fm), 2) * F.pow(F.cos(gm), 2)
        - h2 * F.pow(F.cos(fm), 2) * F.pow(F.sin(gm), 2)
    )
    return F.when((s * c == 0) | (c < F.lit(1e-6)), _haversine_expr(
        st_x(a, meta_a), st_y(a, meta_a), st_x(b, meta_b), st_y(b, meta_b)
    ) * F.lit(WGS84_A / EARTH_RADIUS)).otherwise(d * corr)


def st_lengthsphere(col: Column | str, meta: GeometryMeta) -> Column:
    """Great-circle length (meters) of the linear members — per-vertex sum,
    Arrow-batched kernel (PostGIS ST_Length(geography) analog)."""
    return _unary(geom_ops.geodesic_length, T.DoubleType())(col, meta)


def st_areasphere(col: Column | str, meta: GeometryMeta) -> Column:
    """Geodesic area (m²) of areal members on the mean-radius sphere —
    Chamberlain–Duquette spherical excess per ring, shells minus holes
    (PostGIS ST_Area(geography) analog); Arrow-batched kernel."""
    return _unary(geom_ops.spherical_area, T.DoubleType())(col, meta)


def st_transform(
    col: Column | str,
    src_srid: int,
    dst_srid: int,
    meta: GeometryMeta,
) -> Column:
    """Reproject a geometry column between EPSG:4326 and EPSG:3857
    (closed-form spherical Web Mercator; other pairs raise). WKB out.

    For bare point columns prefer :func:`st_transform_point` — it stays
    pure Catalyst and returns a native point."""
    return _geom_out(lambda g: geom_ops.transform(g, src_srid, dst_srid))(col, meta)


def st_transform_point(
    col: Column | str,
    src_srid: int,
    dst_srid: int,
    meta: GeometryMeta = POINT_META,
) -> Column:
    """Point-column reprojection, pure Catalyst: native struct{x,y} out.
    Supported pairs: 4326 -> 3857, 3857 -> 4326, identity."""
    x, y = st_x(col, meta), st_y(col, meta)
    if src_srid == dst_srid:
        return st_point(x, y)
    if (src_srid, dst_srid) == (4326, 3857):
        mx = F.lit(_MERC_R) * F.radians(x)
        my = F.lit(_MERC_R) * F.log(F.tan(F.lit(math.pi / 4) + F.radians(y) / 2))
        return st_point(mx, my)
    if (src_srid, dst_srid) == (3857, 4326):
        lon = F.degrees(x / F.lit(_MERC_R))
        lat = F.degrees(2 * F.atan(F.exp(y / F.lit(_MERC_R))) - F.lit(math.pi / 2))
        return st_point(lon, lat)
    raise NotImplementedError(
        f"transform {src_srid} -> {dst_srid} not supported "
        "(closed-form pairs only: 4326 <-> 3857)"
    )


# ---------------------------------------------------------------------------
# XYZ tile scheme (Web-Mercator pyramid) — spatial partitioning keys at scale


_WORLD = 2 * math.pi * _MERC_R  # full 3857 extent
_ORIGIN = _WORLD / 2


def st_tileenvelope(z: Column | str | int, x: Column | str | int, y: Column | str | int) -> Column:
    """PostGIS ST_TileEnvelope: bounds of XYZ tile (z, x, y) in EPSG:3857
    as a native XY Polygon (same shape as ``st_envelope`` output) — pure
    Catalyst, usable as a join-side literal or a per-row expression."""
    z, x, y = (F.lit(v) if isinstance(v, int) else F.col(v) if isinstance(v, str) else v
               for v in (z, x, y))
    size = F.lit(_WORLD) / F.pow(F.lit(2.0), z.cast("double"))
    xmin = F.lit(-_ORIGIN) + x.cast("double") * size
    ymax = F.lit(_ORIGIN) - y.cast("double") * size
    xmax, ymin = xmin + size, ymax - size

    def pt(px, py):
        return F.struct(px.alias("x"), py.alias("y"))

    return F.array(F.array(
        pt(xmin, ymin), pt(xmax, ymin), pt(xmax, ymax), pt(xmin, ymax), pt(xmin, ymin)
    ))


def st_tile(
    col: Column | str, z: int, meta: GeometryMeta = POINT_META
) -> Column:
    """XYZ tile index struct{z,x,y} containing a lon/lat point — the
    canonical hierarchical spatial-partitioning key (pure Catalyst; use as
    a groupBy/repartition key for tile-aligned layouts)."""
    n = F.lit(float(2 ** z))
    lon, lat = st_x(col, meta), st_y(col, meta)
    xt = F.floor(n * (lon + 180.0) / 360.0)
    latr = F.radians(lat)
    yt = F.floor(
        n * (1.0 - F.log(F.tan(latr) + 1.0 / F.cos(latr)) / F.lit(math.pi)) / 2.0
    )
    clamp = lambda c: F.greatest(F.lit(0), F.least(c, F.lit(2 ** z - 1)))  # noqa: E731
    return F.struct(
        F.lit(z).alias("z"),
        clamp(xt).cast("long").alias("x"),
        clamp(yt).cast("long").alias("y"),
    )


def st_quadkey(col: Column | str, z: int, meta: GeometryMeta = POINT_META) -> Column:
    """Bing-style quadkey string of the containing tile at zoom ``z`` —
    prefix-ordered so that a SORT/range-partition by quadkey co-locates
    spatial neighbors (pure Catalyst)."""
    t = st_tile(col, z, meta)
    x, y = t["x"], t["y"]
    digits = []
    for i in range(z - 1, -1, -1):
        bx = F.shiftrightunsigned(x, i) % 2
        by = F.shiftrightunsigned(y, i) % 2
        digits.append((bx + 2 * by).cast("int"))
    if not digits:
        return F.lit("")
    return F.concat(*[d.cast("string") for d in digits])
