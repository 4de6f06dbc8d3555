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

import pandas as pd

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
    """PostGIS ST_DistanceSphere: haversine meters on the mean-radius
    sphere. Point×point inputs stay pure Catalyst (via st_x/st_y; WKB
    point inputs pay one decode UDF per side, native points none); any
    other geometry combination dispatches to the exact vertex-vs-arc
    spherical minimum (:func:`st_distancesphere_geoms`) — a LineString
    argument must never ride the point x/y extraction silently."""

    def _pointish(m: GeometryMeta) -> bool:
        ts = tuple(m.geometry_types or ())
        return (m.is_native and m.native_type == "Point") or (
            m.is_wkb and ts in (("Point",), ("Point Z",))
        )

    if _pointish(meta_a) and _pointish(meta_b):
        return _haversine_expr(
            st_x(a, meta_a), st_y(a, meta_a), st_x(b, meta_b), st_y(b, meta_b)
        )
    return st_distancesphere_geoms(a, b, meta_a, meta_b)


def st_distancesphere_geoms(
    a: Column | str,
    b: Column | str,
    meta_a: GeometryMeta,
    meta_b: GeometryMeta,
) -> Column:
    """ST_DistanceSphere for ARBITRARY geometry pairs: minimum great-circle
    meters between the two geometries (0 when intersecting; exact
    vertex-vs-arc spherical cross-track minimum — geom_ops.
    distance_sphere_geom). Arrow-batched kernel UDF; prefer the pure-
    Catalyst :func:`st_distancesphere` when both sides are points."""
    from datafusion_spatial_spark.functions.predicates import (
        _as_rows,
        _converter,
        _prep,
    )

    conv_a = _converter(meta_a, force2d=True)
    conv_b = _converter(meta_b, force2d=True)

    @F.pandas_udf(T.DoubleType())
    def udf(sa: pd.Series, sb: pd.Series) -> pd.Series:
        out = []
        for va, vb in zip(_as_rows(sa), _as_rows(sb)):
            ga = conv_a(va)
            gb = conv_b(vb)
            out.append(
                None
                if ga is None or gb is None
                else geom_ops.distance_sphere_geom_fast(ga, gb)
            )
        return pd.Series(out, dtype="float64")

    return udf(_prep(a, meta_a), _prep(b, meta_b))


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
    beats a divergent series).

    Non-point geometries (r12 fuzz finding: the unconditional st_x/st_y
    was an ANALYSIS-time crash on any other input) dispatch to the exact
    vertex-vs-arc SPHERICAL minimum scaled to the WGS84 semi-major axis.
    This is a documented accuracy DEVIATION from PostGIS (ADVICE r12):
    PostGIS computes a true spheroidal distance for every geometry type,
    whereas the scaled-sphere result for line/polygon inputs carries a
    flattening-order error (up to ~0.3-0.5% of the distance, worst
    pole-to-equator). Point-point pairs keep the ~meter-accurate Andoyer
    form above; treat non-point spheroid distances as approximate or
    pre-densify and take the min over per-vertex point pairs when
    sub-0.1% accuracy matters."""

    def _pointish(m: GeometryMeta) -> bool:
        ts = tuple(m.geometry_types or ())
        return (m.is_native and m.native_type == "Point") or (
            m.is_wkb and ts in (("Point",), ("Point Z",))
        )

    if not (_pointish(meta_a) and _pointish(meta_b)):
        return st_distancesphere_geoms(a, b, meta_a, meta_b) * F.lit(
            WGS84_A / EARTH_RADIUS
        )
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
    custom=None,
) -> Column:
    """Reproject a whole geometry column (any shape, WKB out) between the
    closed-form CRS set: EPSG:4326, 3857 (spherical Web Mercator), WGS84
    UTM zones 326zz/327zz, and 3035 (ETRS89-LAEA) — any pair, pivoting
    through lon/lat. Two escape hatches for other targets in the
    no-pyproj environment (VERDICT r7 item 8): ``custom`` — a scalar
    ``(x, y) -> (x, y)`` callable applied directly for this pair (e.g. a
    similarity closure or a proj-string evaluated by a user-supplied
    library) — or a :func:`geom_ops.register_crs` SRID, which pivots
    against every built-in. Both are resolved DRIVER-side at plan build
    and cloudpickled into the kernel, so worker imports need no registry
    state. Beyond that, any other EPSG pair works when the optional
    public ``pyproj`` library is installed (probed lazily on each worker —
    geom_ops._pyproj_transform); without it, unknown codes raise naming
    the extra. Arrow-batched kernel.

    For bare point columns prefer :func:`st_transform_point` — it stays
    pure Catalyst and returns a native point."""
    fn = custom if custom is not None else geom_ops._lookup_transform(
        src_srid, dst_srid
    )
    return _geom_out(
        lambda g: geom_ops.transform(g, src_srid, dst_srid, fn)
    )(col, meta)


def st_buffergeography(
    col: Column | str,
    meters: float,
    meta: GeometryMeta,
    segments: int = 16,
    params: str | None = None,
) -> Column:
    """Meter-radius buffer for EPSG:4326 geometries (the PostGIS
    ``ST_Buffer(geography, meters)`` shape): pivot through the row's
    local WGS84 UTM zone, buffer planar in meters, return to lon/lat
    (WKB out). Accepts the buffer style string. Rows spanning more than
    one UTM zone raise rather than distort."""
    from datafusion_spatial_spark.functions.predicates import (
        _parse_buffer_params,
    )

    kw: dict = {"segments": segments}
    if params:
        kw.update(_parse_buffer_params(params))
    if "side" in kw:
        raise ValueError("side is not supported for geography buffers")
    return _geom_out(
        lambda g: geom_ops.buffer_geography(g, meters, **kw)
    )(col, meta)


def _tm_fwd_expr(
    lon: Column, lat: Column, lon0_deg: float, south: bool,
    a: float = WGS84_A, f: float = WGS84_F,
    k0: float | None = None, fe: float | None = None,
    fn: float | None = None, lat0_deg: float = 0.0,
) -> tuple[Column, Column]:
    """Catalyst Transverse-Mercator forward (Snyder series) — the
    expression twin of geom_ops._tm_fwd; shared constants computed in
    Python so both paths (and any SQL mirror) agree to the literal.
    Defaults are the WGS84 UTM constants; r10 parameterizes the named
    datum-free TM codes and the ETRS89/UTM zones."""
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    c0, c2, c4, c6 = geom_ops._merid_coeffs(e2)
    k0 = geom_ops._UTM_K0 if k0 is None else k0
    fe = geom_ops._UTM_FE if fe is None else fe
    if fn is None:
        fn = geom_ops._UTM_FN_S if south else 0.0
    m0 = geom_ops._tm_merid(math.radians(lat0_deg), a, e2) if lat0_deg else 0.0
    fn = fn - k0 * m0  # fold M0 into the false northing (exact when m0=0)
    phi, lam = F.radians(lat), F.radians(lon)
    sphi, cphi, tphi = F.sin(phi), F.cos(phi), F.tan(phi)
    N = F.lit(a) / F.sqrt(1 - F.lit(e2) * sphi * sphi)
    T = tphi * tphi
    C = F.lit(ep2) * cphi * cphi
    A = (lam - F.lit(math.radians(lon0_deg))) * cphi
    M = F.lit(a) * (
        F.lit(c0) * phi - F.lit(c2) * F.sin(2 * phi)
        + F.lit(c4) * F.sin(4 * phi) - F.lit(c6) * F.sin(6 * phi)
    )
    A2, A3 = A * A, A * A * A
    x = F.lit(fe) + F.lit(k0) * N * (
        A + (1 - T + C) * A3 / 6
        + (5 - 18 * T + T * T + 72 * C - F.lit(58 * ep2)) * A3 * A2 / 120
    )
    y = F.lit(fn) + F.lit(k0) * (
        M + N * tphi * (
            A2 / 2 + (5 - T + 9 * C + 4 * C * C) * A2 * A2 / 24
            + (61 - 58 * T + T * T + 600 * C - F.lit(330 * ep2)) * A3 * A3 / 720
        )
    )
    return x, y


def _tm_inv_expr(
    x: Column, y: Column, lon0_deg: float, south: bool,
    a: float = WGS84_A, f: float = WGS84_F,
    k0: float | None = None, fe: float | None = None,
    fn: float | None = None, lat0_deg: float = 0.0,
) -> tuple[Column, Column]:
    """Catalyst Transverse-Mercator inverse (Snyder series); defaults =
    WGS84 UTM, parameterized like the forward twin (r10)."""
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    c0, _, _, _ = geom_ops._merid_coeffs(e2)
    e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    k0 = geom_ops._UTM_K0 if k0 is None else k0
    fe = geom_ops._UTM_FE if fe is None else fe
    if fn is None:
        fn = geom_ops._UTM_FN_S if south else 0.0
    m0 = geom_ops._tm_merid(math.radians(lat0_deg), a, e2) if lat0_deg else 0.0
    fn = fn - k0 * m0  # fold M0 into the false northing (exact when m0=0)
    mu = (y - F.lit(fn)) / F.lit(k0 * a * c0)
    phi1 = (
        mu
        + F.lit(3 * e1 / 2 - 27 * e1**3 / 32) * F.sin(2 * mu)
        + F.lit(21 * e1**2 / 16 - 55 * e1**4 / 32) * F.sin(4 * mu)
        + F.lit(151 * e1**3 / 96) * F.sin(6 * mu)
        + F.lit(1097 * e1**4 / 512) * F.sin(8 * mu)
    )
    s1, c1_, t1 = F.sin(phi1), F.cos(phi1), F.tan(phi1)
    C1 = F.lit(ep2) * c1_ * c1_
    T1 = t1 * t1
    N1 = F.lit(a) / F.sqrt(1 - F.lit(e2) * s1 * s1)
    R1 = F.lit(a * (1 - e2)) / F.pow(1 - F.lit(e2) * s1 * s1, 1.5)
    D = (x - F.lit(fe)) / (N1 * F.lit(k0))
    D2 = D * D
    phi = phi1 - (N1 * t1 / R1) * (
        D2 / 2
        - (5 + 3 * T1 + 10 * C1 - 4 * C1 * C1 - F.lit(9 * ep2)) * D2 * D2 / 24
        + (61 + 90 * T1 + 298 * C1 + 45 * T1 * T1 - F.lit(252 * ep2)
           - 3 * C1 * C1) * D2 * D2 * D2 / 720
    )
    lam = F.lit(math.radians(lon0_deg)) + (
        D
        - (1 + 2 * T1 + C1) * D * D2 / 6
        + (5 - 2 * C1 + 28 * T1 - 3 * C1 * C1 + F.lit(8 * ep2)
           + 24 * T1 * T1) * D * D2 * D2 / 120
    ) / c1_
    return F.degrees(lam), F.degrees(phi)


def _laea_fwd_expr(lon: Column, lat: Column) -> tuple[Column, Column]:
    """Catalyst ellipsoidal LAEA forward (EPSG:3035 constants, Snyder)."""
    e, e2, qp, beta0, Rq, Dc, lam0 = geom_ops._laea_consts()
    _, _, FE, FN = geom_ops._LAEA_3035
    phi, lam = F.radians(lat), F.radians(lon)
    s = F.sin(phi)
    q = F.lit(1 - e2) * (
        s / (1 - F.lit(e2) * s * s)
        - F.lit(1 / (2 * e)) * F.log((1 - F.lit(e) * s) / (1 + F.lit(e) * s))
    )
    beta = F.asin(F.greatest(F.lit(-1.0), F.least(F.lit(1.0), q / F.lit(qp))))
    dl = lam - F.lit(lam0)
    B = F.lit(Rq) * F.sqrt(
        2 / (1 + F.lit(math.sin(beta0)) * F.sin(beta)
             + F.lit(math.cos(beta0)) * F.cos(beta) * F.cos(dl))
    )
    x = F.lit(FE) + B * F.lit(Dc) * F.cos(beta) * F.sin(dl)
    y = F.lit(FN) + (B / F.lit(Dc)) * (
        F.lit(math.cos(beta0)) * F.sin(beta)
        - F.lit(math.sin(beta0)) * F.cos(beta) * F.cos(dl)
    )
    return x, y


def _laea_inv_expr(x: Column, y: Column) -> tuple[Column, Column]:
    """Catalyst ellipsoidal LAEA inverse (EPSG:3035 constants, Snyder)."""
    e, e2, qp, beta0, Rq, Dc, lam0 = geom_ops._laea_consts()
    _, _, FE, FN = geom_ops._LAEA_3035
    xp, yp = x - F.lit(FE), y - F.lit(FN)
    rho = F.sqrt((xp / F.lit(Dc)) * (xp / F.lit(Dc)) + (F.lit(Dc) * yp) * (F.lit(Dc) * yp))
    ce = 2 * F.asin(
        F.greatest(F.lit(-1.0), F.least(F.lit(1.0), rho / F.lit(2 * Rq)))
    )
    betap = F.asin(
        # clamp like beta/ce above: rounding near the pole's projection
        # pushes the argument to 1 + O(1e-16) and asin would return NaN
        F.greatest(
            F.lit(-1.0),
            F.least(
                F.lit(1.0),
                F.cos(ce) * F.lit(math.sin(beta0))
                + (F.lit(Dc) * yp * F.sin(ce) * F.lit(math.cos(beta0)) / rho),
            ),
        )
    )
    lam = F.lit(lam0) + F.atan2(
        xp * F.sin(ce),
        F.lit(Dc) * rho * F.lit(math.cos(beta0)) * F.cos(ce)
        - F.lit(Dc * Dc) * yp * F.lit(math.sin(beta0)) * F.sin(ce),
    )
    e4, e6 = e2 * e2, e2 * e2 * e2
    phi = (
        betap
        + F.lit(e2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040) * F.sin(2 * betap)
        + F.lit(23 * e4 / 360 + 251 * e6 / 3780) * F.sin(4 * betap)
        + F.lit(761 * e6 / 45360) * F.sin(6 * betap)
    )
    # the projection center itself has rho == 0 (NaN above): patch exactly
    lat0 = geom_ops._LAEA_3035[1]
    at_center = rho < F.lit(1e-12)
    return (
        F.when(at_center, F.lit(math.degrees(lam0))).otherwise(F.degrees(lam)),
        F.when(at_center, F.lit(lat0)).otherwise(F.degrees(phi)),
    )


# ---- r10 Catalyst twins: conic + polar stereographic families ----------
# The same Snyder math as the geom_ops scalars, as codegen'd expressions.
# The scalars' ITERATIVE latitude inverses are replaced by the standard
# authalic/conformal SERIES (Snyder 3-18 / 3-5): Catalyst inlines every
# subexpression reference, so an unrolled fixed-point's tree grows
# exponentially with the iteration count (an 8-step Albers unroll
# generated >16k lines of Java — Janino refused and the codegen cache
# blew the heap); the series agree with the iterated kernels to ~1e-10
# rad, far inside the 1e-6 m twin-parity bound the tests pin.


def _q_of_expr(phi: Column, e: float, e2: float) -> Column:
    """Snyder 3-12 equal-area q as an expression (LAEA/Albers shared)."""
    s = F.sin(phi)
    return F.lit(1 - e2) * (
        s / (1 - F.lit(e2) * s * s)
        - F.lit(1 / (2 * e)) * F.log((1 - F.lit(e) * s) / (1 + F.lit(e) * s))
    )


def _t_of_expr(phi: Column, e: float) -> Column:
    """Snyder 15-9 conformal t as an expression (LCC/PST shared)."""
    s = F.sin(phi)
    return F.tan(F.lit(math.pi / 4) - phi / 2) / F.pow(
        (1 - F.lit(e) * s) / (1 + F.lit(e) * s), F.lit(e / 2)
    )


def _cea_fwd_expr(lon: Column, lat: Column, srid: int):
    """Cylindrical equal-area forward (EASE-Grid 2.0 family) — shares
    Snyder's q with LAEA/Albers; the longitude wrap is a when-chain."""
    e, e2, k0, lam0, FE, FN, a = geom_ops._cea_consts(geom_ops._CEA_CODES[srid])
    lam = F.radians(lon) - F.lit(lam0)
    lam = F.when(lam > F.lit(math.pi), lam - F.lit(2 * math.pi)).otherwise(
        F.when(lam < F.lit(-math.pi), lam + F.lit(2 * math.pi)).otherwise(lam)
    )
    q = _q_of_expr(F.radians(lat), e, e2)
    return (
        F.lit(FE) + F.lit(a * k0) * lam,
        F.lit(FN) + F.lit(a / (2 * k0)) * q,
    )


def _cea_inv_expr(x: Column, y: Column, srid: int):
    """CEA inverse via the authalic-latitude series (same expression-size
    rationale as :func:`_authalic_phi_expr`)."""
    e, e2, k0, lam0, FE, FN, a = geom_ops._cea_consts(geom_ops._CEA_CODES[srid])
    q = F.lit(2 * k0 / a) * (y - F.lit(FN))
    qp = geom_ops._laea_q(math.pi / 2, e, e2)
    beta = F.asin(F.greatest(F.lit(-1.0), F.least(F.lit(1.0), q / F.lit(qp))))
    return (
        F.degrees((x - F.lit(FE)) / F.lit(a * k0) + F.lit(lam0)),
        F.degrees(_authalic_phi_expr(beta, e2)),
    )


def _aea_fwd_expr(lon: Column, lat: Column, srid: int):
    e, e2, n, C, rho0, lam0, FE, FN = geom_ops._aea_consts(
        geom_ops._ALBERS_CODES[srid]
    )
    q = _q_of_expr(F.radians(lat), e, e2)
    rho = (
        F.lit(geom_ops.GRS80_A)
        * F.sqrt(F.greatest(F.lit(0.0), F.lit(C) - F.lit(n) * q))
        / F.lit(n)
    )
    theta = F.lit(n) * (F.radians(lon) - F.lit(lam0))
    return (
        F.lit(FE) + rho * F.sin(theta),
        F.lit(FN) + F.lit(rho0) - rho * F.cos(theta),
    )


def _authalic_phi_expr(beta: Column, e2: float) -> Column:
    """Snyder 3-18: authalic latitude -> geodetic latitude series (the
    same expansion the LAEA inverse twin uses) — a SERIES, not the scalar
    kernels' fixed-point iteration: Catalyst inlines every subexpression
    reference, so an unrolled iteration's tree grows exponentially (an
    8-step Albers unroll generated 16k+ lines of Java and broke Janino);
    the series stays within ~1e-10 rad of the iterated value, far below
    the 1e-6 m twin-parity bound."""
    e4, e6 = e2 * e2, e2 * e2 * e2
    return (
        beta
        + F.lit(e2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040) * F.sin(2 * beta)
        + F.lit(23 * e4 / 360 + 251 * e6 / 3780) * F.sin(4 * beta)
        + F.lit(761 * e6 / 45360) * F.sin(6 * beta)
    )


def _conformal_phi_expr(chi: Column, e2: float) -> Column:
    """Snyder 3-5: conformal latitude -> geodetic latitude series (the
    expression-safe replacement for the LCC/PST scalar kernels' 7-9
    iteration; same tree-size rationale as :func:`_authalic_phi_expr`)."""
    e4, e6, e8 = e2 * e2, e2 ** 3, e2 ** 4
    return (
        chi
        + F.lit(e2 / 2 + 5 * e4 / 24 + e6 / 12 + 13 * e8 / 360) * F.sin(2 * chi)
        + F.lit(7 * e4 / 48 + 29 * e6 / 240 + 811 * e8 / 11520) * F.sin(4 * chi)
        + F.lit(7 * e6 / 120 + 81 * e8 / 1120) * F.sin(6 * chi)
        + F.lit(4279 * e8 / 161280) * F.sin(8 * chi)
    )


def _aea_inv_expr(x: Column, y: Column, srid: int):
    e, e2, n, C, rho0, lam0, FE, FN = geom_ops._aea_consts(
        geom_ops._ALBERS_CODES[srid]
    )
    xp, yp = x - F.lit(FE), F.lit(rho0) - (y - F.lit(FN))
    rho = F.sqrt(xp * xp + yp * yp)
    if n < 0:  # static: the cone constant is a Python float
        rho = -rho
        theta = F.atan2(-xp, -yp)
    else:
        theta = F.atan2(xp, yp)
    q = (F.lit(C) - F.pow(rho * F.lit(n / geom_ops.GRS80_A), F.lit(2.0))) / F.lit(n)
    qp = geom_ops._laea_q(math.pi / 2, e, e2)
    beta = F.asin(F.greatest(F.lit(-1.0), F.least(F.lit(1.0), q / F.lit(qp))))
    return (
        F.degrees(F.lit(lam0) + theta / F.lit(n)),
        F.degrees(_authalic_phi_expr(beta, e2)),
    )


def _lcc_fwd_expr(lon: Column, lat: Column, srid: int):
    return _lcc_fwd_expr_c(
        lon, lat, geom_ops._lcc_consts(geom_ops._LCC_CODES[srid])
    )


def _lcc_fwd_expr_c(lon: Column, lat: Column, consts):
    e, n, Fc, rho0, lam0, FE, FN, _t, ak = consts
    rho = F.lit(ak * Fc) * F.pow(_t_of_expr(F.radians(lat), e), F.lit(n))
    theta = F.lit(n) * (F.radians(lon) - F.lit(lam0))
    return (
        F.lit(FE) + rho * F.sin(theta),
        F.lit(FN) + F.lit(rho0) - rho * F.cos(theta),
    )


def _lcc_inv_expr(x: Column, y: Column, srid: int):
    return _lcc_inv_expr_c(
        x, y, geom_ops._lcc_consts(geom_ops._LCC_CODES[srid])
    )


def _lcc_inv_expr_c(x: Column, y: Column, consts):
    e, n, Fc, rho0, lam0, FE, FN, _t, ak = consts
    xp, yp = x - F.lit(FE), F.lit(rho0) - (y - F.lit(FN))
    rho = F.sqrt(xp * xp + yp * yp)
    if n < 0:
        rho = -rho
        theta = F.atan2(-xp, -yp)
    else:
        theta = F.atan2(xp, yp)
    tv = F.pow(rho / F.lit(ak * Fc), F.lit(1 / n))
    chi = F.lit(math.pi / 2) - 2 * F.atan(tv)
    phi = _conformal_phi_expr(chi, e * e)
    return F.degrees(F.lit(lam0) + theta / F.lit(n)), F.degrees(phi)


def _pst_fwd_expr(lon: Column, lat: Column, srid: int):
    params = geom_ops._PSTEREO_CODES[srid]
    e, rho_of_t, lam0, FE, FN, south = geom_ops._pst_consts(params)
    rho1 = rho_of_t(1.0)  # both variants are linear in t
    if south:
        phi = F.radians(-lat)
        dl = -(F.radians(lon) - F.lit(lam0))
    else:
        phi = F.radians(lat)
        dl = F.radians(lon) - F.lit(lam0)
    rho = F.lit(rho1) * _t_of_expr(phi, e)
    xh, yh = rho * F.sin(dl), -rho * F.cos(dl)
    if south:
        xh, yh = -xh, -yh
    return F.lit(FE) + xh, F.lit(FN) + yh


def _pst_inv_expr(x: Column, y: Column, srid: int):
    params = geom_ops._PSTEREO_CODES[srid]
    e, rho_of_t, lam0, FE, FN, south = geom_ops._pst_consts(params)
    rho1 = rho_of_t(1.0)
    xh, yh = x - F.lit(FE), y - F.lit(FN)
    if south:
        xh, yh = -xh, -yh
    rho = F.sqrt(xh * xh + yh * yh)
    tv = rho / F.lit(rho1)
    chi = F.lit(math.pi / 2) - 2 * F.atan(tv)
    phi = _conformal_phi_expr(chi, e * e)
    dl = F.atan2(xh, -yh)
    at_pole = rho < F.lit(1e-12)
    if south:
        lam = F.when(at_pole, F.lit(math.degrees(lam0))).otherwise(
            F.degrees(F.lit(lam0) - dl)
        )
        latd = F.when(at_pole, F.lit(-90.0)).otherwise(F.degrees(-phi))
    else:
        lam = F.when(at_pole, F.lit(math.degrees(lam0))).otherwise(
            F.degrees(F.lit(lam0) + dl)
        )
        latd = F.when(at_pole, F.lit(90.0)).otherwise(F.degrees(phi))
    return lam, latd


def _named_tm_expr_params(srid: int):
    """(lat0, lon0, k0, FE, FN, a, f) for datum-free named TM codes and
    the ETRS89/UTM zones; None when the code needs a datum shift (27700
    routes through the Helmert expressions instead) or isn't TM."""
    p = geom_ops._TM_CODES.get(srid)
    if p is not None:
        lat0, lon0, k0, fe, fn, a, f, datum = p
        return None if datum is not None else (lat0, lon0, k0, fe, fn, a, f)
    ez = geom_ops.etrs89_utm_zone_of(srid)
    if ez:
        return (0.0, geom_ops.utm_lon0(ez), geom_ops._UTM_K0,
                geom_ops._UTM_FE, 0.0, geom_ops.GRS80_A, geom_ops.GRS80_F)
    nz = geom_ops.nad83_utm_zone_of(srid)
    if nz:
        # NAD83 / UTM (r14): same GRS80 TM expressions; the plate-fixed
        # datum is WGS84-coincident by the kernel's documented convention
        return (0.0, geom_ops.utm_lon0(nz), geom_ops._UTM_K0,
                geom_ops._UTM_FE, 0.0, geom_ops.GRS80_A, geom_ops.GRS80_F)
    return None


# --- Catalyst Helmert datum bridge (r11, VERDICT r10 #4) -------------------
# The OSGB bridge is closed-form algebra end-to-end: geodetic -> geocentric
# XYZ (trig), the 7-parameter position-vector transform (linear), and
# XYZ -> geodetic via BOWRING's non-iterative latitude formula — the
# geodetic twin of the conformal/authalic series trick that keeps the
# conic inverses codegen-safe (an unrolled fixed-point like the kernel's
# _xyz_to_geodetic loop would explode the expression tree). For |h| under
# a few km (datum shifts put points ~0-500 m off the target ellipsoid)
# Bowring agrees with the iterated latitude to ~1e-12 rad (< 10 um on the
# ground, 6 orders below the ~2 m national accuracy of ANY single GB
# Helmert); tests pin the bound at the OS worked example.


def _let(bindings: dict, body):
    """Genuine let-binding for Column expressions: ``bindings`` are
    evaluated ONCE and referenced as lambda VARIABLES inside ``body`` —
    ``F.transform`` over a one-element array of a struct binds its
    element to a Catalyst lambda variable, so a bound expression appears
    once in the tree regardless of how many times the body references it.
    Without this, chaining the datum-bridge stages multiplies the input
    tree per reference and the Column→Expression conversion itself blows
    the driver heap (the r10 Albers-unroll failure mode, one level
    earlier). ``body`` takes the variable struct and returns a dict of
    named output Columns; the result is a struct Column (extract each
    field once)."""
    bound = F.array(F.struct(*[c.alias(k) for k, c in bindings.items()]))
    return F.element_at(
        F.transform(
            bound,
            lambda v: F.struct(
                *[c.alias(k) for k, c in body(v).items()]
            ),
        ),
        1,
    )


def _geodetic_to_xyz_expr(lon: Column, lat: Column, a: float, f: float):
    e2 = f * (2 - f)
    phi, lam = F.radians(lat), F.radians(lon)
    s, c = F.sin(phi), F.cos(phi)
    N = F.lit(a) / F.sqrt(1 - F.lit(e2) * s * s)
    return N * c * F.cos(lam), N * c * F.sin(lam), N * F.lit(1 - e2) * s


def _xyz_to_geodetic_expr(X: Column, Y: Column, Z: Column, a: float, f: float):
    e2 = f * (2 - f)
    b = a * (1 - f)
    ep2 = e2 / (1 - e2)
    p = F.sqrt(X * X + Y * Y)
    lam = F.atan2(Y, X)
    u = F.atan2(Z * F.lit(a), p * F.lit(b))
    su, cu = F.sin(u), F.cos(u)
    phi = F.atan2(
        Z + F.lit(ep2 * b) * su * su * su,
        p - F.lit(e2 * a) * cu * cu * cu,
    )
    return F.degrees(lam), F.degrees(phi)


def _helmert_apply_expr(X, Y, Z, prm):
    tx, ty, tz, rx, ry, rz, s_ppm = prm
    rx, ry, rz = (v * geom_ops.ARCSEC for v in (rx, ry, rz))
    m = 1.0 + s_ppm * 1e-6
    return (
        F.lit(tx) + F.lit(m) * (X - F.lit(rz) * Y + F.lit(ry) * Z),
        F.lit(ty) + F.lit(m) * (F.lit(rz) * X + Y - F.lit(rx) * Z),
        F.lit(tz) + F.lit(m) * (-F.lit(ry) * X + F.lit(rx) * Y + Z),
    )


def _helmert_invert_expr(X, Y, Z, prm):
    tx, ty, tz, rx, ry, rz, s_ppm = prm
    rx, ry, rz = (v * geom_ops.ARCSEC for v in (rx, ry, rz))
    m = 1.0 + s_ppm * 1e-6
    bx, by, bz = (X - F.lit(tx)) / F.lit(m), (Y - F.lit(ty)) / F.lit(m), (
        Z - F.lit(tz)
    ) / F.lit(m)
    det = 1 + rx * rx + ry * ry + rz * rz
    vx = (bx * F.lit((1 + rx * rx) / det) + by * F.lit((rz + rx * ry) / det)
          + bz * F.lit((rx * rz - ry) / det))
    vy = (bx * F.lit((rx * ry - rz) / det) + by * F.lit((1 + ry * ry) / det)
          + bz * F.lit((rx + ry * rz) / det))
    vz = (bx * F.lit((ry + rx * rz) / det) + by * F.lit((ry * rz - rx) / det)
          + bz * F.lit((1 + rz * rz) / det))
    return vx, vy, vz


def _datum_bridge_expr(lon, lat, a_src, f_src, a_dst, f_dst, hel):
    """Geographic (a_src,f_src) -> geographic (a_dst,f_dst) through the
    Helmert `hel` (a callable applying the geocentric transform). Every
    stage is _let-bound: inputs once, XYZ once, so the tree stays LINEAR
    however deep the surrounding expression is."""
    out = _let(
        {"lon": lon, "lat": lat},
        lambda v: (lambda xyz: {
            "s": _let(
                dict(zip("XYZ", xyz)),
                lambda w: (lambda ll: {"lon": ll[0], "lat": ll[1]})(
                    _xyz_to_geodetic_expr(
                        *hel(w["X"], w["Y"], w["Z"]), a_dst, f_dst
                    )
                ),
            )
        })(_geodetic_to_xyz_expr(v["lon"], v["lat"], a_src, f_src)),
    )
    inner = out["s"]
    return inner["lon"], inner["lat"]


def _datum_from_wgs84_expr(lon, lat, a, f, prm):
    return _datum_bridge_expr(
        lon, lat, geom_ops.WGS84_A, geom_ops.WGS84_F, a, f,
        lambda X, Y, Z: _helmert_apply_expr(X, Y, Z, prm),
    )


def _datum_to_wgs84_expr(lon, lat, a, f, prm):
    return _datum_bridge_expr(
        lon, lat, a, f, geom_ops.WGS84_A, geom_ops.WGS84_F,
        lambda X, Y, Z: _helmert_invert_expr(X, Y, Z, prm),
    )


def _datum_tm_params(srid: int):
    """Full _TM_CODES-shaped row for datum-BEARING TM codes: the built-in
    27700 plus any register_datum(projection='tm') registration."""
    p = geom_ops._TM_CODES.get(srid)
    if p is not None and p[7] is not None:
        return p
    ent = geom_ops._CUSTOM_DATUM_CRS.get(srid)
    if ent and ent["proj"] == "tm":
        return ent["row"]
    return None


def _datum_geographic_params(srid: int):
    """(a, f, helmert) for register_datum(projection='geographic') codes
    (the local datum's own lon/lat grid, e.g. NAD27 / OSGB36 geographic)."""
    ent = geom_ops._CUSTOM_DATUM_CRS.get(srid)
    if ent and ent["proj"] == "geographic":
        a, f = ent["ellipsoid"]
        return a, f, ent["helmert"]
    return None


def _datum_lcc_params(srid: int):
    """(lcc params, a, f, k0, helmert) for datum-bearing LCC codes: the
    built-in NTF Lambert zones 27571-27573 and register_datum('lcc')
    registrations (r11 — the twin coverage gap the first r11 cut left)."""
    zp = geom_ops._NTF_LAMBERT_CODES.get(srid)
    if zp is not None:
        lat0, k0, fn = zp
        return (
            (lat0, lat0, lat0, geom_ops._PARIS_LON0, 600_000.0, fn),
            geom_ops.CLARKE1880IGN_A, geom_ops.CLARKE1880IGN_F,
            k0, geom_ops._WGS84_TO_NTF,
        )
    ent = geom_ops._CUSTOM_DATUM_CRS.get(srid)
    if ent and ent["proj"] == "lcc":
        a, f = ent["ellipsoid"]
        return ent["params"], a, f, ent["k0"], ent["helmert"]
    return None


def _to_lonlat_expr(x: Column, y: Column, srid: int):
    if srid in (4326, 4269):  # 4269: NAD83 geographic, WGS84-coincident
        return x, y
    if srid == 3857:
        return (
            F.degrees(x / F.lit(_MERC_R)),
            F.degrees(2 * F.atan(F.exp(y / F.lit(_MERC_R))) - F.lit(math.pi / 2)),
        )
    if srid == 3035:
        return _laea_inv_expr(x, y)
    if srid in geom_ops._ALBERS_CODES:
        return _aea_inv_expr(x, y, srid)
    if srid in geom_ops._CEA_CODES:
        return _cea_inv_expr(x, y, srid)
    if srid in geom_ops._LCC_CODES:
        return _lcc_inv_expr(x, y, srid)
    if srid in geom_ops._PSTEREO_CODES:
        return _pst_inv_expr(x, y, srid)
    z = geom_ops.utm_zone_of(srid)
    if z:
        return _tm_inv_expr(x, y, geom_ops.utm_lon0(z[0]), z[1])
    ntm = _named_tm_expr_params(srid)
    if ntm:
        lat0, lon0, k0, fe, fn, a, f = ntm
        return _tm_inv_expr(x, y, lon0, False, a, f, k0, fe, fn, lat0)
    dtm = _datum_tm_params(srid)
    if dtm:  # 27700: TM inverse on the local ellipsoid, then the Helmert.
        # _let-bound stages: the TM inverse references x/y several times
        # and the bridge references its inputs several times — binding at
        # each seam keeps the total tree linear (nesting these twins,
        # e.g. a round trip, otherwise OOMs the driver at tree build).
        lat0, lon0, k0, fe, fn, a, f, datum = dtm
        tm = _let(
            {"x": x, "y": y},
            lambda v: (lambda ll: {"lo": ll[0], "la": ll[1]})(
                _tm_inv_expr(v["x"], v["y"], lon0, False, a, f, k0, fe,
                             fn, lat0)
            ),
        )
        return _datum_to_wgs84_expr(tm["lo"], tm["la"], a, f, datum)
    dg = _datum_geographic_params(srid)
    if dg:  # registered local-datum geographic grid: the bridge alone
        a, f, datum = dg
        return _datum_to_wgs84_expr(x, y, a, f, datum)
    dlc = _datum_lcc_params(srid)
    if dlc:  # NTF zones / registered datum LCC: conic inverse, then the
        # Helmert — _let-bound at the seam like the TM twin
        p, a, f, k0, datum = dlc
        consts = geom_ops._lcc_consts(p, a, f, k0)
        cc = _let(
            {"x": x, "y": y},
            lambda v: (lambda ll: {"lo": ll[0], "la": ll[1]})(
                _lcc_inv_expr_c(v["x"], v["y"], consts)
            ),
        )
        return _datum_to_wgs84_expr(cc["lo"], cc["la"], a, f, datum)
    aff = (geom_ops._CUSTOM_CRS.get(srid) or {}).get("affine")
    if aff:
        a, b, d, e, xoff, yoff = aff
        det = a * e - b * d
        u, v = x - F.lit(xoff), y - F.lit(yoff)
        return (
            F.lit(e / det) * u + F.lit(-b / det) * v,
            F.lit(-d / det) * u + F.lit(a / det) * v,
        )
    return None


def _from_lonlat_expr(lon: Column, lat: Column, srid: int):
    if srid in (4326, 4269):
        return lon, lat
    if srid == 3857:
        return (
            F.lit(_MERC_R) * F.radians(lon),
            F.lit(_MERC_R)
            * F.log(F.tan(F.lit(math.pi / 4) + F.radians(lat) / 2)),
        )
    if srid == 3035:
        return _laea_fwd_expr(lon, lat)
    if srid in geom_ops._ALBERS_CODES:
        return _aea_fwd_expr(lon, lat, srid)
    if srid in geom_ops._CEA_CODES:
        return _cea_fwd_expr(lon, lat, srid)
    if srid in geom_ops._LCC_CODES:
        return _lcc_fwd_expr(lon, lat, srid)
    if srid in geom_ops._PSTEREO_CODES:
        return _pst_fwd_expr(lon, lat, srid)
    z = geom_ops.utm_zone_of(srid)
    if z:
        return _tm_fwd_expr(lon, lat, geom_ops.utm_lon0(z[0]), z[1])
    ntm = _named_tm_expr_params(srid)
    if ntm:
        lat0, lon0, k0, fe, fn, a, f = ntm
        return _tm_fwd_expr(lon, lat, lon0, False, a, f, k0, fe, fn, lat0)
    dtm = _datum_tm_params(srid)
    if dtm:  # 27700: Helmert to the local datum, then the TM forward
        # (_let-bound at the seam — see the inverse branch note)
        lat0, lon0, k0, fe, fn, a, f, datum = dtm
        llon, llat = _datum_from_wgs84_expr(lon, lat, a, f, datum)
        out = _let(
            {"lo": llon, "la": llat},
            lambda v: (lambda xy: {"x": xy[0], "y": xy[1]})(
                _tm_fwd_expr(v["lo"], v["la"], lon0, False, a, f, k0, fe,
                             fn, lat0)
            ),
        )
        return out["x"], out["y"]
    dg = _datum_geographic_params(srid)
    if dg:  # registered local-datum geographic grid: the bridge alone
        a, f, datum = dg
        return _datum_from_wgs84_expr(lon, lat, a, f, datum)
    dlc = _datum_lcc_params(srid)
    if dlc:  # NTF zones / registered datum LCC: Helmert, then the conic
        p, a, f, k0, datum = dlc
        consts = geom_ops._lcc_consts(p, a, f, k0)
        llon, llat = _datum_from_wgs84_expr(lon, lat, a, f, datum)
        out = _let(
            {"lo": llon, "la": llat},
            lambda v: (lambda xy: {"x": xy[0], "y": xy[1]})(
                _lcc_fwd_expr_c(v["lo"], v["la"], consts)
            ),
        )
        return out["x"], out["y"]
    aff = (geom_ops._CUSTOM_CRS.get(srid) or {}).get("affine")
    if aff:
        a, b, d, e, xoff, yoff = aff
        return (
            F.lit(a) * lon + F.lit(b) * lat + F.lit(xoff),
            F.lit(d) * lon + F.lit(e) * lat + F.lit(yoff),
        )
    return None


def st_transform_point(
    col: Column | str,
    src_srid: int,
    dst_srid: int,
    meta: GeometryMeta = POINT_META,
) -> Column:
    """Point-column reprojection, pure Catalyst: native struct{x,y} out.

    Supported CRS (any pair, pivoting through lon/lat): EPSG:4326,
    EPSG:3857 (closed-form spherical Web Mercator), WGS84 UTM zones
    EPSG:326zz/327zz and ETRS89/UTM 25828-25838 (Snyder
    Transverse-Mercator series, <1 mm in-zone), EPSG:3035 (ETRS89-LAEA
    Europe, ellipsoidal), r10's Albers 5070/3310/3577, Lambert
    conformal 2154/3978, polar stereographic 3031/3413/3976/5041/5042,
    TM 2180, and — r11 — the datum-bearing codes: EPSG:27700 (OSGB), the
    NTF Lambert zones 27571-27573, and every register_datum('tm'/'lcc'/
    'geographic') registration (the OS
    7-parameter WGS84↔OSGB36 Helmert runs in Catalyst through geocentric
    XYZ, with Bowring's closed-form latitude replacing the kernel's
    fixed-point XYZ→geodetic — the codegen-safe analog of the series
    inverses). Forward twins are expression-for-expression with the
    geom_ops kernels; the iterative latitude inverses are replaced by
    the standard authalic/conformal series (~1e-10 rad of the iterated
    values; Bowring ~1e-12 rad for near-ellipsoid heights). Everything
    stays in whole-stage codegen — trig expressions only, usable inside
    join conditions at scale."""
    x, y = st_x(col, meta), st_y(col, meta)
    if src_srid == dst_srid:
        return st_point(x, y)
    ll = _to_lonlat_expr(x, y, src_srid)
    out = None if ll is None else _from_lonlat_expr(ll[0], ll[1], dst_srid)
    if out is None:
        raise NotImplementedError(
            f"transform {src_srid} -> {dst_srid} has no pure-Catalyst "
            "closed form (built-ins: 4326, 3857, UTM 326zz/327zz + "
            "25828-25838 + NAD83 26901-23/4269 + SPCS83 state-plane meter codes, "
            "LAEA 3035, Albers 5070/3310/3577, LCC "
            "2154/3978, polar stereographic 3031/3413/3976/5041/5042, "
            "TM 2180/27700, NTF Lambert 27571-27573, plus "
            "geom_ops.register_crs(affine=...) and register_datum "
            "SRIDs) — "
            "use st_transform, which also takes callable register_crs "
            "SRIDs, a custom= pair function, or any EPSG pair via the "
            "optional 'pyproj' extra"
        )
    return st_point(out[0], out[1])


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
    # null-propagating clamp: least/greatest skip nulls, so a null point
    # would otherwise land in the max tile (2^z-1, 2^z-1) and its quadkey
    # would masquerade as real bottom-right-corner data (r7 review fix)
    clamp = lambda c: F.when(  # noqa: E731
        c.isNotNull(), F.greatest(F.lit(0), F.least(c, F.lit(2 ** z - 1)))
    )
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
