"""Geometry constructors and coordinate transforms (pure Catalyst).

All of these operate on native-encoded geometry (nested arrays of coord
structs) with higher-order functions — zero Python, zero shuffle — and
compose with the rest of the st_* surface.

WKB input (r12): each transform now also accepts WKB metadata via an
Arrow-batched kernel fallback (``geom_ops._map_xy`` under a pandas UDF
— one decode/encode per row, Z/M preserved). The native path stays the
scale path (whole-stage codegen, zero Python); the fallback exists so a
PostGIS migration with WKB columns is never a hard error. Rounding
convention on the WKB snap path is JTS half-up (floor(x + .5), the
library-wide kernel convention) — Spark's ``F.round`` on the native
path differs only on exact negative half-ties.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from datafusion_spatial_spark.meta import NESTING_DEPTH, GeometryMeta


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def st_makeline(points: Column | str) -> Column:
    """array<point struct> -> native LineString (identity re-tag; pair with
    GeometryMeta('linestring'))."""
    return _c(points)


def st_makepolygon(ring: Column | str, holes: Column | str | None = None) -> Column:
    """Closed ring (array<point>) [+ array of hole rings] -> native Polygon.
    A NULL holes value means "no holes" (concat would otherwise null the
    whole polygon away — r7 review fix)."""
    ring = _c(ring)
    if holes is None:
        return F.array(ring)
    return F.concat(F.array(ring), F.coalesce(_c(holes), F.array()))


def st_collect_points(point_col: Column | str) -> Column:
    """Aggregate: points -> native MultiPoint (nulls dropped). Use inside
    groupBy().agg(); the list is assembled by Catalyst's collect_list with
    partial aggregation."""
    return F.collect_list(_c(point_col))


def _map_coords(col: Column, meta: GeometryMeta, fn_xy) -> Column:
    """Apply ``fn_xy(point_struct) -> (new_x, new_y)`` over every
    coordinate at the encoding's nesting depth, rebuilding each point
    struct with Z/M fields PASSED THROUGH (PostGIS transforms preserve
    them; the old struct(x,y) rebuild silently destroyed elevation and
    measures — r7 review fix). Depth-0 (Point) output is null-guarded:
    ``F.struct`` never returns NULL, so a NULL point would otherwise
    become a non-null struct of null fields. Interleaved-layout input
    raises — normalize with ``meta.to_separated`` first (returning a
    separated struct under the caller's interleaved meta tag would
    misdecode downstream)."""
    if meta.is_native and meta.coord_layout != "separated":
        raise NotImplementedError(
            "coordinate transforms require the separated native layout; "
            "normalize first with meta.to_separated(col, meta)"
        )

    def fn(p):
        nx, ny = fn_xy(p)
        fields = [nx.alias("x"), ny.alias("y")]
        if meta.has_z:
            fields.append(p["z"].alias("z"))
        if meta.has_m:
            fields.append(p["m"].alias("m"))
        return F.struct(*fields)

    depth = NESTING_DEPTH[meta.native_type]
    if depth == 0:
        return F.when(col.isNotNull(), fn(col))
    if depth == 1:
        return F.transform(col, fn)
    if depth == 2:
        return F.transform(col, lambda r: F.transform(r, fn))
    return F.transform(
        col, lambda p: F.transform(p, lambda r: F.transform(r, fn))
    )


def _wkb_map_xy(col: Column | str, meta: GeometryMeta, fn_xy) -> Column:
    """WKB fallback for the transform family: apply ``(x, y) -> (x', y')``
    per coordinate through the geometry kernel (Z/M and structure
    preserved), WKB out. Imported lazily to keep this module's Catalyst
    path import-light."""
    from datafusion_spatial_spark import geom_ops
    from datafusion_spatial_spark.functions.accessors import _geom_out

    return _geom_out(lambda g: geom_ops._map_xy(g, fn_xy))(col, meta)


def st_translate(col: Column | str, dx: float, dy: float, meta: GeometryMeta) -> Column:
    dx, dy = float(dx), float(dy)
    if meta.is_wkb:
        return _wkb_map_xy(col, meta, lambda x, y: (x + dx, y + dy))
    col = _c(col)

    def move(p):
        return p["x"] + F.lit(dx), p["y"] + F.lit(dy)

    return _map_coords(col, meta, move)


def st_scale(col: Column | str, sx: float, sy: float, meta: GeometryMeta) -> Column:
    sx, sy = float(sx), float(sy)
    if meta.is_wkb:
        return _wkb_map_xy(col, meta, lambda x, y: (x * sx, y * sy))
    col = _c(col)

    def scale(p):
        return p["x"] * F.lit(sx), p["y"] * F.lit(sy)

    return _map_coords(col, meta, scale)


def st_flipcoordinates(col: Column | str, meta: GeometryMeta) -> Column:
    if meta.is_wkb:
        return _wkb_map_xy(col, meta, lambda x, y: (y, x))
    col = _c(col)

    def flip(p):
        return p["y"], p["x"]

    return _map_coords(col, meta, flip)


def st_snaptogrid(col: Column | str, size: float, meta: GeometryMeta) -> Column:
    """Snap every coordinate to a grid of ``size``, rounding half-ties
    UP toward +infinity (JTS/PostGIS convention: floor(v/size + 0.5)) on
    BOTH encodings — ADVICE r12 pinned the native path to the same
    convention (F.round is HALF_UP *away from zero*, which snaps -2.5 to
    -3 where the kernel snaps it to -2)."""
    size = float(size)
    if meta.is_wkb:
        import math as _m

        def snap(v: float) -> float:
            return 0.0 + _m.floor(v / size + 0.5) * size  # JTS half-up

        return _wkb_map_xy(col, meta, lambda x, y: (snap(x), snap(y)))
    col = _c(col)
    s = F.lit(size)

    def snap_c(p):
        return (
            F.floor(p["x"] / s + F.lit(0.5)) * s,
            F.floor(p["y"] / s + F.lit(0.5)) * s,
        )

    return _map_coords(col, meta, snap_c)


def st_affine(
    col: Column | str,
    a: float, b: float, d: float, e: float,
    xoff: float, yoff: float,
    meta: GeometryMeta,
) -> Column:
    """2-D affine transform (PostGIS ST_Affine 2D form):
    x' = a·x + b·y + xoff, y' = d·x + e·y + yoff. Pure Catalyst on
    native input; kernel fallback on WKB."""
    if meta.is_wkb:
        fa, fb, fd, fe = float(a), float(b), float(d), float(e)
        fx, fy = float(xoff), float(yoff)
        return _wkb_map_xy(
            col, meta,
            lambda x, y: (fa * x + fb * y + fx, fd * x + fe * y + fy),
        )
    col = _c(col)
    la, lb, ld, le = (F.lit(float(v)) for v in (a, b, d, e))
    lx, ly = F.lit(float(xoff)), F.lit(float(yoff))

    def tx(p):
        return la * p["x"] + lb * p["y"] + lx, ld * p["x"] + le * p["y"] + ly

    return _map_coords(col, meta, tx)


def st_rotate(
    col: Column | str,
    angle: float,
    meta: GeometryMeta,
    origin: tuple[float, float] = (0.0, 0.0),
) -> Column:
    """CCW rotation by ``angle`` radians about ``origin`` (PostGIS
    ST_Rotate). Composition of affines, folded to literals — pure
    Catalyst, zero Python."""
    import math as _m

    c, s = _m.cos(angle), _m.sin(angle)
    ox, oy = origin
    # x' = c(x-ox) - s(y-oy) + ox ; y' = s(x-ox) + c(y-oy) + oy
    return st_affine(
        col, c, -s, s, c,
        ox - c * ox + s * oy,
        oy - s * ox - c * oy,
        meta,
    )
