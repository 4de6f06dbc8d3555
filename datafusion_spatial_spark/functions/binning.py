"""Planar grid binning: square and hexagon cells, pure Catalyst.

The standard 100 TB map-aggregation shape — assign every geometry a grid
cell key, then ``groupBy(cell).agg(...)`` (one shuffle on a small int
pair, partial aggregation map-side). The PostGIS analogs are the
set-returning ST_SquareGrid / ST_HexagonGrid + a join; the Spark-idiomatic
form inverts it: a cell-key *expression* per row (whole-stage codegen, no
join), plus a cell→polygon generator for rendering the binned result.

Hexagons are pointy-top, axial (q, r) coordinates with ``size`` = the
circumradius (center→vertex). Cell assignment is the classic fractional
axial coordinate + cube rounding, expressed entirely in Catalyst — the
rounding tie-break (Spark HALF_UP) is consistent between the assignment
and the polygon generator, so every point lands in exactly one cell whose
polygon covers it.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from datafusion_spatial_spark.functions.scalar import st_bbox, st_point
from datafusion_spatial_spark.meta import GeometryMeta

_SQRT3 = math.sqrt(3.0)


def _check_size(size: float) -> float:
    size = float(size)
    if not size > 0.0:
        raise ValueError(f"cell size must be > 0, got {size!r}")
    return size


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _center_xy(col: Column | str, meta: GeometryMeta) -> tuple[Column, Column]:
    """bbox-center x/y (pure Catalyst for native encodings; the exact
    point for point columns)."""
    b = st_bbox(col, meta)
    return (b["xmin"] + b["xmax"]) / 2.0, (b["ymin"] + b["ymax"]) / 2.0


def st_squarecell(
    col: Column | str,
    meta: GeometryMeta,
    size: float,
    origin: tuple[float, float] = (0.0, 0.0),
) -> Column:
    """struct{i, j} (LongType) square-grid cell of the geometry's bbox
    center. NULL geometry -> NULL cell."""
    size = _check_size(size)
    x, y = _center_xy(col, meta)
    i = F.floor((x - F.lit(float(origin[0]))) / F.lit(size)).cast("long")
    j = F.floor((y - F.lit(float(origin[1]))) / F.lit(size)).cast("long")
    return F.when(x.isNotNull() & y.isNotNull(), F.struct(i.alias("i"), j.alias("j")))


def st_squarecellenvelope(
    i: Column | str,
    j: Column | str,
    size: float,
    origin: tuple[float, float] = (0.0, 0.0),
) -> Column:
    """Native Polygon of square cell (i, j) — the ST_SquareGrid generator
    inverted to a per-key expression. NULL key -> NULL polygon."""
    i, j = _as_col(i), _as_col(j)
    s, ox, oy = _check_size(size), float(origin[0]), float(origin[1])
    x0 = i.cast("double") * F.lit(s) + F.lit(ox)
    y0 = j.cast("double") * F.lit(s) + F.lit(oy)
    x1, y1 = x0 + F.lit(s), y0 + F.lit(s)

    def pt(px, py):
        return F.struct(px.alias("x"), py.alias("y"))

    return F.when(
        i.isNotNull() & j.isNotNull(),
        F.array(
            F.array(pt(x0, y0), pt(x1, y0), pt(x1, y1), pt(x0, y1), pt(x0, y0))
        ),
    )


def _hex_round(qf: Column, rf: Column) -> tuple[Column, Column]:
    """Cube rounding of fractional axial coordinates, pure Catalyst."""
    xf, zf = qf, rf
    yf = -xf - zf
    rx, ry, rz = F.round(xf, 0), F.round(yf, 0), F.round(zf, 0)
    dx, dy, dz = F.abs(rx - xf), F.abs(ry - yf), F.abs(rz - zf)
    # fix the component with the largest rounding error so x+y+z == 0
    q = F.when((dx > dy) & (dx > dz), -ry - rz).otherwise(rx)
    r = F.when((dx > dy) & (dx > dz), rz).otherwise(
        F.when(dy > dz, rz).otherwise(-rx - ry)
    )
    return q.cast("long"), r.cast("long")


def st_hexcell(
    col: Column | str,
    meta: GeometryMeta,
    size: float,
    origin: tuple[float, float] = (0.0, 0.0),
) -> Column:
    """struct{q, r} (LongType) pointy-top hexagon cell (axial coords,
    circumradius ``size``) of the geometry's bbox center."""
    size = _check_size(size)
    x, y = _center_xy(col, meta)
    px = (x - F.lit(float(origin[0]))) / F.lit(float(size))
    py = (y - F.lit(float(origin[1]))) / F.lit(float(size))
    qf = F.lit(_SQRT3 / 3.0) * px - py / F.lit(3.0)
    rf = py * F.lit(2.0 / 3.0)
    q, r = _hex_round(qf, rf)
    return F.when(x.isNotNull() & y.isNotNull(), F.struct(q.alias("q"), r.alias("r")))


def st_hexcellpolygon(
    q: Column | str,
    r: Column | str,
    size: float,
    origin: tuple[float, float] = (0.0, 0.0),
) -> Column:
    """Native Polygon (7 points, closed) of axial hex cell (q, r).
    NULL key -> NULL polygon."""
    q, r = _as_col(q), _as_col(r)
    s, ox, oy = _check_size(size), float(origin[0]), float(origin[1])
    cx = F.lit(s * _SQRT3) * (q.cast("double") + r.cast("double") / 2.0) + F.lit(ox)
    cy = F.lit(s * 1.5) * r.cast("double") + F.lit(oy)

    def pt(k: int):
        a = math.radians(60.0 * k - 30.0)  # pointy-top vertex angles
        return F.struct(
            (cx + F.lit(s * math.cos(a))).alias("x"),
            (cy + F.lit(s * math.sin(a))).alias("y"),
        )

    return F.when(
        q.isNotNull() & r.isNotNull(),
        F.array(F.array(pt(0), pt(1), pt(2), pt(3), pt(4), pt(5), pt(0))),
    )


def st_hexcenter(
    q: Column | str,
    r: Column | str,
    size: float,
    origin: tuple[float, float] = (0.0, 0.0),
) -> Column:
    """Native point at the center of axial hex cell (q, r).
    NULL key -> NULL point."""
    q, r = _as_col(q), _as_col(r)
    s = _check_size(size)
    return F.when(
        q.isNotNull() & r.isNotNull(),
        st_point(
            F.lit(s * _SQRT3) * (q.cast("double") + r.cast("double") / 2.0)
            + F.lit(float(origin[0])),
            F.lit(s * 1.5) * r.cast("double") + F.lit(float(origin[1])),
        ),
    )
