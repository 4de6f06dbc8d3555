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

import pandas as pd
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


def _sq_cells_py(bb, size, ox, oy, max_cells):
    """Python mirror of the Catalyst square-grid enumeration (same floor
    arithmetic, same over-cap NULL contract)."""
    i0 = math.floor((bb[0] - ox) / size)
    i1 = math.floor((bb[2] - ox) / size)
    j0 = math.floor((bb[1] - oy) / size)
    j1 = math.floor((bb[3] - oy) / size)
    n = (i1 - i0 + 1) * (j1 - j0 + 1)
    if n <= 0 or n > max_cells:
        return None
    return [
        {"i": i, "j": j}
        for i in range(i0, i1 + 1)
        for j in range(j0, j1 + 1)
    ]


def _hex_cells_py(bb, size, ox, oy, max_cells):
    """Python mirror of the Catalyst hex-grid enumeration."""
    s = size
    xmin, xmax = bb[0] - ox - s, bb[2] - ox + s
    ymin, ymax = bb[1] - oy - s, bb[3] - oy + s
    r0 = math.ceil(ymin / (1.5 * s))
    r1 = math.floor(ymax / (1.5 * s))
    if r1 < r0:
        return None
    w = _SQRT3 * s
    nmax = (r1 - r0 + 1) * (math.floor((xmax - xmin) / w) + 2)
    if nmax > max_cells:
        return None
    out = []
    for r in range(r0, r1 + 1):
        q0 = math.ceil(xmin / w - r / 2.0)
        q1 = math.floor(xmax / w - r / 2.0)
        out.extend({"q": q, "r": r} for q in range(q0, q1 + 1))
    return out


def _grid_wkb_udf(col: Column | str, meta: GeometryMeta, cells_fn, fields):
    """Array-of-cells over a WKB/non-Catalyst-bbox column in ONE
    Arrow-batched UDF — Spark rejects Python-UDF-derived columns inside
    higher-order-function lambdas (UNSUPPORTED_FEATURE.
    LAMBDA_FUNCTION_WITH_PYTHON_UDF), so the Catalyst sequence/transform
    form is reserved for native encodings."""
    from pyspark.sql import types as T

    from datafusion_spatial_spark import geom_ops
    from datafusion_spatial_spark.functions.predicates import (
        _as_rows,
        _converter,
        _prep,
    )

    conv = _converter(meta, force2d=True)
    dtype = T.ArrayType(T.StructType(
        [T.StructField(f, T.LongType()) for f in fields]
    ))

    @F.pandas_udf(dtype)
    def udf(s: pd.Series) -> pd.Series:
        out = []
        for v in _as_rows(s):
            g = conv(v)
            bb = None if g is None else geom_ops._bbox(g)
            out.append(None if bb is None else cells_fn(bb))
        return pd.Series(out, dtype="object")

    return udf(_prep(col, meta))


def st_squaregrid(
    col: Column | str,
    meta: GeometryMeta,
    size: float,
    origin: tuple[float, float] = (0.0, 0.0),
    max_cells: int = 65536,
) -> Column:
    """PostGIS ST_SquareGrid as an ``array<struct{i, j}>`` of the square
    cells overlapping the geometry's bbox — ``F.explode`` it for the
    set-returning form, then :func:`st_squarecellenvelope` for polygons.
    Pure Catalyst (nested ``sequence``/``transform``) for native
    encodings; WKB routes through one Arrow-batched UDF with identical
    arithmetic. A bbox spanning more than ``max_cells`` cells yields NULL
    instead of materializing an unbounded array (at scale, tile huge
    geometries with st_subdivide first). NULL geometry -> NULL."""
    size = _check_size(size)
    ox, oy = float(origin[0]), float(origin[1])
    if meta.is_wkb:
        return _grid_wkb_udf(
            col, meta,
            lambda bb: _sq_cells_py(bb, size, ox, oy, int(max_cells)),
            ("i", "j"),
        )
    b = st_bbox(col, meta)
    i0 = F.floor((b["xmin"] - F.lit(ox)) / F.lit(size)).cast("long")
    i1 = F.floor((b["xmax"] - F.lit(ox)) / F.lit(size)).cast("long")
    j0 = F.floor((b["ymin"] - F.lit(oy)) / F.lit(size)).cast("long")
    j1 = F.floor((b["ymax"] - F.lit(oy)) / F.lit(size)).cast("long")
    n = (i1 - i0 + 1) * (j1 - j0 + 1)
    cells = F.flatten(
        F.transform(
            F.sequence(i0, i1),
            lambda i: F.transform(
                F.sequence(j0, j1),
                lambda j: F.struct(i.alias("i"), j.alias("j")),
            ),
        )
    )
    return F.when(
        b.isNotNull() & (n <= F.lit(int(max_cells))) & (n > 0), cells
    )


def st_hexagongrid(
    col: Column | str,
    meta: GeometryMeta,
    size: float,
    origin: tuple[float, float] = (0.0, 0.0),
    max_cells: int = 65536,
) -> Column:
    """PostGIS ST_HexagonGrid-shaped: ``array<struct{q, r}>`` of pointy-top
    axial hex cells whose CENTER lies within the geometry's bbox expanded
    by one circumradius — a covering superset of every hexagon that
    overlaps the bbox (refine with st_intersects on
    :func:`st_hexcellpolygon` when exact overlap is needed; PostGIS also
    over-returns edge cells). Catalyst for native encodings, one
    Arrow-batched UDF for WKB; NULL over ``max_cells``."""
    size = _check_size(size)
    ox, oy = float(origin[0]), float(origin[1])
    if meta.is_wkb:
        return _grid_wkb_udf(
            col, meta,
            lambda bb: _hex_cells_py(bb, size, ox, oy, int(max_cells)),
            ("q", "r"),
        )
    b = st_bbox(col, meta)
    s = F.lit(float(size))
    xmin, xmax = b["xmin"] - F.lit(ox) - s, b["xmax"] - F.lit(ox) + s
    ymin, ymax = b["ymin"] - F.lit(oy) - s, b["ymax"] - F.lit(oy) + s
    # center rows: cy = 1.5·s·r → r range; per row cx = √3·s·(q + r/2)
    r0 = F.ceil(ymin / (F.lit(1.5) * s)).cast("long")
    r1 = F.floor(ymax / (F.lit(1.5) * s)).cast("long")
    w = F.lit(_SQRT3) * s

    def q_range(r):
        rq = r.cast("double") / 2.0
        q0 = F.ceil(xmin / w - rq).cast("long")
        q1 = F.floor(xmax / w - rq).cast("long")
        return F.when(
            q1 >= q0,
            F.transform(
                F.sequence(q0, q1),
                lambda q: F.struct(q.alias("q"), r.alias("r")),
            ),
        ).otherwise(F.array().cast("array<struct<q:bigint,r:bigint>>"))

    cells = F.flatten(F.transform(F.sequence(r0, r1), q_range))
    # conservative cap: rows × max row width
    nmax = (r1 - r0 + 1) * (F.floor((xmax - xmin) / w).cast("long") + 2)
    return F.when(
        b.isNotNull() & (r1 >= r0) & (nmax <= F.lit(int(max_cells))), cells
    )
