"""Binary spatial predicates, measures, and constructive ops.

The reference's README declares these (README.md:19-39) but implements none;
here they are backed by the clean-room kernels in
:mod:`datafusion_spatial_spark.geom_ops`, executed as Arrow-batched pandas
UDFs (the WKB slow path — there is no pure-Catalyst form for exact
topological predicates).

Scale note: a predicate UDF in a *join condition* forces a nested-loop plan.
For spatial joins use :mod:`datafusion_spatial_spark.operators.spatial_join`
(grid-bucketed equi-join + exact refine) and keep these UDFs for the refine
stage or for projections/filters.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datafusion_spatial_spark import geom_ops, wkb
from datafusion_spatial_spark.meta import NESTING_DEPTH, GeometryMeta, to_separated


def _prep(col: Column | str, meta: GeometryMeta) -> Column:
    """Column fed to the UDF: WKB binary as-is; native nested geometry is
    re-shaped JVM-side into a GeoArrow-style *flat offsets* struct
    ``{xs: array<double>, ys: array<double>[, zs], ring_counts: array<int>,
    part_counts: array<int>}`` built with codegen'd ``flatten``/``transform``.
    Every field is a 1-D array, which the Arrow→pandas bridge handles;
    ragged *nested* arrays (polygon rings of different lengths) it cannot
    materialize, and the previous ``to_json`` text hop cost ~3-5× the bytes
    plus a Python-side parse. Raw doubles cross the boundary losslessly."""
    col = F.col(col) if isinstance(col, str) else col
    if meta.is_wkb:
        return col
    col, meta = to_separated(col, meta)
    depth = NESTING_DEPTH[meta.native_type]
    if depth == 0:
        # NULL-guard the wrap: F.array(null_struct) is [NULL], which the
        # Arrow->pandas bridge renders as [nan] — indistinguishable from
        # POINT EMPTY (nan, nan), so a NULL point silently adopted EMPTY
        # semantics in every conv-backed function (ST_Intersects(NULL,x)
        # = False, ST_Equals(NULL,NULL) = True, ST_Area(NULL) = 0.0).
        # With the guard, NULL -> null xs -> converter None -> SQL NULL,
        # the PostGIS strict-function contract. Depth>=1 already
        # propagates (transform(NULL) is NULL).
        leaves = F.when(col.isNotNull(), F.array(col))
    elif depth == 1:
        leaves = col
    elif depth == 2:
        leaves = F.flatten(col)
    else:
        leaves = F.flatten(F.flatten(col))
    fields = [
        F.transform(leaves, lambda c: c["x"]).alias("xs"),
        F.transform(leaves, lambda c: c["y"]).alias("ys"),
    ]
    if meta.has_z:
        fields.append(F.transform(leaves, lambda c: c["z"]).alias("zs"))
    if meta.has_m:
        fields.append(F.transform(leaves, lambda c: c["m"]).alias("ms"))
    if depth == 2:
        fields.append(F.transform(col, F.size).alias("ring_counts"))
    elif depth == 3:
        fields.append(
            F.flatten(
                F.transform(col, lambda p: F.transform(p, F.size))
            ).alias("ring_counts")
        )
        fields.append(F.transform(col, F.size).alias("part_counts"))
    # a NULL geometry yields NULL transform outputs -> struct with null xs;
    # the converter maps that back to None (no cast-to-struct needed)
    return F.struct(*fields)


def _as_rows(s):
    """pandas_udf input normalizer: StructType columns arrive as a
    pd.DataFrame (one column per field) — iterate them as per-row dicts;
    plain Series pass through."""
    return s.to_dict("records") if isinstance(s, pd.DataFrame) else s


def _converter(
    meta: GeometryMeta, force2d: bool = False
) -> Callable[[object], wkb.Geom | None]:
    """UDF-side value (WKB bytes or flat-offsets struct) -> Geom.

    ``force2d=True`` projects Z/M away before the kernel sees the Geom —
    the 2-D analysis operations (predicates, measures, overlay,
    ST_Distance) are defined on the XY projection (PostGIS semantics),
    and the scalar kernels assume 2-tuples in several places (r11:
    ``contains`` crashed outright on XYZ input). Dim-preserving consumers
    (st_asbinary/st_asgeojson/st_3ddistance, the structural accessors)
    keep the default."""
    if meta.is_wkb:
        if force2d:
            def conv_wkb_2d(v):
                if v is None:
                    return None
                g = wkb.loads(bytes(v))
                # meta rarely knows WKB dims — decide per row (two attr
                # reads; force_2d returns the same object for 2-D input)
                if g.has_z or g.has_m or g.type_name == "GeometryCollection":
                    g = geom_ops.force_2d(g)
                return g

            return conv_wkb_2d

        def conv_wkb(v):
            if v is None:
                return None
            return wkb.loads(bytes(v))

        return conv_wkb

    tname = meta.native_type
    depth = NESTING_DEPTH[tname]
    has_z, has_m = meta.has_z, meta.has_m
    if force2d:
        has_z = has_m = False  # conv reads xs/ys only: projection for free

    def mk(coords):
        return wkb.Geom(tname, coords, has_z, None, has_m)

    def conv_native(v):
        if v is None:
            return None
        xs = v["xs"]
        if xs is None:
            return None
        ys = v["ys"]
        cols = [xs, ys]
        if has_z:
            cols.append(v["zs"])
        if has_m:
            cols.append(v["ms"])
        pts = list(zip(*cols))
        if depth == 0:
            if not pts or pts[0][0] is None:
                return None
            return mk(pts[0])
        if depth == 1:
            return mk(pts)
        rings = []
        i = 0
        for n in v["ring_counts"]:
            rings.append(pts[i : i + n])
            i += n
        if depth == 2:
            return mk(rings)
        parts = []
        j = 0
        for n in v["part_counts"]:
            parts.append(rings[j : j + n])
            j += n
        return mk(parts)

    return conv_native


def _fast_kind(meta: GeometryMeta) -> str:
    """Shape hint for the vectorized refine fast paths: 'wkb' (bytes reach
    the UDF as-is), 'point' (depth-0 native struct),
    'native:<TypeName>' (deeper native struct — the flat-offsets fields
    are coordinate arrays the sweep can consume directly, r10), or
    'other' (unknown type: the scalar kernels decide). Z/M native columns
    participate since r11 — the sweep reads xs/ys only, the projection
    the 2-D kernels apply via force2d."""
    if meta.is_wkb:
        return "wkb"
    t = meta.native_type
    if t in NESTING_DEPTH:
        return "point" if NESTING_DEPTH[t] == 0 else f"native:{t}"
    return "other"


def _binary_predicate(fn: Callable[[wkb.Geom, wkb.Geom], bool], mode: str | None = None):
    def build(a: Column | str, b: Column | str, meta_a: GeometryMeta, meta_b: GeometryMeta) -> Column:
        ca = _converter(meta_a, force2d=True)
        cb = _converter(meta_b, force2d=True)
        kind_a, kind_b = _fast_kind(meta_a), _fast_kind(meta_b)

        @F.pandas_udf(T.BooleanType())
        def udf(sa: pd.Series, sb: pd.Series) -> pd.Series:
            if mode is not None:
                from datafusion_spatial_spark.functions._fastpath import (
                    predicate_fastpath,
                )

                fast = predicate_fastpath(sa, sb, mode, kind_a, kind_b)
                if fast is not None:
                    return fast
            out = []
            for va, vb in zip(_as_rows(sa), _as_rows(sb)):
                ga, gb = ca(va), cb(vb)
                out.append(None if ga is None or gb is None else fn(ga, gb))
            return pd.Series(out, dtype="object")

        return udf(_prep(a, meta_a), _prep(b, meta_b))

    return build


st_intersects = _binary_predicate(geom_ops.intersects, "intersects")
st_disjoint = _binary_predicate(geom_ops.disjoint, "disjoint")
st_contains = _binary_predicate(geom_ops.contains, "contains")
st_within = _binary_predicate(geom_ops.within, "within")
st_equals = _binary_predicate(geom_ops.equals, "equals")


def st_distance(
    a: Column | str, b: Column | str, meta_a: GeometryMeta, meta_b: GeometryMeta
) -> Column:
    ca, cb = _converter(meta_a, force2d=True), _converter(meta_b, force2d=True)
    kind_a, kind_b = _fast_kind(meta_a), _fast_kind(meta_b)

    @F.pandas_udf(T.DoubleType())
    def udf(sa: pd.Series, sb: pd.Series) -> pd.Series:
        from datafusion_spatial_spark.functions._fastpath import (
            distance_fastpath,
        )

        fast = distance_fastpath(sa, sb, kind_a, kind_b)
        if fast is not None:
            return fast
        out = []
        for va, vb in zip(_as_rows(sa), _as_rows(sb)):
            ga, gb = ca(va), cb(vb)
            out.append(None if ga is None or gb is None else geom_ops.distance(ga, gb))
        return pd.Series(out, dtype="float64")

    return udf(_prep(a, meta_a), _prep(b, meta_b))


def st_dwithin(
    a: Column | str,
    b: Column | str,
    d: float,
    meta_a: GeometryMeta,
    meta_b: GeometryMeta,
) -> Column:
    return st_distance(a, b, meta_a, meta_b) <= F.lit(float(d))


def _unary_measure(fn, dtype=T.DoubleType(), fast_mode: str | None = None):
    def build(col: Column | str, meta: GeometryMeta) -> Column:
        conv = _converter(meta, force2d=True)
        kind = _fast_kind(meta)

        @F.pandas_udf(dtype)
        def udf(s: pd.Series) -> pd.Series:
            if fast_mode is not None and (
                kind == "wkb" or kind.startswith("native:")
            ):
                from datafusion_spatial_spark.functions._fastpath import (
                    measure_fastpath,
                )

                fast = measure_fastpath(s, fast_mode, kind)
                if fast is not None:
                    return fast
            out = []
            for v in _as_rows(s):
                g = conv(v)
                out.append(None if g is None else fn(g))
            return pd.Series(out, dtype="object")

        return udf(_prep(col, meta))

    return build


st_area = _unary_measure(geom_ops.area, fast_mode="area")
st_length = _unary_measure(geom_ops.length, fast_mode="length")
st_issimple = _unary_measure(geom_ops.is_simple, T.BooleanType())
st_isvalid = _unary_measure(geom_ops.is_valid, T.BooleanType())
st_isvalidreason = _unary_measure(
    lambda g: geom_ops.invalid_reason(g) or "Valid Geometry", T.StringType()
)


def _unary_constructive(fn):
    """geometry -> geometry op, emitted as WKB (pair with GeometryMeta('WKB'))."""

    def build(col: Column | str, meta: GeometryMeta, **kw) -> Column:
        conv = _converter(meta, force2d=True)

        @F.pandas_udf(T.BinaryType())
        def udf(s: pd.Series) -> pd.Series:
            out = []
            for v in _as_rows(s):
                g = conv(v)
                r = None if g is None else fn(g, **kw)
                # a kernel may decline its input (wrong geometry class,
                # e.g. offset_curve on a polygon): NULL out, never a
                # worker crash in wkb.dumps (r12 fuzz)
                out.append(None if r is None else wkb.dumps(r))
            return pd.Series(out, dtype="object")

        return udf(_prep(col, meta))

    return build


st_convexhull = _unary_constructive(lambda g: geom_ops.convex_hull(g))
st_boundary = _unary_constructive(lambda g: geom_ops.boundary(g))
st_makevalid = _unary_constructive(lambda g: geom_ops.make_valid(g))
st_unaryunion = _unary_constructive(lambda g: geom_ops.unary_union(g))


def _parse_buffer_params(params: str) -> dict:
    """PostGIS buffer style string: 'quad_segs=8 endcap=flat join=mitre
    mitre_limit=5.0' (aliases: butt=flat, miter=mitre)."""
    out: dict = {}
    for tok in params.split():
        if "=" not in tok:
            raise ValueError(f"bad buffer parameter {tok!r}")
        k, v = tok.split("=", 1)
        k = k.strip().lower()
        v = v.strip().lower()
        if k == "quad_segs":
            out["segments"] = int(v)
        elif k == "endcap":
            if v not in ("round", "flat", "butt", "square"):
                raise ValueError(f"unknown endcap {v!r}")
            out["endcap"] = v
        elif k == "join":
            if v not in ("round", "mitre", "miter", "bevel"):
                raise ValueError(f"unknown join {v!r}")
            out["join"] = v
        elif k in ("mitre_limit", "miter_limit"):
            out["mitre_limit"] = float(v)
        elif k == "side":
            if v not in ("both", "left", "right"):
                raise ValueError(f"unknown side {v!r}")
            out["side"] = v
        else:
            raise ValueError(f"unknown buffer parameter {k!r}")
    return out


def st_buffer(
    col: Column | str,
    radius: float,
    meta: GeometryMeta,
    segments: int = 16,
    params: str | None = None,
) -> Column:
    """PostGIS ST_Buffer; ``params`` accepts the PostGIS style string
    ('quad_segs=8 endcap=round|flat|square join=round|mitre|bevel
    mitre_limit=5.0')."""
    kw: dict = {"segments": segments}
    if params:
        kw.update(_parse_buffer_params(params))
    return _unary_constructive(
        lambda g: geom_ops.buffer(g, radius, **kw)
    )(col, meta)


def st_offsetcurve(
    col: Column | str,
    distance: float,
    meta: GeometryMeta,
    segments: int = 16,
    params: str | None = None,
) -> Column:
    """PostGIS ST_OffsetCurve: one-sided offset line (positive = left,
    same direction; negative = right, reversed — GEOS convention). The
    style string accepts quad_segs / join / mitre_limit."""
    kw: dict = {"segments": segments}
    if params:
        parsed = _parse_buffer_params(params)
        for k in ("endcap", "side"):
            if k in parsed:
                raise ValueError(f"{k} does not apply to ST_OffsetCurve")
        kw.update(parsed)

    def _offset(g):
        # PostGIS raises on non-line input; the column-layer convention
        # here is NULL (r12 fuzz: the kernel's ValueError used to crash
        # the Python worker mid-job on mixed-type columns)
        if g.type_name not in ("LineString", "MultiLineString"):
            return None
        return geom_ops.offset_curve(g, distance, **kw)

    return _unary_constructive(_offset)(col, meta)


def st_centroid(col: Column | str, meta: GeometryMeta) -> Column:
    """Centroid as a native Point struct; NULL or EMPTY geometry → NULL
    (the pandas→Arrow bridge coerces NaN to null, so EMPTY cannot round-trip
    the NaN empty-point convention through this UDF)."""
    conv = _converter(meta, force2d=True)

    _pt_type = T.StructType([
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
    ])

    kind = _fast_kind(meta)

    @F.pandas_udf(_pt_type)
    def udf(s: pd.Series) -> pd.DataFrame:
        if kind == "wkb" or kind.startswith("native:"):
            from datafusion_spatial_spark.functions._fastpath import (
                centroid_fastpath,
            )

            fast = centroid_fastpath(s, kind)
            if fast is not None:
                return fast
        nan = float("nan")
        xs, ys = [], []
        for v in _as_rows(s):
            g = conv(v)
            if g is None:
                xs.append(None)
                ys.append(None)
                continue
            c = geom_ops.centroid(g)
            xs.append(nan if c is None else c[0])
            ys.append(nan if c is None else c[1])
        return pd.DataFrame({"x": xs, "y": ys})

    out = udf(_prep(col, meta))
    # pandas struct UDFs cannot emit NULL structs — normalize all-null rows
    return F.when(out["x"].isNull(), F.lit(None).cast(_pt_type)).otherwise(out)


def _binary_constructive(fn):
    """(geometry, geometry) -> geometry op, emitted as WKB."""

    def build(
        a: Column | str, b: Column | str, meta_a: GeometryMeta, meta_b: GeometryMeta
    ) -> Column:
        ca, cb = _converter(meta_a, force2d=True), _converter(meta_b, force2d=True)

        @F.pandas_udf(T.BinaryType())
        def udf(sa: pd.Series, sb: pd.Series) -> pd.Series:
            out = []
            for va, vb in zip(_as_rows(sa), _as_rows(sb)):
                ga, gb = ca(va), cb(vb)
                out.append(
                    None if ga is None or gb is None else wkb.dumps(fn(ga, gb))
                )
            return pd.Series(out, dtype="object")

        return udf(_prep(a, meta_a), _prep(b, meta_b))

    return build


st_intersection = _binary_constructive(geom_ops.intersection)
st_difference = _binary_constructive(geom_ops.difference)
st_union = _binary_constructive(geom_ops.union)
st_symdifference = _binary_constructive(geom_ops.sym_difference)


st_touches = _binary_predicate(geom_ops.touches)
st_crosses = _binary_predicate(geom_ops.crosses)
st_overlaps = _binary_predicate(geom_ops.overlaps)


def st_relate_matrix(
    a: Column | str,
    b: Column | str,
    meta_a: GeometryMeta,
    meta_b: GeometryMeta,
) -> Column:
    """Dimension-true DE-9IM matrix string (e.g. '212101212') — the
    PostGIS 2-argument ST_Relate form (geom_ops.relate_matrix)."""
    ca, cb = _converter(meta_a, force2d=True), _converter(meta_b, force2d=True)

    @F.pandas_udf(T.StringType())
    def udf(sa: pd.Series, sb: pd.Series) -> pd.Series:
        out = []
        for va, vb in zip(_as_rows(sa), _as_rows(sb)):
            ga, gb = ca(va), cb(vb)
            out.append(
                None
                if ga is None or gb is None
                else geom_ops.relate_matrix(ga, gb)
            )
        return pd.Series(out, dtype="object")

    return udf(_prep(a, meta_a), _prep(b, meta_b))


def st_relate(
    a: Column | str,
    b: Column | str,
    pattern: str,
    meta_a: GeometryMeta,
    meta_b: GeometryMeta,
) -> Column:
    """DE-9IM pattern match: T/F/* cells and explicit dimensions 0/1/2
    (dimension cells use geom_ops.relate_matrix)."""
    ca, cb = _converter(meta_a, force2d=True), _converter(meta_b, force2d=True)

    @F.pandas_udf(T.BooleanType())
    def udf(sa: pd.Series, sb: pd.Series) -> pd.Series:
        out = []
        for va, vb in zip(_as_rows(sa), _as_rows(sb)):
            ga, gb = ca(va), cb(vb)
            out.append(
                None
                if ga is None or gb is None
                else geom_ops.relate_pattern(ga, gb, pattern)
            )
        return pd.Series(out, dtype="object")

    return udf(_prep(a, meta_a), _prep(b, meta_b))


def st_subdivide(
    col: Column | str, max_vertices: int, meta: GeometryMeta
) -> Column:
    """PostGIS ST_Subdivide as an array column (``array<binary>`` of WKB
    parts — ``F.explode`` it to get the set-returning form). Use before
    grid spatial joins on huge polygons: parts have tighter bboxes and
    bounded refine cost. ``max_vertices`` is validated HERE on the
    driver (r12 fuzz: the kernel's >= 8 check used to surface as a
    Python-worker crash mid-job)."""
    max_vertices = int(max_vertices)
    if max_vertices < 8:
        raise ValueError("ST_Subdivide max_vertices must be >= 8")
    conv = _converter(meta, force2d=True)

    @F.pandas_udf(T.ArrayType(T.BinaryType()))
    def udf(s: pd.Series) -> pd.Series:
        out = []
        for v in _as_rows(s):
            g = conv(v)
            if g is None:
                out.append(None)
            else:
                out.append(
                    [wkb.dumps(p) for p in geom_ops.subdivide(g, max_vertices)]
                )
        return pd.Series(out, dtype="object")

    return udf(_prep(col, meta))


def st_simplify(col: Column | str, tolerance: float, meta: GeometryMeta) -> Column:
    """Douglas–Peucker simplification → WKB out."""
    return _unary_constructive(
        lambda g: geom_ops.simplify(g, tolerance)
    )(col, meta)


def st_lineinterpolatepoint(
    col: Column | str, fraction: float, meta: GeometryMeta
) -> Column:
    """Point at ``fraction`` of a LineString's length, as a native Point
    struct (NULL for non-lines)."""
    conv = _converter(meta, force2d=True)
    _pt = T.StructType([
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
    ])

    @F.pandas_udf(_pt)
    def udf(s: pd.Series) -> pd.DataFrame:
        xs, ys = [], []
        for v in _as_rows(s):
            g = conv(v)
            p = None if g is None else geom_ops.line_interpolate_point(g, fraction)
            xs.append(None if p is None else p[0])
            ys.append(None if p is None else p[1])
        return pd.DataFrame({"x": xs, "y": ys})

    out = udf(_prep(col, meta))
    return F.when(out["x"].isNull(), F.lit(None).cast(_pt)).otherwise(out)


def st_geohash(col: Column | str, precision: int, meta: GeometryMeta) -> Column:
    """Geohash of a point geometry's (x=lon, y=lat) at ``precision`` chars."""
    from datafusion_spatial_spark import geohash as _gh

    conv = _converter(meta, force2d=True)

    @F.pandas_udf(T.StringType())
    def udf(s: pd.Series) -> pd.Series:
        out = []
        for v in _as_rows(s):
            g = conv(v)
            if g is None or g.type_name != "Point" or g.is_empty:
                out.append(None)
            else:
                out.append(_gh.encode(g.coords[0], g.coords[1], precision))
        return pd.Series(out, dtype="object")

    return udf(_prep(col, meta))


def st_pointfromgeohash(col: Column | str) -> Column:
    """Geohash string -> native Point struct (cell center)."""
    from datafusion_spatial_spark import geohash as _gh

    _pt = T.StructType([
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
    ])

    @F.pandas_udf(_pt)
    def udf(s: pd.Series) -> pd.DataFrame:
        xs, ys = [], []
        for v in _as_rows(s):
            if v is None:
                xs.append(None)
                ys.append(None)
            else:
                lon, lat = _gh.decode(v)
                xs.append(lon)
                ys.append(lat)
        return pd.DataFrame({"x": xs, "y": ys})

    col = F.col(col) if isinstance(col, str) else col
    out = udf(col)
    return F.when(out["x"].isNull(), F.lit(None).cast(_pt)).otherwise(out)


def st_closestpoint(
    a: Column | str, b: Column | str, meta_a: GeometryMeta, meta_b: GeometryMeta
) -> Column:
    """The point on ``a`` closest to ``b`` as a native Point struct."""
    ca, cb = _converter(meta_a, force2d=True), _converter(meta_b, force2d=True)
    _pt = T.StructType([
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
    ])

    @F.pandas_udf(_pt)
    def udf(sa: pd.Series, sb: pd.Series) -> pd.DataFrame:
        xs, ys = [], []
        for va, vb in zip(_as_rows(sa), _as_rows(sb)):
            ga, gb = ca(va), cb(vb)
            p = None if ga is None or gb is None else geom_ops.closest_point(ga, gb)
            xs.append(None if p is None else p[0])
            ys.append(None if p is None else p[1])
        return pd.DataFrame({"x": xs, "y": ys})

    out = udf(_prep(a, meta_a), _prep(b, meta_b))
    return F.when(out["x"].isNull(), F.lit(None).cast(_pt)).otherwise(out)


# r11 parity-plus: the covers family (PostGIS ST_Covers/ST_CoveredBy —
# containment that admits boundary contact; geom_ops.covers is the 4-way
# 'T' DE-9IM pattern union with EI = EB = F)
st_covers = _binary_predicate(geom_ops.covers)
st_coveredby = _binary_predicate(geom_ops.covered_by)
