"""Geometry accessor functions (PostGIS parity family).

Parity-plus surface: the reference implements none of these (README.md
roadmap stops at predicates/measures), but any PostGIS/DuckDB-spatial user
switching to this engine expects them. All run over the flat-offsets
transport (functions.predicates._prep) so WKB, separated-native and
interleaved-native inputs work uniformly; geometry outputs are WKB (pair
with ``GeometryMeta("WKB")``).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datafusion_spatial_spark import geom_ops, wkb
from datafusion_spatial_spark.functions.predicates import (
    _as_rows,
    _converter,
    _prep,
    _unary_measure,
)
from datafusion_spatial_spark.meta import GeometryMeta


def _unary(fn, dtype, force2d: bool = False):
    """(Geom -> value|None) lifted to a Column function. ``force2d``
    projects Z/M away for kernels defined on the XY plane (see
    predicates._converter); structural accessors keep dims."""

    def build(col: Column | str, meta: GeometryMeta) -> Column:
        conv = _converter(meta, force2d=force2d)

        @F.pandas_udf(dtype)
        def udf(s: pd.Series) -> pd.Series:
            out = []
            for v in _as_rows(s):
                g = conv(v)
                out.append(None if g is None else fn(g))
            return pd.Series(out, dtype="object")

        return udf(_prep(col, meta))

    return build


def _geom_out(fn, force2d: bool = False):
    """(Geom -> Geom|None) lifted to a WKB-emitting Column function."""

    def inner(g):
        r = fn(g)
        return None if r is None else wkb.dumps(r)

    return _unary(inner, T.BinaryType(), force2d=force2d)


# -- cardinality / members ---------------------------------------------------


def _parts(g: wkb.Geom):
    t = g.type_name
    if t == "GeometryCollection":
        return list(g.coords)
    if t == "MultiPoint":
        return [wkb.Geom("Point", c, g.has_z, has_m=g.has_m) for c in g.coords]
    if t == "MultiLineString":
        return [wkb.Geom("LineString", line, g.has_z, has_m=g.has_m) for line in g.coords]
    if t == "MultiPolygon":
        return [wkb.Geom("Polygon", rings, g.has_z, has_m=g.has_m) for rings in g.coords]
    return [g]


def _num_geometries(g):
    # every EMPTY geometry counts 0 (PostGIS; the old Point carve-out
    # returned 1 for POINT EMPTY — r7 review fix)
    return 0 if g.is_empty else len(_parts(g))


def _geometry_n(g, n):
    parts = _parts(g)
    return parts[n - 1] if 1 <= n <= len(parts) else None


st_numgeometries = _unary(_num_geometries, T.IntegerType())


def st_geometryn(col: Column | str, n: int, meta: GeometryMeta) -> Column:
    """1-based member of a Multi*/collection (PostGIS ST_GeometryN)."""
    return _geom_out(lambda g: _geometry_n(g, int(n)))(col, meta)


# -- rings -------------------------------------------------------------------


def _exterior_ring(g):
    if g.type_name != "Polygon" or not g.coords:
        return None
    return wkb.Geom("LineString", list(g.coords[0]), g.has_z, has_m=g.has_m)


def _num_interior_rings(g):
    if g.type_name != "Polygon":
        return None
    return max(0, len(g.coords) - 1)


def _interior_ring_n(g, n):
    if g.type_name != "Polygon" or not (1 <= n <= len(g.coords) - 1):
        return None
    return wkb.Geom("LineString", list(g.coords[n]), g.has_z, has_m=g.has_m)


st_exteriorring = _geom_out(_exterior_ring)
st_numinteriorrings = _unary(_num_interior_rings, T.IntegerType())


def st_interiorringn(col: Column | str, n: int, meta: GeometryMeta) -> Column:
    return _geom_out(lambda g: _interior_ring_n(g, int(n)))(col, meta)


# -- line vertices -----------------------------------------------------------


def _point_n(g, n):
    if g.type_name != "LineString" or not g.coords:
        return None
    m = len(g.coords)
    if n < 0:
        n = m + 1 + n  # PostGIS negative indexing from the end
    if not (1 <= n <= m):
        return None
    return wkb.Geom("Point", tuple(g.coords[n - 1]), g.has_z, has_m=g.has_m)


def st_pointn(col: Column | str, n: int, meta: GeometryMeta) -> Column:
    """1-based vertex of a LineString (negative n counts from the end)."""
    return _geom_out(lambda g: _point_n(g, int(n)))(col, meta)


st_startpoint = _geom_out(lambda g: _point_n(g, 1))
st_endpoint = _geom_out(lambda g: _point_n(g, -1))


# -- orientation / measures --------------------------------------------------


def _reverse(g):
    t = g.type_name
    if t == "Point":
        return g
    if t in ("LineString", "MultiPoint"):
        return wkb.Geom(t, list(reversed(g.coords)), g.has_z, None, g.has_m)
    if t in ("Polygon", "MultiLineString"):
        return wkb.Geom(
            t, [list(reversed(r)) for r in g.coords], g.has_z, None, g.has_m
        )
    if t == "MultiPolygon":
        return wkb.Geom(
            t,
            [[list(reversed(r)) for r in rings] for rings in g.coords],
            g.has_z, None, g.has_m,
        )
    return wkb.Geom(t, [_reverse(m) for m in g.coords], g.has_z, None, g.has_m)


st_reverse = _geom_out(_reverse)


# r10: routed through the measure wrapper so uniform WKB/native batches
# take the vectorized sweep (mode 'perimeter': flat ring-segment hypot
# fold for polygonal batches, per-member partials for collections)
st_perimeter = _unary_measure(geom_ops.perimeter, fast_mode="perimeter")


def st_azimuth(
    a: Column | str, b: Column | str, meta_a: GeometryMeta, meta_b: GeometryMeta
) -> Column:
    """North-based clockwise azimuth (radians) from point a to point b;
    NULL for coincident points or non-point input (PostGIS ST_Azimuth)."""
    ca = _converter(meta_a, force2d=True)
    cb = _converter(meta_b, force2d=True)

    @F.pandas_udf(T.DoubleType())
    def udf(sa: pd.Series, sb: pd.Series) -> pd.Series:
        out = []
        for va, vb in zip(_as_rows(sa), _as_rows(sb)):
            ga, gb = ca(va), cb(vb)
            if (
                ga is None or gb is None
                or ga.type_name != "Point" or gb.type_name != "Point"
                or ga.is_empty or gb.is_empty
            ):
                out.append(None)
                continue
            dx = gb.coords[0] - ga.coords[0]
            dy = gb.coords[1] - ga.coords[1]
            if dx == 0.0 and dy == 0.0:
                out.append(None)
                continue
            out.append(math.atan2(dx, dy) % (2 * math.pi))
        return pd.Series(out, dtype="object")

    return udf(_prep(a, meta_a), _prep(b, meta_b))


# -- dump / merge / densify / canonical (round-3 constructive extras) --------


st_linemerge = _geom_out(geom_ops.line_merge, force2d=True)  # stitch is XY
st_normalize = _geom_out(geom_ops.normalize)
st_force2d = _geom_out(geom_ops.force_2d)
st_orientedenvelope = _geom_out(geom_ops.oriented_envelope, force2d=True)


def _pos_point(g):
    p = geom_ops.point_on_surface(g)
    return None if p is None else wkb.Geom("Point", (p[0], p[1]))


st_pointonsurface = _geom_out(_pos_point, force2d=True)


def st_force3d(col: Column | str, meta: GeometryMeta, z: float = 0.0) -> Column:
    return _geom_out(lambda g: geom_ops.force_3d(g, z))(col, meta)


def st_segmentize(col: Column | str, max_len: float, meta: GeometryMeta) -> Column:
    return _geom_out(lambda g: geom_ops.segmentize(g, max_len))(col, meta)


def st_removerepeatedpoints(
    col: Column | str, meta: GeometryMeta, tolerance: float = 0.0
) -> Column:
    return _geom_out(
        lambda g: geom_ops.remove_repeated_points(g, tolerance)
    )(col, meta)


def st_linesubstring(
    col: Column | str, start: float, end: float, meta: GeometryMeta
) -> Column:
    return _geom_out(lambda g: geom_ops.line_substring(g, start, end))(col, meta)


def st_minimumboundingcircle(
    col: Column | str, meta: GeometryMeta, segments: int = 32
) -> Column:
    """Smallest enclosing circle as a polygon (``segments`` arc points per
    quadrant-4 total, PostGIS-style n-gon approximation); degenerate
    single-point input yields that point."""

    def mbc(g):
        c = geom_ops.minimum_bounding_circle(g)
        if c is None:
            return None
        (cx, cy), r = c
        if r <= 0:
            return wkb.Geom("Point", (cx, cy))
        return geom_ops.buffer_point((cx, cy), r, segments)

    return _geom_out(mbc, force2d=True)(col, meta)


def st_dump(col: Column | str, meta: GeometryMeta) -> Column:
    """PostGIS ST_Dump as an array of single-part WKB geometries — pair
    with ``F.explode`` for the row-per-part form (the Spark-idiomatic
    shape of the set-returning PostGIS function)."""
    return _unary(
        lambda g: [wkb.dumps(p) for p in geom_ops.dump_parts(g)],
        T.ArrayType(T.BinaryType()),
    )(col, meta)


def st_dumppoints(col: Column | str, meta: GeometryMeta) -> Column:
    """Every vertex as WKB points (array; explode for rows)."""
    return _unary(
        lambda g: [wkb.dumps(p) for p in geom_ops.dump_points(g)],
        T.ArrayType(T.BinaryType()),
    )(col, meta)


def st_linelocatepoint(
    line: Column | str, point: Column | str,
    meta_line: GeometryMeta, meta_point: GeometryMeta,
) -> Column:
    """Fraction [0,1] along ``line`` of the projection of ``point`` —
    PostGIS ST_LineLocatePoint."""
    cl = _converter(meta_line, force2d=True)
    cp = _converter(meta_point, force2d=True)

    @F.pandas_udf(T.DoubleType())
    def udf(sl: pd.Series, sp: pd.Series) -> pd.Series:
        out = []
        for vl, vp in zip(_as_rows(sl), _as_rows(sp)):
            gl, gp = cl(vl), cp(vp)
            if gl is None or gp is None or gp.type_name != "Point" or gp.is_empty:
                out.append(None)
                continue
            out.append(geom_ops.line_locate_point(gl, gp.coords))
        return pd.Series(out, dtype="object")

    return udf(_prep(line, meta_line), _prep(point, meta_point))


def st_expand(col: Column | str, dx: float, meta: GeometryMeta, dy: float | None = None) -> Column:
    """Bounding box grown by dx/dy as a polygon (PostGIS ST_Expand)."""
    return _geom_out(lambda g: geom_ops.expand(g, dx, dy), force2d=True)(col, meta)


def st_split(col: Column | str, blade_wkt: str, meta: GeometryMeta) -> Column:
    """Split a (multi)line by a point/multipoint/line blade, or a
    (multi)polygon by a line blade (literal WKT); returns an array of WKB
    pieces — explode for the row-per-piece PostGIS form. Unsupported
    input/blade combinations (point inputs, polygon-by-point, …) yield
    NULL — the column-layer convention (r12 fuzz: the kernel's
    NotImplementedError used to crash the Python worker on mixed-type
    columns)."""
    blade = wkb.from_wkt(blade_wkt)

    def fn(g):
        try:
            return [wkb.dumps(p) for p in geom_ops.split(g, blade)]
        except NotImplementedError:
            return None

    return _unary(
        fn, T.ArrayType(T.BinaryType()), force2d=True,
    )(col, meta)


def st_snap(
    a: Column | str, b: Column | str,
    tolerance: float,
    meta_a: GeometryMeta, meta_b: GeometryMeta,
) -> Column:
    """Snap vertices of ``a`` onto nearby vertices/edges of ``b``
    (PostGIS ST_Snap); WKB out."""
    ca = _converter(meta_a, force2d=True)
    cb = _converter(meta_b, force2d=True)

    @F.pandas_udf(T.BinaryType())
    def udf(sa: pd.Series, sb: pd.Series) -> pd.Series:
        out = []
        for va, vb in zip(_as_rows(sa), _as_rows(sb)):
            ga, gb = ca(va), cb(vb)
            if ga is None or gb is None:
                out.append(None)
                continue
            out.append(wkb.dumps(geom_ops.snap(ga, gb, tolerance)))
        return pd.Series(out, dtype="object")

    return udf(_prep(a, meta_a), _prep(b, meta_b))


def st_project(
    col: Column | str, distance: float, azimuth: float, meta: GeometryMeta
) -> Column:
    """Destination point at ``distance`` along north-based clockwise
    ``azimuth`` radians from a point (planar ST_Project); WKB out."""

    def proj(g):
        if g.type_name != "Point" or g.is_empty:
            return None
        p = geom_ops.project_point(g.coords, distance, azimuth)
        return wkb.Geom("Point", p)

    return _geom_out(proj)(col, meta)


def st_polygonize(col: Column | str, meta: GeometryMeta) -> Column:
    """PostGIS ST_Polygonize over one geometry's linework: faces of the
    (auto-noded) arrangement as an array of polygon WKBs — explode for
    rows. For the aggregate form, ``st_collect_agg`` the lines first and
    polygonize the collection."""
    return _unary(
        lambda g: [wkb.dumps(p) for p in geom_ops.polygonize(g)],
        T.ArrayType(T.BinaryType()), force2d=True,
    )(col, meta)


def st_node(col: Column | str, meta: GeometryMeta) -> Column:
    """PostGIS ST_Node: fully node the linework (split at every crossing /
    touch, dissolve duplicate segments); MultiLineString WKB out."""
    return _geom_out(geom_ops.node_lines, force2d=True)(col, meta)


def st_delaunaytriangles(col: Column | str, meta: GeometryMeta) -> Column:
    """Delaunay triangulation (Bowyer–Watson) of the geometry's vertices;
    array of triangle WKBs — explode for rows, or aggregate areas in
    place (PostGIS ST_DelaunayTriangles analog)."""
    return _unary(
        lambda g: [wkb.dumps(t) for t in geom_ops.delaunay_triangles(g)],
        T.ArrayType(T.BinaryType()), force2d=True,
    )(col, meta)


def st_voronoipolygons(
    col: Column | str, meta: GeometryMeta, envelope_wkt: str | None = None
) -> Column:
    """Voronoi cells of the geometry's vertices clipped to an optional
    literal envelope (WKT); array of cell WKBs in sorted-site order."""
    env = wkb.from_wkt(envelope_wkt) if envelope_wkt else None
    return _unary(
        lambda g: [wkb.dumps(c) for c in geom_ops.voronoi_polygons(g, env)],
        T.ArrayType(T.BinaryType()), force2d=True,
    )(col, meta)


def st_concavehull(
    col: Column | str, ratio: float, meta: GeometryMeta,
    allow_holes: bool = False,
) -> Column:
    """PostGIS ST_ConcaveHull(geom, ratio): chi-shape erosion of the
    Delaunay triangulation by target edge length — ratio 1 = convex hull,
    ratio→0 = maximally concave; polygon WKB out."""
    return _geom_out(
        lambda g: geom_ops.concave_hull(g, float(ratio), allow_holes),
        force2d=True,
    )(col, meta)


_MIC_SCHEMA = T.StructType(
    [
        T.StructField("center", T.BinaryType()),
        T.StructField("nearest", T.BinaryType()),
        T.StructField("radius", T.DoubleType()),
    ]
)


def st_maximuminscribedcircle(
    col: Column | str, meta: GeometryMeta, tolerance: float | None = None
) -> Column:
    """PostGIS ST_MaximumInscribedCircle: largest circle inside a
    (multi)polygon, as struct{center WKB point, nearest WKB boundary
    point, radius} (polylabel-style branch and bound, exact within
    ``tolerance`` — default 1e-6 of the bbox span)."""
    conv = _converter(meta, force2d=True)

    @F.pandas_udf(_MIC_SCHEMA)
    def udf(s: pd.Series) -> pd.DataFrame:
        centers, nearests, radii = [], [], []
        for v in _as_rows(s):
            g = conv(v)
            r = None if g is None else geom_ops.maximum_inscribed_circle(
                g, tolerance
            )
            if r is None:
                centers.append(None)
                nearests.append(None)
                radii.append(None)
            else:
                (cx, cy), rad, np_ = r
                centers.append(wkb.dumps(wkb.Geom("Point", (cx, cy))))
                nearests.append(
                    None if np_ is None else wkb.dumps(wkb.Geom("Point", np_))
                )
                radii.append(rad)
        return pd.DataFrame(
            {"center": centers, "nearest": nearests, "radius": radii}
        )

    return udf(_prep(col, meta))


def st_largestemptycircle(
    col: Column | str,
    meta: GeometryMeta,
    tolerance: float | None = None,
    boundary_wkt: str | None = None,
) -> Column:
    """PostGIS/GEOS ST_LargestEmptyCircle: largest circle whose CENTER
    lies within ``boundary_wkt`` (default: the obstacles' convex hull) and
    whose interior avoids the row's obstacle geometry. Returns
    struct{center WKB point, nearest WKB obstacle point, radius} — same
    branch-and-bound as ST_MaximumInscribedCircle with the distance sign
    flipped to empty space."""
    conv = _converter(meta, force2d=True)
    bnd = None if boundary_wkt is None else wkb.from_wkt(boundary_wkt)

    @F.pandas_udf(_MIC_SCHEMA)
    def udf(s: pd.Series) -> pd.DataFrame:
        centers, nearests, radii = [], [], []
        for v in _as_rows(s):
            g = conv(v)
            r = None if g is None else geom_ops.largest_empty_circle(
                g, bnd, tolerance
            )
            if r is None:
                centers.append(None)
                nearests.append(None)
                radii.append(None)
            else:
                (cx, cy), rad, np_ = r
                centers.append(wkb.dumps(wkb.Geom("Point", (cx, cy))))
                nearests.append(
                    None if np_ is None else wkb.dumps(wkb.Geom("Point", np_))
                )
                radii.append(rad)
        return pd.DataFrame(
            {"center": centers, "nearest": nearests, "radius": radii}
        )

    return udf(_prep(col, meta))


def st_generatepoints(
    col: Column | str, n: int, meta: GeometryMeta, seed: int = 0
) -> Column:
    """PostGIS ST_GeneratePoints: ``n`` seeded-deterministic points inside
    a (multi)polygon; MultiPoint WKB out."""
    return _geom_out(
        lambda g: geom_ops.generate_points(g, int(n), int(seed)),
        force2d=True,
    )(col, meta)


def _binary_geom_fn(fn, dtype, force2d: bool = False):
    """(Geom, Geom -> value|None) lifted to a 2-column function."""

    def build(a, b, meta_a, meta_b):
        ca = _converter(meta_a, force2d=force2d)
        cb = _converter(meta_b, force2d=force2d)

        @F.pandas_udf(dtype)
        def udf(sa: pd.Series, sb: pd.Series) -> pd.Series:
            out = []
            for va, vb in zip(_as_rows(sa), _as_rows(sb)):
                ga, gb = ca(va), cb(vb)
                out.append(None if ga is None or gb is None else fn(ga, gb))
            return pd.Series(out, dtype="object")

        return udf(_prep(a, meta_a), _prep(b, meta_b))

    return build


def _shortest_line_wkb(ga, gb):
    r = geom_ops.shortest_line(ga, gb)
    return None if r is None else wkb.dumps(r)


st_shortestline = _binary_geom_fn(_shortest_line_wkb, T.BinaryType(), force2d=True)
st_hausdorffdistance = _binary_geom_fn(
    geom_ops.hausdorff_distance, T.DoubleType(), force2d=True
)
st_3ddistance = _binary_geom_fn(geom_ops.distance_3d, T.DoubleType())


def st_angle(
    p1: Column | str, p2: Column | str, p3: Column | str,
    meta: GeometryMeta,
    meta2: GeometryMeta | None = None,
    meta3: GeometryMeta | None = None,
) -> Column:
    """3-point form of PostGIS ST_Angle (angle at p2), clockwise [0, 2π).

    Each argument may carry its own encoding (``meta2``/``meta3`` default
    to ``meta``), so mixed native + WKB columns decode correctly.
    """
    m2 = meta2 if meta2 is not None else meta
    m3 = meta3 if meta3 is not None else meta
    c1, c2, c3 = (_converter(meta, force2d=True),
                  _converter(m2, force2d=True),
                  _converter(m3, force2d=True))

    @F.pandas_udf(T.DoubleType())
    def udf(s1: pd.Series, s2: pd.Series, s3: pd.Series) -> pd.Series:
        out = []
        for v1, v2, v3 in zip(_as_rows(s1), _as_rows(s2), _as_rows(s3)):
            g1, g2, g3 = c1(v1), c2(v2), c3(v3)
            if any(g is None or g.type_name != "Point" or g.is_empty
                   for g in (g1, g2, g3)):
                out.append(None)
                continue
            out.append(geom_ops.angle(g1.coords, g2.coords, g3.coords))
        return pd.Series(out, dtype="object")

    return udf(_prep(p1, meta), _prep(p2, m2), _prep(p3, m3))


# -- r11 parity-plus: extremal metrics, shared paths, fast box clip,
#    precision reduction, smoothing, collection casts, longitude shifts,
#    polygon triangulation, and the remaining structural metadata.


def _longest_line_wkb(ga, gb):
    r = geom_ops.longest_line(ga, gb)
    return None if r is None else wkb.dumps(r)


st_longestline = _binary_geom_fn(_longest_line_wkb, T.BinaryType(), force2d=True)
st_maxdistance = _binary_geom_fn(geom_ops.max_distance, T.DoubleType(), force2d=True)


def st_frechetdistance(
    a: Column | str, b: Column | str,
    meta_a: GeometryMeta, meta_b: GeometryMeta,
    densify_frac: float | None = None,
) -> Column:
    """Discrete Fréchet distance over vertex sequences (PostGIS
    ST_FrechetDistance; optional GEOS-style densify fraction)."""
    return _binary_geom_fn(
        lambda ga, gb: geom_ops.frechet_distance(ga, gb, densify_frac),
        T.DoubleType(), force2d=True,
    )(a, b, meta_a, meta_b)


def _shared_paths_wkb(ga, gb):
    r = geom_ops.shared_paths(ga, gb)
    return None if r is None else wkb.dumps(r)


st_sharedpaths = _binary_geom_fn(_shared_paths_wkb, T.BinaryType(), force2d=True)


def st_clipbybox2d(
    col: Column | str,
    xmin: float, ymin: float, xmax: float, ymax: float,
    meta: GeometryMeta,
) -> Column:
    """PostGIS ST_ClipByBox2D: fast rectangle clip (convex-box primitives
    only, no general overlay)."""
    return _geom_out(
        lambda g: geom_ops.clip_by_box2d(
            g, float(xmin), float(ymin), float(xmax), float(ymax)
        ),
        force2d=True,
    )(col, meta)


def st_clipbybox2d_geom(
    a: Column | str, b: Column | str,
    meta_a: GeometryMeta, meta_b: GeometryMeta,
) -> Column:
    """PostGIS-signature ST_ClipByBox2D(geom, box2d): clip ``a`` by the
    BBOX of ``b`` (PostGIS's box2d argument is usually built with
    ST_MakeEnvelope or cast from a geometry — either way only its bbox
    matters). Per-row box columns work; the literal-bounds form above
    stays for the numeric signature. WKB out."""

    def kernel(ga, gb):
        bb = geom_ops._bbox(gb)
        if bb is None:
            return None
        r = geom_ops.clip_by_box2d(ga, bb[0], bb[1], bb[2], bb[3])
        return None if r is None else wkb.dumps(r)

    return _binary_geom_fn(kernel, T.BinaryType(), force2d=True)(
        a, b, meta_a, meta_b
    )


def st_reduceprecision(
    col: Column | str, gridsize: float, meta: GeometryMeta
) -> Column:
    """PostGIS ST_ReducePrecision: grid snap + collapse cleanup + polygonal
    re-validation (geom_ops.reduce_precision)."""
    return _geom_out(
        lambda g: geom_ops.reduce_precision(g, float(gridsize)), force2d=True
    )(col, meta)


def st_chaikinsmoothing(
    col: Column | str,
    meta: GeometryMeta,
    n_iterations: int = 1,
    preserve_end_points: bool = False,
) -> Column:
    """PostGIS ST_ChaikinSmoothing (corner cutting; iterations capped at 5)."""
    return _geom_out(
        lambda g: geom_ops.chaikin_smoothing(
            g, int(n_iterations), bool(preserve_end_points)
        ),
        force2d=True,
    )(col, meta)


def st_wrapx(
    col: Column | str, wrap: float, move: float, meta: GeometryMeta
) -> Column:
    """PostGIS ST_WrapX: split at x=wrap and translate the vacated side by
    ``move`` (geom_ops.wrap_x)."""
    return _geom_out(
        lambda g: geom_ops.wrap_x(g, float(wrap), float(move)), force2d=True
    )(col, meta)


# coordinate-wise ops preserve Z/M (geom_ops._map_xy keeps the tail)
st_shiftlongitude = _geom_out(geom_ops.shift_longitude)
st_multi = _geom_out(geom_ops.multi)
st_collectionhomogenize = _geom_out(geom_ops.collection_homogenize)
st_triangulatepolygon = _geom_out(geom_ops.triangulate_polygon, force2d=True)


def st_collectionextract(
    col: Column | str, dim: int, meta: GeometryMeta
) -> Column:
    """PostGIS ST_CollectionExtract(geom, type): 1 points / 2 lines /
    3 polygons, as a MULTI* (EMPTY multi when absent). An invalid type
    code fails HERE on the driver (r12 fuzz: it used to surface as a
    Python-worker crash mid-job)."""
    dim = int(dim)
    if dim not in (1, 2, 3):
        raise ValueError(
            f"ST_CollectionExtract type must be 1 (points), 2 (lines) or "
            f"3 (polygons), got {dim}"
        )
    return _geom_out(lambda g: geom_ops.collection_extract(g, dim))(col, meta)


def _num_points(g):
    # PostGIS ST_NumPoints: LineString vertex count, NULL otherwise
    return len(g.coords) if g.type_name == "LineString" else None


st_numpoints = _unary(_num_points, T.IntegerType())


def _is_closed(g):
    """PostGIS ST_IsClosed. Points/MultiPoints are closed by convention;
    a LineString is closed when first == last vertex (ALL dims compared,
    PostGIS lwline_is_closed); a MultiLineString when every member is.
    EMPTY inputs are false (JTS convention; PostGIS is inconsistent here)."""
    t = g.type_name
    if t in ("Point", "MultiPoint"):
        return not g.is_empty
    if t == "LineString":
        return bool(g.coords) and tuple(g.coords[0]) == tuple(g.coords[-1])
    if t == "MultiLineString":
        return bool(g.coords) and all(
            line and tuple(line[0]) == tuple(line[-1]) for line in g.coords
        )
    return None


st_isclosed = _unary(_is_closed, T.BooleanType())


def _is_ring(g):
    if g.type_name != "LineString":
        return None
    return bool(_is_closed(g)) and geom_ops.is_simple(g)


st_isring = _unary(_is_ring, T.BooleanType())

# PostGIS ST_Zmflag: 0 = 2-D, 1 = 3-D M, 2 = 3-D Z, 3 = 4-D
st_zmflag = _unary(
    lambda g: (2 if g.has_z else 0) + (1 if g.has_m else 0), T.IntegerType()
)
st_ndims = _unary(
    lambda g: 2 + (1 if g.has_z else 0) + (1 if g.has_m else 0), T.IntegerType()
)
# ST_CoordDim is the SQL-MM alias of ST_NDims for linear geometries
st_coorddim = st_ndims


# -- r11 wave 2: line editing, bounding diagonal, multi-point interpolation,
#    envelope constructor, and the ST_MinimumRotatedRectangle alias.


# PostGIS ST_MinimumRotatedRectangle is the GEOS name for the oriented
# envelope — same rotating-calipers result
st_minimumrotatedrectangle = st_orientedenvelope


def _line_edit(fn):
    """LineString-editing kernel lift: non-line / empty input -> NULL
    (PostGIS raises; NULL is the column-layer convention here)."""

    def inner(g):
        if g.type_name != "LineString" or len(g.coords) < 2:
            return None
        out = fn(list(g.coords))
        if out is None or len(out) < 2:
            return None
        # Inserted/replacement vertices arrive 2-D; pad to the line's
        # coordinate width with 0.0 (PostGIS coerces the point to the
        # line's dims) so the WKB writer never NaN-pads a Z/M line.
        width = 2 + (1 if g.has_z else 0) + (1 if g.has_m else 0)
        out = [
            tuple(v)[:width] + (0.0,) * max(0, width - len(v)) for v in out
        ]
        return wkb.Geom("LineString", out, g.has_z, None, g.has_m)

    return _geom_out(inner)


def st_addpoint(
    col: Column | str, x: float, y: float, meta: GeometryMeta,
    position: int = -1,
) -> Column:
    """PostGIS ST_AddPoint: insert (x, y) before 0-based ``position``
    (-1 = append)."""
    p = (float(x), float(y))

    def ed(coords):
        pos = int(position)
        if pos == -1 or pos >= len(coords):
            coords.append(p)
        elif 0 <= pos:
            coords.insert(pos, p)
        else:
            return None
        return coords

    return _line_edit(ed)(col, meta)


def st_setpoint(
    col: Column | str, position: int, x: float, y: float, meta: GeometryMeta
) -> Column:
    """PostGIS ST_SetPoint: replace the 0-based vertex (negative counts
    from the end, -1 = last)."""
    p = (float(x), float(y))

    def ed(coords):
        pos = int(position)
        if pos < 0:
            pos += len(coords)
        if not (0 <= pos < len(coords)):
            return None
        coords[pos] = p
        return coords

    return _line_edit(ed)(col, meta)


def st_removepoint(
    col: Column | str, position: int, meta: GeometryMeta
) -> Column:
    """PostGIS ST_RemovePoint: drop the 0-based vertex."""

    def ed(coords):
        pos = int(position)
        if not (0 <= pos < len(coords)):
            return None
        del coords[pos]
        return coords

    return _line_edit(ed)(col, meta)


def _scroll(g, px: float, py: float):
    """PostGIS ST_Scroll: rotate a CLOSED LineString to start at the vertex
    equal to (px, py); None when not closed or the vertex is absent."""
    if g.type_name != "LineString" or len(g.coords) < 3:
        return None
    c = list(g.coords)
    if tuple(c[0][:2]) != tuple(c[-1][:2]):
        return None
    body = c[:-1]
    for k, v in enumerate(body):
        if v[0] == px and v[1] == py:
            rolled = body[k:] + body[:k]
            return wkb.Geom(
                "LineString", rolled + [rolled[0]], g.has_z, None, g.has_m
            )
    return None


def st_scroll(
    col: Column | str, x: float, y: float, meta: GeometryMeta
) -> Column:
    return _geom_out(lambda g: _scroll(g, float(x), float(y)))(col, meta)


# -- PostGIS-signature (geometry-argument) forms of the line editors.
# PostGIS ST_AddPoint/ST_SetPoint take a POINT geometry, not x/y literals
# (ADVICE r11); these binary forms accept any point column/literal and map
# the point's ordinates positionally onto the line's coordinate width,
# padding with 0.0.


def _pad_vertex(coords, width):
    c = tuple(coords)
    return c[:width] + (0.0,) * max(0, width - len(c))


def _line_point_edit(fn):
    """(line-coords, vertex, width -> coords|None) lifted to a binary
    (line, point) -> WKB function; non-line / non-point input -> NULL."""

    def kernel(gl, gp):
        if gl.type_name != "LineString" or len(gl.coords) < 2:
            return None
        if gp.type_name != "Point" or gp.is_empty:
            return None
        width = 2 + (1 if gl.has_z else 0) + (1 if gl.has_m else 0)
        coords = [_pad_vertex(v, width) for v in gl.coords]
        out = fn(coords, _pad_vertex(gp.coords, width))
        if out is None or len(out) < 2:
            return None
        return wkb.dumps(
            wkb.Geom("LineString", out, gl.has_z, None, gl.has_m)
        )

    return kernel


def st_addpoint_geom(
    line: Column | str, point: Column | str,
    meta_line: GeometryMeta, meta_point: GeometryMeta,
    position: int = -1,
) -> Column:
    """PostGIS ST_AddPoint(line, point [, position]) — geometry-argument
    form; WKB out.

    Position semantics (ADVICE r12): -1 appends (PostGIS default); any
    other negative literal is rejected at BUILD time (PostGIS raises on
    an invalid index, and a constant bad index should fail the query,
    not silently null rows); a non-negative position past the end of a
    particular row's line yields NULL for that row — a documented
    deviation from PostGIS, which errors per row (a worker exception
    would kill the whole job for one bad row at scale)."""
    pos = int(position)
    if pos < -1:
        raise ValueError(
            f"ST_AddPoint position must be -1 (append) or >= 0; got {pos}"
        )

    def ed(coords, v):
        if pos == -1:
            coords.append(v)
        elif pos <= len(coords):
            coords.insert(pos, v)
        else:
            return None  # out-of-range for this row -> NULL, not append
        return coords

    return _binary_geom_fn(_line_point_edit(ed), T.BinaryType())(
        line, point, meta_line, meta_point
    )


def st_setpoint_geom(
    line: Column | str, position: int, point: Column | str,
    meta_line: GeometryMeta, meta_point: GeometryMeta,
) -> Column:
    """PostGIS ST_SetPoint(line, index, point) — geometry-argument form;
    WKB out."""
    position = int(position)

    def ed(coords, v):
        pos = position
        if pos < 0:
            pos += len(coords)
        if not (0 <= pos < len(coords)):
            return None
        coords[pos] = v
        return coords

    return _binary_geom_fn(_line_point_edit(ed), T.BinaryType())(
        line, point, meta_line, meta_point
    )


def st_scroll_geom(
    line: Column | str, point: Column | str,
    meta_line: GeometryMeta, meta_point: GeometryMeta,
) -> Column:
    """PostGIS ST_Scroll(line, point) — geometry-argument form; WKB out."""

    def kernel(gl, gp):
        if gp.type_name != "Point" or gp.is_empty:
            return None
        r = _scroll(gl, float(gp.coords[0]), float(gp.coords[1]))
        return None if r is None else wkb.dumps(r)

    return _binary_geom_fn(kernel, T.BinaryType())(
        line, point, meta_line, meta_point
    )


def _bounding_diagonal(g):
    bb = geom_ops._bbox(g)
    if bb is None:
        return wkb.Geom("LineString", [])
    return wkb.Geom("LineString", [(bb[0], bb[1]), (bb[2], bb[3])])


st_boundingdiagonal = _geom_out(_bounding_diagonal, force2d=True)


# Cap on points generated by st_lineinterpolatepoints(repeat=True): a
# tiny fraction (e.g. 1e-9) would otherwise loop ~1/fraction times per
# row and OOM the executor (ADVICE r11).
_MAX_INTERP_POINTS = 1_000_000


def st_lineinterpolatepoints(
    col: Column | str, fraction: float, meta: GeometryMeta,
    repeat: bool = True,
) -> Column:
    """PostGIS ST_LineInterpolatePoints: points at fraction, 2·fraction, …
    along the line as a MultiPoint (``repeat=False`` degenerates to the
    single-point form).  ``repeat=True`` generates ~1/fraction points, so
    fractions below 1/``_MAX_INTERP_POINTS`` return NULL rather than
    building a runaway MultiPoint inside the UDF (same bounded-output
    contract as the grid generators' max_cells)."""
    f = float(fraction)

    def fn(g):
        if not (0.0 < f <= 1.0):
            return None
        if repeat and f < 1.0 / _MAX_INTERP_POINTS:
            return None
        if not repeat:
            p = geom_ops.line_interpolate_point(g, f)
            return None if p is None else wkb.Geom("Point", p)
        pts = []
        k = 1
        while k * f <= 1.0 + 1e-12:
            p = geom_ops.line_interpolate_point(g, min(1.0, k * f))
            if p is None:
                return None
            pts.append(p)
            k += 1
        return wkb.Geom("MultiPoint", pts)

    return _geom_out(fn)(col, meta)


# -- r11 wave 3: linear referencing (M-coordinate / LRS family) --------------
# Measured geometries keep dims through _geom_out (force2d stays False).


def st_addmeasure(
    col: Column | str, m_start: float, m_end: float, meta: GeometryMeta
) -> Column:
    """PostGIS ST_AddMeasure: M interpolated over cumulative arc length."""
    return _geom_out(
        lambda g: geom_ops.add_measure(g, float(m_start), float(m_end))
    )(col, meta)


def st_interpolatepoint(
    a: Column | str, b: Column | str, meta_a: GeometryMeta, meta_b: GeometryMeta
) -> Column:
    """PostGIS ST_InterpolatePoint: M of the measured geometry at the
    location nearest the point."""
    return _binary_geom_fn(geom_ops.interpolate_point, T.DoubleType())(
        a, b, meta_a, meta_b
    )


def st_locatealong(
    col: Column | str, m: float, meta: GeometryMeta
) -> Column:
    """PostGIS ST_LocateAlong: MultiPoint M where measure == m."""
    return _geom_out(lambda g: geom_ops.locate_along(g, float(m)))(col, meta)


def st_locatebetween(
    col: Column | str, m_start: float, m_end: float, meta: GeometryMeta
) -> Column:
    """PostGIS ST_LocateBetween: the sub-geometry with measure in range
    (segments clipped at the M crossings)."""
    return _geom_out(
        lambda g: geom_ops.locate_between(g, float(m_start), float(m_end))
    )(col, meta)


def st_filterbym(
    col: Column | str, m_min: float, meta: GeometryMeta,
    m_max: float | None = None,
) -> Column:
    """PostGIS ST_FilterByM: vertex decimation by measure range."""
    mx = None if m_max is None else float(m_max)
    return _geom_out(
        lambda g: geom_ops.filter_by_m(g, float(m_min), mx)
    )(col, meta)


# -- r11 wave 4: trajectories (M as time — the PostGIS CPA family) ----------


def _unary_bool(fn):
    return _unary(fn, T.BooleanType())


st_isvalidtrajectory = _unary_bool(geom_ops.is_valid_trajectory)
st_closestpointofapproach = _binary_geom_fn(
    geom_ops.closest_point_of_approach, T.DoubleType()
)
st_distancecpa = _binary_geom_fn(geom_ops.distance_cpa, T.DoubleType())


def st_cpawithin(
    a: Column | str, b: Column | str, dist: float,
    meta_a: GeometryMeta, meta_b: GeometryMeta,
) -> Column:
    """PostGIS ST_CPAWithin: true when the trajectories' closest point of
    approach is within ``dist``."""
    d = float(dist)
    return _binary_geom_fn(
        lambda ga, gb: geom_ops.cpa_within(ga, gb, d), T.BooleanType()
    )(a, b, meta_a, meta_b)


# -- r11 wave 5: validity detail + ordinate swap -----------------------------

_VALID_DETAIL_SCHEMA = T.StructType([
    T.StructField("valid", T.BooleanType()),
    T.StructField("reason", T.StringType()),
    T.StructField("location", T.BinaryType()),
])


def st_isvaliddetail(col: Column | str, meta: GeometryMeta) -> Column:
    """PostGIS ST_IsValidDetail: struct{valid, reason, location} — the
    reason strings are exactly ST_IsValidReason's; location is a WKB
    point at the first failure (NULL when the class has no single
    coordinate)."""
    conv = _converter(meta, force2d=True)

    @F.pandas_udf(_VALID_DETAIL_SCHEMA)
    def udf(s: pd.Series) -> pd.DataFrame:
        valids, reasons, locs = [], [], []
        for v in _as_rows(s):
            g = conv(v)
            if g is None:
                valids.append(None)
                reasons.append(None)
                locs.append(None)
                continue
            ok, reason, loc = geom_ops.invalid_detail(g)
            valids.append(bool(ok))
            reasons.append(reason)
            locs.append(
                None if loc is None
                else wkb.dumps(wkb.Geom("Point", (loc[0], loc[1])))
            )
        return pd.DataFrame(
            {"valid": valids, "reason": reasons, "location": locs}
        )

    out = udf(_prep(col, meta))
    # pandas struct UDFs can't emit a NULL struct row; NULL geometry maps
    # to struct(NULL, NULL, NULL) -> collapse to a NULL struct
    return F.when(out["valid"].isNotNull() | out["reason"].isNotNull(), out)


def st_swapordinates(
    col: Column | str, spec: str, meta: GeometryMeta
) -> Column:
    """PostGIS ST_SwapOrdinates (spec: two distinct chars of 'xyzm').
    A malformed SPEC fails here on the driver; rows whose geometry lacks
    a requested ordinate (e.g. 'xz' on a 2-D row in a mixed column)
    yield NULL instead of crashing the worker (r12 robustness audit)."""
    spec = str(spec).lower()
    if len(spec) != 2 or spec[0] == spec[1] or any(
        c not in "xyzm" for c in spec
    ):
        raise ValueError(
            f"spec must be two distinct chars of 'xyzm', got {spec!r}"
        )

    def fn(g):
        try:
            return geom_ops.swap_ordinates(g, spec)
        except ValueError:
            return None  # geometry lacks the requested ordinate

    return _geom_out(fn)(col, meta)


# -- r11 wave 6: dump/orientation utilities ----------------------------------


def st_dumpsegments(col: Column | str, meta: GeometryMeta) -> Column:
    """PostGIS ST_DumpSegments as an array of 2-point WKB LineStrings
    (explode for rows)."""
    return _unary(
        lambda g: [wkb.dumps(p) for p in geom_ops.dump_segments(g)],
        T.ArrayType(T.BinaryType()),
    )(col, meta)


def st_dumprings(col: Column | str, meta: GeometryMeta) -> Column:
    """PostGIS ST_DumpRings as an array of single-ring WKB Polygons."""
    return _unary(
        lambda g: [wkb.dumps(p) for p in geom_ops.dump_rings(g)],
        T.ArrayType(T.BinaryType()),
    )(col, meta)


st_forcepolygonccw = _geom_out(geom_ops.force_polygon_ccw)
st_forcepolygoncw = _geom_out(geom_ops.force_polygon_cw)
st_ispolygonccw = _unary(geom_ops.is_polygon_ccw, T.BooleanType())
st_ispolygoncw = _unary(geom_ops.is_polygon_cw, T.BooleanType())


# -- r11 wave 7: ordinate extrema, geometric median, ST_SimplifyVW -----------


def _extreme(ordinate: str, want_max: bool):
    return _unary(
        lambda g: geom_ops.ordinate_extreme(g, ordinate, want_max),
        T.DoubleType(),
    )


st_xmin = _extreme("x", False)
st_xmax = _extreme("x", True)
st_ymin = _extreme("y", False)
st_ymax = _extreme("y", True)
st_zmin = _extreme("z", False)
st_zmax = _extreme("z", True)
st_mmin = _extreme("m", False)
st_mmax = _extreme("m", True)


def _geometric_median_wkb(g):
    p = geom_ops.geometric_median(g)
    return None if p is None else wkb.dumps(wkb.Geom("Point", p))


st_geometricmedian = _unary(_geometric_median_wkb, T.BinaryType(), force2d=True)


def st_simplifyvw(
    col: Column | str, tolerance: float, meta: GeometryMeta
) -> Column:
    """PostGIS ST_SimplifyVW: Visvalingam–Whyatt area-based
    simplification (tolerance = minimum effective triangle area)."""
    return _geom_out(
        lambda g: geom_ops.simplify_vw(g, float(tolerance)), force2d=True
    )(col, meta)
