"""Round-12 ADVICE fixes, pinned.

1. (medium) st_addpoint/st_setpoint on Z/M lines: inserted/replacement
   vertices are padded to the line's coordinate width with 0.0 instead
   of letting the WKB writer NaN-pad them (accessors._line_edit).
2. (low) st_lineinterpolatepoints(repeat=True) rejects fractions below
   1/_MAX_INTERP_POINTS instead of looping ~1/fraction times per row.
3. (low) SQL ST_AddPoint/ST_SetPoint/ST_Scroll accept the PostGIS
   geometry-argument forms (ST_AddPoint(line, ST_Point(x,y) [, pos]),
   ST_SetPoint(line, idx, pt), ST_Scroll(line, pt)) alongside the
   numeric-literal forms.
4. (low) geom_ops.invalid_reason is now a wrapper over invalid_detail's
   single validity walk — reasons/order shared by construction.
"""

import math

import pytest

from datafusion_spatial_spark import geom_ops as G
from datafusion_spatial_spark import wkb
from datafusion_spatial_spark.functions.scalar import st_geomfromtext
from datafusion_spatial_spark.meta import GeometryMeta

W = GeometryMeta(encoding="WKB")


def _g(b):
    return wkb.loads(bytes(b))


# -- 1: Z/M vertex padding ---------------------------------------------------


def test_line_edit_pads_z_line(spark):
    from datafusion_spatial_spark.functions.accessors import (
        st_addpoint,
        st_setpoint,
    )

    df = spark.createDataFrame(
        [(1, "LINESTRING Z (0 0 5, 4 0 6)"),
         (2, "LINESTRING M (0 0 1, 4 0 2)"),
         (3, "LINESTRING ZM (0 0 5 1, 4 0 6 2)")],
        "id long, w string",
    )
    g = df.select("id", st_geomfromtext("w").alias("g"))
    out = {r.id: r for r in g.select(
        "id",
        st_addpoint("g", 8.0, 0.0, W).alias("ap"),
        st_setpoint("g", 0, 9.0, 9.0, W).alias("sp"),
    ).collect()}
    for rid, width in ((1, 3), (2, 3), (3, 4)):
        ap = _g(out[rid].ap)
        assert len(ap.coords) == 3
        new_v = ap.coords[-1]
        assert len(new_v) == width
        # appended vertex: missing ordinates are 0.0, never NaN
        assert new_v[:2] == (8.0, 0.0)
        assert all(v == 0.0 for v in new_v[2:])
        assert not any(math.isnan(c) for v in ap.coords for c in v)
        # untouched vertices keep their original Z/M
        assert ap.coords[0][2:] == _g_orig(rid)[0][2:]
        sp = _g(out[rid].sp)
        assert sp.coords[0][:2] == (9.0, 9.0)
        assert all(v == 0.0 for v in sp.coords[0][2:])
        assert not any(math.isnan(c) for v in sp.coords for c in v)


def _g_orig(rid):
    return {
        1: [(0.0, 0.0, 5.0), (4.0, 0.0, 6.0)],
        2: [(0.0, 0.0, 1.0), (4.0, 0.0, 2.0)],
        3: [(0.0, 0.0, 5.0, 1.0), (4.0, 0.0, 6.0, 2.0)],
    }[rid]


def test_line_edit_2d_unchanged(spark):
    from datafusion_spatial_spark.functions.accessors import st_addpoint

    df = spark.createDataFrame([(1, "LINESTRING (0 0, 4 0)")],
                               "id long, w string")
    g = df.select(st_geomfromtext("w").alias("g"))
    b = g.select(st_addpoint("g", 8.0, 0.0, W).alias("ap")).collect()[0].ap
    assert _g(b).coords == [(0.0, 0.0), (4.0, 0.0), (8.0, 0.0)]


# -- 2: interpolate-points fraction floor ------------------------------------


def test_lineinterpolatepoints_fraction_floor(spark):
    from datafusion_spatial_spark.functions.accessors import (
        _MAX_INTERP_POINTS,
        st_lineinterpolatepoints,
    )

    df = spark.createDataFrame([(1, "LINESTRING (0 0, 4 0)")],
                               "id long, w string")
    g = df.select(st_geomfromtext("w").alias("g"))
    rows = g.select(
        st_lineinterpolatepoints("g", 1e-9, W).alias("tiny"),
        st_lineinterpolatepoints("g", 1e-9, W, repeat=False).alias("single"),
        st_lineinterpolatepoints("g", 0.5, W).alias("ok"),
    ).collect()[0]
    assert rows.tiny is None  # would be a 1e9-point MultiPoint
    # repeat=False generates exactly one point — no cap applies
    assert _g(rows.single).type_name == "Point"
    assert _g(rows.ok).type_name == "MultiPoint"
    assert _MAX_INTERP_POINTS <= 10_000_000  # the cap stays bounded


# -- 3: PostGIS geometry-argument SQL forms ----------------------------------


def test_sql_line_edit_geometry_forms(spark):
    from datafusion_spatial_spark.meta import with_geo_meta
    from datafusion_spatial_spark.plans.sql import SpatialSQL

    s = SpatialSQL(spark)
    df = spark.createDataFrame(
        [(1, "LINESTRING (0 0, 4 0)"),
         (2, "LINESTRING (0 0, 1 0, 1 1, 0 0)")],
        "id long, w string",
    )
    gdf = with_geo_meta(
        df.select("id", st_geomfromtext("w").alias("g")), "g", W
    )
    s.register_view("t_edit", gdf)
    rows = {r.id: r for r in s.sql(
        "SELECT id, "
        "ST_AsText(ST_AddPoint(g, ST_Point(8, 0))) AS ap, "
        "ST_AsText(ST_AddPoint(g, ST_Point(2, 2), 1)) AS ai, "
        "ST_AsText(ST_SetPoint(g, 0, ST_Point(9, 9))) AS sp, "
        "ST_AsText(ST_Scroll(g, ST_Point(1, 0))) AS sc "
        "FROM t_edit"
    ).collect()}
    assert rows[1].ap == "LINESTRING (0 0, 4 0, 8 0)"
    assert rows[1].ai == "LINESTRING (0 0, 2 2, 4 0)"
    assert rows[1].sp == "LINESTRING (9 9, 4 0)"
    assert rows[1].sc is None  # open line
    assert rows[2].sc == "LINESTRING (1 0, 1 1, 0 0, 1 0)"
    # the numeric-literal legacy forms still resolve
    legacy = s.sql(
        "SELECT ST_AsText(ST_AddPoint(g, 8, 0)) AS ap FROM t_edit "
        "WHERE id = 1"
    ).collect()[0]
    assert legacy.ap == "LINESTRING (0 0, 4 0, 8 0)"


def test_addpoint_geom_z_point_keeps_z(spark):
    """Geometry-argument form: a Z point into a Z line carries the
    point's own Z (positional mapping), not a 0 pad."""
    from datafusion_spatial_spark.functions.accessors import st_addpoint_geom

    df = spark.createDataFrame(
        [(1, "LINESTRING Z (0 0 5, 4 0 6)", "POINT Z (8 0 7)")],
        "id long, wl string, wp string",
    )
    g = df.select(
        st_geomfromtext("wl").alias("l"), st_geomfromtext("wp").alias("p")
    )
    b = g.select(
        st_addpoint_geom("l", "p", W, W).alias("ap")
    ).collect()[0].ap
    ap = _g(b)
    assert ap.has_z and ap.coords[-1] == (8.0, 0.0, 7.0)


# -- 4: one validity walk ----------------------------------------------------


def test_invalid_reason_is_detail_wrapper():
    import inspect

    src = inspect.getsource(G.invalid_reason)
    assert "invalid_detail" in src  # wrapper, not a parallel copy
    cases = [
        "POLYGON((0 0,1 0,1 1,0 1,0 0))",
        "POLYGON((0 0,1 1,1 0,0 1,0 0))",
        "POLYGON((0 0,2 0,2 2,0 2,0 0),(3 3,4 3,4 4,3 4,3 3))",
        "POLYGON((0 0,1 0,0 0))",
        "MULTIPOLYGON(((0 0,2 0,2 2,0 2,0 0)),((1 1,3 1,3 3,1 3,1 1)))",
        "GEOMETRYCOLLECTION(POINT(1 1),POLYGON((0 0,1 1,1 0,0 1,0 0)))",
        "POINT(1 2)",
        "LINESTRING(0 0,1 1)",
    ]
    for w in cases:
        g = wkb.from_wkt(w)
        valid, reason, _loc = G.invalid_detail(g)
        assert G.invalid_reason(g) == reason
        assert G.is_valid(g) == valid == (reason is None)
