"""Round-3 constructive extras: Dump/DumpPoints (explode form), LineMerge,
PointOnSurface, Segmentize, RemoveRepeatedPoints, Normalize, Force2D/3D,
LineSubstring/LineLocatePoint, MinimumBoundingCircle, OrientedEnvelope,
Rotate/Affine (pure Catalyst)."""

import math

import pytest
from pyspark.sql import functions as F

from datafusion_spatial_spark import geom_ops as G
from datafusion_spatial_spark import wkb
from datafusion_spatial_spark.functions import (
    st_affine,
    st_area,
    st_astext,
    st_dump,
    st_dumppoints,
    st_force2d,
    st_force3d,
    st_geomfromtext,
    st_linelocatepoint,
    st_linemerge,
    st_linesubstring,
    st_minimumboundingcircle,
    st_normalize,
    st_orientedenvelope,
    st_point,
    st_pointonsurface,
    st_removerepeatedpoints,
    st_rotate,
    st_segmentize,
)
from datafusion_spatial_spark.meta import GeometryMeta

W = GeometryMeta(encoding="WKB")
PT = GeometryMeta(encoding="point", geometry_types=("Point",))


def wdf(spark, *wkts):
    return spark.createDataFrame([(w,) for w in wkts], "wkt string").select(
        st_geomfromtext("wkt").alias("g")
    )


def test_dump_explode(spark):
    df = wdf(
        spark,
        "GEOMETRYCOLLECTION (MULTIPOINT ((1 1), (2 2)), LINESTRING (0 0, 1 1))",
    )
    parts = (
        df.select(F.explode(st_dump("g", W)).alias("p"))
        .select(st_astext("p", W).alias("wkt"))
        .collect()
    )
    assert [r.wkt for r in parts] == [
        "POINT (1 1)",
        "POINT (2 2)",
        "LINESTRING (0 0, 1 1)",
    ]


def test_dumppoints_count(spark):
    df = wdf(spark, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    n = df.select(F.size(st_dumppoints("g", W)).alias("n")).collect()[0].n
    assert n == 5


def test_linemerge(spark):
    df = wdf(spark, "MULTILINESTRING ((0 0, 1 0), (1 0, 2 0), (5 5, 6 6))")
    out = df.select(st_astext(st_linemerge("g", W), W).alias("m")).collect()
    assert out[0].m == "MULTILINESTRING ((0 0, 1 0, 2 0), (5 5, 6 6))"


def test_pointonsurface_inside(spark):
    df = wdf(spark, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))")
    out = df.select(st_pointonsurface("g", W).alias("p")).collect()
    g = wkb.loads(bytes(out[0].p))
    holed = wkb.from_wkt(
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))"
    )
    assert G._point_intersects((g.coords[0], g.coords[1]), holed)


def test_segmentize_preserves_shape(spark):
    df = wdf(spark, "LINESTRING (0 0, 10 0)")
    out = df.select(st_astext(st_segmentize("g", 3.0, W), W).alias("s")).collect()
    assert out[0].s == "LINESTRING (0 0, 2.5 0, 5 0, 7.5 0, 10 0)"


def test_removerepeatedpoints(spark):
    df = wdf(spark, "LINESTRING (0 0, 0 0, 1 0, 1 0, 2 0)")
    out = df.select(
        st_astext(st_removerepeatedpoints("g", W), W).alias("c")
    ).collect()
    assert out[0].c == "LINESTRING (0 0, 1 0, 2 0)"


def test_normalize_canonical(spark):
    a = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    b = "POLYGON ((4 4, 0 4, 0 0, 4 0, 4 4))"  # rotated start, same ring
    df = wdf(spark, a, b)
    out = df.select(st_astext(st_normalize("g", W), W).alias("n")).collect()
    assert out[0].n == out[1].n


def test_force_dims_roundtrip(spark):
    df = wdf(spark, "POINT (1 2)")
    z = df.select(st_astext(st_force3d("g", W, 7.0), W).alias("z")).collect()
    assert z[0].z == "POINT Z (1 2 7)"
    df2 = spark.createDataFrame([("POINT Z (1 2 7)",)], "wkt string").select(
        st_geomfromtext("wkt").alias("g")
    )
    flat = df2.select(st_astext(st_force2d("g", W), W).alias("f")).collect()
    assert flat[0].f == "POINT (1 2)"


def test_line_substring_and_locate(spark):
    df = wdf(spark, "LINESTRING (0 0, 10 0, 10 10)")
    sub = df.select(
        st_astext(st_linesubstring("g", 0.25, 0.75, W), W).alias("s")
    ).collect()
    assert sub[0].s == "LINESTRING (5 0, 10 0, 10 5)"
    pt = spark.createDataFrame([(3.0, 5.0)], "x double, y double").select(
        st_point("x", "y").alias("p")
    )
    line = wdf(spark, "LINESTRING (0 0, 10 0)")
    both = line.crossJoin(pt)
    frac = both.select(st_linelocatepoint("g", "p", W, PT).alias("f")).collect()
    assert abs(frac[0].f - 0.3) < 1e-12


def test_minimum_bounding_circle(spark):
    df = wdf(spark, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    out = df.select(st_area(st_minimumboundingcircle("g", W), W).alias("a")).collect()
    r = 2 * math.sqrt(2)
    # 32-gon area slightly below pi*r^2
    assert math.pi * r * r * 0.97 < out[0].a < math.pi * r * r


def test_oriented_envelope_rotated_square(spark):
    # unit square rotated 45deg: oriented envelope area == 2, axis bbox == 4
    df = wdf(spark, "MULTIPOINT ((0 0), (1 1), (2 0), (1 -1))")
    out = df.select(st_area(st_orientedenvelope("g", W), W).alias("a")).collect()
    assert abs(out[0].a - 2.0) < 1e-9


def test_rotate_and_affine_catalyst(spark):
    # native point meta: rotation by 90deg CCW about origin maps (1,0)->(0,1)
    df = spark.createDataFrame([(1.0, 0.0)], "x double, y double").select(
        st_point("x", "y").alias("g")
    )
    out = df.select(st_rotate("g", math.pi / 2, PT).alias("r")).collect()
    p = out[0].r
    assert abs(p.x - 0.0) < 1e-12 and abs(p.y - 1.0) < 1e-12
    out2 = df.select(st_affine("g", 2, 0, 0, 3, 10, 20, PT).alias("r")).collect()
    assert (out2[0].r.x, out2[0].r.y) == (12.0, 20.0)


def test_rotate_plan_is_codegen(spark):
    df = spark.createDataFrame([(1.0, 0.0)], "x double, y double").select(
        st_point("x", "y").alias("g")
    )
    plan = (
        df.select(st_rotate("g", 0.5, PT).alias("r"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_split_explode(spark):
    from datafusion_spatial_spark.functions.accessors import st_split

    df = wdf(spark, "LINESTRING (0 0, 10 0)")
    parts = (
        df.select(F.explode(st_split("g", "LINESTRING (5 -5, 5 5)", W)).alias("p"))
        .select(st_astext("p", W).alias("wkt"))
        .collect()
    )
    assert [r.wkt for r in parts] == [
        "LINESTRING (0 0, 5 0)",
        "LINESTRING (5 0, 10 0)",
    ]


def test_snap_to_grid_line(spark):
    from datafusion_spatial_spark.functions.accessors import st_snap

    noisy = wdf(spark, "LINESTRING (0.05 0, 5 0.04, 9.97 0)")
    target = wdf(spark, "LINESTRING (0 0, 10 0)").withColumnRenamed("g", "t")
    out = (
        noisy.crossJoin(target)
        .select(st_astext(st_snap("g", "t", 0.1, W, W), W).alias("s"))
        .collect()
    )
    assert out[0].s == "LINESTRING (0 0, 5 0, 10 0)"


def test_project_and_expand(spark):
    from datafusion_spatial_spark.functions.accessors import st_expand, st_project

    df = wdf(spark, "POINT (0 0)")
    east = df.select(
        st_astext(st_project("g", 10.0, math.pi / 2, W), W).alias("p")
    ).collect()
    # azimuth pi/2 = due east
    g = wdf(spark, east[0].p).collect()  # parse back via st_geomfromtext
    box = df.select(st_area(st_expand("g", 2.0, W), W).alias("a")).collect()
    assert box[0].a == 16.0


def test_delaunay_square(spark):
    from datafusion_spatial_spark.functions.accessors import st_delaunaytriangles

    df = wdf(spark, "MULTIPOINT ((0 0), (1 0), (1 1), (0 1))")
    tris = (
        df.select(F.explode(st_delaunaytriangles("g", W)).alias("t"))
        .select(st_area("t", W).alias("a"))
        .collect()
    )
    assert len(tris) == 2
    assert sum(r.a for r in tris) == 1.0


def test_delaunay_empty_circumcircle_property(spark):
    # Delaunay invariant: no site lies strictly inside any triangle's
    # circumcircle (checked kernel-side on a pseudo-random-ish point set)
    pts = [(i * 7 % 13, i * 11 % 17) for i in range(12)]
    mp = wkb.Geom("MultiPoint", [(float(x), float(y)) for x, y in pts])
    tris = G.delaunay_triangles(mp)
    sites = sorted(dict.fromkeys((p[0], p[1]) for p in G._all_coords(mp)))
    for t in tris:
        ring = t.coords[0]
        cc = G._circumcircle(ring[0], ring[1], ring[2])
        assert cc is not None
        (ux, uy), r2 = cc
        for s in sites:
            if s in ring[:3]:
                continue
            assert (s[0] - ux) ** 2 + (s[1] - uy) ** 2 >= r2 * (1 - 1e-9)


def test_delaunay_voronoi_scale_budget(spark):
    """Round-5: walk-located Bowyer–Watson + Delaunay-neighbor Voronoi
    clipping must stay near-linear — 5k random sites under wall-time
    budgets, with the Voronoi partition property verified exactly (cells
    tile the envelope; every cell vertex is nearest its own site)."""
    import math
    import random
    import time

    random.seed(11)
    pts = [
        (round(random.uniform(0, 100), 6), round(random.uniform(0, 100), 6))
        for _ in range(5000)
    ]
    mp = wkb.Geom("MultiPoint", pts)
    t0 = time.perf_counter()
    tris = G.delaunay_triangles(mp)
    t_del = time.perf_counter() - t0
    sites = sorted(dict.fromkeys(pts))
    # Euler bound: 2n - 2 - hull_size triangles
    assert len(tris) > 1.8 * len(sites)
    assert t_del < 15.0, f"5k-site delaunay took {t_del:.1f}s"
    t0 = time.perf_counter()
    cells = G.voronoi_polygons(mp)
    t_vor = time.perf_counter() - t0
    assert t_vor < 15.0, f"5k-site voronoi took {t_vor:.1f}s"
    assert len(cells) == len(sites)
    x0, y0, x1, y1 = G._bbox(mp)
    mx = max(x1 - x0, y1 - y0, 1.0) / 2
    env_area = (x1 - x0 + 2 * mx) * (y1 - y0 + 2 * mx)
    total = sum(G.area(c) for c in cells)
    assert abs(total - env_area) < 1e-6 * env_area
    # concave hull rides the same triangulation — budget it too
    t0 = time.perf_counter()
    ch = G.concave_hull(mp, 0.3)
    assert time.perf_counter() - t0 < 15.0
    assert 0 < G.area(ch) <= G.area(G.convex_hull(mp)) + 1e-9
    # spot-check the nearest-site property on a sample of cells
    for site, cell in random.sample(list(zip(sites, cells)), 50):
        for v in cell.coords[0]:
            d_own = math.hypot(v[0] - site[0], v[1] - site[1])
            d_min = min(
                math.hypot(v[0] - s[0], v[1] - s[1]) for s in sites
            )
            assert d_own <= d_min + 1e-6


def test_voronoi_collinear_fallback(spark):
    """Collinear sites degenerate the triangulation — the all-pairs
    fallback must still emit one slab per site."""
    mp = wkb.Geom(
        "MultiPoint", [(0.0, 0.0), (1.0, 0.0), (2.0, 0.0), (3.0, 0.0)]
    )
    cells = G.voronoi_polygons(mp)
    assert len(cells) == 4
    widths = sorted(round(G._bbox(c)[2] - G._bbox(c)[0], 9) for c in cells)
    assert widths == [1.0, 1.0, 2.0, 2.0]  # inner slabs 1 wide, outer 2


def test_voronoi_partition_of_envelope(spark):
    from datafusion_spatial_spark.functions.accessors import st_voronoipolygons

    df = wdf(spark, "MULTIPOINT ((0 0), (1 0), (1 1), (0 1))")
    cells = (
        df.select(
            F.explode(
                st_voronoipolygons("g", W, "POLYGON ((-1 -1, 2 -1, 2 2, -1 2, -1 -1))")
            ).alias("c")
        )
        .select(st_area("c", W).alias("a"))
        .collect()
    )
    assert len(cells) == 4
    assert abs(sum(r.a for r in cells) - 9.0) < 1e-9
    assert all(abs(r.a - 2.25) < 1e-9 for r in cells)


def test_shortestline_hausdorff_angle(spark):
    from datafusion_spatial_spark.functions.accessors import (
        st_angle,
        st_hausdorffdistance,
        st_shortestline,
    )

    a = wdf(spark, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    b = wdf(spark, "POINT (5 2)").withColumnRenamed("g", "h")
    both = a.crossJoin(b)
    row = both.select(
        st_astext(st_shortestline("g", "h", W, W), W).alias("sl"),
        st_hausdorffdistance("g", "h", W, W).alias("hd"),
    ).collect()[0]
    assert row.sl == "LINESTRING (2 2, 5 2)"
    assert abs(row.hd - math.hypot(5, 2)) < 1e-9  # farthest corner (0,0)

    pts = spark.createDataFrame([(1.0,)], "v double").select(
        st_point(F.lit(1.0), F.lit(0.0)).alias("p1"),
        st_point(F.lit(0.0), F.lit(0.0)).alias("p2"),
        st_point(F.lit(0.0), F.lit(1.0)).alias("p3"),
    )
    ang = pts.select(st_angle("p1", "p2", "p3", PT).alias("a")).collect()[0].a
    assert abs(ang - 3 * math.pi / 2) < 1e-12


def test_concave_hull_tighter_than_convex(spark):
    from datafusion_spatial_spark.functions.accessors import st_concavehull

    # U-shape: dense rim of a square minus its open top — a low-ratio
    # concave hull should carve into the notch, a ratio-1 hull equals convex
    pts = []
    for i in range(11):
        t = i / 10.0
        pts += [(t * 4, 0.0), (0.0, t * 4), (4.0, t * 4)]
    pts += [(1.0, 4.0), (3.0, 4.0), (1.0, 1.0), (3.0, 1.0), (2.0, 0.5)]
    mp = "MULTIPOINT (" + ", ".join(f"({x} {y})" for x, y in pts) + ")"
    df = wdf(spark, mp)
    row = df.select(
        st_area(st_concavehull("g", 0.2, W), W).alias("concave"),
        st_area(st_concavehull("g", 1.0, W), W).alias("ratio1"),
        st_area(F.col("g"), W).alias("zero"),
    ).collect()[0]
    hull_area = G.area(G.convex_hull(wkb.from_wkt(mp)))
    assert abs(row.ratio1 - hull_area) < 1e-9
    assert 0 < row.concave < hull_area - 1e-9
    # every input vertex stays covered by the concave hull
    hull_wkb = df.select(st_concavehull("g", 0.2, W).alias("h")).collect()[0].h
    hull = wkb.loads(hull_wkb)
    for x, y in pts:
        assert G.intersects(hull, wkb.Geom("Point", (x, y)))


def test_maximum_inscribed_circle_square(spark):
    from datafusion_spatial_spark.functions.accessors import (
        st_maximuminscribedcircle,
    )

    df = wdf(spark, "POLYGON ((0 0, 4 0, 4 2, 0 2, 0 0))")
    row = df.select(
        st_maximuminscribedcircle("g", W).alias("mic")
    ).select("mic.*").collect()[0]
    assert abs(row.radius - 1.0) < 1e-4
    cx, cy = wkb.loads(row.center).coords
    assert abs(cy - 1.0) < 1e-3 and 1.0 - 1e-3 <= cx <= 3.0 + 1e-3
    nx, ny = wkb.loads(row.nearest).coords
    assert min(abs(ny - 0.0), abs(ny - 2.0), abs(nx), abs(nx - 4.0)) < 1e-3
    # non-areal input -> NULL struct fields
    ln = wdf(spark, "LINESTRING (0 0, 1 1)")
    r2 = ln.select(st_maximuminscribedcircle("g", W).alias("m")).collect()[0].m
    assert r2.radius is None and r2.center is None


def test_largest_empty_circle(spark):
    """LEC of the 4 corners of a square: center at the middle, radius =
    half diagonal; with an explicit boundary the center is clamped into
    it; SQL-registered form agrees."""
    import math

    from datafusion_spatial_spark.functions.accessors import (
        st_largestemptycircle,
    )

    df = wdf(spark, "MULTIPOINT ((0 0), (10 0), (10 10), (0 10))")
    row = df.select(
        st_largestemptycircle("g", W, 1e-7).alias("lec")
    ).select("lec.*").collect()[0]
    assert abs(row.radius - math.hypot(5, 5)) < 1e-4
    cx, cy = wkb.loads(row.center).coords
    assert abs(cx - 5.0) < 1e-3 and abs(cy - 5.0) < 1e-3
    # explicit boundary: center constrained to [0,4]^2 -> corner (4,4)
    row2 = df.select(
        st_largestemptycircle(
            "g", W, 1e-7, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
        ).alias("lec")
    ).select("lec.*").collect()[0]
    assert abs(row2.radius - math.hypot(4, 4)) < 1e-4
    # SQL resolver path
    from datafusion_spatial_spark.meta import with_geo_meta
    from datafusion_spatial_spark.plans.sql import SpatialSQL

    ssql = SpatialSQL(spark)
    ssql.register_view("lec_t", with_geo_meta(df, "g", W))
    r3 = ssql.sql(
        "SELECT ST_LargestEmptyCircle(g).radius AS r FROM lec_t"
    ).collect()[0]
    assert abs(r3.r - math.hypot(5, 5)) < 1e-3
    # empty obstacles -> NULL struct
    e = wdf(spark, "MULTIPOINT EMPTY")
    r4 = e.select(st_largestemptycircle("g", W).alias("m")).collect()[0].m
    assert r4.radius is None


def test_generate_points_deterministic_inside(spark):
    from datafusion_spatial_spark.functions.accessors import st_generatepoints

    poly = "POLYGON ((0 0, 10 0, 10 5, 0 5, 0 0), (4 1, 6 1, 6 4, 4 4, 4 1))"
    df = wdf(spark, poly)
    a = df.select(st_generatepoints("g", 40, W, seed=7).alias("p")).collect()[0].p
    b = df.select(st_generatepoints("g", 40, W, seed=7).alias("p")).collect()[0].p
    assert a == b  # seeded-deterministic bytes
    g = wkb.loads(a)
    assert g.type_name == "MultiPoint" and len(g.coords) == 40
    shell = wkb.from_wkt(poly)
    for x, y in g.coords:
        assert G.intersects(shell, wkb.Geom("Point", (x, y)))


def test_concave_hull_sql_resolver(spark, tmp_path):
    from datafusion_spatial_spark.meta import with_geo_meta
    from datafusion_spatial_spark.plans.sql import SpatialSQL

    df = wdf(spark, "MULTIPOINT ((0 0), (4 0), (4 4), (0 4), (2 1))").select(
        F.col("g").alias("geometry")
    )
    ssql = SpatialSQL(spark)
    ssql.register_view("chull_t", with_geo_meta(df, "geometry", W))
    out = ssql.sql(
        "SELECT ST_Area(ST_ConcaveHull(geometry, 1.0)) AS a, "
        "ST_AsText(ST_GeneratePoints(geometry, 0)) AS empty_mp FROM chull_t"
    ).collect()[0]
    assert abs(out.a - 16.0) < 1e-9
    assert out.empty_mp == "MULTIPOINT EMPTY"


def test_largest_empty_circle_degenerate_boundary_terminates(spark):
    """Round-6 fix (advisor finding): a zero-area boundary polygon with a
    positive bbox span used to subdivide forever (no cell center ever
    feasible, best stayed -inf, the tolerance break never fired). Must
    return None promptly, like the collinear-hull case."""
    from datafusion_spatial_spark import geom_ops as G
    from datafusion_spatial_spark import wkb

    obstacles = wkb.Geom("MultiPoint", [(0.0, 0.0), (10.0, 10.0)])
    degenerate = wkb.Geom(
        "Polygon", [[(0.0, 0.0), (10.0, 10.0), (5.0, 5.0), (0.0, 0.0)]]
    )
    assert G.largest_empty_circle(obstacles, degenerate) is None
    # normal boundaries still solve
    sq = wkb.Geom(
        "Polygon",
        [[(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]],
    )
    (cx, cy), r, _ = G.largest_empty_circle(obstacles, sq)
    assert abs(r - 10.0) < 1e-3
    assert min(
        abs(cx - gx) + abs(cy - gy) for gx, gy in ((0.0, 10.0), (10.0, 0.0))
    ) < 1e-3


def test_largest_empty_circle_flat_field_exact():
    """Round-7 fix (VERDICT r6 #3 / ADVICE): a FILLED polygon obstacle
    makes the distance field identically 0 over its interior; the old
    generic Lipschitz bound degenerated to exhaustive subdivision and hit
    the 20k pop cap, returning a coarser-than-requested answer. The
    interior-depth bound (dist(q, obstacles) <= reach - depth for cells
    inside the obstacle) prunes those cells exactly, so flat fields now
    meet the tolerance contract with no cap and no warning."""
    import math
    import time
    import warnings

    from datafusion_spatial_spark import geom_ops as G
    from datafusion_spatial_spark import wkb

    obstacle = wkb.Geom(
        "Polygon",
        [[(2.0, 2.0), (8.0, 2.0), (8.0, 8.0), (2.0, 8.0), (2.0, 2.0)]],
    )
    boundary = wkb.Geom(
        "Polygon",
        [[(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]],
    )
    t0 = time.time()
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # the budget warning must NOT fire
        (cx, cy), r, _ = G.largest_empty_circle(obstacle, boundary, 1e-6)
    assert time.time() - t0 < 10.0
    # optimum: a boundary corner, e.g. (0,0) at distance sqrt(8) from (2,2)
    assert abs(r - math.sqrt(8.0)) < 1e-4
    corners = [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0), (10.0, 10.0)]
    assert min(abs(cx - gx) + abs(cy - gy) for gx, gy in corners) < 1e-4


def test_largest_empty_circle_obstacle_covers_boundary():
    """Obstacle covering the whole boundary: every center has distance 0 —
    must terminate promptly with a zero radius, not subdivide to the cap."""
    import time
    import warnings

    from datafusion_spatial_spark import geom_ops as G
    from datafusion_spatial_spark import wkb

    cover = wkb.Geom(
        "Polygon",
        [[(-1.0, -1.0), (11.0, -1.0), (11.0, 11.0), (-1.0, 11.0), (-1.0, -1.0)]],
    )
    boundary = wkb.Geom(
        "Polygon",
        [[(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]],
    )
    t0 = time.time()
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        out = G.largest_empty_circle(cover, boundary, 1e-6)
    assert time.time() - t0 < 10.0
    assert out is None or out[1] <= 1e-6


def test_largest_empty_circle_coincident_hull_ring_exact_zero():
    """Round-7 regression: ST_LargestEmptyCircle(convex filled polygon)
    with the DEFAULT boundary (= its own convex hull) has the obstacle
    ring coinciding with the boundary ring. Interior-depth pruning cannot
    touch the ring-hugging cells (depth -> 0 there), so before the
    free-space overlay check this subdivided O(perimeter/tol) cells —
    an effective hang that froze the full suite via the SQL-resolver
    fixture query. Must now return exact radius 0 promptly, no warning."""
    import time
    import warnings

    from datafusion_spatial_spark import geom_ops as G
    from datafusion_spatial_spark import wkb

    # the reference fixture polygon that exposed the hang
    quad = wkb.Geom(
        "Polygon",
        [[(30.0, 10.0), (40.0, 40.0), (20.0, 40.0), (10.0, 20.0), (30.0, 10.0)]],
    )
    t0 = time.time()
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        (cx, cy), r, _ = G.largest_empty_circle(quad)
    assert time.time() - t0 < 5.0
    assert r == 0.0
    # center is feasible (inside the hull)
    assert G.polygon_contains_point(quad.coords, cx, cy) >= 1


def test_largest_empty_circle_obstacle_with_interior_free_pocket():
    """A filled C-shaped obstacle with a free pocket: the optimum sits in
    the pocket, and interior-depth pruning must not cut it off."""
    import warnings

    from datafusion_spatial_spark import geom_ops as G
    from datafusion_spatial_spark import wkb

    # ring-shaped obstacle: outer 0..10 square with a 4..6 square hole —
    # free space is the hole; optimum center (5,5), r = 1 (to the hole wall)
    obstacle = wkb.Geom(
        "Polygon",
        [
            [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)],
            [(4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0)],
        ],
    )
    boundary = wkb.Geom(
        "Polygon",
        [[(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]],
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        (cx, cy), r, _ = G.largest_empty_circle(obstacle, boundary, 1e-6)
    assert abs(cx - 5.0) < 1e-4 and abs(cy - 5.0) < 1e-4
    assert abs(r - 1.0) < 1e-4


# heavy battery file: certification tier only (r15 tiering, VERDICT r14 #9)
pytestmark = pytest.mark.slow
