"""Grid binning (square + hexagon, pure Catalyst) and ST_Subdivide.

Binning is the 100 TB map-aggregation shape: a cell-key expression per
row (no set-returning join), groupBy on a small int pair. Subdivide is
the PostGIS big-polygon join pattern: bound refine cost + bbox cell
fan-out, pieces union back to the input.
"""

import math
import random

import pytest
from pyspark.sql import functions as F

from datafusion_spatial_spark import geom_ops as G
from datafusion_spatial_spark import wkb
from datafusion_spatial_spark.functions import (
    st_area,
    st_hexcell,
    st_hexcellpolygon,
    st_hexcenter,
    st_point,
    st_squarecell,
    st_squarecellenvelope,
    st_subdivide,
)
from datafusion_spatial_spark.meta import GeometryMeta

PM = GeometryMeta(encoding="point", geometry_types=("Point",))
SQRT3 = math.sqrt(3.0)


def _pts_df(spark, pts):
    return spark.createDataFrame(
        [(i, p[0] if p else None, p[1] if p else None) for i, p in enumerate(pts)],
        "id long, x double, y double",
    ).select(
        "id",
        F.when(
            F.col("x").isNotNull(), st_point("x", "y")
        ).alias("g"),
        "x", "y",
    )


class TestSquareGrid:
    def test_known_cells_and_envelope(self, spark):
        pts = [(0.5, 0.5), (9.99, 0.0), (10.0, 0.0), (-0.1, -0.1), None]
        df = _pts_df(spark, pts)
        out = df.select(
            "id", st_squarecell("g", PM, 10.0).alias("c")
        ).orderBy("id").collect()
        assert (out[0].c.i, out[0].c.j) == (0, 0)
        assert (out[1].c.i, out[1].c.j) == (0, 0)
        assert (out[2].c.i, out[2].c.j) == (1, 0)
        assert (out[3].c.i, out[3].c.j) == (-1, -1)
        assert out[4].c is None

    def test_envelope_contains_point_and_is_pure_catalyst(self, spark):
        rng = random.Random(5)
        pts = [(rng.uniform(-50, 50), rng.uniform(-50, 50)) for _ in range(200)]
        df = _pts_df(spark, pts)
        cells = df.select(
            "x", "y", st_squarecell("g", PM, 7.5, origin=(1.0, -2.0)).alias("c")
        )
        out = cells.select(
            "x", "y", "c",
            st_squarecellenvelope(
                F.col("c.i"), F.col("c.j"), 7.5, origin=(1.0, -2.0)
            ).alias("env"),
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan
        for r in out.collect():
            ring = [(p.x, p.y) for p in r.env[0]]
            assert len(ring) == 5 and ring[0] == ring[-1]
            loc = G.polygon_contains_point([ring], r.x, r.y)
            assert loc >= 1  # inside (or exactly on a cell edge)


class TestHexGrid:
    def test_centers_land_in_their_own_cell(self, spark):
        cells = [(0, 0), (1, 0), (0, 1), (-2, 3), (5, -4)]
        size = 3.0
        rows = []
        for q, r in cells:
            cx = size * SQRT3 * (q + r / 2.0)
            cy = size * 1.5 * r
            rows.append((cx, cy))
        df = _pts_df(spark, rows)
        out = df.select(st_hexcell("g", PM, size).alias("c")).collect()
        assert [(r.c.q, r.c.r) for r in out] == cells

    def test_random_points_inside_their_hexagon(self, spark):
        rng = random.Random(17)
        size = 2.5
        pts = [(rng.uniform(-40, 40), rng.uniform(-40, 40)) for _ in range(300)]
        df = _pts_df(spark, pts)
        out = df.select(
            "x", "y",
            st_hexcell("g", PM, size).alias("c"),
        ).select(
            "x", "y", "c",
            st_hexcellpolygon(F.col("c.q"), F.col("c.r"), size).alias("hx"),
            st_hexcenter(F.col("c.q"), F.col("c.r"), size).alias("ctr"),
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan
        for r in out.collect():
            ring = [(p.x, p.y) for p in r.hx[0]]
            assert len(ring) == 7 and ring[0] == ring[-1]
            # boundary-tolerant containment: the assignment tie-breaks
            # edge points consistently, and every interior point must be
            # strictly inside its hexagon
            loc = G.polygon_contains_point([ring], r.x, r.y)
            assert loc >= 1, (r.x, r.y, r.c)
            # inside the hexagon means within the circumradius of center
            d0 = math.hypot(r.x - r.ctr.x, r.y - r.ctr.y)
            assert d0 <= size + 1e-9

    def test_neighbor_center_spacing(self, spark):
        size = 4.0
        df = spark.createDataFrame(
            [(0, 0, 1, 0), (0, 0, 0, 1), (0, 0, -1, 1)],
            "q1 long, r1 long, q2 long, r2 long",
        ).select(
            st_hexcenter("q1", "r1", size).alias("a"),
            st_hexcenter("q2", "r2", size).alias("b"),
        )
        for r in df.collect():
            d = math.hypot(r.a.x - r.b.x, r.a.y - r.b.y)
            assert abs(d - size * SQRT3) < 1e-9

    def test_null_propagates(self, spark):
        df = _pts_df(spark, [None])
        assert df.select(st_hexcell("g", PM, 1.0).alias("c")).first().c is None

    def test_hexbin_aggregation_partitions_rows(self, spark, sf_dir):
        from datafusion_spatial_spark.sources.tables import load_table

        cust = load_table(spark, sf_dir, "customer").select(
            st_point(
                F.col("c_acctbal"), F.col("c_custkey").cast("double")
            ).alias("g")
        )
        total = cust.count()
        binned = (
            cust.select(st_hexcell("g", PM, 250.0).alias("c"))
            .groupBy("c").count()
        )
        rows = binned.collect()
        assert sum(r["count"] for r in rows) == total
        assert len(rows) > 1  # actually spread over multiple cells


class TestSubdivide:
    def _wiggly(self, n=240, seed=3):
        rng = random.Random(seed)
        ring = []
        for i in range(n):
            a = 2 * math.pi * i / n
            rad = 10 + rng.uniform(-1, 1)
            ring.append((rad * math.cos(a), rad * math.sin(a)))
        ring.append(ring[0])
        return G.Geom("Polygon", [ring])

    def test_kernel_area_and_vertex_bound(self):
        poly = self._wiggly()
        parts = G.subdivide(poly, 64)
        assert len(parts) > 1
        for p in parts:
            assert sum(1 for _ in G._all_coords(p)) <= 64
        assert abs(sum(G.area(p) for p in parts) - G.area(poly)) < 1e-9

    def test_kernel_lines_points_passthrough(self):
        line = G.Geom(
            "LineString", [(float(i), math.sin(i / 5.0)) for i in range(150)]
        )
        parts = G.subdivide(line, 32)
        assert all(sum(1 for _ in G._all_coords(p)) <= 32 for p in parts)
        assert abs(sum(G.length(p) for p in parts) - G.length(line)) < 1e-9
        pt = G.Geom("Point", (1.0, 2.0))
        assert [p.type_name for p in G.subdivide(pt, 64)] == ["Point"]
        small = G.Geom("Polygon", [[(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0)]])
        assert len(G.subdivide(small, 64)) == 1
        with pytest.raises(ValueError):
            G.subdivide(small, 4)

    def test_kernel_holed_and_multi(self):
        outer = [(0.0, 0.0), (20.0, 0.0), (20.0, 20.0), (0.0, 20.0), (0.0, 0.0)]
        hole = [(8.0, 8.0), (12.0, 8.0), (12.0, 12.0), (8.0, 12.0), (8.0, 8.0)]
        dense_outer = []
        for a, b in zip(outer, outer[1:]):
            for t in range(20):
                dense_outer.append(
                    (a[0] + (b[0] - a[0]) * t / 20, a[1] + (b[1] - a[1]) * t / 20)
                )
        dense_outer.append(outer[0])
        g = G.Geom("Polygon", [dense_outer, hole])
        parts = G.subdivide(g, 40)
        assert abs(sum(G.area(p) for p in parts) - G.area(g)) < 1e-9
        for p in parts:
            assert sum(1 for _ in G._all_coords(p)) <= 40

    def test_spark_explode_roundtrip(self, spark):
        poly = self._wiggly()
        wm = GeometryMeta(encoding="WKB")
        df = spark.createDataFrame(
            [(1, bytearray(wkb.dumps(poly)))], "id long, g binary"
        )
        parts = df.select(
            "id", F.explode(st_subdivide("g", 64, wm)).alias("p")
        )
        out = parts.select(
            "id", st_area("p", wm).alias("a")
        ).groupBy("id").agg(
            F.sum("a").alias("total"), F.count("*").alias("n")
        ).first()
        assert out.n > 1
        assert abs(out.total - G.area(poly)) < 1e-6


class TestReviewFixes:
    def test_subdivide_line_preserves_z_m_srid(self):
        line = G.Geom(
            "LineString",
            [(float(i), 0.0, float(i) * 10) for i in range(20)],
            has_z=True, srid=4326,
        )
        parts = G.subdivide(line, 8)
        assert len(parts) > 1
        for p in parts:
            assert p.has_z and p.srid == 4326 and not p.has_m
        # z survives a WKB roundtrip of each piece
        rt = wkb.loads(wkb.dumps(parts[0]))
        assert rt.has_z and rt.coords[0][2] == 0.0 and rt.coords[1][2] == 10.0

    def test_generators_propagate_null_keys(self, spark):
        df = spark.createDataFrame(
            [(None, None), (1, 2)], "q int, r int"
        )
        rows = df.select(
            st_hexcellpolygon("q", "r", 2.0).alias("hx"),
            st_hexcenter("q", "r", 2.0).alias("c"),
            st_squarecellenvelope("q", "r", 2.0).alias("sq"),
        ).collect()
        null_row = [r for r in rows if r.c is None]
        real_row = [r for r in rows if r.c is not None]
        assert len(null_row) == 1 and len(real_row) == 1
        assert null_row[0].hx is None and null_row[0].sq is None
        assert real_row[0].hx is not None and real_row[0].sq is not None

    def test_nonpositive_size_rejected_upfront(self, spark):
        df = _pts_df(spark, [(1.0, 1.0)])
        for bad in (0.0, -3.0):
            with pytest.raises(ValueError, match="size must be > 0"):
                st_squarecell("g", PM, bad)
            with pytest.raises(ValueError, match="size must be > 0"):
                st_hexcell("g", PM, bad)
            with pytest.raises(ValueError, match="size must be > 0"):
                st_hexcenter(F.lit(1), F.lit(1), bad)
        del df
