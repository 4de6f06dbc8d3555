"""Hilbert spatial layout: Catalyst/Python key parity, curve properties
(bijection, unit-step locality, coarse-prefix containment), and the
write_spatial -> spatial_scan pruning round trip."""

import random

from pyspark.sql import functions as F

from datafusion_spatial_spark.functions.indexing import (
    hilbert_cell_expr,
    hilbert_covering_cells,
    hilbert_xy2d,
)
from datafusion_spatial_spark.functions.scalar import st_point
from datafusion_spatial_spark.meta import GeometryMeta
from datafusion_spatial_spark.operators.storage import spatial_scan, write_spatial

PT = GeometryMeta(encoding="point", geometry_types=("Point",))


def test_hilbert_catalyst_matches_python(spark):
    rng = random.Random(42)
    level = 15
    cells = [
        (rng.randrange(1 << level), rng.randrange(1 << level)) for _ in range(200)
    ]
    df = spark.createDataFrame(cells, "x long, y long")
    got = df.select(
        "x", "y", hilbert_cell_expr(F.col("x"), F.col("y"), level).alias("d")
    ).collect()
    for r in got:
        assert r.d == hilbert_xy2d(level, r.x, r.y)


def test_hilbert_prefix_property():
    # the first 2k bits of a level-L key ARE the level-k key of the
    # containing coarse cell — what makes directory-partitioning by
    # shifted keys consistent with covering-cell enumeration
    rng = random.Random(7)
    L, k = 12, 4
    m = L - k
    for _ in range(300):
        x, y = rng.randrange(1 << L), rng.randrange(1 << L)
        assert hilbert_xy2d(L, x, y) >> (2 * m) == hilbert_xy2d(k, x >> m, y >> m)


def test_hilbert_bijection_and_unit_steps():
    level = 5
    n = 1 << level
    inv = {}
    for x in range(n):
        for y in range(n):
            d = hilbert_xy2d(level, x, y)
            assert d not in inv
            inv[d] = (x, y)
    assert set(inv) == set(range(n * n))
    for d in range(n * n - 1):
        (x0, y0), (x1, y1) = inv[d], inv[d + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1  # a true Hilbert walk


def test_covering_cells_clamp_outside_extent():
    cells = hilbert_covering_cells(
        window=(-50.0, -50.0, 5.0, 5.0),
        extent=(0.0, 0.0, 100.0, 100.0),
        coarse_level=4,
    )
    assert cells == [hilbert_xy2d(4, 0, 0)]


def _points_df(spark, n=4000):
    return spark.range(n).select(
        "id",
        ((F.col("id") * 37 % 1000) / 10.0).alias("x"),
        ((F.col("id") * 91 % 1000) / 10.0).alias("y"),
    ).withColumn("geom", st_point(F.col("x"), F.col("y")))


def test_write_spatial_scan_roundtrip_and_pruning(spark, tmp_path):
    path = str(tmp_path / "layout")
    df = _points_df(spark)
    write_spatial(
        df, path, "geom", PT, extent=(0.0, 0.0, 100.0, 100.0), coarse_level=3
    )
    window = (20.0, 30.0, 45.0, 60.0)
    got = spatial_scan(spark, path, window)
    exp = {
        r.id
        for r in df.filter(
            (F.col("x") >= 20.0) & (F.col("x") <= 45.0)
            & (F.col("y") >= 30.0) & (F.col("y") <= 60.0)
        ).collect()
    }
    assert {r.id for r in got.collect()} == exp and exp

    # listing-level pruning: the scan touches a strict subset of the files
    all_files = {
        r.f
        for r in spark.read.parquet(path)
        .select(F.input_file_name().alias("f"))
        .collect()
    }
    hit_files = {
        r.f for r in got.select(F.input_file_name().alias("f")).collect()
    }
    assert hit_files and len(hit_files) < len(all_files)

    # and it is plan-level pruning, not post-scan filtering: the coarse
    # cells land in PartitionFilters, the bbox bounds in PushedFilters
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "hcell" in plan
    assert "PushedFilters" in plan and "bbox_xmin" in plan


def test_with_hilbert_key_matches_expr_form(spark):
    from datafusion_spatial_spark.functions.indexing import with_hilbert_key
    from datafusion_spatial_spark.functions.scalar import st_point

    df = spark.range(500).select(
        "id",
        ((F.col("id") * 97 % 1000) / 10.0).alias("x"),
        ((F.col("id") * 61 % 1000) / 10.0).alias("y"),
    ).withColumn("geom", st_point(F.col("x"), F.col("y")))
    ext = (0.0, 0.0, 100.0, 100.0)
    bulk = with_hilbert_key(df, "geom", PT, ext, level=15)
    got = {r.id: r.hkey for r in bulk.collect()}
    expected = {
        r.id: hilbert_xy2d(
            15,
            min(int(r.x / 100.0 * (1 << 15)), (1 << 15) - 1),
            min(int(r.y / 100.0 * (1 << 15)), (1 << 15) - 1),
        )
        for r in df.collect()
    }
    assert got == expected
    # the bulk form stays whole-stage-codegen ("*(n)"-starred operators)
    # with no interpreted HOF fold in the plan
    plan = bulk._jdf.queryExecution().executedPlan().toString()
    assert "*(" in plan and "aggregate(" not in plan


def test_spatial_scan_refine_for_polygons(spark, tmp_path):
    from datafusion_spatial_spark.functions import st_geomfromtext
    from datafusion_spatial_spark.meta import GeometryMeta

    W = GeometryMeta(encoding="WKB")
    # diagonal sliver whose bbox overlaps the window but whose geometry
    # does not; plus one polygon genuinely inside
    rows = [
        (1, "POLYGON ((0 0, 1 0, 50 49, 50 50, 0 1, 0 0))"),   # sliver along diag
        (2, "POLYGON ((30 5, 35 5, 35 9, 30 9, 30 5))"),       # inside window
        (3, "POLYGON ((80 80, 90 80, 90 90, 80 90, 80 80))"),  # far away
    ]
    df = spark.createDataFrame(rows, "id long, wkt string").select(
        "id", st_geomfromtext("wkt").alias("geom")
    )
    path = str(tmp_path / "poly_layout")
    write_spatial(df, path, "geom", W, extent=(0.0, 0.0, 100.0, 100.0),
                  coarse_level=2)
    window = (25.0, 2.0, 40.0, 12.0)  # bbox of sliver overlaps; geometry not
    coarse = spatial_scan(spark, path, window)
    assert {r.id for r in coarse.collect()} == {1, 2}  # bbox prefilter keeps sliver
    exact = spatial_scan(spark, path, window, refine_meta=W)
    assert {r.id for r in exact.collect()} == {2}      # refine drops it
