"""Geometry aggregates: ST_Union_Agg / ST_Collect_Agg / ST_UnaryUnion and
the two-phase dissolve operator.

Unit-cell construction gives closed-form truth: the union of axis-aligned
unit squares has area equal to the number of DISTINCT occupied cells
(adjacent squares dissolve along shared edges, duplicates vanish).
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from datafusion_spatial_spark import geom_ops as G
from datafusion_spatial_spark import wkb
from datafusion_spatial_spark.functions import (
    st_area,
    st_collect_agg,
    st_unaryunion,
    st_union_agg,
)
from datafusion_spatial_spark.meta import GeometryMeta
from datafusion_spatial_spark.operators.spatial_agg import dissolve

W = GeometryMeta(encoding="WKB")


def _cell_wkt(x, y):
    return (
        f"POLYGON (({x} {y}, {x + 1} {y}, {x + 1} {y + 1}, "
        f"{x} {y + 1}, {x} {y}))"
    )


@pytest.fixture(scope="module")
def cells(spark):
    # key 'a': 2x2 block + duplicate + contained overlap -> area 4
    # key 'b': two disjoint cells + bridging cell overlapping both -> area < 3
    rows = []
    for x in range(2):
        for y in range(2):
            rows.append(("a", _cell_wkt(x, y)))
    rows.append(("a", _cell_wkt(0, 0)))  # exact duplicate
    rows.append(("b", _cell_wkt(10, 0)))
    rows.append(("b", _cell_wkt(12, 0)))
    df = spark.createDataFrame(rows, "k string, wkt string")
    from datafusion_spatial_spark.functions.scalar import st_geomfromtext

    return df.select("k", st_geomfromtext("wkt").alias("g"))


def test_union_agg_dissolves(cells):
    out = (
        cells.groupBy("k")
        .agg(st_union_agg("g", W).alias("u"))
        .select("k", F.round(st_area("u", W), 9).alias("area"))
        .orderBy("k")
        .collect()
    )
    assert [(r.k, r.area) for r in out] == [("a", 4.0), ("b", 2.0)]


def test_union_agg_geometry_is_regularized(cells):
    row = (
        cells.filter(F.col("k") == "a")
        .agg(st_union_agg("g", W).alias("u"))
        .collect()[0]
    )
    g = wkb.loads(bytes(row.u))
    # 2x2 block dissolves into one polygon covering [0,2]x[0,2]
    assert G.area(g) == 4.0
    assert len(list(G._polygons(g))) == 1


def test_collect_agg_preserves_parts(cells):
    row = (
        cells.filter(F.col("k") == "a")
        .agg(st_collect_agg("g", W).alias("c"))
        .collect()[0]
    )
    g = wkb.loads(bytes(row.c))
    assert g.type_name == "MultiPolygon"
    assert len(list(G._polygons(g))) == 5  # nothing dissolved
    assert G.perimeter(g) == 5 * 4.0


def test_unary_union_scalar(spark):
    df = spark.createDataFrame(
        [
            (
                "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), "
                "((2 2, 6 2, 6 6, 2 6, 2 2)))",
            )
        ],
        "wkt string",
    )
    from datafusion_spatial_spark.functions.scalar import st_geomfromtext

    out = df.select(
        st_area(st_unaryunion(st_geomfromtext("wkt"), W), W).alias("area")
    ).collect()
    assert out[0].area == 28.0  # 16 + 16 - 4 overlap


def test_dissolve_operator_matches_agg(cells):
    got = (
        dissolve(cells.repartition(4), ["k"], "g", W)
        .select("k", F.round(st_area("geometry", W), 9).alias("area"))
        .orderBy("k")
        .collect()
    )
    assert [(r.k, r.area) for r in got] == [("a", 4.0), ("b", 2.0)]


def test_dissolve_plan_has_partial_stage(cells):
    plan = dissolve(cells, ["k"], "g", W)._jdf.queryExecution().toString()
    # mapInPandas partial stage must sit below the exchange
    assert "MapInPandas" in plan


def test_union_agg_null_and_empty(spark):
    from datafusion_spatial_spark.functions.scalar import st_geomfromtext

    df = spark.createDataFrame(
        [("a", None), ("a", "POLYGON EMPTY"), ("b", "POINT (1 2)")],
        "k string, wkt string",
    ).select("k", st_geomfromtext("wkt").alias("g"))
    rows = (
        df.groupBy("k").agg(st_union_agg("g", W).alias("u")).orderBy("k").collect()
    )
    a = wkb.loads(bytes(rows[0].u))
    assert a.is_empty  # only null/EMPTY inputs -> empty collection
    b = wkb.loads(bytes(rows[1].u))
    assert b.type_name == "Point"
