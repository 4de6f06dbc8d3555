"""XYZ (3-D) geometry support — the Z half of the reference's 14-type
taxonomy (src/helpers.rs:117-132). Fixtures are generated here following the
public GeoParquet 1.1 native layout (struct<x,y,z>) since the reference only
ships XY fixtures."""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datafusion_spatial_spark import read_geoparquet, resolve_meta, wkb
from datafusion_spatial_spark.functions import (
    st_astext,
    st_bbox,
    st_extent,
    st_geometrytype,
)


@pytest.fixture(scope="module")
def xyz_paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("xyz")
    coord = pa.struct(
        [
            pa.field("x", pa.float64(), nullable=False),
            pa.field("y", pa.float64(), nullable=False),
            pa.field("z", pa.float64(), nullable=False),
        ]
    )
    pts = pa.array(
        [{"x": 30.0, "y": 10.0, "z": 5.0}, {"x": 40.0, "y": 40.0, "z": -2.0}, None],
        type=coord,
    )
    native = d / "point_z_native.parquet"
    meta = {
        "version": "1.1.0",
        "primary_column": "geometry",
        "columns": {"geometry": {"encoding": "point", "geometry_types": ["Point Z"]}},
    }
    tbl = pa.table({"col": pa.array([0, 1, 2]), "geometry": pts})
    pq.write_table(
        tbl.replace_schema_metadata({b"geo": json.dumps(meta).encode()}), native
    )
    # WKB variant from the codec
    wkbs = [
        wkb.dumps(wkb.Geom("Point", (30.0, 10.0, 5.0), has_z=True)),
        wkb.dumps(wkb.Geom("Point", (40.0, 40.0, -2.0), has_z=True)),
        None,
    ]
    wkb_path = d / "point_z_wkb.parquet"
    meta_w = {
        "version": "1.1.0",
        "primary_column": "geometry",
        "columns": {"geometry": {"encoding": "WKB", "geometry_types": ["Point Z"]}},
    }
    tbl2 = pa.table({"col": pa.array([0, 1, 2]), "geometry": pa.array(wkbs, pa.binary())})
    pq.write_table(
        tbl2.replace_schema_metadata({b"geo": json.dumps(meta_w).encode()}), wkb_path
    )
    return str(native), str(wkb_path)


def test_native_z(spark, xyz_paths):
    native, _ = xyz_paths
    df = read_geoparquet(spark, native)
    meta = resolve_meta(df, "geometry")
    assert meta.has_z and meta.geometry_type == "Point Z"
    rows = df.select(
        st_astext("geometry", meta).alias("wkt"),
        st_geometrytype("geometry", meta).alias("t"),
        st_bbox("geometry", meta).alias("b"),
    ).orderBy("col").collect()
    assert rows[0].wkt == "POINT Z (30 10 5)"
    assert rows[0].t == "ST_PointZ"
    assert (rows[0].b.xmin, rows[0].b.ymax) == (30.0, 10.0)  # bbox stays 2-D
    assert rows[2].wkt is None
    ext = df.agg(st_extent("geometry", meta).alias("e")).collect()[0].e
    assert (ext.xmin, ext.ymin, ext.xmax, ext.ymax) == (30.0, 10.0, 40.0, 40.0)


def test_wkb_z(spark, xyz_paths):
    _, wkbp = xyz_paths
    df = read_geoparquet(spark, wkbp)
    meta = resolve_meta(df, "geometry")
    rows = df.select(
        st_astext("geometry", meta).alias("wkt"),
        st_geometrytype("geometry", meta).alias("t"),
    ).orderBy("col").collect()
    assert rows[0].wkt == "POINT Z (30 10 5)"
    assert rows[0].t == "ST_PointZ"
    ext = df.agg(st_extent("geometry", meta).alias("e")).collect()[0].e
    assert (ext.xmin, ext.ymin, ext.xmax, ext.ymax) == (30.0, 10.0, 40.0, 40.0)


def test_sniff_z(spark, xyz_paths):
    native, _ = xyz_paths
    plain = spark.read.parquet(native)  # no geo metadata attached
    meta = resolve_meta(plain, "geometry")
    assert meta.has_z  # structural sniff sees the z field


class TestNativeM:
    """Native measured coordinates: struct<x,y,m> and struct<x,y,z,m>
    columns (sniffed or declared), Catalyst WKT with M/ZM tokens, and the
    flat-offsets transport carrying measures into kernels."""

    def test_sniff_m_and_zm(self, spark):
        import pyspark.sql.types as T

        from datafusion_spatial_spark.meta import sniff_meta

        m_t = T.StructType([
            T.StructField("x", T.DoubleType()),
            T.StructField("y", T.DoubleType()),
            T.StructField("m", T.DoubleType()),
        ])
        zm_t = T.StructType([
            T.StructField("x", T.DoubleType()),
            T.StructField("y", T.DoubleType()),
            T.StructField("z", T.DoubleType()),
            T.StructField("m", T.DoubleType()),
        ])
        mm = sniff_meta(m_t)
        assert mm.geometry_types == ("Point M",)
        assert mm.has_m and not mm.has_z
        mzm = sniff_meta(zm_t)
        assert mzm.geometry_types == ("Point ZM",)
        assert mzm.has_m and mzm.has_z

    def test_astext_m_token(self, spark):
        from pyspark.sql import functions as F

        from datafusion_spatial_spark.functions.scalar import st_astext
        from datafusion_spatial_spark.meta import GeometryMeta

        df = spark.createDataFrame(
            [(1.0, 2.0, 9.5)], "x double, y double, m double"
        ).select(
            F.struct(
                F.col("x"), F.col("y"), F.col("m")
            ).alias("g")
        )
        meta = GeometryMeta(encoding="point", geometry_types=("Point M",))
        out = df.select(st_astext("g", meta).alias("wkt")).collect()
        assert out[0].wkt == "POINT M (1 2 9.5)"

    def test_astext_zm_linestring(self, spark):
        from pyspark.sql import functions as F

        from datafusion_spatial_spark.functions.scalar import st_astext
        from datafusion_spatial_spark.meta import GeometryMeta

        df = spark.createDataFrame(
            [([ (0.0, 0.0, 1.0, 10.0), (3.0, 4.0, 2.0, 20.0) ],)],
            "g array<struct<x double, y double, z double, m double>>",
        )
        meta = GeometryMeta(
            encoding="linestring", geometry_types=("LineString ZM",)
        )
        out = df.select(st_astext("g", meta).alias("wkt")).collect()
        assert out[0].wkt == "LINESTRING ZM (0 0 1 10, 3 4 2 20)"

    def test_m_transport_roundtrip_via_asbinary(self, spark):
        """Native M column -> flat-offsets transport -> codec WKB -> WKT:
        measures survive the full path."""
        from pyspark.sql import functions as F

        from datafusion_spatial_spark import wkb
        from datafusion_spatial_spark.functions.scalar import st_asbinary
        from datafusion_spatial_spark.meta import GeometryMeta

        df = spark.createDataFrame(
            [([ (0.0, 0.0, 10.0), (3.0, 4.0, 20.0) ],)],
            "g array<struct<x double, y double, m double>>",
        )
        meta = GeometryMeta(
            encoding="linestring", geometry_types=("LineString M",)
        )
        out = df.select(st_asbinary("g", meta).alias("b")).collect()
        g = wkb.loads(bytes(out[0].b))
        assert g.has_m and not g.has_z
        assert wkb.to_wkt(g) == "LINESTRING M (0 0 10, 3 4 20)"
        # 2-D measures don't perturb geometry: length ignores m
        from datafusion_spatial_spark import geom_ops as G
        assert G.length(g) == 5.0


def test_st_z_st_m_accessors(spark):
    from datafusion_spatial_spark.functions import st_geomfromtext, st_m, st_x, st_z
    from datafusion_spatial_spark.meta import GeometryMeta

    W = GeometryMeta(encoding="WKB")
    df = spark.createDataFrame(
        [("POINT ZM (1 2 3 4)",), ("POINT Z (1 2 3)",),
         ("POINT M (1 2 4)",), ("POINT (1 2)",)],
        "wkt string",
    ).select(st_geomfromtext("wkt").alias("g"), "wkt")
    rows = {r.wkt: (r.x, r.z, r.m) for r in df.select(
        "wkt", st_x("g", W).alias("x"), st_z("g", W).alias("z"),
        st_m("g", W).alias("m"),
    ).collect()}
    assert rows["POINT ZM (1 2 3 4)"] == (1.0, 3.0, 4.0)
    assert rows["POINT Z (1 2 3)"] == (1.0, 3.0, None)
    assert rows["POINT M (1 2 4)"] == (1.0, None, 4.0)
    assert rows["POINT (1 2)"] == (1.0, None, None)


def test_st_3ddistance(spark):
    from datafusion_spatial_spark.functions import (
        st_3ddistance,
        st_distance,
        st_geomfromtext,
    )
    from datafusion_spatial_spark.meta import GeometryMeta

    W = GeometryMeta(encoding="WKB")
    pairs = [
        # 3-4-12 box diagonal: sqrt(3^2+4^2+12^2) = 13
        ("POINT Z (0 0 0)", "POINT Z (3 4 12)", 13.0),
        # point above the middle of a vertical segment: xy-dist 5, z inside
        ("POINT Z (3 4 5)", "LINESTRING Z (0 0 0, 0 0 10)", 5.0),
        # skew segments passing 2 apart in z
        ("LINESTRING Z (-1 0 0, 1 0 0)", "LINESTRING Z (0 -1 2, 0 1 2)", 2.0),
        # 2-D inputs behave as z=0 (planar distance)
        ("POINT (0 0)", "POINT (3 4)", 5.0),
    ]
    df = spark.createDataFrame(pairs, "wa string, wb string, want double").select(
        st_geomfromtext("wa").alias("a"), st_geomfromtext("wb").alias("b"), "want"
    )
    for r in df.select(st_3ddistance("a", "b", W, W).alias("d"), "want").collect():
        assert abs(r.d - r.want) < 1e-12
