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
