"""GeoJSON codec + source tests (RFC 7946; extension beyond the reference)."""

import json

import pytest
from pyspark.sql import functions as F

from datafusion_spatial_spark import wkb
from datafusion_spatial_spark.functions.scalar import (
    st_asgeojson,
    st_geomfromgeojson,
)
from datafusion_spatial_spark.meta import GeometryMeta
from datafusion_spatial_spark.sources.geojson import read_geojson

WKB_META = GeometryMeta(encoding="WKB")

ROUNDTRIP = [
    '{"type":"Point","coordinates":[30.0,10.0]}',
    '{"type":"LineString","coordinates":[[30.0,10.0],[10.0,30.0],[40.0,40.0]]}',
    '{"type":"Polygon","coordinates":[[[30.0,10.0],[40.0,40.0],[20.0,40.0],[10.0,20.0],[30.0,10.0]]]}',
    '{"type":"Polygon","coordinates":[[[35.0,10.0],[45.0,45.0],[15.0,40.0],[10.0,20.0],[35.0,10.0]],[[20.0,30.0],[35.0,35.0],[30.0,20.0],[20.0,30.0]]]}',
    '{"type":"MultiPoint","coordinates":[[10.0,40.0],[40.0,30.0]]}',
    '{"type":"MultiLineString","coordinates":[[[10.0,10.0],[20.0,20.0]],[[40.0,40.0],[30.0,30.0]]]}',
    '{"type":"MultiPolygon","coordinates":[[[[30.0,20.0],[45.0,40.0],[10.0,40.0],[30.0,20.0]]],[[[15.0,5.0],[40.0,10.0],[10.0,20.0],[15.0,5.0]]]]}',
    '{"type":"GeometryCollection","geometries":[{"type":"Point","coordinates":[4.0,6.0]},{"type":"LineString","coordinates":[[4.0,6.0],[7.0,10.0]]}]}',
    '{"type":"Point","coordinates":[1.0,2.0,3.0]}',
]


def test_geojson_roundtrip_codec():
    for gj in ROUNDTRIP:
        g = wkb.from_geojson(gj)
        back = json.loads(wkb.to_geojson(g))
        assert back == json.loads(gj)
        # and through WKB
        g2 = wkb.loads(wkb.dumps(g))
        assert json.loads(wkb.to_geojson(g2)) == json.loads(gj)


def test_geojson_z_sets_has_z():
    g = wkb.from_geojson('{"type":"Point","coordinates":[1,2,3]}')
    assert g.has_z and g.coords == (1.0, 2.0, 3.0)
    assert wkb.to_wkt(g) == "POINT Z (1 2 3)"


def test_geojson_column_functions(spark):
    df = spark.createDataFrame([(gj,) for gj in ROUNDTRIP], "gj string")
    out = df.select(
        st_asgeojson(st_geomfromgeojson("gj"), WKB_META).alias("back"), "gj"
    ).collect()
    for r in out:
        assert json.loads(r.back) == json.loads(r.gj)


def test_read_geojson_feature_collection(spark, tmp_path):
    fc = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature", "id": "a",
             "geometry": {"type": "Point", "coordinates": [1.0, 2.0]},
             "properties": {"name": "alpha", "pop": 10}},
            {"type": "Feature", "id": "b",
             "geometry": {"type": "Polygon",
                          "coordinates": [[[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 0.0]]]},
             "properties": {"name": "beta", "pop": 20}},
            {"type": "Feature", "id": "c", "geometry": None,
             "properties": {"name": "nogeom"}},
        ],
    }
    p = tmp_path / "fc.geojson"
    p.write_text(json.dumps(fc))
    df = read_geojson(spark, str(p))
    rows = {r.feature_id: r for r in df.collect()}
    assert set(rows) == {"a", "b", "c"}
    assert wkb.loads(bytes(rows["a"].geometry)).coords == (1.0, 2.0)
    assert wkb.loads(bytes(rows["b"].geometry)).type_name == "Polygon"
    assert rows["c"].geometry is None
    assert json.loads(rows["a"].properties)["name"] == "alpha"
    # properties reachable with ordinary Spark JSON functions
    got = (
        df.select(F.get_json_object("properties", "$.pop").alias("pop"))
        .filter(F.col("pop").isNotNull()).orderBy("pop").collect()
    )
    assert [r.pop for r in got] == ["10", "20"]


def test_read_geojson_ndjson(spark, tmp_path):
    lines = [
        json.dumps({"type": "Feature", "id": i,
                    "geometry": {"type": "Point", "coordinates": [float(i), 0.0]},
                    "properties": {"i": i}})
        for i in range(5)
    ]
    p = tmp_path / "feats.ndjson"
    p.write_text("\n".join(lines))
    df = read_geojson(spark, str(p), ndjson=True)
    assert df.count() == 5
    xs = sorted(
        wkb.loads(bytes(r.geometry)).coords[0] for r in df.collect()
    )
    assert xs == [0.0, 1.0, 2.0, 3.0, 4.0]
    # WKB meta attached -> st_* functions resolve without explicit meta
    from datafusion_spatial_spark import resolve_meta
    assert resolve_meta(df, "geometry").is_wkb
