"""Interleaved-coordinate native encoding (``fixed_size_list<double>[2]`` →
Spark ``array<double>``): cross-encoding invariance tests.

The reference sniffs both coord layouts structurally (helpers.rs:49-71) and
computes over interleaved buffers (compute.rs:19-44 chunk-by-D fold). Here
interleaved twins of the 6 reference fixture tables are generated with
pyarrow and every core function must agree bit-for-bit across WKB ≡
separated ≡ interleaved.
"""

import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from datafusion_spatial_spark import read_geoparquet, resolve_meta
from datafusion_spatial_spark.functions import st_astext, st_extent
from datafusion_spatial_spark.functions.predicates import st_area
from datafusion_spatial_spark.functions.scalar import st_envelope, st_npoints
from datafusion_spatial_spark.meta import NESTING_DEPTH

REFDATA = "/root/reference/data"
TYPES = [
    "point", "linestring", "polygon",
    "multipoint", "multilinestring", "multipolygon",
]
_TYPE_NAME = {
    "point": "Point", "linestring": "LineString", "polygon": "Polygon",
    "multipoint": "MultiPoint", "multilinestring": "MultiLineString",
    "multipolygon": "MultiPolygon",
}


def _interleave(v, depth):
    if v is None:
        return None
    if depth == 0:
        return [v["x"], v["y"]]
    return [_interleave(x, depth - 1) for x in v]


@pytest.fixture(scope="module")
def twin_dir(tmp_path_factory):
    """Interleaved twins of the reference native fixtures, preserving the
    ``geo`` footer metadata."""
    out = tmp_path_factory.mktemp("interleaved")
    for t in TYPES:
        src = f"{REFDATA}/data-{t}-encoding_native.parquet"
        tbl = pq.read_table(src)
        depth = NESTING_DEPTH[_TYPE_NAME[t]]
        # plain list rather than fixed_size_list: parquet cannot encode
        # fixed-size lists with null slots, and Spark surfaces both as
        # array<double> — the layout under test is identical
        typ = pa.list_(pa.float64())
        for _ in range(depth):
            typ = pa.list_(typ)
        vals = [_interleave(v, depth) for v in tbl.column("geometry").to_pylist()]
        arr = pa.array(vals, type=typ)
        idx = tbl.schema.get_field_index("geometry")
        tbl = tbl.set_column(idx, pa.field("geometry", typ), arr)
        tbl = tbl.replace_schema_metadata(pq.read_schema(src).metadata)
        pq.write_table(tbl, str(out / f"data-{t}-interleaved.parquet"))
    return out


def _frames(spark, twin_dir, t):
    sep = read_geoparquet(spark, f"{REFDATA}/data-{t}-encoding_native.parquet")
    il = read_geoparquet(spark, str(twin_dir / f"data-{t}-interleaved.parquet"))
    wk = read_geoparquet(spark, f"{REFDATA}/data-{t}-encoding_wkb.parquet")
    return (
        (sep, resolve_meta(sep, "geometry")),
        (il, resolve_meta(il, "geometry")),
        (wk, resolve_meta(wk, "geometry")),
    )


@pytest.mark.parametrize("t", TYPES)
def test_layout_sniffed(spark, twin_dir, t):
    il = read_geoparquet(spark, str(twin_dir / f"data-{t}-interleaved.parquet"))
    m = resolve_meta(il, "geometry")
    assert m.coord_layout == "interleaved"
    assert m.native_type == _TYPE_NAME[t]


@pytest.mark.parametrize("t", TYPES)
def test_astext_invariance(spark, twin_dir, t):
    (sep, ms), (il, mi), (wk, mw) = _frames(spark, twin_dir, t)

    def wkts(df, m):
        return [r.w for r in
                df.select(st_astext("geometry", m).alias("w")).collect()]

    a, b, c = wkts(sep, ms), wkts(il, mi), wkts(wk, mw)
    assert a == b == c


@pytest.mark.parametrize("t", TYPES)
def test_envelope_extent_invariance(spark, twin_dir, t):
    (sep, ms), (il, mi), (wk, mw) = _frames(spark, twin_dir, t)

    def env(df, m):
        e = st_envelope("geometry", m)
        from datafusion_spatial_spark.functions.scalar import ENVELOPE_META
        return [r.w for r in
                df.select(st_astext(e, ENVELOPE_META).alias("w")).collect()]

    assert env(sep, ms) == env(il, mi) == env(wk, mw)

    def ext(df, m):
        r = df.agg(st_extent("geometry", m).alias("e")).collect()[0].e
        return (r.xmin, r.ymin, r.xmax, r.ymax)

    assert ext(sep, ms) == ext(il, mi) == ext(wk, mw)


@pytest.mark.parametrize("t", ["polygon", "multipolygon"])
def test_area_and_npoints_invariance(spark, twin_dir, t):
    """The flat-offsets UDF transport must normalize interleaved input too."""
    (sep, ms), (il, mi), _ = _frames(spark, twin_dir, t)

    def areas(df, m):
        return [
            None if r.a is None else round(r.a, 9)
            for r in df.select(st_area("geometry", m).alias("a")).collect()
        ]

    def npts(df, m):
        return [r.n for r in
                df.select(st_npoints("geometry", m).alias("n")).collect()]

    assert areas(sep, ms) == areas(il, mi)
    assert npts(sep, ms) == npts(il, mi)
    assert any(a and a > 0 for a in areas(sep, ms))


def test_interleaved_xyz_with_declared_metadata(spark):
    """Interleaved arrays carry no length info in Spark, so XYZ needs
    declared 'Point Z'-style metadata; to_separated must then emit z."""
    from pyspark.sql import functions as F

    from datafusion_spatial_spark.functions import st_astext
    from datafusion_spatial_spark.functions.scalar import st_x, st_y
    from datafusion_spatial_spark.meta import GeometryMeta

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, [4.0, 5.0, 6.0]), (3, None)],
        "id long, g array<double>",
    )
    meta = GeometryMeta(
        encoding="point", geometry_types=("Point Z",), coord_layout="interleaved"
    )
    rows = df.select(
        "id",
        st_astext("g", meta).alias("w"),
        st_x("g", meta).alias("x"),
        st_y("g", meta).alias("y"),
    ).orderBy("id").collect()
    assert rows[0].w == "POINT Z (1 2 3)"
    assert rows[1].w == "POINT Z (4 5 6)"
    assert rows[2].w is None
    assert (rows[0].x, rows[0].y) == (1.0, 2.0)
