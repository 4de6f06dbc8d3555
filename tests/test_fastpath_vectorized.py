"""Parity pins for the vectorized point_xy_batch conformance check
(round 6: the per-row Python validation loop became one join + numpy
byte-level checks; fallback semantics must be identical)."""
import struct

import numpy as np
import pandas as pd

from datafusion_spatial_spark.functions._fastpath import point_xy_batch


def _pt(x, y):
    return struct.pack("<BIdd", 1, 1, x, y)


def test_plain_points_with_nulls():
    s = pd.Series([_pt(1, 2), None, _pt(3, 4)], dtype=object)
    x, y, valid = point_xy_batch(s)
    assert x.tolist()[0] == 1.0 and y.tolist()[2] == 4.0
    assert valid.tolist() == [True, False, True]
    assert np.isnan(x[1])


def test_nan_empty_point_invalid_mask():
    s = pd.Series([_pt(float("nan"), float("nan")), _pt(0, 0)], dtype=object)
    _, _, valid = point_xy_batch(s)
    assert valid.tolist() == [False, True]


def test_non_point_type_word_falls_back():
    bad = struct.pack("<BIddd", 1, 2, 0, 0, 0)  # LineString type word
    assert point_xy_batch(pd.Series([_pt(1, 2), bad], dtype=object)) is None


def test_big_endian_falls_back():
    be = b"\x00" + struct.pack(">Idd", 1, 1.0, 2.0)
    assert point_xy_batch(pd.Series([be], dtype=object)) is None


def test_mixed_record_lengths_stitch():
    """r12 (VERDICT r11 #4): a batch mixing 2-D and Z point records no
    longer falls back — it partitions by record length and decodes each
    uniform slice. Junk lengths still reject the whole batch."""
    z = struct.pack("<BIddd", 1, 0x80000001, 5, 6, 3)
    out = point_xy_batch(pd.Series([_pt(1, 2), z, None], dtype=object))
    assert out is not None
    x, y, valid = out
    assert x[:2].tolist() == [1.0, 5.0] and y[:2].tolist() == [2.0, 6.0]
    assert valid.tolist() == [True, True, False]
    junk = b"\x01" + b"\x00" * 19  # 20 bytes: not a point record length
    assert point_xy_batch(
        pd.Series([_pt(1, 2), junk], dtype=object)
    ) is None


def test_uniform_z_and_zm_batches_decode():
    z = [struct.pack("<BIddd", 1, 0x80000001, i, -i, 9.0) for i in range(5)]
    x, y, valid = point_xy_batch(pd.Series(z, dtype=object))
    assert x.tolist() == [0.0, 1.0, 2.0, 3.0, 4.0] and valid.all()
    zm = [struct.pack("<BIdddd", 1, 3001, i, i + 1, 0.0, 0.0) for i in range(3)]
    x, y, valid = point_xy_batch(pd.Series(zm, dtype=object))
    assert y.tolist() == [1.0, 2.0, 3.0] and valid.all()


def test_all_null_and_non_bytes_fall_back():
    assert point_xy_batch(pd.Series([None, None], dtype=object)) is None
    assert point_xy_batch(pd.Series(["not-wkb"], dtype=object)) is None


# ---------------------------------------------------------------------------
# flat_coords_batch (round 7: LineString/Polygon/MultiPoint vertex streams)


from datafusion_spatial_spark import wkb as W
from datafusion_spatial_spark.functions._fastpath import flat_coords_batch
from datafusion_spatial_spark.wkb import Geom


def _flatten(g):
    if g.type_name == "Polygon":
        return [p for ring in g.coords for p in ring]
    return list(g.coords)


def _check_parity(vals):
    s = pd.Series(vals, dtype=object)
    out = flat_coords_batch(s)
    assert out is not None
    xs, ys, counts = out
    pos = 0
    for v, c in zip(vals, counts):
        if v is None:
            assert c == 0
            continue
        exp = _flatten(W.loads(bytes(v)))
        assert c == len(exp)
        for ex, ey in exp:
            assert xs[pos] == ex and ys[pos] == ey
            pos += 1
    assert pos == len(xs)


def test_flat_linestring_parity_with_null_and_empty():
    vals = [
        W.dumps(Geom("LineString", [(30.0, 10.0), (10.0, 30.0), (40.0, 40.0)])),
        None,
        W.dumps(Geom("LineString", [])),  # EMPTY -> count 0
        W.dumps(Geom("LineString", [(1.5, -2.5), (3.0, 4.0)])),
    ]
    _check_parity(vals)


def test_flat_polygon_parity_incl_hole():
    shell = [(35.0, 10.0), (45.0, 45.0), (15.0, 40.0), (10.0, 20.0), (35.0, 10.0)]
    hole = [(20.0, 30.0), (35.0, 35.0), (30.0, 20.0), (20.0, 30.0)]
    vals = [
        W.dumps(Geom("Polygon", [shell, hole])),
        W.dumps(Geom("Polygon", [shell])),
        None,
        W.dumps(Geom("Polygon", [])),
    ]
    _check_parity(vals)


def test_flat_multipoint_parity():
    vals = [
        W.dumps(Geom("MultiPoint", [(10.0, 40.0), (40.0, 30.0), (20.0, 20.0)])),
        W.dumps(Geom("MultiPoint", [(30.0, 10.0)])),
        W.dumps(Geom("MultiPoint", [])),
    ]
    _check_parity(vals)


def test_flat_mixed_types_stitch():
    """r13 (VERDICT r12 #2): mixed base gtypes in one batch partition by
    type word and stitch — vertex-stream parity row by row, including a
    Point row and a null."""
    import numpy as np

    vals = [
        W.dumps(Geom("LineString", [(0.0, 0.0), (1.0, 1.0)])),
        W.dumps(Geom("Polygon", [[(0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (0.0, 0.0)]])),
        W.dumps(Geom("Point", (7.0, -3.0))),
        None,
        W.dumps(Geom("MultiPoint", [(2.0, 5.0), (6.0, 8.0)])),
    ]
    out = flat_coords_batch(pd.Series(vals, dtype=object))
    assert out is not None, "mixed-gtype batch fell out of the stitcher"
    xs, ys, counts = out
    assert list(counts) == [2, 4, 1, 0, 2]
    exp = [(0.0, 0.0), (1.0, 1.0),
           (0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (0.0, 0.0),
           (7.0, -3.0), (2.0, 5.0), (6.0, 8.0)]
    assert np.array_equal(xs, np.array([p[0] for p in exp]))
    assert np.array_equal(ys, np.array([p[1] for p in exp]))


def test_flat_point_batch_falls_back_to_point_path():
    vals = [W.dumps(Geom("Point", (1.0, 2.0)))]
    assert flat_coords_batch(pd.Series(vals, dtype=object)) is None


def test_flat_big_endian_falls_back():
    le = W.dumps(Geom("LineString", [(0.0, 0.0), (1.0, 1.0)]))
    be = b"\x00" + struct.pack(">II", 2, 0)
    assert flat_coords_batch(pd.Series([le, be], dtype=object)) is None


def test_flat_z_linestring_falls_back():
    # 3-D records have 24-byte vertices: the 2-D length check must reject
    z = struct.pack("<BII", 1, 0x80000002, 2) + struct.pack("<dddddd", 1, 2, 3, 4, 5, 6)
    assert flat_coords_batch(pd.Series([z], dtype=object)) is None


def test_flat_truncated_polygon_falls_back():
    good = W.dumps(Geom("Polygon", [[(0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (0.0, 0.0)]]))
    assert flat_coords_batch(pd.Series([good[:-8]], dtype=object)) is None


def test_gather_f8_all_phases():
    from datafusion_spatial_spark.functions._fastpath import _gather_f8

    vals = [float(i) for i in range(16)]
    for pad in range(8):
        buf = b"\x07" * pad + struct.pack("<16d", *vals)
        off = np.array([pad + 8 * i for i in range(16)], dtype=np.int64)
        got = _gather_f8(buf, off)
        assert got.tolist() == vals


def test_bbox_fastpath_excludes_nan_vertices():
    """r7 review fix: the reduceat fast path must EXCLUDE NaN vertices
    (EMPTY members inside a multi-geometry) exactly like the per-row
    wkb.bbox slow path — np.minimum propagates NaN, np.fmin skips it."""
    from datafusion_spatial_spark.functions.scalar import _wkb_bbox_udf

    nan = float("nan")
    vals = [
        W.dumps(Geom("MultiPoint", [(nan, nan), (1.0, 1.0)])),
        W.dumps(Geom("MultiPoint", [(2.0, 3.0)])),
        W.dumps(Geom("MultiPoint", [(nan, nan)])),  # all-NaN -> null bbox
    ]
    out = _wkb_bbox_udf.func(pd.Series(vals, dtype=object))
    assert tuple(out.iloc[0]) == (1.0, 1.0, 1.0, 1.0)
    assert tuple(out.iloc[1]) == (2.0, 3.0, 2.0, 3.0)
    assert out.iloc[2].isna().all()


def _flatten_any(g):
    if g.type_name == "Polygon":
        return [p for ring in g.coords for p in ring]
    if g.type_name == "MultiLineString":
        return [p for part in g.coords for p in part]
    if g.type_name == "MultiPolygon":
        return [p for poly in g.coords for ring in poly for p in ring]
    return list(g.coords)


def _check_parity_any(vals):
    s = pd.Series(vals, dtype=object)
    out = flat_coords_batch(s)
    assert out is not None
    xs, ys, counts = out
    pos = 0
    for v, c in zip(vals, counts):
        if v is None:
            assert c == 0
            continue
        exp = _flatten_any(W.loads(bytes(v)))
        assert c == len(exp)
        for ex, ey in exp:
            assert xs[pos] == ex and ys[pos] == ey
            pos += 1
    assert pos == len(xs)


def test_flat_multilinestring_parity():
    """r9d: gtype 5 vertex streams — multi parts, degenerate 1-vertex
    part, EMPTY, null."""
    vals = [
        W.dumps(Geom("MultiLineString",
                     [[(0.0, 0.0), (1.0, 1.0)], [(5.0, 5.0), (6.0, 5.0), (7.0, 8.0)]])),
        W.dumps(Geom("MultiLineString", [[(2.5, -1.5)]])),
        W.dumps(Geom("MultiLineString", [])),
        None,
        W.dumps(Geom("MultiLineString", [[(9.0, 9.0), (10.0, 10.0)]])),
    ]
    _check_parity_any(vals)


def test_flat_multipolygon_parity_incl_holes():
    """r9d: gtype 6 vertex streams — members with holes, EMPTY, null."""
    shell = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
    hole = [(1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0), (1.0, 1.0)]
    far = [(10.0, 10.0), (12.0, 10.0), (12.0, 12.0), (10.0, 10.0)]
    vals = [
        W.dumps(Geom("MultiPolygon", [[shell, hole], [far]])),
        W.dumps(Geom("MultiPolygon", [[far]])),
        W.dumps(Geom("MultiPolygon", [])),
        None,
    ]
    _check_parity_any(vals)


def test_bbox_udf_multi_batches(spark):
    """st_bbox rides the new gtype 5/6 flat streams — parity with the
    per-row wkb.bbox slow path."""
    from datafusion_spatial_spark.functions.scalar import st_bbox
    from datafusion_spatial_spark.meta import GeometryMeta

    geoms = [
        Geom("MultiLineString", [[(0.0, 0.0), (1.0, 2.0)], [(-3.0, 5.0), (4.0, -1.0)]]),
        Geom("MultiPolygon", [[[(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 0.0)]],
                              [[(5.0, 5.0), (7.0, 5.0), (7.0, 9.0), (5.0, 5.0)]]]),
    ]
    m = GeometryMeta(encoding="WKB", geometry_types=("MultiLineString",))
    for g in geoms:
        df = spark.createDataFrame(
            [(bytearray(W.dumps(g)),)] * 3, "geom binary"
        )
        row = df.select(st_bbox("geom", m).alias("b")).collect()[0].b
        from datafusion_spatial_spark import wkb as _w
        exp = _w.bbox(g)
        assert (row.xmin, row.ymin, row.xmax, row.ymax) == exp
