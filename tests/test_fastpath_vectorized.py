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


def test_mixed_record_lengths_fall_back():
    z = struct.pack("<BIddd", 1, 0x80000001, 1, 2, 3)
    assert point_xy_batch(pd.Series([_pt(1, 2), z], dtype=object)) is None


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
