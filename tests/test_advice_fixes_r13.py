"""Pins for the round-13 ADVICE fixes.

1. (low) ST_SnapToGrid half-tie convention unified across encodings —
   pinned in tests/test_transforms.py::test_snaptogrid_negative_half_tie_parity.
2. (low) st_addpoint_geom position validation: pos < -1 raises at build
   time; a non-negative position past a row's line length yields NULL
   (documented deviation from PostGIS's per-row error) instead of the
   old silent append.
3. (low) st_distancespheroid non-point accuracy class surfaced in the
   docstring (doc-only).
4. (low) post-aggregate ST_NPoints reuses the scalar NaN-empty-point
   counting — pinned via the chain fuzz (tests/test_sql_chain_r13.py).
5. (low) duplicate_spans / remove_duplicate_spans collision probability
   documented with the exact-mode escape hatch (doc-only).
"""
from __future__ import annotations

import pytest

from datafusion_spatial_spark import wkb as W
from datafusion_spatial_spark.functions.accessors import st_addpoint_geom
from datafusion_spatial_spark.meta import GeometryMeta

WKB_META = GeometryMeta(encoding="WKB")


def _df(spark, line_wkt: str, pt_wkt: str):
    return spark.createDataFrame(
        [(bytearray(W.dumps(W.from_wkt(line_wkt))),
          bytearray(W.dumps(W.from_wkt(pt_wkt))))],
        "line binary, pt binary",
    )


def test_addpoint_geom_rejects_bad_literal_position(spark):
    df = _df(spark, "LINESTRING (0 0, 1 1)", "POINT (5 5)")
    with pytest.raises(ValueError, match="position must be -1"):
        st_addpoint_geom("line", "pt", WKB_META, WKB_META, position=-2)


def test_addpoint_geom_out_of_range_row_is_null(spark):
    df = _df(spark, "LINESTRING (0 0, 1 1)", "POINT (5 5)")
    out = df.select(
        st_addpoint_geom("line", "pt", WKB_META, WKB_META, position=7)
        .alias("g")
    ).collect()[0]["g"]
    assert out is None  # old behavior silently appended


def test_addpoint_geom_append_and_insert_still_work(spark):
    df = _df(spark, "LINESTRING (0 0, 1 1)", "POINT (5 5)")
    for pos, exp in (
        (-1, "LINESTRING (0 0, 1 1, 5 5)"),
        (0, "LINESTRING (5 5, 0 0, 1 1)"),
        (1, "LINESTRING (0 0, 5 5, 1 1)"),
        (2, "LINESTRING (0 0, 1 1, 5 5)"),  # pos == npoints appends
    ):
        out = df.select(
            st_addpoint_geom("line", "pt", WKB_META, WKB_META, position=pos)
            .alias("g")
        ).collect()[0]["g"]
        assert W.to_wkt(W.loads(bytes(out))) == exp, pos
