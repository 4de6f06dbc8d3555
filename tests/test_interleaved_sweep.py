"""Interleaved native coords through the VECTORIZED SWEEP end-to-end
(r11, VERDICT r10 #8): `_prep` normalizes interleaved ``array<double>``
coords to separated structs JVM-side (meta.to_separated) before the
flat-offsets transport, so interleaved columns ride the same
`_native_sweep_batch` fast path as separated ones. This pins the path at
batch scale through the public API — parity interleaved ≡ separated ≡
WKB for measures and predicates — complementing test_interleaved.py's
5-row fixture scope.
"""
import random

import pytest
from pyspark.sql import functions as F

from datafusion_spatial_spark import wkb
from datafusion_spatial_spark.functions.predicates import (
    _fast_kind,
    st_area,
    st_intersects,
    st_length,
)
from datafusion_spatial_spark.meta import GeometryMeta

N = 4000


@pytest.fixture(scope="module")
def line_frames(spark):
    """One random LineString set, delivered three ways: interleaved
    native, separated native, WKB."""
    rng = random.Random(21)
    rows = []
    for i in range(N):
        k = rng.randint(2, 6)
        pts = [
            (rng.uniform(-100.0, 100.0), rng.uniform(-100.0, 100.0))
            for _ in range(k)
        ]
        rows.append((i, [[x, y] for x, y in pts],
                     [{"x": x, "y": y} for x, y in pts],
                     wkb.dumps(wkb.Geom("LineString", pts))))
    df = spark.createDataFrame(
        rows,
        "id long, il array<array<double>>, "
        "sep array<struct<x double, y double>>, wk binary",
    ).cache()
    df.count()
    return df


META_IL = GeometryMeta(
    encoding="linestring", geometry_types=("LineString",),
    coord_layout="interleaved",
)
META_SEP = GeometryMeta(
    encoding="linestring", geometry_types=("LineString",),
    coord_layout="separated",
)
META_WKB = GeometryMeta(encoding="WKB")


def test_interleaved_fast_kind_is_native():
    # the sweep gate must admit interleaved columns (to_separated runs
    # inside _prep, before the flat-offsets transport)
    assert _fast_kind(META_IL) == "native:LineString"
    assert _fast_kind(META_SEP) == "native:LineString"


def test_interleaved_measures_match_all_layouts(line_frames):
    out = line_frames.select(
        "id",
        st_length("il", META_IL).alias("l_il"),
        st_length("sep", META_SEP).alias("l_sep"),
        st_length("wk", META_WKB).alias("l_wk"),
        st_area("il", META_IL).alias("a_il"),
    ).collect()
    for r in out:
        assert r.l_il == r.l_sep == r.l_wk, r.id
        assert r.a_il == 0.0


def test_interleaved_predicates_match_all_layouts(line_frames):
    q = wkb.dumps(wkb.Geom("Polygon", [[(-50.0, -50.0), (50.0, -50.0),
                                        (50.0, 50.0), (-50.0, 50.0),
                                        (-50.0, -50.0)]]))
    lit = F.lit(q)
    out = line_frames.select(
        "id",
        st_intersects("il", lit, META_IL, META_WKB).alias("i_il"),
        st_intersects("sep", lit, META_SEP, META_WKB).alias("i_sep"),
        st_intersects("wk", lit, META_WKB, META_WKB).alias("i_wk"),
    ).collect()
    hits = 0
    for r in out:
        assert r.i_il == r.i_sep == r.i_wk, r.id
        hits += bool(r.i_il)
    assert 0 < hits < N  # both outcomes exercised


# heavy battery file: certification tier only (r15 tiering, VERDICT r14 #9)
pytestmark = pytest.mark.slow
