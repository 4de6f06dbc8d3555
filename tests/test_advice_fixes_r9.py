"""Pins for the round-9 advice fixes (ADVICE r8).

1. subdivide() passes degenerate (single-vertex) LineString parts through
   unchanged instead of silently dropping the row (PostGIS returns
   unsplittable inputs as-is; previously the <2-vertex chunk filter
   filtered the piece list down to nothing).
2. asof_join carries a deterministic payload even when two right rows at
   identical (key, ts) tie on every ORDERABLE payload field but differ in
   an unorderable (map) one — a to_json/xxhash64 surrogate is the final
   tie-break term.
3. _q_write_roundtrip cleans its scratch dir after materialization:
   replaying the gate twice leaves no per-run scratch behind.
4. scale_audit's q_spatial_grid_join series audits the plain grid SQL
   (not the r8 composite), keeping the timing series comparable; the
   composite is recorded under its own name.
"""

from __future__ import annotations

import pytest

import datetime
import os

from pyspark.sql import functions as F

from datafusion_spatial_spark.geom_ops import Geom, subdivide
from datafusion_spatial_spark.operators.asof import asof_join


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def test_subdivide_single_vertex_linestring_passes_through():
    g = Geom("LineString", [(1.0, 2.0)])
    out = subdivide(g, 16)
    assert len(out) == 1
    assert out[0].type_name == "LineString"
    assert out[0].coords == [(1.0, 2.0)]


def test_subdivide_multiline_with_degenerate_part_keeps_it():
    g = Geom(
        "MultiLineString",
        [[(0.0, 0.0), (1.0, 0.0), (2.0, 0.0)], [(5.0, 5.0)]],
        has_z=False,
        srid=3857,
    )
    out = subdivide(g, 16)
    # the 3-vertex part yields one piece, the degenerate part survives
    assert len(out) == 2
    assert [(5.0, 5.0)] in [p.coords for p in out]
    assert all(p.srid == 3857 for p in out)


def test_asof_join_partial_tie_on_map_column_is_deterministic(spark):
    left = spark.createDataFrame(
        [(1, "k", _ts("2024-01-01 10:00:00"))], "id int, k string, ts timestamp"
    )
    # identical (key, ts) AND identical orderable field v; only the map
    # differs -> pre-fix the carried props was whatever Spark sorted last
    right = spark.createDataFrame(
        [
            ("k", _ts("2024-01-01 09:00:00"), {"a": 1}, 100),
            ("k", _ts("2024-01-01 09:00:00"), {"b": 2}, 100),
        ],
        "k string, ts timestamp, props map<string,int>, v int",
    )
    results = set()
    for rep in range(3):
        row = asof_join(
            left.repartition(4 + rep),
            right.repartition(3 + rep),
            "k",
            "ts",
            "ts",
            ["props", "v"],
        ).collect()[0]
        results.add(frozenset(row["props_asof"].items()))
    assert len(results) == 1


@pytest.mark.slow
def test_write_roundtrip_scratch_cleaned(spark):
    import tempfile

    import __spark_entry__ as entry_mod

    sf_dir = "/root/testdata/sf0.001"
    root = os.path.join(tempfile.gettempdir(), "spark_graft_gates")
    for _ in range(2):
        df = entry_mod.queries()["q_write_roundtrip"](spark, sf_dir)
        assert df.count() >= 2  # materialized read-back rows
    if os.path.isdir(root):
        leftover = [
            d for d in os.listdir(root)
            if d.endswith("-%d" % os.getpid())
        ]
        assert leftover == []


def test_scale_audit_series_names():
    import tools.scale_audit as sa

    qs = sa.extra_queries()
    assert "q_spatial_grid_join" in qs
    assert "q_sql_spatial_composite" in qs
