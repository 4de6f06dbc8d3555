"""r16 kNN loop restructure: loop control rides the pending checkpoint as
observed metrics, and the LAST round skips both the count/stats and the
eager materialization (its stats are never consulted; an all-resolved
final round just makes the unresolved-tail join empty). These tests pin
the exact paths that restructure touched, for both loop variants:

* a candidate seen in the final round but NOT resolved -> emitted with
  resolved = False (the tail join must stay non-empty),
* resolution happening exactly IN the final round -> no phantom tail,
* max_rounds = 1 (no observation ever created).
"""

import pytest
from pyspark.sql import functions as F

from datafusion_spatial_spark.meta import GeometryMeta
from datafusion_spatial_spark.functions.scalar import st_point
from datafusion_spatial_spark.operators.spatial_knn import (
    knn_join,
    knn_join_geography,
)

PT = GeometryMeta(encoding="point", geometry_types=("Point",))


def pts(spark, prefix, coords):
    rows = [(i, float(x), float(y)) for i, (x, y) in enumerate(coords)]
    return spark.createDataFrame(
        rows, f"{prefix}_id long, x double, y double"
    ).select(f"{prefix}_id", st_point("x", "y").alias("g"))


def test_planar_unresolved_tail_nonempty(spark):
    # k=2; neighbors at 1.5 and 100. radius 1, 2 rounds -> final ring r=2
    # sees only the near neighbor (1 < k) => unresolved, must be emitted
    lf = pts(spark, "l", [(0, 0)])
    rf = pts(spark, "r", [(1.5, 0), (100, 0)])
    got = knn_join(
        lf, rf, "g", "g", PT, PT, "l_id", "r_id", k=2, radius=1.0,
        max_rounds=2,
    ).collect()
    assert len(got) == 1
    assert got[0].resolved is False and got[0].r_id == 0
    assert abs(got[0].distance - 1.5) < 1e-12


def test_planar_resolved_in_final_round_no_phantom_tail(spark):
    # k=1; neighbor at 1.5 resolves exactly in round 2 (r=2) -> one row,
    # resolved True, and no duplicate from the tail join
    lf = pts(spark, "l", [(0, 0)])
    rf = pts(spark, "r", [(1.5, 0)])
    got = knn_join(
        lf, rf, "g", "g", PT, PT, "l_id", "r_id", k=1, radius=1.0,
        max_rounds=2,
    ).collect()
    assert len(got) == 1 and got[0].resolved is True
    assert abs(got[0].distance - 1.5) < 1e-12


def test_planar_single_round(spark):
    lf = pts(spark, "l", [(0, 0)])
    rf = pts(spark, "r", [(0.5, 0), (3.0, 0)])
    got = knn_join(
        lf, rf, "g", "g", PT, PT, "l_id", "r_id", k=1, radius=1.0,
        max_rounds=1,
    ).collect()
    assert len(got) == 1 and got[0].resolved is True
    assert got[0].r_id == 0


def test_geography_unresolved_tail_and_final_round(spark):
    # ~111 km per lat degree at lon 0: neighbor at 1.2 deg (~133 km) and
    # at 30 deg. radius 60 km, 2 rounds -> final ring 120 km misses both
    # k=2 neighbors; the near one is a candidate at ring 2? No: 133 km >
    # 120 km pad -> no candidate, empty output. Use 1.0 deg (~111 km):
    # ring 2 (120 km) sees it; k=2 unresolved -> resolved=False row.
    lf = pts(spark, "l", [(0, 0)])
    rf = pts(spark, "r", [(0, 1.0), (0, 30.0)])
    got = knn_join_geography(
        lf, rf, "g", "g", PT, PT, "l_id", "r_id", k=2, radius_m=60_000.0,
        max_rounds=2,
    ).collect()
    assert len(got) == 1
    assert got[0].resolved is False and got[0].r_id == 0
    # resolves exactly in the final round with k=1
    got2 = knn_join_geography(
        lf, rf, "g", "g", PT, PT, "l_id", "r_id", k=1, radius_m=60_000.0,
        max_rounds=2,
    ).collect()
    assert len(got2) == 1 and got2[0].resolved is True
    assert got2[0].r_id == 0


def test_geography_all_null_left(spark):
    lf = spark.createDataFrame([(0,)], "l_id long").select(
        "l_id", F.lit(None).cast(
            pts(spark, "x", [(0, 0)]).schema["g"].dataType
        ).alias("g")
    )
    rf = pts(spark, "r", [(0, 1.0)])
    got = knn_join_geography(
        lf, rf, "g", "g", PT, PT, "l_id", "r_id", k=1, radius_m=60_000.0,
        max_rounds=3,
    ).collect()
    assert got == []
