"""Spatial-join skew stress: a synthetic hot cell (≥30% of all rows in ONE
grid cell) must trigger AQE's skew-join split, and the join's wall time must
stay bounded relative to a uniform dataset of the same size.

This demonstrates (rather than asserts in comments) the claim in
operators/spatial_join.py that "hot cells split via AQE": the only shuffle
keys on the grid cell id, so data skew concentrates in one shuffle
partition, which AQE then splits across tasks.
"""

import time
from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

from datafusion_spatial_spark.functions.scalar import st_point
from datafusion_spatial_spark.meta import GeometryMeta
from datafusion_spatial_spark.operators.spatial_join import spatial_join

PT = GeometryMeta(encoding="point", geometry_types=("Point",))
CELL = 1.0
N = 40_000
HOT_FRAC = 0.3  # 12k of 40k rows inside one cell


@contextmanager
def _confs(spark, settings: dict):
    old = {}
    for k, v in settings.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _points(spark, hot: bool):
    """40k points over a 100x100-cell extent; hot=True concentrates 30% of
    them inside cell (0,0) (same join semantics, massively skewed cell)."""
    n_hot = int(N * HOT_FRAC) if hot else 0
    # hash-based pseudo-random positions (a modular lattice would create
    # accidental near-pair structure in the uniform control)
    ux = F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1_000_000)) / 1_000_000.0
    uy = F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1_000_000)) / 1_000_000.0
    df = spark.range(N).select(
        "id",
        F.when(F.col("id") < n_hot, ux * CELL).otherwise(ux * 100.0).alias("x"),
        F.when(F.col("id") < n_hot, uy * CELL).otherwise(uy * 100.0).alias("y"),
    )
    # break lineage so both datasets enter the join as materialized rows
    return df.select("id", st_point("x", "y").alias("g")).localCheckpoint()


def _run(spark, df):
    out = spatial_join(
        df, df, "g", "g", PT, PT, "id", "id",
        cell_size=CELL, predicate="dwithin", distance=0.02,
    )
    t0 = time.perf_counter()
    # collect() (not count()) so the final ADAPTIVE plan we inspect below
    # belongs to this very execution
    n = len(out.collect())
    return time.perf_counter() - t0, n, out


def test_hot_cell_triggers_aqe_skew_split_and_stays_bounded(spark):
    settings = {
        # keep the candidate join a shuffle join (broadcast would hide the
        # skew entirely — at 100 TB neither side is broadcastable)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # scale AQE's skew thresholds down to test-data sizes (defaults are
        # 256 MB partitions — the same RATIOS the defaults encode at scale)
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "8KB",
    }
    with _confs(spark, settings):
        uniform = _points(spark, hot=False)
        hotdf = _points(spark, hot=True)

        t_uniform, n_uniform, _ = _run(spark, uniform)
        t_hot, n_hot, out_hot = _run(spark, hotdf)

        # AQE really split the hot partition: the FINAL adaptive plan marks
        # the shuffle join with skew=true
        plan = out_hot._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:4000]

        # more pairs fall out of the hot cell by construction: the 12k
        # clustered points in one unit cell yield ~180k within-radius
        # ordered pairs, while the uniform spread over 10^4 cells yields
        # essentially only the N self-pairs
        assert n_uniform < 1.01 * N
        assert n_hot > 2 * n_uniform
        # …but wall time stays bounded: the hot cell concentrates ~144M
        # candidate comparisons in one shuffle key, and the split keeps it
        # within a generous envelope of the uniform run instead of one
        # straggler task owning all of it
        assert t_hot < max(10.0, 12.0 * t_uniform), (t_hot, t_uniform)
