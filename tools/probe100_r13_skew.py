#!/usr/bin/env python
"""Round-13 grid-spatial-join SKEW probe (VERDICT r12 #8).

The grid join's docstring claims "hot cells split via AQE"; a pytest
(test_spatial_join_skew.py) demonstrates the split at one size, but no
probe showed the claim HOLDS ACROSS SCALE. This probe grows a skewed
FACT side (50% of all points inside ONE grid cell) 1x/30x/100x against
a FIXED dimension side (100k uniform points — the fact x dim shape
where candidate pairs stay linear in the fact side and the skew is
purely a shuffle-balance problem, exactly AQE skew-split's case). A
growing hot cell on BOTH sides is intrinsically quadratic in candidates
— no skew mitigation can fix O(n_hot^2) semantics, only density-adaptive
cell sizing can — so that shape is out of scope here by design.

Records per scale: median wall time, output rows (must scale ~linearly),
the final ADAPTIVE plan's skew=true marker at 100x, and the wall-time
exponents alpha(30->100) and alpha(1->100), which must stay < 1.

Broadcast is disabled (at 100 TB neither side of a fact join is
broadcastable) and AQE skew thresholds scale down to probe data sizes
at the same RATIOS the defaults encode, mirroring the pytest.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CELL = 1.0
EXTENT = 100.0  # 100x100 cells
BASE_N = 100_000
DIM_N = 100_000
SIDES = [("t01", 1), ("t30", 30), ("t100", 100)]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from datafusion_spatial_spark.functions.scalar import st_point
    from datafusion_spatial_spark.meta import GeometryMeta
    from datafusion_spatial_spark.operators.spatial_join import spatial_join
    from datafusion_spatial_spark.session import get_spark

    PT = GeometryMeta(encoding="point", geometry_types=("Point",))
    spark = get_spark(app_name="probe100_r13_skew")
    for k, v in {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8MB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4MB",
    }.items():
        spark.conf.set(k, v)

    def skewed_points(n):
        """n fact points: 50% inside grid cell (0,0), rest uniform."""
        ux = F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1_000_000)) / 1e6
        uy = F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1_000_000)) / 1e6
        df = spark.range(n).select(
            "id",
            F.when(F.col("id") % 2 == 0, ux * CELL)
            .otherwise(ux * EXTENT).alias("x"),
            F.when(F.col("id") % 2 == 0, uy * CELL)
            .otherwise(uy * EXTENT).alias("y"),
        )
        return df.select("id", st_point("x", "y").alias("g"))

    def dim_points():
        ux = F.pmod(F.xxhash64("id", F.lit(7)), F.lit(1_000_000)) / 1e6
        uy = F.pmod(F.xxhash64("id", F.lit(8)), F.lit(1_000_000)) / 1e6
        return spark.range(DIM_N).select(
            F.col("id").alias("zid"),
            st_point(ux * EXTENT, uy * EXTENT).alias("g"),
        )

    dim = dim_points().localCheckpoint()

    def q(mult):
        fact = skewed_points(BASE_N * mult)
        return spatial_join(
            fact, dim, "g", "g", PT, PT, "id", "zid",
            cell_size=CELL, predicate="dwithin", distance=0.05,
        )

    outputs = {}
    for side, mult in SIDES:  # warmup + row counts
        t0 = time.perf_counter()
        out = q(mult)
        n = len(out.select("id").collect())
        outputs[side] = {"rows": n, "warmup_sec": round(
            time.perf_counter() - t0, 3)}
        print(f"warmup {side}: rows {n}", flush=True)
    plan = (
        q(SIDES[2][1]).select("id")
    )
    plan.collect()
    final_plan = plan._jdf.queryExecution().executedPlan().toString()
    skew_marker = "skew=true" in final_plan
    plans_dir = os.path.join(REPO, ".scale", "plans100_r13")
    os.makedirs(plans_dir, exist_ok=True)
    with open(os.path.join(plans_dir, "spatial_join_skew.txt"), "w") as f:
        f.write(final_plan)

    samples = {s: [] for s, _ in SIDES}
    for r in range(args.rounds):
        for side, mult in SIDES:
            t0 = time.perf_counter()
            q(mult).select("id").collect()
            dt = time.perf_counter() - t0
            samples[side].append(round(dt, 4))
            print(f"round {r} {side}: {dt:.3f}s", flush=True)

    med = {s: statistics.median(samples[s]) for s, _ in SIDES}
    out = {
        "rounds": args.rounds,
        "method": "interleaved",
        "shape": "skewed fact (50% in one cell) x fixed 100k dim",
        "samples": samples,
        "medians": {k: round(v, 4) for k, v in med.items()},
        "outputs": outputs,
        "skew_split_in_final_plan_t100": skew_marker,
        "segment_alpha_30_100": round(
            math.log(med["t100"] / med["t30"]) / math.log(100 / 30), 3
        ),
        "full_alpha_1_100": round(
            math.log(med["t100"] / med["t01"]) / math.log(100), 3
        ),
    }
    print(json.dumps(out["medians"]), "seg", out["segment_alpha_30_100"],
          "full", out["full_alpha_1_100"], "skew", skew_marker, flush=True)
    with open(os.path.join(REPO, ".scale", "probe100_r13_skew.json"), "w") as f:
        json.dump(out, f, indent=1)
    try:
        spark.stop()
    except Exception:
        pass


if __name__ == "__main__":
    main()
