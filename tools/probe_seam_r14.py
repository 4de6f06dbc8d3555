#!/usr/bin/env python
"""Geography-join antimeridian seam probe (r14, follows the seam fix).

Deterministically generates lon/lat points clustered around ±180° at mid
latitudes (spark.range — no driver data), self-joins within 1 km at
1x/10x/30x row counts, and records: wall medians, the seam legs'
presence in the plan (Union), pair counts, and the wall exponent. The
point: the seam legs must stay boundary-strip-sized — cost grows with
the data, not with the square of the seam population.
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

SIDES = [("t1", 100_000), ("t10", 1_000_000), ("t30", 3_000_000)]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from datafusion_spatial_spark.meta import GeometryMeta
    from datafusion_spatial_spark.operators.spatial_join import (
        spatial_join_geography,
    )
    from datafusion_spatial_spark.session import get_spark

    spark = get_spark(app_name="probe_seam_r14")
    pm = GeometryMeta(encoding="point", geometry_types=("Point",))

    def pts(n, salt):
        # lon wrapped uniformly into [178, 182) -> [-180, 180); lat 30-40
        base = spark.range(n).select(
            F.col("id"),
            (F.pmod(
                F.lit(178.0)
                + F.pmod(F.xxhash64(F.col("id") + salt), 40000) / 10000.0
                + F.lit(180.0), F.lit(360.0),
            ) - F.lit(180.0)).alias("x"),
            (F.lit(30.0)
             + F.pmod(F.xxhash64(F.col("id") * 3 + salt), 100000) / 10000.0
             ).alias("y"),
        )
        return base.select(
            "id", F.struct(F.col("x"), F.col("y")).alias("geom")
        )

    out: dict = {"rounds": args.rounds, "method": "generated near-seam band"}
    res: dict = {}
    for side, n in SIDES:
        a = pts(n, F.lit(1))
        b = pts(n, F.lit(2))
        j = spatial_join_geography(
            a, b, "geom", "geom", pm, pm, "id", "id", 1_000.0
        )
        q = j.agg(F.count("*").alias("pairs"))
        n_pairs = q.collect()[0]["pairs"]  # warmup
        plan = q._jdf.queryExecution().executedPlan().toString()
        samples = []
        for r in range(args.rounds):
            t0 = time.perf_counter()
            spatial_join_geography(
                pts(n, F.lit(1)), pts(n, F.lit(2)),
                "geom", "geom", pm, pm, "id", "id", 1_000.0,
            ).agg(F.count("*")).collect()
            samples.append(round(time.perf_counter() - t0, 3))
            print(f"{side} r{r}: {samples[-1]}s pairs={n_pairs}", flush=True)
        res[side] = {
            "rows_per_side": n,
            "pairs": n_pairs,
            "samples_sec": samples,
            "median_sec": round(statistics.median(samples), 3),
            "seam_unions_in_plan": plan.count("Union"),
        }
    m1, m30 = res["t1"]["median_sec"], res["t30"]["median_sec"]
    out["sides"] = res
    out["alpha_1_30"] = round(math.log(m30 / m1) / math.log(30), 3)
    # pairs scale ~n^2 * (radius/band area) — per-pair cost must not
    p1, p30 = res["t1"]["pairs"], res["t30"]["pairs"]
    out["pairs_ratio_30"] = round(p30 / max(1, p1), 1)
    with open(os.path.join(REPO, ".scale", "probe_seam_r14.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["sides"]["t30"]), "alpha:", out["alpha_1_30"])
    spark.stop()


if __name__ == "__main__":
    main()
