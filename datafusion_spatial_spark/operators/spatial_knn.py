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
    for _ in range(max_rounds):
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
        # ``isEmpty()`` action.
        pobs = Observation()
        pending = (
            pending.join(done_ids, "__lid", "left_anti")
            .observe(pobs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        best = topk  # last round's partial results for the unresolved tail
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
        geo_side_stats,
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
    # Setup is fused the same way when the two sides are union-compatible
    # (same id/geom storage types and geometry encoding): ONE side-tagged
    # union checkpoint carries both sides' stats in a single observation —
    # both input scans run concurrently in one job instead of a serial
    # lp-materialization + right-stats collect (the r15 stats-fusion
    # argument, applied to the kNN prologue). Incompatible sides keep the
    # two-action path.
    STAT_KEYS = ("mx", "sp", "top", "bot", "xe", "xw", "n")
    fuse = (
        left.schema[left_id].dataType == right.schema[right_id].dataType
        and left.schema[left_geom].dataType
        == right.schema[right_geom].dataType
        and left_meta.encoding == right_meta.encoding
    )
    if fuse:
        lobs = Observation()
        lsel = left.select(
            F.col(left_id).alias("__kid"),
            F.col(left_geom).alias("__kg"),
            F.lit(0).alias("__kside"),
        ).filter(F.col("__kg").isNotNull())  # see knn_join (left only)
        rsel = right.select(
            F.col(right_id).alias("__kid"),
            F.col(right_geom).alias("__kg"),
            F.lit(1).alias("__kside"),
        )
        side = F.col("__kside")
        u = (
            lsel.unionByName(rsel)
            .observe(
                lobs,
                *geo_stat_observe_aggs(
                    "__kg", left_meta, max_abs_lat, where=side == 0
                ),
                *geo_stat_observe_aggs(
                    "__kg", right_meta, max_abs_lat,
                    where=side == 1, suffix="_r",
                ),
            )
            .localCheckpoint(eager=True)
        )
        lp = u.filter(side == 0).select(
            F.col("__kid").alias("__lid"), F.col("__kg").alias("__lg")
        )
        rp = u.filter(side == 1).select(
            F.col("__kid").alias("__rid"), F.col("__kg").alias("__rg")
        )
        m = lobs.get
        pstats = _geo_stats_finalize({k: m[k] for k in STAT_KEYS})
        rstats = _geo_stats_finalize({k: m[k + "_r"] for k in STAT_KEYS})
    else:
        lobs = Observation()
        lp = (
            left.select(
                F.col(left_id).alias("__lid"), F.col(left_geom).alias("__lg")
            )
            .filter(F.col("__lg").isNotNull())  # see knn_join
            .observe(
                lobs, *geo_stat_observe_aggs("__lg", left_meta, max_abs_lat)
            )
            .localCheckpoint(eager=True)
        )
        rp = right.select(
            F.col(right_id).alias("__rid"), F.col(right_geom).alias("__rg")
        ).localCheckpoint(eager=False)

        # r15 optimization: the geography join's per-side stats scans used
        # to run INSIDE it every round — the loop-invariant right side
        # (the full corpus at scale) was re-scanned per round. One job.
        rstats = geo_side_stats(rp, "__rg", right_meta, max_abs_lat)
        pstats = _geo_stats_finalize(lobs.get)

    pending = lp
    resolved_parts: list[DataFrame] = []
    r = float(radius_m)
    best = None
    for _ in range(max_rounds):
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
        pobs = Observation()
        pending = (
            pending.join(done_ids, "__lid", "left_anti")
            .observe(
                pobs, *geo_stat_observe_aggs("__lg", left_meta, max_abs_lat)
            )
            .localCheckpoint(eager=True)
        )
        pstats = _geo_stats_finalize(pobs.get)
        best = topk
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
