"""Distributed spatial clustering (PostGIS ST_ClusterWithin /
ST_ClusterDBSCAN as set-level operators).

PostGIS exposes these as window/aggregate functions that materialize the
whole partition on one node; at 100 TB that is the wrong shape. Here both
are compositions of two already-scale-proven pieces:

1. neighbor pairs from the grid-bucketed spatial join
   (``operators/spatial_join.py`` — canonical-cell dedup, no payload
   re-exchange), and
2. component labels from min-label + path-halving connected components
   (``operators/dedup.py`` — localCheckpoint-truncated lineage).

Everything between is plain Catalyst joins/aggregations, so the plan
scales with the cluster instead of a window buffer.

Reference parity note: the reference engine has no clustering surface at
all (README.md roadmap stops at predicates/measures) — this is
parity-plus for PostGIS users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datafusion_spatial_spark.meta import GeometryMeta
from datafusion_spatial_spark.operators.dedup import connected_components
from datafusion_spatial_spark.operators.spatial_join import (
    estimate_cell_size,
    spatial_join,
)


def _with_ids(df: DataFrame, id_col: str | None) -> DataFrame:
    """Attach a ``__cid`` row id. With a caller-provided unique id column
    it's a cheap alias; otherwise ``monotonically_increasing_id`` — which
    is only recompute-stable for plain scans, so the lazy localCheckpoint
    pins the assignment and the self-join sides and the final label join
    agree (NOTES_r3)."""
    if id_col is not None:
        return df.withColumn("__cid", F.col(id_col))
    return df.withColumn(
        "__cid", F.monotonically_increasing_id()
    ).localCheckpoint(eager=False)


def _neighbor_pairs(
    work: DataFrame,
    geom_col: str,
    meta: GeometryMeta,
    distance: float,
    cell_size: float | None,
) -> DataFrame:
    """Unordered (ida < idb) dwithin self-join pairs, excluding self."""
    if cell_size is None:
        cell_size = max(estimate_cell_size(work, geom_col, meta), 2.0 * distance)
    left = work.select(F.col("__cid").alias("__ida"), F.col(geom_col).alias("__ga"))
    right = work.select(F.col("__cid").alias("__idb"), F.col(geom_col).alias("__gb"))
    pairs = spatial_join(
        left, right, "__ga", "__gb", meta, meta,
        "__ida", "__idb", cell_size, "dwithin", distance,
    )
    return pairs.filter(F.col("__ida") < F.col("__idb"))


def _neighbor_pairs_geography(
    work: DataFrame,
    geom_col: str,
    meta: GeometryMeta,
    meters: float,
    cell_size_deg: float | None,
    max_abs_lat: float,
    wide_pad: str = "raise",
) -> DataFrame:
    """Unordered (ida < idb) dwithin-in-METERS self-join pairs on lon/lat
    data, excluding self — the geography analog of :func:`_neighbor_pairs`.
    Routed through :func:`spatial_join_geography`, so the antimeridian
    seam legs and polar-cap legs apply: a cluster chain crossing ±180° or
    the pole stays connected."""
    from datafusion_spatial_spark.operators.spatial_join import (
        spatial_join_geography,
    )

    left = work.select(F.col("__cid").alias("__ida"), F.col(geom_col).alias("__ga"))
    right = work.select(F.col("__cid").alias("__idb"), F.col(geom_col).alias("__gb"))
    pairs = spatial_join_geography(
        left, right, "__ga", "__gb", meta, meta,
        "__ida", "__idb", meters, cell_size_deg=cell_size_deg,
        max_abs_lat=max_abs_lat, wide_pad=wide_pad,
    )
    return pairs.filter(F.col("__ida") < F.col("__idb"))


def _label_components(
    work: DataFrame, pairs: DataFrame, out_col: str
) -> DataFrame:
    """Connected components over the neighbor pairs; singletons keep
    their own id (ST_ClusterWithin semantics)."""
    labels = connected_components(pairs, "__ida", "__idb")
    out = work.join(
        labels.select(F.col("id").alias("__cid"), F.col("component")),
        "__cid",
        "left",
    ).withColumn(out_col, F.coalesce("component", "__cid"))
    return out.drop("component", "__cid")


def cluster_within(
    df: DataFrame,
    geom_col: str,
    meta: GeometryMeta,
    distance: float,
    cell_size: float | None = None,
    id_col: str | None = None,
    out_col: str = "cluster_id",
) -> DataFrame:
    """PostGIS ST_ClusterWithin: rows whose geometries form a chain of
    hops each ≤ ``distance`` share a cluster id (the minimum row id of the
    component). Singletons keep their own id. Returns the input plus
    ``out_col``."""
    work = _with_ids(df, id_col)
    pairs = _neighbor_pairs(work, geom_col, meta, distance, cell_size)
    return _label_components(work, pairs, out_col)


def cluster_within_geography(
    df: DataFrame,
    geom_col: str,
    meta: GeometryMeta,
    meters: float,
    cell_size_deg: float | None = None,
    id_col: str | None = None,
    out_col: str = "cluster_id",
    max_abs_lat: float = 80.0,
    wide_pad: str = "raise",
) -> DataFrame:
    """ST_ClusterWithin in METERS on lon/lat data (r15, VERDICT r14 #3):
    chains measured by exact spherical distance, correct across the
    antimeridian and into the polar caps (the pair graph comes from
    :func:`spatial_join_geography`, which adds seam and cap legs as the
    data requires). Same output contract as :func:`cluster_within`.
    ``wide_pad="cross"`` opts into the exact cross-join fallback when the
    threshold is too wide for the seam slices AND the data reaches the
    seam (see :func:`spatial_join_geography`)."""
    work = _with_ids(df, id_col)
    pairs = _neighbor_pairs_geography(
        work, geom_col, meta, meters, cell_size_deg, max_abs_lat, wide_pad
    )
    return _label_components(work, pairs, out_col)


def cluster_dbscan(
    df: DataFrame,
    geom_col: str,
    meta: GeometryMeta,
    eps: float,
    min_points: int,
    cell_size: float | None = None,
    id_col: str | None = None,
    out_col: str = "cluster_id",
) -> DataFrame:
    """PostGIS ST_ClusterDBSCAN: density-based clusters.

    A row is a *core* point when at least ``min_points`` rows (itself
    included, PostGIS convention) lie within ``eps``. Clusters are the
    connected components of the core-core ≤ eps graph; non-core rows with
    a core neighbor (border points) adopt the smallest adjacent core
    cluster; everything else is noise → NULL ``out_col``."""
    work = _with_ids(df, id_col)
    # materialize the neighbor pairs ONCE: the lazy plan references them
    # from degree, border adoption and the component edges (~6 subtree
    # references), and each would re-run the grid self-join + exact
    # refine — the dominant cost (r7 review fix; same localCheckpoint
    # pattern as connected_components' edge list)
    pairs = _neighbor_pairs(work, geom_col, meta, eps, cell_size).localCheckpoint(
        eager=True
    )
    return _dbscan_from_pairs(work, pairs, min_points, out_col)


def cluster_dbscan_geography(
    df: DataFrame,
    geom_col: str,
    meta: GeometryMeta,
    eps_m: float,
    min_points: int,
    cell_size_deg: float | None = None,
    id_col: str | None = None,
    out_col: str = "cluster_id",
    max_abs_lat: float = 80.0,
    wide_pad: str = "raise",
) -> DataFrame:
    """ST_ClusterDBSCAN in METERS on lon/lat data (r15, VERDICT r14 #3):
    identical core/border/noise semantics to :func:`cluster_dbscan`, but
    ``eps_m`` is an exact spherical distance and the neighbor graph is
    seam- and polar-correct (:func:`spatial_join_geography`).
    ``wide_pad`` as in :func:`cluster_within_geography`."""
    work = _with_ids(df, id_col)
    pairs = _neighbor_pairs_geography(
        work, geom_col, meta, eps_m, cell_size_deg, max_abs_lat, wide_pad
    ).localCheckpoint(eager=True)  # see cluster_dbscan
    return _dbscan_from_pairs(work, pairs, min_points, out_col)


def _dbscan_from_pairs(
    work: DataFrame, pairs: DataFrame, min_points: int, out_col: str
) -> DataFrame:
    """DBSCAN labeling from a materialized unordered neighbor-pair list —
    shared by the planar and geography front-ends."""
    # symmetric edge list (both directions) for degree + border adoption
    sym = pairs.union(
        pairs.select(F.col("__idb").alias("__ida"), F.col("__ida").alias("__idb"))
    )
    # degree over ALL rows (zero-neighbor rows are absent from the edge
    # list but are still core when min_points == 1)
    degree = (
        work.select(F.col("__cid").alias("__ida"))
        .join(sym.groupBy("__ida").agg(F.count("*").alias("__deg")), "__ida", "left")
        .withColumn("__deg", F.coalesce("__deg", F.lit(0)))
    )
    core = degree.filter(F.col("__deg") + 1 >= min_points).select(
        F.col("__ida").alias("__core_id")
    )
    # core-core edges -> components
    cc_edges = (
        pairs.join(core.withColumnRenamed("__core_id", "__ida"), "__ida")
        .join(core.withColumnRenamed("__core_id", "__idb"), "__idb")
        .select("__ida", "__idb")
    )
    comp = connected_components(cc_edges, "__ida", "__idb").select(
        F.col("id").alias("__core_id"), F.col("component")
    )
    # isolated cores (min_points == 1 or no core neighbors) are their own cluster
    core_labels = core.join(comp, "__core_id", "left").select(
        "__core_id", F.coalesce("component", "__core_id").alias("__cluster")
    )
    # border adoption: non-core nodes take the min cluster among core neighbors
    border = (
        sym.join(
            core_labels.withColumnRenamed("__core_id", "__idb"), "__idb"
        )
        .join(core_labels.withColumnRenamed("__core_id", "__ida"), "__ida", "left_anti")
        .groupBy("__ida")
        .agg(F.min("__cluster").alias("__cluster"))
    )
    labels = core_labels.select(
        F.col("__core_id").alias("__cid"), "__cluster"
    ).union(border.select(F.col("__ida").alias("__cid"), "__cluster"))
    out = work.join(labels, "__cid", "left").withColumn(out_col, F.col("__cluster"))
    return out.drop("__cluster", "__cid")


def cluster_kmeans(
    df: DataFrame,
    geom_col: str,
    meta: GeometryMeta,
    k: int,
    id_col: str | None = None,
    seed: int = 42,
    max_iter: int = 20,
) -> DataFrame:
    """PostGIS ST_ClusterKMeans as a set-level operator: adds
    ``cluster_id`` (0..k-1) per row from k-means over the geometries' bbox
    centers.

    PostGIS runs this as a window function buffering the whole partition
    on one node; here it is Spark ML KMeans — the canonical distributed
    shape (broadcast centroids, map-side assignment, tree-aggregated
    updates), so it scales to any row count. Cluster ids are renumbered by
    ascending centroid (x, y) so results are deterministic for a fixed
    seed regardless of ML's internal centroid order. Rows with null/empty
    geometry get NULL cluster_id (PostGIS contract)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import VectorAssembler

    from datafusion_spatial_spark.functions.scalar import st_bbox

    b = st_bbox(geom_col, meta)
    work = _with_ids(df, id_col).withColumn("__bbox", b)
    feat = work.filter(F.col("__bbox").isNotNull()).withColumn(
        "__cx", (F.col("__bbox.xmin") + F.col("__bbox.xmax")) / 2.0
    ).withColumn("__cy", (F.col("__bbox.ymin") + F.col("__bbox.ymax")) / 2.0)
    asm = VectorAssembler(inputCols=["__cx", "__cy"], outputCol="__features")
    vec = asm.transform(feat)
    model = KMeans(
        k=k, seed=seed, maxIter=max_iter, featuresCol="__features",
        predictionCol="__raw_cluster",
    ).fit(vec)
    # stable renumbering: ascending centroid (x, y); ML can return fewer
    # than k centers when the data has fewer distinct points
    centers = model.clusterCenters()
    order = sorted(
        range(len(centers)), key=lambda i: (centers[i][0], centers[i][1])
    )
    remap = {raw: new for new, raw in enumerate(order)}
    mapping = F.create_map(
        *[F.lit(v) for kv in remap.items() for v in kv]
    )
    labeled = model.transform(vec).select(
        "__cid", mapping[F.col("__raw_cluster")].alias("cluster_id")
    )
    return (
        work.join(labeled, "__cid", "left")
        .drop("__bbox", "__cid")
    )


def cluster_intersecting(
    df: DataFrame,
    geom_col: str,
    meta: GeometryMeta,
    cell_size: float | None = None,
    id_col: str | None = None,
    out_col: str = "cluster_id",
) -> DataFrame:
    """PostGIS ST_ClusterIntersecting: transitive closure of the
    intersects relation. Euclidean distance 0 is exactly "intersects" for
    closed geometries, so this is ``cluster_within(distance=0)`` riding
    the same grid join + connected components."""
    return cluster_within(
        df, geom_col, meta, 0.0, cell_size=cell_size, id_col=id_col,
        out_col=out_col,
    )
