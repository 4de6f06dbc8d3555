"""Storage-layout operators: partitioned & bucketed writes for shuffle-free
downstream joins/aggregations.

At 100 TB the physical layout *is* the query plan: a fact table bucketed on
its join key lets every later equi-join/groupBy on that key run with ZERO
exchange (Spark reads co-located buckets), and partition columns prune whole
directories before any IO. These helpers standardize that layout.
"""

from __future__ import annotations

import json
import os
import re as _re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _spark_glob_escape(path: str) -> str:
    """Spark/Hadoop treat read paths as globs — backslash-escape the
    metacharacters so a literal directory like ``run[1]`` reads back
    instead of matching nothing (writes are literal; only reads glob)."""
    return _re.sub(r"([*?\[\]{}\\])", r"\\\1", path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Directory-partitioned parquet: queries filtering on partition_cols
    prune at the file-listing level (visible as PartitionFilters in explain).
    """
    w = df.write.mode(mode).partitionBy(*partition_cols)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed (+optionally sorted) table. Joins/aggregations on
    ``bucket_cols`` between tables with the same bucketing skip the shuffle
    entirely; sorting additionally enables shuffle-AND-sort-free sort-merge
    joins. ``path`` makes it an external table (bypasses the static
    warehouse-dir conf)."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join_is_shuffle_free(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> bool:
    """Diagnostic: True iff a sort-merge join of the two bucketed tables on
    ``on`` needs no shuffle exchange (the whole point of bucketing). The
    MERGE hint rules out broadcast, which would trivially have no shuffle
    on tiny test data."""
    df = (
        spark.table(left_table)
        .hint("merge")
        .join(spark.table(right_table), on)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan


# ---------------------------------------------------------------------------
# Spatial layout: Hilbert-clustered writes + pruned scans
#
# At 100 TB the only way to make a window query cheap is to never read the
# rest of the planet: (1) directory-partition by a coarse Hilbert cell so
# file listing prunes whole regions, (2) range-partition + sort by the full
# Hilbert key so each parquet file and row group covers a tight bbox, and
# (3) stamp per-row bbox columns so min/max row-group statistics prune
# within the surviving files (PushedFilters). The scan side reproduces the
# predicate from a small layout sidecar. This is the same recipe as Delta
# OPTIMIZE ZORDER / Iceberg hilbert(...), expressed with stock Spark APIs.

_LAYOUT_FILE = "_spatial_layout.json"


def write_spatial(
    df: DataFrame,
    path: str,
    geom_col: str,
    meta,
    extent: tuple[float, float, float, float],
    level: int = 15,
    coarse_level: int = 4,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Hilbert-clustered GeoParquet-style layout.

    Rows gain ``hcell`` (coarse Hilbert directory-partition key),
    ``hkey`` (full Hilbert sort key) and ``bbox_xmin/.../bbox_ymax``
    min/max-pruning columns; data is range-partitioned and sorted by
    ``hkey`` (so writer tasks emit contiguous curve ranges — each output
    file touches few directories and covers a tight spatial extent), then
    written ``partitionBy(hcell)``. ``extent`` is the fixed world bounds of
    the layout (queries outside it still work — keys clamp to the border
    cells, correctness comes from the bbox columns).

    The layout parameters are persisted in a ``_spatial_layout.json``
    sidecar next to the data (local filesystem; on an object store this
    would go through the Hadoop FS API — same pattern as Delta's
    ``_delta_log``).

    Scan-time directory pruning is padded by the dataset's max geometry
    half-extent (recorded here), so a few huge geometries inflate every
    window's cell list — ``st_subdivide`` such rows before layout (the
    standard practice) to keep the pad tight."""
    from datafusion_spatial_spark.functions.indexing import with_hilbert_key

    from datafusion_spatial_spark.functions.scalar import st_bbox

    shift = 2 * (level - coarse_level)
    out = (
        # materialize the bbox struct once (one UDF call for WKB inputs) and
        # hand it to with_hilbert_key via bbox_col=, so the flat pruning
        # columns AND the key share a single geometry decode; the key uses
        # the codegen bulk form (with_hilbert_key), not the interpreted HOF
        # fold
        with_hilbert_key(
            df.withColumn("__bbox", st_bbox(geom_col, meta)),
            geom_col, meta, extent, level, bbox_col="__bbox",
        )
        .withColumn("hcell", F.shiftrightunsigned(F.col("hkey"), shift))
        .withColumn("bbox_xmin", F.col("__bbox.xmin"))
        .withColumn("bbox_ymin", F.col("__bbox.ymin"))
        .withColumn("bbox_xmax", F.col("__bbox.xmax"))
        .withColumn("bbox_ymax", F.col("__bbox.ymax"))
        .drop("__bbox")
    )
    n = num_files or max(1, df.sparkSession.sparkContext.defaultParallelism)
    out = out.repartitionByRange(n, "hkey").sortWithinPartitions("hkey")
    out.write.mode(mode).partitionBy("hcell").parquet(path)
    # The Hilbert key places each geometry at its bbox CENTER, so a window
    # scan's covering-cell list must be padded by the largest half-extent
    # in the dataset or a big geometry centered outside the window could be
    # directory-pruned away while its bbox still overlaps. Record it (one
    # cheap agg over the just-written columns; 0 for points).
    # an EMPTY input writes only _SUCCESS (no part files), so a read-back
    # could not infer a schema; the layout is still valid — zero rows need
    # zero pad. Probe for part files explicitly instead of catching the
    # read's exception: a bare except here would also swallow transient
    # IO/footer errors on NON-empty data and stamp max_half_* = 0.0, after
    # which spatial_scan under-pads its covering and silently drops large
    # geometries (r8 advice fix).
    import glob as _glob

    # glob.escape: a path containing glob metacharacters ('run[1]') must
    # not be treated as a pattern — an unescaped miss here would stamp
    # zero pads on non-empty data, the exact silent-wrongness this probe
    # exists to prevent
    part_files = _glob.glob(
        os.path.join(_glob.escape(path), "**", "part-*"), recursive=True
    )
    if part_files:
        halves = (
            df.sparkSession.read.parquet(_spark_glob_escape(path))
            .agg(
                F.max((F.col("bbox_xmax") - F.col("bbox_xmin")) / 2.0),
                F.max((F.col("bbox_ymax") - F.col("bbox_ymin")) / 2.0),
            )
            .collect()[0]
        )
    else:
        halves = (0.0, 0.0)
    with open(os.path.join(path, _LAYOUT_FILE), "w") as f:
        json.dump(
            {
                "geom_col": geom_col,
                "extent": list(extent),
                "level": level,
                "coarse_level": coarse_level,
                "max_half_w": float(halves[0] or 0.0),
                "max_half_h": float(halves[1] or 0.0),
            },
            f,
        )


def spatial_scan(
    spark: SparkSession,
    path: str,
    window: tuple[float, float, float, float],
    refine_meta=None,
) -> DataFrame:
    """Window scan over a ``write_spatial`` layout: directory pruning via
    the coarse-cell IN-list (PartitionFilters), row-group pruning via the
    bbox min/max columns (PushedFilters), bbox-overlap semantics.

    The bbox filter is exact for points. For non-point geometries pass
    ``refine_meta`` (the layout column's GeometryMeta) to append the exact
    ``st_intersects`` against the window rectangle — the standard
    filter-then-refine: the predicate UDF only ever sees the pruned
    bbox-surviving rows."""
    from datafusion_spatial_spark.functions.indexing import hilbert_covering_cells

    with open(os.path.join(path, _LAYOUT_FILE)) as f:
        layout = json.load(f)
    wxmin, wymin, wxmax, wymax = (float(v) for v in window)
    # pad the cell-covering window by the dataset's max half-extent: keys
    # sit at bbox centers, so this is what makes the directory prune safe
    # for non-point geometries (the bbox columns then filter exactly)
    pw = float(layout.get("max_half_w", 0.0))
    ph = float(layout.get("max_half_h", 0.0))
    cells = hilbert_covering_cells(
        (wxmin - pw, wymin - ph, wxmax + pw, wymax + ph),
        tuple(layout["extent"]), layout["coarse_level"],
    )
    df = spark.read.parquet(_spark_glob_escape(path))
    out = df.filter(
        F.col("hcell").isin(cells)
        & (F.col("bbox_xmin") <= wxmax)
        & (F.col("bbox_xmax") >= wxmin)
        & (F.col("bbox_ymin") <= wymax)
        & (F.col("bbox_ymax") >= wymin)
    )
    if refine_meta is not None:
        from datafusion_spatial_spark import wkb
        from datafusion_spatial_spark.functions.predicates import st_intersects
        from datafusion_spatial_spark.meta import GeometryMeta

        ring = [
            (wxmin, wymin), (wxmax, wymin), (wxmax, wymax),
            (wxmin, wymax), (wxmin, wymin),
        ]
        wbytes = wkb.dumps(wkb.Geom("Polygon", [ring]))
        out = out.filter(
            st_intersects(
                layout["geom_col"],
                F.lit(wbytes),
                refine_meta,
                GeometryMeta(encoding="WKB"),
            )
        )
    return out
