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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


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
    ``_delta_log``)."""
    from datafusion_spatial_spark.functions.indexing import with_hilbert_key

    from datafusion_spatial_spark.functions.scalar import st_bbox

    shift = 2 * (level - coarse_level)
    out = (
        # materialize the bbox struct once (one UDF call for WKB inputs),
        # then fan out to flat min/max-statistics columns; the key uses the
        # codegen bulk form (with_hilbert_key), not the interpreted HOF fold
        with_hilbert_key(
            df.withColumn("__bbox", st_bbox(geom_col, meta)),
            geom_col, meta, extent, level,
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
    with open(os.path.join(path, _LAYOUT_FILE), "w") as f:
        json.dump(
            {
                "geom_col": geom_col,
                "extent": list(extent),
                "level": level,
                "coarse_level": coarse_level,
            },
            f,
        )


def spatial_scan(
    spark: SparkSession,
    path: str,
    window: tuple[float, float, float, float],
) -> DataFrame:
    """Window scan over a ``write_spatial`` layout: directory pruning via
    the coarse-cell IN-list (PartitionFilters), row-group pruning via the
    bbox min/max columns (PushedFilters), bbox-overlap semantics. For
    non-point geometries follow with an exact ``st_intersects`` refine —
    the bbox filter is the standard conservative prefilter."""
    from datafusion_spatial_spark.functions.indexing import hilbert_covering_cells

    with open(os.path.join(path, _LAYOUT_FILE)) as f:
        layout = json.load(f)
    cells = hilbert_covering_cells(
        window, tuple(layout["extent"]), layout["level"], layout["coarse_level"]
    )
    wxmin, wymin, wxmax, wymax = (float(v) for v in window)
    df = spark.read.parquet(path)
    return df.filter(
        F.col("hcell").isin(cells)
        & (F.col("bbox_xmin") <= wxmax)
        & (F.col("bbox_xmax") >= wxmin)
        & (F.col("bbox_ymin") <= wymax)
        & (F.col("bbox_ymax") >= wymin)
    )
