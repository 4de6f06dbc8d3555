"""Aggregate spatial functions.

``st_extent`` reproduces the reference UDAF (src/udafs/extent.rs) as a
composition of built-in min/max aggregates over a per-row bbox expression.
Catalyst plans the partial/final (map-side combine + merge) protocol itself,
which both distributes correctly at any scale and fixes the reference's two
merge bugs by construction: its ``state()`` emits ``[xmin,xmax,ymin,ymax]``
but ``merge_batch`` reads ``[xmin,ymin,xmax,ymax]`` (extent.rs:98-103 vs
211-222), and the merge takes ``min`` of the maxes (extent.rs:217-222). It
also implements the WKB input path the reference left ``todo!()``
(extent.rs:131-142).

Zero matching rows → NULL struct (documented deviation from the reference's
``f64::MAX/MIN`` sentinel leak, extent.rs:85-94; SURVEY §7 risk list).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from datafusion_spatial_spark.functions.scalar import _BBOX_TYPE, st_bbox
from datafusion_spatial_spark.meta import GeometryMeta


def st_extent(col: Column | str, meta: GeometryMeta) -> Column:
    """Aggregate bbox over all rows → ``struct{xmin,ymin,xmax,ymax}``.

    Use inside ``df.agg(...)`` / ``groupBy(...).agg(...)``. NaN empty-point
    coords are already excluded by ``st_bbox`` (the reference's
    ``empty_point_check``, extent.rs:159-164); nulls are ignored by min/max.
    """
    b = st_bbox(col, meta)
    agg = F.struct(
        F.min(b["xmin"]).alias("xmin"),
        F.min(b["ymin"]).alias("ymin"),
        F.max(b["xmax"]).alias("xmax"),
        F.max(b["ymax"]).alias("ymax"),
    )
    # all-null/empty input -> NULL struct, not a struct of nulls
    return F.when(F.max(b["xmax"]).isNull(), F.lit(None).cast(_BBOX_TYPE)).otherwise(
        agg
    )
