"""Space-filling-curve indexing: Hilbert keys for spatial clustering.

Why this exists: at 100 TB the dominant spatial-query cost is IO, and the
only lever that removes IO (rather than overlapping it) is *layout* — rows
sorted/partitioned so that spatially-close records land in the same files
and parquet row groups, letting bbox predicates prune at the file-listing
and row-group-statistics level before a single byte is read. A Hilbert key
is the standard tool (better worst-case locality than Morton/quadkey:
consecutive keys are always 4-adjacent cells, no diagonal jumps across the
map), and it is what Delta Lake's OPTIMIZE ZORDER and Iceberg's
``hilbert(...)`` transform compute on the JVM side.

This implementation is **pure Catalyst** in two forms: an expression form
(:func:`st_hilbert` — the per-level rotate-and-flip fold as an
``aggregate`` higher-order function, for use inside any query and
mirrorable in oracle SQL) and a bulk form (:func:`with_hilbert_key` — the
same fold as a codegen-collapsed chain of per-level projections, for the
100 TB re-layout write path). No Python in either hot path. A driver-side
Python mirror (``hilbert_xy2d``) backs cell-covering enumeration and
tests.

The reference has no storage-layout surface (it is a query-side extension;
reference src/lib.rs:1-6) — this is Spark-first extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from datafusion_spatial_spark.functions.scalar import st_bbox
from datafusion_spatial_spark.meta import GeometryMeta

DEFAULT_LEVEL = 15  # 2^15 x 2^15 grid -> 30-bit key; plenty below maxLong


def hilbert_xy2d(level: int, x: int, y: int) -> int:
    """Driver-side Hilbert index of integer cell (x, y) on a 2^level grid
    (Hamilton's rotate/flip fold). Mirrors the Catalyst expression exactly —
    property-tested against it."""
    n = 1 << level
    d = 0
    s = n >> 1
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                # full-grid flip (n-1-x, not s-1-x): keeps coordinates in
                # [0, n) so the Catalyst mirror needs no negative-modulo
                # semantics (Spark % is sign-preserving, Python & is
                # two's-complement — they disagree below zero)
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s >>= 1
    return d


def hilbert_cell_expr(cx: Column, cy: Column, level: int) -> Column:
    """Hilbert index (LongType) of integer cell columns on a 2^level grid,
    as a single pure-Catalyst expression: the per-level rotate/flip fold
    runs as an ``aggregate`` higher-order function over the level sequence
    with a ``struct{x, y, d}`` accumulator. (Unrolling the loop in Python
    instead substitutes each level's x/y trees into the next — an
    exponentially-sized expression that OOMs the analyzer around level 15;
    the fold keeps the tree constant-size.) All values < 2^level ≤ 2^15,
    so the double-precision floor-division bit extraction is exact."""
    init = F.struct(
        cx.cast("long").alias("x"),
        cy.cast("long").alias("y"),
        F.lit(0).cast("long").alias("d"),
    )

    n = 1 << level

    def step(acc: Column, i: Column) -> Column:
        s = F.pow(F.lit(2.0), i.cast("double")).cast("long")
        x, y, d = acc["x"], acc["y"], acc["d"]
        rx = F.floor(x / s).cast("long") % 2
        ry = F.floor(y / s).cast("long") % 2
        quad = (
            F.when(rx == 1, F.when(ry == 1, F.lit(2)).otherwise(F.lit(3)))
            .otherwise(ry)
            .cast("long")
        )
        flip = (ry == 0) & (rx == 1)
        swap = ry == 0
        nx = F.when(swap, F.when(flip, F.lit(n - 1) - y).otherwise(y)).otherwise(x)
        ny = F.when(swap, F.when(flip, F.lit(n - 1) - x).otherwise(x)).otherwise(y)
        return F.struct(
            nx.cast("long").alias("x"),
            ny.cast("long").alias("y"),
            (d + s * s * quad).alias("d"),
        )

    seq = F.sequence(F.lit(level - 1), F.lit(0), F.lit(-1))
    return F.aggregate(seq, init, step)["d"]


def quantize_expr(v: Column, lo: float, hi: float, level: int) -> Column:
    """Clamped integer cell coordinate of ``v`` on [lo, hi) at 2^level.
    NULL-propagating: Spark's least/greatest SKIP null arguments, so a
    null input would otherwise clamp to cell n-1 — fabricating a
    top-corner location for null geometries (r7 review fix)."""
    n = 1 << level
    cell = F.floor((v - F.lit(lo)) / F.lit(hi - lo) * F.lit(float(n)))
    clamped = F.greatest(F.lit(0), F.least(cell, F.lit(n - 1))).cast("long")
    return F.when(v.isNotNull(), clamped)


def st_hilbert(
    col: Column | str,
    meta: GeometryMeta,
    extent: tuple[float, float, float, float],
    level: int = DEFAULT_LEVEL,
) -> Column:
    """Hilbert key (LongType) of a geometry's bbox center over ``extent``
    (xmin, ymin, xmax, ymax). Pure Catalyst for native encodings (st_bbox
    is a higher-order-function fold); WKB pays the usual one decode.

    Usage at scale: ``df.repartitionByRange(N, key).sortWithinPartitions
    (key)`` before writing — see operators.storage.write_spatial."""
    xmin, ymin, xmax, ymax = (float(v) for v in extent)
    b = st_bbox(col, meta)
    cx = quantize_expr((b["xmin"] + b["xmax"]) / 2.0, xmin, xmax, level)
    cy = quantize_expr((b["ymin"] + b["ymax"]) / 2.0, ymin, ymax, level)
    return hilbert_cell_expr(cx, cy, level)


def hilbert_covering_cells(
    window: tuple[float, float, float, float],
    extent: tuple[float, float, float, float],
    coarse_level: int,
) -> list[int]:
    """Driver-side: the coarse-grid Hilbert prefixes (keys shifted down to
    ``coarse_level``) whose cells intersect ``window`` — the IN-list that
    prunes a Hilbert-partitioned layout. coarse_level is small (<= ~10) so
    the enumeration is at most thousands of cells. (Computes entirely at
    coarse resolution; the layout's full ``level`` never enters — it only
    matters to the key writer's shift, see storage.write_spatial.)"""
    exmin, eymin, exmax, eymax = (float(v) for v in extent)
    wxmin, wymin, wxmax, wymax = (float(v) for v in window)
    n = 1 << coarse_level

    def cell_of(v, lo, hi):
        c = int((v - lo) / (hi - lo) * n)
        return max(0, min(c, n - 1))

    x0, x1 = cell_of(wxmin, exmin, exmax), cell_of(wxmax, exmin, exmax)
    y0, y1 = cell_of(wymin, eymin, eymax), cell_of(wymax, eymin, eymax)
    out = {
        hilbert_xy2d(coarse_level, cx, cy)
        for cx in range(x0, x1 + 1)
        for cy in range(y0, y1 + 1)
    }
    return sorted(out)


def with_hilbert_key(
    df,
    geom_col: str,
    meta: GeometryMeta,
    extent: tuple[float, float, float, float],
    level: int = DEFAULT_LEVEL,
    key_col: str = "hkey",
    bbox_col: str | None = None,
):
    """DataFrame-level Hilbert key: same fold as :func:`st_hilbert`, but
    unrolled into a linear chain of per-level projections over named
    columns instead of one nested expression. Each level reads the
    previous level's ``__hx/__hy/__hd`` columns BY NAME, so the plan is
    15 stacked projections (whole-stage codegen collapses them into
    straight-line JVM code) rather than an exponentially-substituted tree
    (the pure-Column form must route per-level state through an
    interpreted ``aggregate`` lambda — ~10x slower per key; fine inside a
    query expression or the DuckDB-mirrored oracle, wrong for the bulk
    re-layout write path).

    ``bbox_col`` names an already-materialized bbox struct column to reuse —
    callers that also need the bbox (write_spatial's pruning columns) pass it
    so WKB rows are decoded once, not once per consumer."""
    xmin, ymin, xmax, ymax = (float(v) for v in extent)
    n = 1 << level
    b = F.col(bbox_col) if bbox_col else st_bbox(geom_col, meta)
    out = df.withColumn("__hbox", b)
    cx = quantize_expr(
        (F.col("__hbox.xmin") + F.col("__hbox.xmax")) / 2.0, xmin, xmax, level
    )
    cy = quantize_expr(
        (F.col("__hbox.ymin") + F.col("__hbox.ymax")) / 2.0, ymin, ymax, level
    )
    out = (
        out.withColumn("__hx", cx)
        .withColumn("__hy", cy)
        .withColumn("__hd", F.lit(0).cast("long"))
    )
    for i in range(level - 1, -1, -1):
        s = 1 << i
        x, y, d = F.col("__hx"), F.col("__hy"), F.col("__hd")
        rx = F.shiftrightunsigned(x, i) % 2
        ry = F.shiftrightunsigned(y, i) % 2
        quad = (
            F.when(rx == 1, F.when(ry == 1, F.lit(2)).otherwise(F.lit(3)))
            .otherwise(ry)
            .cast("long")
        )
        flip = (ry == 0) & (rx == 1)
        swap = ry == 0
        nx = F.when(swap, F.when(flip, F.lit(n - 1) - y).otherwise(y)).otherwise(x)
        ny = F.when(swap, F.when(flip, F.lit(n - 1) - x).otherwise(x)).otherwise(y)
        keep = [c for c in out.columns if c not in ("__hx", "__hy", "__hd")]
        out = out.select(
            *keep,
            nx.alias("__hx"),
            ny.alias("__hy"),
            (d + F.lit(s * s).cast("long") * quad).alias("__hd"),
        )
    return (
        out.withColumn(key_col, F.col("__hd"))
        .drop("__hx", "__hy", "__hd", "__hbox")
    )
