"""Grid-bucketed spatial join.

A predicate UDF in a join condition degenerates to a nested-loop cross join
— unusable beyond toy sizes. The scalable plan (SURVEY §7) is:

1. per-row bbox (pure Catalyst for native encodings — no Python);
2. expand each bbox to the grid cells it covers (``sequence`` + ``explode``,
   map-only);
3. **equi-join on cell id** — hash-shuffle partitionable, AQE-skew-safe;
4. keep each candidate pair only in its **canonical reference cell** (the
   cell containing the min corner of the two bboxes' padded intersection):
   a pair sharing several cells survives exactly once, with **no
   de-duplication shuffle** — the dedup is a map-side filter on the joined
   row, so geometry payloads are never exchanged a second time;
5. exact refine with the geom_ops predicate UDF on candidates only.

At 100 TB this is the textbook shape: the only shuffle keys on cell id, the
Python predicate touches candidate pairs instead of the n×m cross product,
and hot cells (skewed data) split via AQE. Cell size trades shuffle fan-out
(small cells → more rows) against refine cost (big cells → more candidates);
pick ~the median geometry bbox diagonal.

The reference has no spatial join at all (its README.md roadmap stops at
scalar routines); this operator is the Spark-native scale path for the
predicate surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datafusion_spatial_spark.functions.predicates import (
    st_contains,
    st_distance,
    st_intersects,
    st_within,
)
from datafusion_spatial_spark.functions.scalar import st_bbox
from datafusion_spatial_spark.meta import GeometryMeta

_PREDICATES = {
    "intersects": st_intersects,
    "contains": st_contains,
    "within": st_within,
}


def _cells(b: Column, cell_size: float, pad: float = 0.0) -> Column:
    """array<bigint> of flattened cell ids covered by bbox ``b`` (struct
    xmin..ymax), optionally padded (for distance joins)."""
    cs = F.lit(float(cell_size))
    x0 = F.floor((b["xmin"] - pad) / cs).cast("long")
    x1 = F.floor((b["xmax"] + pad) / cs).cast("long")
    y0 = F.floor((b["ymin"] - pad) / cs).cast("long")
    y1 = F.floor((b["ymax"] + pad) / cs).cast("long")
    # interleave into one id: cell = x * 2^32 + y (grid coords fit in int32
    # for any realistic extent/cell-size combination)
    return F.flatten(
        F.transform(
            F.sequence(x0, x1),
            lambda x: F.transform(F.sequence(y0, y1), lambda y: x * F.lit(1 << 32) + y),
        )
    )


def spatial_join(
    left: DataFrame,
    right: DataFrame,
    left_geom: str,
    right_geom: str,
    left_meta: GeometryMeta,
    right_meta: GeometryMeta,
    left_id: str,
    right_id: str,
    cell_size: float,
    predicate: str = "intersects",
    distance: float | None = None,
    with_distance: bool = False,
    pad_override: float | None = None,
) -> DataFrame:
    """Returns (left_id, right_id) pairs satisfying the predicate.

    ``predicate='dwithin'`` uses ``distance`` and pads the left grid cells.
    ``predicate='dwithin_sphere'`` (point×point lon/lat only) refines with
    the haversine distance in METERS; pass the grid pad in DEGREES via
    ``pad_override`` (see :func:`spatial_join_geography`).
    ``with_distance=True`` (dwithin only) adds the exact ``distance``
    column — computed inside the join, so consumers like the k-NN join
    don't re-join geometries by id to get it.
    """
    pad = float(pad_override if pad_override is not None else (distance or 0.0))
    both_points = (
        left_meta.is_native and left_meta.native_type == "Point"
        and right_meta.is_native and right_meta.native_type == "Point"
    )
    # point×point dwithin refines on bbox coords alone — don't shuffle the
    # geometry payload at all
    carry_geom = not (
        both_points and predicate in ("dwithin", "dwithin_sphere")
    )
    lcols = [F.col(left_id).alias("__lid"),
             st_bbox(left_geom, left_meta).alias("__lbox")]
    rcols = [F.col(right_id).alias("__rid"),
             st_bbox(right_geom, right_meta).alias("__rbox")]
    if carry_geom:
        lcols.insert(1, F.col(left_geom).alias("__lgeom"))
        rcols.insert(1, F.col(right_geom).alias("__rgeom"))
    lb = left.select(*lcols).filter(F.col("__lbox").isNotNull())
    rb = right.select(*rcols).filter(F.col("__rbox").isNotNull())

    lc = lb.withColumn("__cell", F.explode(_cells(F.col("__lbox"), cell_size, pad)))
    rc = rb.withColumn("__cell", F.explode(_cells(F.col("__rbox"), cell_size)))

    # canonical reference cell: the cell of the min corner of the padded
    # bbox intersection.  floor is monotonic, so greatest(floor(a),floor(b))
    # == floor(greatest(a,b)); once the bbox prefilter holds, this cell is
    # inside BOTH sides' cell ranges, so each pair survives exactly once —
    # dedup as a map-side filter, not an exchange.
    cs = F.lit(float(cell_size))
    canon_x = F.greatest(
        F.floor((F.col("__lbox.xmin") - pad) / cs),
        F.floor(F.col("__rbox.xmin") / cs),
    ).cast("long")
    canon_y = F.greatest(
        F.floor((F.col("__lbox.ymin") - pad) / cs),
        F.floor(F.col("__rbox.ymin") / cs),
    ).cast("long")
    cand = (
        lc.join(rc, "__cell")
        # bbox prefilter kills most false candidates JVM-side
        .filter(
            (F.col("__lbox.xmin") - pad <= F.col("__rbox.xmax"))
            & (F.col("__rbox.xmin") <= F.col("__lbox.xmax") + pad)
            & (F.col("__lbox.ymin") - pad <= F.col("__rbox.ymax"))
            & (F.col("__rbox.ymin") <= F.col("__lbox.ymax") + pad)
        )
        .filter(F.col("__cell") == canon_x * F.lit(1 << 32) + canon_y)
        .select(
            "__lid", "__rid",
            *(("__lgeom", "__rgeom") if carry_geom else ("__lbox", "__rbox")),
        )
    )

    return _refine(
        cand, left_meta, right_meta, left_id, right_id,
        predicate, distance, with_distance, both_points,
    )


def _refine(
    cand: DataFrame,
    left_meta: GeometryMeta,
    right_meta: GeometryMeta,
    left_id: str,
    right_id: str,
    predicate: str,
    distance: float | None,
    with_distance: bool,
    both_points: bool,
) -> DataFrame:
    """Exact-refine candidate pairs (columns __lid/__rid and __lgeom/__rgeom
    or __lbox/__rbox) — shared by the shuffle and bucketed join paths."""
    if predicate == "dwithin_sphere":
        if distance is None:
            raise ValueError("dwithin_sphere requires distance= (meters)")
        if both_points:
            from datafusion_spatial_spark.functions.geodesic import (
                _haversine_expr,
            )

            dcol = _haversine_expr(
                F.col("__lbox.xmin"), F.col("__lbox.ymin"),
                F.col("__rbox.xmin"), F.col("__rbox.ymin"),
            )
        else:
            # arbitrary geometries: exact vertex-vs-arc spherical minimum
            # (candidate pairs only — the degree grid already pruned)
            from datafusion_spatial_spark.functions.geodesic import (
                st_distancesphere_geoms,
            )

            dcol = st_distancesphere_geoms(
                "__lgeom", "__rgeom", left_meta, right_meta
            )
        if with_distance:
            return (
                cand.withColumn("__dist", dcol)
                .filter(F.col("__dist") <= F.lit(float(distance)))
                .select(
                    F.col("__lid").alias(left_id),
                    F.col("__rid").alias(right_id),
                    F.col("__dist").alias("distance_m"),
                )
            )
        return cand.filter(dcol <= F.lit(float(distance))).select(
            F.col("__lid").alias(left_id), F.col("__rid").alias(right_id)
        )
    if predicate == "dwithin":
        if distance is None:
            raise ValueError("dwithin requires distance=")
        if both_points:
            # pure-Catalyst refine: a point's bbox IS the point, so the
            # exact distance needs no geometry decode and no Python — the
            # whole join plan stays inside whole-stage codegen
            dx = F.col("__lbox.xmin") - F.col("__rbox.xmin")
            dy = F.col("__lbox.ymin") - F.col("__rbox.ymin")
            dcol = F.sqrt(dx * dx + dy * dy)
        else:
            dcol = st_distance("__lgeom", "__rgeom", left_meta, right_meta)
        if with_distance:
            return (
                cand.withColumn("__dist", dcol)
                .filter(F.col("__dist") <= F.lit(float(distance)))
                .select(
                    F.col("__lid").alias(left_id),
                    F.col("__rid").alias(right_id),
                    F.col("__dist").alias("distance"),
                )
            )
        keep = dcol <= F.lit(float(distance))
    else:
        try:
            pred = _PREDICATES[predicate]
        except KeyError:
            raise ValueError(
                f"unknown predicate {predicate!r}; one of {sorted(_PREDICATES)} or 'dwithin'"
            ) from None
        keep = pred("__lgeom", "__rgeom", left_meta, right_meta)

    return cand.filter(keep).select(
        F.col("__lid").alias(left_id), F.col("__rid").alias(right_id)
    )


def spatial_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    left_geom: str,
    right_geom: str,
    left_meta: GeometryMeta,
    right_meta: GeometryMeta,
    left_id: str,
    right_id: str,
    predicate: str = "intersects",
) -> DataFrame:
    """Broadcast variant for a SMALL right side (dimension polygons, admin
    boundaries): broadcast-nested-loop with a JVM-side bbox prefilter, then
    the exact predicate on survivors. No shuffle at all — the right plan
    when |right| ≪ |left| and right fits in the broadcast threshold."""
    from pyspark.sql.functions import broadcast

    try:
        pred = _PREDICATES[predicate]
    except KeyError:
        raise ValueError(
            f"unknown predicate {predicate!r}; one of {sorted(_PREDICATES)}"
        ) from None
    lb = left.select(
        F.col(left_id).alias("__lid"),
        F.col(left_geom).alias("__lgeom"),
        st_bbox(left_geom, left_meta).alias("__lbox"),
    ).filter(F.col("__lbox").isNotNull())
    rb = right.select(
        F.col(right_id).alias("__rid"),
        F.col(right_geom).alias("__rgeom"),
        st_bbox(right_geom, right_meta).alias("__rbox"),
    ).filter(F.col("__rbox").isNotNull())
    cand = lb.join(
        broadcast(rb),
        (F.col("__lbox.xmin") <= F.col("__rbox.xmax"))
        & (F.col("__rbox.xmin") <= F.col("__lbox.xmax"))
        & (F.col("__lbox.ymin") <= F.col("__rbox.ymax"))
        & (F.col("__rbox.ymin") <= F.col("__lbox.ymax")),
    )
    return cand.filter(
        pred("__lgeom", "__rgeom", left_meta, right_meta)
    ).select(F.col("__lid").alias(left_id), F.col("__rid").alias(right_id))


def estimate_cell_size(
    df: DataFrame,
    geom_col: str,
    meta: GeometryMeta,
    sample_fraction: float = 0.01,
    min_rows: int = 200,
) -> float:
    """Pick a grid cell size ≈ the median bbox diagonal of a sample — the
    balance point between shuffle fan-out (small cells) and candidate
    explosion (big cells). Point data (zero-extent bboxes) falls back to
    1/100 of the sampled extent's diagonal."""
    b = st_bbox(geom_col, meta)

    def _stats(frame):
        return frame.agg(
            F.expr("percentile(sqrt(power(b.xmax - b.xmin, 2) + power(b.ymax - b.ymin, 2)), 0.5)").alias("med_diag"),
            F.min("b.xmin").alias("x0"),
            F.max("b.xmax").alias("x1"),
            F.min("b.ymin").alias("y0"),
            F.max("b.ymax").alias("y1"),
            F.count("*").alias("n"),
        ).collect()[0]

    sampled = (
        df.sample(fraction=min(1.0, sample_fraction), seed=42)
        .select(b.alias("b"))
        .filter(F.col("b").isNotNull())
        .limit(100_000)
    )
    stats = _stats(sampled)
    if stats.n < min_rows:
        # tiny frame (or a too-thin sample): scan up to 100k rows directly
        stats = _stats(
            df.select(b.alias("b")).filter(F.col("b").isNotNull()).limit(100_000)
        )
    if stats.n == 0:
        raise ValueError("no non-null geometries sampled; pass cell_size explicitly")
    if stats.med_diag and stats.med_diag > 0:
        return float(stats.med_diag)
    import math

    extent_diag = math.hypot(stats.x1 - stats.x0, stats.y1 - stats.y0)
    return max(extent_diag / 100.0, 1e-9)


# ---------------------------------------------------------------------------
# Co-located spatial join: cell-bucketed layout → zero-exchange candidates
# ---------------------------------------------------------------------------

def write_spatial_bucketed(
    df: DataFrame,
    geom_col: str,
    meta: GeometryMeta,
    id_col: str,
    table: str,
    cell_size: float,
    num_buckets: int = 32,
    path: str | None = None,
    pad: float = 0.0,
    mode: str = "overwrite",
) -> None:
    """Materialize a geometry table's grid-cell explosion as a table
    BUCKETED and SORTED by cell id — the co-located spatial-join layout.

    Two tables written with the same grid (``cell_size``) and bucket count
    join on cell id with ZERO exchange (and zero sort): the candidate join
    is the only shuffle in :func:`spatial_join`, so for repeated joins
    against the same corpora this layout removes the shuffle entirely —
    the spatial analog of bucketing a fact table on its join key, and at
    100 TB the difference between re-shuffling the corpus per query and
    reading co-located buckets.

    ``pad`` pre-pads the cell explosion; write the LEFT side of future
    dwithin joins with ``pad`` = the largest distance it should serve (a
    larger pad only adds bbox-prefiltered false candidates, never wrong
    results). Grid parameters are recorded in table properties and
    validated at join time.
    """
    from datafusion_spatial_spark.operators.storage import write_bucketed

    dfx = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(geom_col).alias("geom"),
            st_bbox(geom_col, meta).alias("box"),
        )
        .filter(F.col("box").isNotNull())
        .withColumn("cell", F.explode(_cells(F.col("box"), cell_size, pad)))
    )
    write_bucketed(
        dfx, table, ["cell"], num_buckets, sort_cols=["cell"],
        mode=mode, path=path,
    )
    df.sparkSession.sql(
        f"ALTER TABLE {table} SET TBLPROPERTIES ("
        f"'spatial.cell_size'='{float(cell_size)!r}', "
        f"'spatial.pad'='{float(pad)!r}', "
        f"'spatial.num_buckets'='{int(num_buckets)}')"
    )


def _table_grid_props(spark, table: str) -> dict:
    rows = spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    return {r["key"]: r["value"] for r in rows}


def spatial_join_bucketed(
    spark,
    left_table: str,
    right_table: str,
    left_meta: GeometryMeta,
    right_meta: GeometryMeta,
    left_id: str,
    right_id: str,
    predicate: str = "intersects",
    distance: float | None = None,
    with_distance: bool = False,
    hint: str | None = None,
) -> DataFrame:
    """Grid spatial join over two :func:`write_spatial_bucketed` tables.

    Same semantics and canonical-cell dedup as :func:`spatial_join`, but
    the equi-join on cell id rides the bucketed layout: matching bucket
    spec on both sides → no Exchange, and the sortBy(cell) makes the
    sort-merge join sort-free too. Validates that both tables share the
    grid, and that a dwithin ``distance`` does not exceed the pad the
    left table was written with (the cell explosion would under-reach).

    ``hint`` (e.g. ``"merge"``) pins the join strategy — useful to keep
    AQE from choosing broadcast on small inputs when demonstrating the
    zero-exchange plan.
    """
    lp = _table_grid_props(spark, left_table)
    rp = _table_grid_props(spark, right_table)
    try:
        cs_l = float(lp["spatial.cell_size"])
        cs_r = float(rp["spatial.cell_size"])
    except KeyError:
        raise ValueError(
            "both tables must be written by write_spatial_bucketed "
            "(missing spatial.cell_size property)"
        ) from None
    if cs_l != cs_r:
        raise ValueError(
            f"grid mismatch: {left_table} cell_size={cs_l} vs "
            f"{right_table} cell_size={cs_r}"
        )
    if predicate == "dwithin_sphere":
        # The meters distance is NOT a degree pad: using it as one skips
        # the left-pad validation and silently misses pairs beyond the
        # write pad (and the canonical-cell filter would use meters as
        # degrees). Use spatial_join_geography for meter-radius joins.
        raise NotImplementedError(
            "spatial_join_bucketed does not support dwithin_sphere — the "
            "meters distance cannot drive the degree grid; use "
            "spatial_join_geography (shuffle grid) instead"
        )
    pad = float(distance or 0.0)
    left_pad = float(lp.get("spatial.pad", "0.0"))
    if predicate == "dwithin" and pad > left_pad:
        raise ValueError(
            f"distance={pad} exceeds the pad={left_pad} {left_table} was "
            "written with; rewrite the left table with a larger pad"
        )
    cell_size = cs_l
    left = spark.table(left_table).alias("l")
    right = spark.table(right_table).alias("r")
    if hint:
        left = left.hint(hint)
    cs = F.lit(float(cell_size))
    canon_x = F.greatest(
        F.floor((F.col("l.box.xmin") - pad) / cs),
        F.floor(F.col("r.box.xmin") / cs),
    ).cast("long")
    canon_y = F.greatest(
        F.floor((F.col("l.box.ymin") - pad) / cs),
        F.floor(F.col("r.box.ymin") / cs),
    ).cast("long")
    both_points = (
        left_meta.is_native and left_meta.native_type == "Point"
        and right_meta.is_native and right_meta.native_type == "Point"
    )
    carry_geom = not (both_points and predicate == "dwithin")
    cand = (
        left.join(right, F.col("l.cell") == F.col("r.cell"))
        .filter(
            (F.col("l.box.xmin") - pad <= F.col("r.box.xmax"))
            & (F.col("r.box.xmin") <= F.col("l.box.xmax") + pad)
            & (F.col("l.box.ymin") - pad <= F.col("r.box.ymax"))
            & (F.col("r.box.ymin") <= F.col("l.box.ymax") + pad)
        )
        .filter(F.col("l.cell") == canon_x * F.lit(1 << 32) + canon_y)
        .select(
            F.col("l.id").alias("__lid"),
            F.col("r.id").alias("__rid"),
            *(
                (F.col("l.geom").alias("__lgeom"),
                 F.col("r.geom").alias("__rgeom"))
                if carry_geom
                else (F.col("l.box").alias("__lbox"),
                      F.col("r.box").alias("__rbox"))
            ),
        )
    )
    return _refine(
        cand, left_meta, right_meta, left_id, right_id,
        predicate, distance, with_distance, both_points,
    )


def spatial_join_geography(
    left: DataFrame,
    right: DataFrame,
    left_geom: str,
    right_geom: str,
    left_meta: GeometryMeta,
    right_meta: GeometryMeta,
    left_id: str,
    right_id: str,
    meters: float,
    cell_size_deg: float | None = None,
    with_distance: bool = False,
    max_abs_lat: float = 80.0,
) -> DataFrame:
    """dwithin-in-METERS join for EPSG:4326 geometry columns.

    Same grid-join shape as :func:`spatial_join` — the grid lives in
    degrees with a latitude-safe pad (lon degrees shrink by cos(lat), so
    the pad is sized for the data's extreme latitude; a too-large pad
    only adds bbox-prefiltered false candidates). Point×point pairs
    refine with the pure-Catalyst haversine (zero Python in the plan);
    any other geometry combination refines with the exact vertex-vs-arc
    spherical minimum distance under an Arrow-batched kernel, still only
    on grid candidates. Data beyond ``max_abs_lat`` raises (the lon pad
    diverges toward the poles; use a polar-cap projection there).
    """
    import math

    from datafusion_spatial_spark.functions.scalar import st_bbox

    stats = []
    for df, col, m_ in (
        (left, left_geom, left_meta),
        (right, right_geom, right_meta),
    ):
        row = df.select(
            F.max(
                F.greatest(
                    F.abs(st_bbox(col, m_)["ymin"]),
                    F.abs(st_bbox(col, m_)["ymax"]),
                )
            ).alias("mx")
        ).collect()[0]
        stats.append(float(row["mx"] or 0.0))
    lat = max(stats)
    if lat > max_abs_lat:
        raise ValueError(
            f"data reaches |lat|={lat:.1f}° > {max_abs_lat}° — the "
            "degree-grid pad diverges near the poles"
        )
    # Size the pad on the refine's OWN sphere (haversine, R=6371008.8 m),
    # not on ellipsoidal meters-per-degree constants: a mismatch drops
    # near-threshold east-west pairs at high latitude (the prefilter must
    # never be tighter than the refine). Exact haversine inversions:
    #   |Δlat| ≤ degrees(d/R)  (meridian distance ≤ great-circle distance)
    #   sin²(d/2R) ≥ cos²(lat_max)·sin²(Δλ/2)  ⇒
    #   |Δλ| ≤ 2·asin(min(1, sin(d/2R) / cos(lat_max)))
    R = 6371008.8  # must match _haversine_expr / dwithin_sphere refine
    pad_lat = math.degrees(meters / R)
    s = math.sin(meters / (2.0 * R)) / math.cos(math.radians(lat))
    pad_lon = math.degrees(2.0 * math.asin(min(1.0, s)))
    pad_deg = max(pad_lat, pad_lon) * (1.0 + 1e-9)  # float-error slack
    cell = cell_size_deg if cell_size_deg is not None else 4 * pad_deg
    return spatial_join(
        left, right, left_geom, right_geom, left_meta, right_meta,
        left_id, right_id, cell_size=cell, predicate="dwithin_sphere",
        distance=meters, with_distance=with_distance,
        pad_override=pad_deg,
    )
