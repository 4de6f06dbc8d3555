"""Structured Streaming operators.

The reference is batch-only (reference src/lib.rs:1-6 — no streaming
anywhere), so this module is pure extension surface: the streaming shapes a
large-scale ingest/training pipeline needs, built on watermarks + built-in
windowing + ``applyInPandasWithState`` for custom state.

All operators take/return streaming DataFrames and are sink-agnostic;
``run_to_memory`` drives any of them to completion against a finite file
source for tests/smoke (the driver pattern: parquet in → memory sink).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table.

    The streaming file source needs a user-declared schema, so unlike the
    batch loader we must sniff the parquet's physical ``ts`` type first:
    driver-generated data has shipped both INT64 TIMESTAMP(NANOS) (read as
    long via ``nanosAsLong``, then ns→µs floor-divided, matching
    sources/tables.py) and plain ``timestamp[us]`` (read natively; dividing
    it again would shrink the event-time span 1000× and stall every
    watermark, which showed up as an append-mode stream emitting 0 rows).
    """
    import pyarrow as pa
    import pyarrow.parquet as papq

    from datafusion_spatial_spark.sources.tables import _ensure_session_confs

    import glob as _glob
    import os as _os

    _ensure_session_confs(spark)
    ev = f"{sf_dir}/events.parquet"
    if _os.path.isdir(ev):  # directory of part files (Spark's own layout)
        parts = sorted(_glob.glob(_os.path.join(ev, "*.parquet")))
        if not parts:
            raise FileNotFoundError(f"no parquet part files under {ev}")
        sniff = parts[0]
    else:
        sniff = ev
    t = papq.read_schema(sniff).field("ts").type
    native_ts = pa.types.is_timestamp(t) and t.unit in ("s", "ms", "us")
    schema = _events_schema(
        T.TimestampType() if native_ts else T.LongType()
    )
    # the file source requires a directory; glob-filter to the events table
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if native_ts:
        return raw
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def windowed_counts(
    events: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling/sliding event-type counts with late-data handling. At scale
    this is the canonical streaming shuffle: state keyed by (window, type),
    watermark bounds state size."""
    w = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Built-in session windows per user (gap-based), the streaming analog
    of the batch sessionize query in __spark_entry__."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def stream_dedup(
    events: DataFrame, key_cols: list[str], watermark: str = "1 hour"
) -> DataFrame:
    """Exactly-once-per-key within the watermark horizon
    (``dropDuplicatesWithinWatermark``): bounded state, the streaming form
    of exact dedup."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


_STATE_SCHEMA = "user_id LONG, n LONG, total DOUBLE"
_OUT_SCHEMA = (
    "user_id LONG, n_events LONG, total_value DOUBLE, batch_events LONG"
)


def _running_totals_fn(
    key, pdfs: Iterator[pd.DataFrame], state
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState kernel: running per-user event count/value sum
    across micro-batches (custom stateful operator demo)."""
    (user_id,) = key
    if state.exists:
        n, total = state.get[1], state.get[2]
    else:
        n, total = 0, 0.0
    batch_n = 0
    for pdf in pdfs:
        batch_n += len(pdf)
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((user_id, n, total))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "batch_events": [batch_n],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running totals maintained in explicit state (the extension point for
    operators Spark's built-ins can't express)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            _running_totals_fn,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_to_memory(
    stream: DataFrame,
    name: str,
    output_mode: str = "append",
    flush_timeout: float = 60.0,
):
    """Drive a (finite file-source) stream to completion into a memory sink;
    returns the bound table name. Caller: ``spark.table(name)``.

    Append-mode watermarked aggregations only emit a window when the
    watermark passes its end — and that happens in a **no-data micro-batch**
    the engine schedules *after* the last data batch commits its new
    watermark. ``processAllAvailable()`` returns as soon as all source
    offsets are processed, i.e. possibly before that flush batch, so
    stopping there races dropped output (observed: 0 rows from a green
    query). For stateful append streams we therefore wait until a
    zero-input batch has committed before stopping."""
    import time

    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    q.processAllAvailable()
    progress = q.recentProgress
    stateful = any(p.get("stateOperators") for p in progress)
    if output_mode == "append" and stateful:
        # the flush batch must come AFTER the last data batch — an idle
        # zero-input batch that committed before it (startup tick) must not
        # satisfy the wait, so require a batchId past the last DATA batch
        last_seen = max(
            (p["batchId"] for p in progress if p["numInputRows"] > 0),
            default=-1,
        )
        deadline = time.monotonic() + flush_timeout
        flushed = False
        while time.monotonic() < deadline:
            if any(
                p["numInputRows"] == 0 and p["batchId"] > last_seen
                for p in q.recentProgress
            ):
                q.processAllAvailable()  # make sure the flush batch is fully committed
                flushed = True
                break
            time.sleep(0.1)
        if not flushed:
            q.stop()
            # r7 review fix: returning silently here hands back a table
            # missing the final watermark-closed windows — the exact race
            # this wait exists to prevent
            raise TimeoutError(
                f"memory sink {name!r}: no watermark-flush batch committed "
                f"within {flush_timeout}s (is "
                "spark.sql.streaming.noDataMicroBatches.enabled false?)"
            )
    q.stop()
    return name


def windowed_extent(
    points: DataFrame,
    geom_col: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming spatial aggregate: per-window bounding box of a native
    point stream — st_extent's min/max composition works unchanged under
    watermarked streaming aggregation (state = 4 doubles per window, the
    same partial/final shape as batch)."""
    from datafusion_spatial_spark.functions.scalar import st_bbox
    from datafusion_spatial_spark.meta import GeometryMeta

    meta = GeometryMeta(encoding="point", geometry_types=("Point",))
    b = st_bbox(geom_col, meta)
    return (
        points.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"))
        .agg(
            F.min(b["xmin"]).alias("xmin"),
            F.min(b["ymin"]).alias("ymin"),
            F.max(b["xmax"]).alias("xmax"),
            F.max(b["ymax"]).alias("ymax"),
            F.count("*").alias("n"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "xmin", "ymin", "xmax", "ymax", "n",
        )
    )


def geofence_alerts(
    points: DataFrame,
    fences: DataFrame,
    point_geom: str,
    fence_geom: str,
    fence_id: str,
    ts_col: str = "ts",
    distance: float | None = None,
) -> DataFrame:
    """Streaming geofencing: emit one alert row per (point, fence) hit.

    Stream-static broadcast join — the fence table (admin boundaries,
    alert zones: small by construction) is broadcast once; each
    micro-batch runs a JVM-side bbox prefilter against it and the exact
    predicate (intersects, or dwithin when ``distance`` is given) on the
    survivors. Entirely stateless, so it composes with any downstream
    watermarking/windowed aggregation and scales with the point stream's
    partitioning — the canonical 100 TB shape for enrichment against a
    small dimension.

    ``points`` must carry a native point column ``point_geom``;
    ``fences`` any geometry column ``fence_geom`` (WKB typical).
    """
    from pyspark.sql.functions import broadcast

    from datafusion_spatial_spark.functions.predicates import (
        st_dwithin,
        st_intersects,
    )
    from datafusion_spatial_spark.functions.scalar import st_bbox
    from datafusion_spatial_spark.meta import GeometryMeta

    pmeta = GeometryMeta(encoding="point", geometry_types=("Point",))
    fmeta = GeometryMeta(encoding="WKB")
    pad = float(distance or 0.0)
    pb = points.withColumn("__pbox", st_bbox(point_geom, pmeta)).filter(
        F.col("__pbox").isNotNull()
    )
    fb = fences.select(
        F.col(fence_id).alias("__fid"),
        F.col(fence_geom).alias("__fgeom"),
        st_bbox(fence_geom, fmeta).alias("__fbox"),
    ).filter(F.col("__fbox").isNotNull())
    cand = pb.join(
        broadcast(fb),
        (F.col("__pbox.xmin") - pad <= F.col("__fbox.xmax"))
        & (F.col("__fbox.xmin") <= F.col("__pbox.xmax") + pad)
        & (F.col("__pbox.ymin") - pad <= F.col("__fbox.ymax"))
        & (F.col("__fbox.ymin") <= F.col("__pbox.ymax") + pad),
    )
    if distance is not None:
        keep = st_dwithin(point_geom, "__fgeom", float(distance), pmeta, fmeta)
    else:
        keep = st_intersects(point_geom, "__fgeom", pmeta, fmeta)
    if "fence_id" in points.columns:
        raise ValueError(
            "points stream already has a 'fence_id' column — rename it "
            "before calling geofence_alerts (the output column would "
            "silently overwrite it)"
        )
    return (
        cand.filter(keep)
        .withColumn("fence_id", F.col("__fid"))
        .drop("__pbox", "__fbox", "__fgeom", "__fid")
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    interval: str = "15 minutes",
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream equi-join with an event-time interval
    bound: right rows within ``[left_ts, left_ts + interval]`` of a
    matching left row.

    Both sides MUST carry watermarks and the join condition MUST bound
    event time — that is what lets Spark expire buffered state instead of
    holding both streams forever (state size ~ watermark horizon x input
    rate, independent of stream length — the only shape that survives an
    unbounded 100 TB/day stream). Inner matches emit eagerly; outer rows
    emit once the watermark proves no match can arrive."""
    lf = left.withWatermark(left_ts, watermark).alias("l")
    rf = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {interval}")
        )
    )
    return lf.join(rf, cond, how)
