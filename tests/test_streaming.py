"""Structured Streaming operator tests (finite parquet source → memory sink,
cross-checked against the equivalent batch computation)."""

import pytest
from pyspark.sql import functions as F

from datafusion_spatial_spark.sources.tables import load_table
from datafusion_spatial_spark.streaming import ops


@pytest.fixture(scope="module")
def events_batch(spark, sf_dir):
    return load_table(spark, sf_dir, "events").cache()


def test_windowed_counts_matches_batch(spark, sf_dir, events_batch):
    stream = ops.stream_events(spark, sf_dir)
    name = ops.run_to_memory(
        ops.windowed_counts(stream, window="1 hour"), "win_counts"
    )
    got = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in spark.table(name).collect()
    }
    want = {
        (r.ws, r.event_type): (r.n, r.tv)
        for r in events_batch.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("tv"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "tv")
        .collect()
    }
    # append-mode emits only windows closed by the watermark; every emitted
    # window must match batch exactly
    assert got
    for k, v in got.items():
        assert want[k] == v
    # FULL drop accounting: every batch group the stream did NOT emit must
    # be explained — with a single-file source the first micro-batch sees
    # all rows (no late drops), so the only legal misses are windows the
    # final watermark (max ts - 10 min delay) could never finalize
    from datetime import timedelta

    final_wm = events_batch.agg(F.max("ts")).collect()[0][0] - timedelta(
        minutes=10
    )
    missing = set(want) - set(got)
    for ws, _etype in missing:
        assert ws + timedelta(hours=1) > final_wm, (
            f"window {ws} was finalizable but never emitted"
        )
    assert set(got) | missing == set(want)


def test_session_windows(spark, sf_dir, events_batch):
    stream = ops.stream_events(spark, sf_dir)
    name = ops.run_to_memory(
        ops.session_windows(stream, gap="30 minutes"), "sessions"
    )
    rows = spark.table(name).collect()
    assert rows, "no sessions emitted"
    # session totals must partition total event count for emitted users
    per_user_stream = {}
    for r in rows:
        per_user_stream[r.user_id] = per_user_stream.get(r.user_id, 0) + r.n_events
    batch_counts = {
        r.user_id: r.n for r in events_batch.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    for uid, n in per_user_stream.items():
        assert n <= batch_counts[uid]


def test_stream_dedup(spark, sf_dir):
    stream = ops.stream_events(spark, sf_dir)
    name = ops.run_to_memory(
        ops.stream_dedup(stream, ["user_id", "event_type"]), "deduped"
    )
    out = spark.table(name)
    assert out.count() == out.select("user_id", "event_type").distinct().count()


def test_running_user_totals(spark, sf_dir, events_batch):
    stream = ops.stream_events(spark, sf_dir)
    name = ops.run_to_memory(
        ops.running_user_totals(stream), "running", output_mode="update"
    )
    rows = spark.table(name).collect()
    assert rows
    # final state per user equals the batch aggregate
    final = {}
    for r in rows:  # last update per user wins
        final[r.user_id] = (r.n_events, r.total_value)
    want = {
        r.user_id: (r.n, r.tv)
        for r in events_batch.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("tv"))
        .collect()
    }
    assert final == want


def test_windowed_extent_stream(spark, sf_dir, events_batch):
    """Streaming spatial aggregate: windowed bbox over synthetic points
    derived from the event stream, cross-checked against batch."""
    from pyspark.sql import functions as F

    from datafusion_spatial_spark.streaming.ops import (
        run_to_memory,
        stream_events,
        windowed_extent,
    )

    def to_points(df):
        return df.select(
            "ts",
            F.struct(
                F.col("value").alias("x"),
                F.col("user_id").cast("double").alias("y"),
            ).alias("geom"),
        )

    stream = to_points(stream_events(spark, sf_dir))
    name = run_to_memory(windowed_extent(stream, "geom", window="6 hours"), "wext")
    got = {
        r.window_start: (r.xmin, r.ymin, r.xmax, r.ymax, r.n)
        for r in spark.table(name).collect()
    }
    assert got, "no windows emitted"
    batch = to_points(events_batch)
    want = {
        r.ws: (r.xmin, r.ymin, r.xmax, r.ymax, r.n)
        for r in batch.groupBy(F.window("ts", "6 hours").alias("w"))
        .agg(
            F.min("geom.x").alias("xmin"),
            F.min("geom.y").alias("ymin"),
            F.max("geom.x").alias("xmax"),
            F.max("geom.y").alias("ymax"),
            F.count("*").alias("n"),
        )
        .select(F.col("w.start").alias("ws"), "xmin", "ymin", "xmax", "ymax", "n")
        .collect()
    }
    for k, v in got.items():
        assert want[k] == v


def test_geofence_alerts_stream(spark, sf_dir):
    """Stream-static broadcast geofence: alerts match the batch result,
    and every alert's point is genuinely inside its fence."""
    from pyspark.sql import functions as F

    from datafusion_spatial_spark.functions.scalar import st_geomfromtext
    from datafusion_spatial_spark.streaming.ops import (
        geofence_alerts,
        run_to_memory,
        stream_events,
    )

    fences = spark.createDataFrame(
        [
            (1, "POLYGON ((0 0, 60 0, 60 4000, 0 4000, 0 0))"),
            (2, "POLYGON ((40 2000, 100 2000, 100 9000, 40 9000, 40 2000))"),
        ],
        "fence_id_in int, wkt string",
    ).select("fence_id_in", st_geomfromtext("wkt").alias("fence_g"))

    def to_points(df):
        return df.select(
            "event_id",
            "ts",
            F.struct(
                F.col("value").alias("x"),
                F.col("user_id").cast("double").alias("y"),
            ).alias("geom"),
        )

    stream = to_points(stream_events(spark, sf_dir))
    alerts = geofence_alerts(
        stream, fences, "geom", "fence_g", "fence_id_in"
    ).select("event_id", "fence_id")
    name = run_to_memory(alerts, "geofence_alerts")
    got = {(r.event_id, r.fence_id) for r in spark.table(name).collect()}

    from datafusion_spatial_spark.sources.tables import load_table

    batch = to_points(load_table(spark, sf_dir, "events"))
    expect = {
        (r.event_id, r.fence_id)
        for r in geofence_alerts(batch, fences, "geom", "fence_g", "fence_id_in")
        .select("event_id", "fence_id")
        .collect()
    }
    assert got == expect
    assert len(got) > 0


def test_stream_stream_join_matches_batch(spark, sf_dir, events_batch):
    views = ops.stream_events(spark, sf_dir).filter(F.col("event_type") == "view")
    purchases = (
        ops.stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("p_value"),
        )
    )
    joined = ops.stream_stream_join(
        views.select("user_id", "ts", "event_id"),
        purchases.withColumnRenamed("p_user", "user_id"),
        key="user_id",
        left_ts="ts",
        right_ts="p_ts",
        interval="30 minutes",
        watermark="2 hours",
    ).select("l.user_id", "event_id", "ts", "p_ts", "p_value")
    name = ops.run_to_memory(joined, "ssj_out")
    got = {
        (r.user_id, r.event_id, r.p_ts) for r in spark.table(name).collect()
    }

    bv = events_batch.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    bp = events_batch.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("p_ts")
    )
    want = {
        (r.user_id, r.event_id, r.p_ts)
        for r in bv.join(
            bp,
            (F.col("user_id") == F.col("pu"))
            & (F.col("p_ts") >= F.col("ts"))
            & (F.col("p_ts") <= F.col("ts") + F.expr("INTERVAL 30 minutes")),
        ).collect()
    }
    # inner stream-stream matches emit eagerly: exact batch equivalence
    assert got == want and got


# heavy battery file: certification tier only (r15 tiering, VERDICT r14 #9)
pytestmark = pytest.mark.slow
