"""ST_ClusterWithin / ST_ClusterDBSCAN as distributed operators
(grid spatial join + connected components), hand-computed fixtures."""

import pytest
from pyspark.sql import functions as F

from datafusion_spatial_spark.meta import GeometryMeta
from datafusion_spatial_spark.operators.spatial_cluster import (
    cluster_dbscan,
    cluster_within,
)

PT = GeometryMeta(encoding="point", geometry_types=("Point",))


def pdf(spark, pts):
    from datafusion_spatial_spark.functions import st_point

    return spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "id bigint, x double, y double",
    ).select("id", st_point("x", "y").alias("g"))


# chain A: 0-1-2 linked by 1-unit hops; B: 3-4 pair far away; 5: singleton
POINTS = [(0, 0), (1, 0), (2, 0), (100, 100), (100.5, 100), (-50, 70)]


def test_cluster_within_chains(spark):
    df = pdf(spark, POINTS)
    out = (
        cluster_within(df, "g", PT, distance=1.1, cell_size=2.0, id_col="id")
        .select("id", "cluster_id")
        .orderBy("id")
        .collect()
    )
    got = {r.id: r.cluster_id for r in out}
    # chain A clusters to min id 0; pair B to 3; singleton keeps own id
    assert got[0] == got[1] == got[2] == 0
    assert got[3] == got[4] == 3
    assert got[5] == 5


def test_cluster_within_generated_ids(spark):
    df = pdf(spark, POINTS).drop("id")
    out = cluster_within(df, "g", PT, distance=1.1, cell_size=2.0).collect()
    clusters = {}
    for r in out:
        clusters.setdefault(r.cluster_id, 0)
        clusters[r.cluster_id] += 1
    assert sorted(clusters.values()) == [1, 2, 3]


def test_dbscan_core_border_noise(spark):
    # dense blob of 4 at origin (all within eps of each other), a border
    # point attached to one core, and an isolated noise point
    pts = [
        (0, 0), (0.5, 0), (0, 0.5), (0.5, 0.5),  # cores at min_points=4
        (1.3, 0),  # within eps=1 of (0.5,0) only -> border (2 neighbors < 4)
        (50, 50),  # noise
    ]
    df = pdf(spark, pts)
    out = (
        cluster_dbscan(df, "g", PT, eps=1.0, min_points=4, cell_size=2.0, id_col="id")
        .select("id", "cluster_id")
        .orderBy("id")
        .collect()
    )
    got = {r.id: r.cluster_id for r in out}
    assert got[0] == got[1] == got[2] == got[3] == 0  # one core cluster
    assert got[4] == 0  # border adopts the core's cluster
    assert got[5] is None  # noise


def test_dbscan_min_points_one_everything_clusters(spark):
    df = pdf(spark, POINTS)
    out = cluster_dbscan(
        df, "g", PT, eps=1.1, min_points=1, cell_size=2.0, id_col="id"
    ).collect()
    got = {r.id: r.cluster_id for r in out}
    assert got[5] == 5  # isolated core forms its own singleton cluster
    assert got[0] == got[1] == got[2] == 0


def test_dbscan_two_dense_blobs_stay_separate(spark):
    blob1 = [(0, 0), (0.4, 0), (0, 0.4)]
    blob2 = [(10, 10), (10.4, 10), (10, 10.4)]
    df = pdf(spark, blob1 + blob2)
    out = cluster_dbscan(
        df, "g", PT, eps=1.0, min_points=3, cell_size=2.0, id_col="id"
    ).collect()
    got = {r.id: r.cluster_id for r in out}
    assert got[0] == got[1] == got[2] == 0
    assert got[3] == got[4] == got[5] == 3


def test_cluster_kmeans_two_blobs(spark):
    from pyspark.sql import functions as F

    from datafusion_spatial_spark.functions.scalar import st_point
    from datafusion_spatial_spark.meta import GeometryMeta
    from datafusion_spatial_spark.operators.spatial_cluster import cluster_kmeans

    meta = GeometryMeta(encoding="point", geometry_types=("Point",))
    rows = []
    for i in range(30):
        rows.append((i, 0.0 + (i % 5) * 0.1, 0.0 + (i % 7) * 0.1))     # blob A
        rows.append((100 + i, 50.0 + (i % 5) * 0.1, 50.0 + (i % 7) * 0.1))  # blob B
    df = spark.createDataFrame(rows, "id long, x double, y double").withColumn(
        "geom", st_point(F.col("x"), F.col("y"))
    )
    out = cluster_kmeans(df, "geom", meta, k=2, id_col="id")
    got = {r.id: r.cluster_id for r in out.collect()}
    # centroid renumbering: blob A (lower x) is cluster 0, blob B cluster 1
    assert all(got[i] == 0 for i in range(30))
    assert all(got[100 + i] == 1 for i in range(30))

    # null geometry -> NULL cluster_id
    df2 = df.withColumn(
        "geom", F.when(F.col("id") == 0, F.lit(None)).otherwise(F.col("geom"))
    )
    out2 = cluster_kmeans(df2, "geom", meta, k=2, id_col="id")
    assert out2.filter(F.col("id") == 0).collect()[0].cluster_id is None


def test_cluster_intersecting_chains(spark):
    from pyspark.sql import functions as F

    from datafusion_spatial_spark.functions import st_geomfromtext
    from datafusion_spatial_spark.meta import GeometryMeta, with_geo_meta
    from datafusion_spatial_spark.operators.spatial_cluster import (
        cluster_intersecting,
    )

    W = GeometryMeta(encoding="WKB")
    # A-B overlap, B-C touch at an edge -> one cluster; D is far away
    rows = [
        (1, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"),
        (2, "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"),
        (3, "POLYGON ((3 1, 5 1, 5 3, 3 3, 3 1))"),
        (4, "POLYGON ((50 50, 51 50, 51 51, 50 51, 50 50))"),
    ]
    df = spark.createDataFrame(rows, "id long, wkt string").select(
        "id", st_geomfromtext("wkt").alias("g")
    )
    out = cluster_intersecting(df, "g", W, id_col="id", cell_size=10.0)
    got = {r.id: r.cluster_id for r in out.collect()}
    assert got[1] == got[2] == got[3]
    assert got[4] != got[1]


# heavy battery file: certification tier only (r15 tiering, VERDICT r14 #9)
pytestmark = pytest.mark.slow
