"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the exact baseline: a map-only scan computing
``dot/(|q||v|)`` with higher-order functions (JVM-side, no Python), then a
global top-k. At 100 TB the scan is embarrassingly parallel and the top-k is
``TakeOrderedAndProject`` (per-partition heap + driver merge of k·partitions
rows) — no full sort, no wide shuffle.

The scale path is LSH bucketing with random hyperplanes:
sign(v·r_i) bits form a bucket key; candidates share the query's bucket (or
a hamming-neighbor bucket via multi-probe), then exact rerank. Bucketing is
again map-only; the candidate fetch is a partition-pruned filter or an
equi-join on bucket id. Plane vectors are generated from a fixed seed and
embedded as literals, so results are deterministic and oracle-reproducible.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _vec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product (matches DuckDB list_reduce order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine similarity to ``query``. Deterministic
    tie-break on id. Plan: scan → map (cosine) → TakeOrderedAndProject."""
    q = F.array(*[F.lit(float(x)) for x in query])
    # precompute |q| driver-side: it is constant per query, and folding it
    # into a literal removes one array fold per row
    qn = math.sqrt(sum(float(x) * float(x) for x in query)) or 1.0
    v = _vec(vec_col)
    scored = df.select(
        F.col(id_col), (dot(v, q) / (norm(v) * F.lit(qn))).alias("score")
    )
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def knn_pairs_bruteforce(
    df: DataFrame, vec_col: str, id_col: str, k: int = 5
) -> DataFrame:
    """All-pairs exact kNN (cosine) via self-join — O(n²) compute but only
    one shuffle; for modest n (rerank sets, sampled audits). For full-corpus
    kNN at scale use :func:`lsh_bucket` blocking first."""
    from pyspark.sql import Window

    a = df.select(F.col(id_col).alias("id_a"), _vec(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), _vec(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") != F.col("id_b")).withColumn(
        "score", cosine(F.col("va"), F.col("vb"))
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("score"), F.col("id_b"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id_a", "id_b", "score", "rank")
    )


def random_hyperplanes(dims: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic unit-ish hyperplane normals (Box-Muller from a seeded
    PRNG; plain Python so the literals can also be embedded in oracle SQL)."""
    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dims)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def lsh_bucket(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    planes: list[list[float]],
) -> DataFrame:
    """Add a ``bucket`` column: integer whose bit i = sign(v · plane_i).
    Map-only; bucket is then a blocking/partitioning key."""
    v = _vec(vec_col)
    bucket = None
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(v, p) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return df.withColumn("bucket", bucket.cast("int"))


def lsh_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    planes: list[list[float]],
    k: int = 10,
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """ANN top-k: restrict to buckets within ``multiprobe_hamming`` bit
    flips of the query's bucket, then exact cosine rerank. The bucket filter
    prunes the scan (predicate pushdown on a materialized bucket column /
    partition key at scale)."""
    qbucket = 0
    for i, plane in enumerate(planes):
        s = sum(float(a) * float(b) for a, b in zip(query, plane))
        if s > 0:
            qbucket |= 1 << i
    n = len(planes)
    probes = {qbucket}
    if multiprobe_hamming >= 1:
        for i in range(n):
            probes.add(qbucket ^ (1 << i))
    if multiprobe_hamming >= 2:
        for i in range(n):
            for j in range(i + 1, n):
                probes.add(qbucket ^ (1 << i) ^ (1 << j))
    bucketed = lsh_bucket(df, vec_col, id_col, planes)
    cand = bucketed.filter(F.col("bucket").isin(sorted(probes)))
    q = F.array(*[F.lit(float(x)) for x in query])
    return (
        cand.select(F.col(id_col), cosine(_vec(vec_col), q).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    planes: list[list[float]] | None = None,
    dims: int | None = None,
    n_planes: int = 8,
    seed: int = 42,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Embedding-based near-duplicate PAIR mining at corpus scale: LSH
    hyperplane bucketing (map-only) → within-bucket self-join (equi-join on
    bucket id — never an all-pairs cross join) → exact cosine verify at
    ``threshold``. Returns (id_a, id_b, score) with id_a < id_b.

    Same scale shape as the MinHash text path (operators/dedup.py): the
    only shuffle keys on the bucket id, and ``max_bucket`` caps degenerate
    buckets (e.g. all-zeros embeddings) so a hot bucket cannot go
    quadratic. Recall is bucket-limited by construction — raise
    ``n_planes``-probes or union several plane seeds for higher recall;
    candidates are always verified exactly, so precision is 1.0.
    """
    if planes is None:
        if dims is None:
            raise ValueError("pass planes= or dims=")
        planes = random_hyperplanes(dims, n_planes, seed)
    bucketed = lsh_bucket(df, vec_col, id_col, planes).select(
        F.col(id_col).alias("__id"), _vec(vec_col).alias("__v"), "bucket"
    )
    # cap pathological buckets before the self-join
    counts = bucketed.groupBy("bucket").count()
    bucketed = bucketed.join(
        F.broadcast(counts.filter(F.col("count") <= max_bucket).select("bucket")),
        "bucket",
    )
    a = bucketed.select(
        "bucket", F.col("__id").alias("id_a"), F.col("__v").alias("__va")
    )
    b = bucketed.select(
        "bucket", F.col("__id").alias("id_b"), F.col("__v").alias("__vb")
    )
    pairs = (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("score", cosine(F.col("__va"), F.col("__vb")))
        .filter(F.col("score") >= F.lit(float(threshold)))
        .select("id_a", "id_b", F.round("score", 6).alias("score"))
    )
    return pairs.dropDuplicates(["id_a", "id_b"])


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: k-means coarse quantizer + nprobe search


def ivf_index(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_lists: int = 16,
    seed: int = 42,
    max_iter: int = 20,
):
    """Build an IVF index: k-means centroids (Spark ML, distributed) and the
    corpus tagged with its nearest-centroid list id.

    Returns (assigned_df, centroids) where ``assigned_df`` = df columns +
    ``list_id`` and ``centroids`` = [[float,...], ...]. At scale, write
    ``assigned_df`` partitioned by ``list_id`` so a probe reads only
    nprobe/n_lists of the data (partition pruning).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.withColumn("__features", array_to_vector(_vec(vec_col)))
    model = KMeans(
        k=n_lists, seed=seed, maxIter=max_iter, featuresCol="__features",
        predictionCol="list_id",
    ).fit(feat)
    assigned = model.transform(feat).drop("__features")
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return assigned, centroids


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """ANN top-k: rank centroids by cosine to the query driver-side (tiny),
    scan only the ``nprobe`` nearest lists, exact cosine rerank. The
    ``list_id`` filter is the IVF pruning step — with list-partitioned
    storage it becomes partition pruning instead of a filter."""
    import math as _m

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = _m.sqrt(sum(x * x for x in a)) or 1.0
        nb = _m.sqrt(sum(x * x for x in b)) or 1.0
        return dot / (na * nb)

    ranked = sorted(range(len(centroids)), key=lambda i: -cos(query, centroids[i]))
    probes = ranked[: max(1, nprobe)]
    q = F.array(*[F.lit(float(x)) for x in query])
    cand = assigned.filter(F.col("list_id").isin(probes))
    return (
        cand.select(F.col(id_col), cosine(_vec(vec_col), q).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )
