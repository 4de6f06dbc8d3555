"""Small-graph CC fast path (r15 optimization): the driver union-find must
produce exactly the distributed loop's (id, component=min-id) labels."""

import random

import pytest
from pyspark.sql import functions as F

from datafusion_spatial_spark.operators.dedup import connected_components


def _labels(df):
    return sorted(
        ((r.id, r.component) for r in df.collect()),
        key=lambda t: (t[0] is None, str(t[0])),
    )


def _parity(spark, pairs, id_a="id_a", id_b="id_b"):
    fast = connected_components(pairs, id_a, id_b)  # default threshold: fast path
    slow = connected_components(pairs, id_a, id_b, small_graph_threshold=None)
    assert _labels(fast) == _labels(slow)
    return _labels(fast)


def test_random_graph_parity(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(300)]
    pairs = spark.createDataFrame(edges, "id_a: long, id_b: long")
    _parity(spark, pairs)


def test_string_ids_and_chain(spark):
    chain = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(60)]
    extra = [("zz", "n000"), ("aa", "zz")]
    pairs = spark.createDataFrame(chain + extra, "id_a: string, id_b: string")
    labels = dict(_parity(spark, pairs))
    # the whole chain + aa/zz is one component; min id is "aa"
    assert set(labels.values()) == {"aa"}


def test_two_components_min_ids(spark):
    pairs = spark.createDataFrame(
        [(5, 9), (9, 7), (100, 200)], "id_a: long, id_b: long"
    )
    labels = dict(_parity(spark, pairs))
    assert labels == {5: 5, 9: 5, 7: 5, 100: 100, 200: 100}


def test_over_threshold_takes_distributed_path(spark):
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a: long, id_b: long"
    )
    # threshold smaller than the 2x-directed distinct edge count forces the
    # distributed loop; results must match the fast path
    slow = connected_components(pairs, small_graph_threshold=5)
    fast = connected_components(pairs)
    assert _labels(slow) == _labels(fast)


def test_null_endpoint_edges(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (None, 3), (4, None)], "id_a: long, id_b: long"
    )
    labels = dict(_parity(spark, pairs))
    # null never matches (join semantics): 3 and 4 stay singletons, and the
    # null node surfaces as (None, None) on both paths
    assert labels[1] == 1 and labels[2] == 1
    assert labels[3] == 3 and labels[4] == 4
    assert labels[None] is None


def test_empty_edge_list(spark):
    pairs = spark.createDataFrame([], "id_a: long, id_b: long")
    assert _parity(spark, pairs) == []
