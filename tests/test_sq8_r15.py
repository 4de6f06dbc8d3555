"""SQ8 scalar quantization (r15): exact param training, Catalyst
encode/decode, compressed-domain top-k."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_spatial_spark.operators import simsearch


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_sq8_train_exact_params(spark):
    rows = [
        (1, [0.0, 10.0, 5.0]),
        (2, [1.0, -10.0, 5.0]),
        (3, [0.5, 0.0, 5.0]),
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    mins, spans = simsearch.sq8_train(df, "v")
    assert mins == [0.0, -10.0, 5.0]
    assert spans == [1.0, 20.0, 1.0]  # constant dim -> span 1.0


def test_sq8_encode_decode_bounds(spark):
    rows = [(1, [0.0, 10.0, 5.0]), (2, [1.0, -10.0, 5.0]), (3, [0.5, 0.0, 5.0]),
            (4, None)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    mins, spans = simsearch.sq8_train(df, "v")
    enc = simsearch.sq8_encode(df, "v", mins, spans)
    got = {r.id: r.sq8_code for r in enc.collect()}
    assert got[1] == [0, 255, 0]  # extremes hit the code range exactly
    assert got[2] == [255, 0, 0]
    assert got[3] == [128, 128, 0]  # floor(0.5*255+0.5)=128
    assert got[4] is None  # null vector -> null code
    # reconstruction error bound: span/510 per dimension
    dec = enc.filter(F.col("v").isNotNull()).select(
        "id", "v",
        simsearch.sq8_decode_expr("sq8_code", mins, spans).alias("xh"),
    )
    for r in dec.collect():
        for x, xh, sp in zip(r.v, r.xh, spans):
            assert abs(x - xh) <= sp / 510 + 1e-12, (r.id, x, xh)


def test_sq8_codes_in_byte_range(spark, emb):
    mins, spans = simsearch.sq8_train(emb, "embedding")
    assert len(mins) == 64 == len(spans)
    enc = simsearch.sq8_encode(emb, "embedding", mins, spans)
    bad = enc.filter(
        F.exists("sq8_code", lambda c: (c < 0) | (c > 255))
    ).count()
    assert bad == 0


def test_sq8_topk_recall_vs_exact(spark, emb):
    qrow = emb.filter(F.col("vec_id") == 0).collect()[0]
    q = [float(x) for x in qrow.embedding]
    exact = [
        r.vec_id
        for r in simsearch.cosine_topk(emb, "embedding", "vec_id", q, k=10).collect()
    ]
    mins, spans = simsearch.sq8_train(emb, "embedding")
    enc = simsearch.sq8_encode(emb, "embedding", mins, spans).select(
        "vec_id", "sq8_code"
    )
    approx = [
        r.vec_id
        for r in simsearch.sq8_topk(
            enc, mins, spans, "vec_id", q, k=10
        ).collect()
    ]
    assert approx[0] == 0  # the query's own vector survives quantization
    assert len(set(exact) & set(approx)) >= 8  # near-lossless at 8 bits


def test_sq8_scoring_stays_jvm_side(spark, emb):
    """The compressed scan must contain no Python evaluation."""
    mins, spans = simsearch.sq8_train(emb, "embedding")
    enc = simsearch.sq8_encode(emb, "embedding", mins, spans).select(
        "vec_id", "sq8_code"
    )
    top = simsearch.sq8_topk(enc, mins, spans, "vec_id", [0.1] * 64, k=5)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sq8_train_empty_raises(spark):
    df = spark.createDataFrame([], "id long, v array<double>")
    with pytest.raises(ValueError, match="no non-null"):
        simsearch.sq8_train(df, "v")


def test_sq8_train_all_null_dimension_raises(spark):
    rows = [(1, [1.0, None, 3.0]), (2, [2.0, None, 4.0])]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    with pytest.raises(ValueError, match="NULL in every vector"):
        simsearch.sq8_train(df, "v")
