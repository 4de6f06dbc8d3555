"""ANN retrieval-QUALITY gates (r14, VERDICT r13 #1).

The correctness gates prove the *implemented* pruning is value-exact vs
an oracle that mirrors the same pruning — but a pruning bug that drops
true neighbors would match its own mirror. These tests measure recall@10
against the exact brute-force cosine top-10 at sf0.01 (the driver's gate
SF) and pin the EXACT deterministic values, plus the structural
invariants that must hold for any data:

* IVF: recall is monotone non-decreasing in nprobe; probing every list
  is a full scan, so recall == 1.0 exactly.
* LSH: recall is monotone non-decreasing in the Hamming radius; radius
  == n_planes admits every bucket, so recall == 1.0 exactly.
* PQ: the ADC shortlist grows with rerank_factor, so recall is monotone
  non-decreasing; a shortlist covering the whole table reranks exactly,
  so recall == 1.0.

The same recall@10 statistic ships inside the oracle-hashed gates
(`q_lsh_ann_topk` part 'recall', `q_ivf_ann_topk` parts 'ivf_recall'/
'pq_recall'), so the driver's correctness file now records retrieval
quality, not just pruning self-consistency.
"""
from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from datafusion_spatial_spark.operators.simsearch import (
    _vec,
    cosine,
    ivf_index_pivots,
    lsh_bucket,
    pq_encode,
    pq_topk,
    random_hyperplanes,
)

SF01 = "/root/testdata/sf0.01"

# pinned sweep values at sf0.01 (500 embeddings, query vec_id=0),
# measured 2026-08-16; deterministic: pivot IVF + fixed-seed planes,
# sequential-fold cosine on both sides
IVF_RECALL = {1: 0.9, 2: 1.0, 3: 1.0, 4: 1.0, 6: 1.0, 8: 1.0}
LSH_RECALL = {0: 0.5, 1: 0.5, 2: 0.8, 3: 0.9}
GATE_RECALL = {"lsh": 0.5, "ivf": 1.0, "pq": 0.7, "sq8": 1.0}


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF01}/embeddings.parquet").cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def qvec(emb):
    return [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).collect()[0].embedding
    ]


@pytest.fixture(scope="module")
def exact10(emb, qvec):
    q = F.array(*[F.lit(float(x)) for x in qvec])
    return [
        r.vec_id
        for r in emb.select(
            "vec_id", F.round(cosine(_vec("embedding"), q), 6).alias("s")
        )
        .orderBy(F.desc("s"), "vec_id")
        .limit(10)
        .collect()
    ]


def _recall(got_ids, exact_ids):
    return len(set(got_ids) & set(exact_ids)) / 10.0


def _py_cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a)) or 1.0
    nb = math.sqrt(sum(x * x for x in b)) or 1.0
    return d / (na * nb)


def test_ivf_recall_vs_nprobe_pinned(emb, qvec, exact10):
    assigned, pivots = ivf_index_pivots(emb, "embedding", "vec_id", n_lists=8)
    assigned = assigned.cache()
    assigned.count()
    try:
        ranked = sorted(
            range(len(pivots)), key=lambda i: -_py_cos(qvec, pivots[i])
        )
        q = F.array(*[F.lit(float(x)) for x in qvec])
        got = {}
        for nprobe in sorted(IVF_RECALL):
            ids = [
                r.vec_id
                for r in assigned.filter(
                    F.col("list_id").isin(ranked[:nprobe])
                )
                .select(
                    "vec_id",
                    F.round(cosine(_vec("embedding"), q), 6).alias("s"),
                )
                .orderBy(F.desc("s"), "vec_id")
                .limit(10)
                .collect()
            ]
            got[nprobe] = _recall(ids, exact10)
        assert got == IVF_RECALL
        seq = [got[k] for k in sorted(got)]
        assert seq == sorted(seq)  # monotone in nprobe
        assert got[8] == 1.0  # probing every list IS the full scan
    finally:
        assigned.unpersist()


def test_lsh_recall_vs_radius_pinned(emb, exact10):
    planes = random_hyperplanes(E.EMB_DIMS, E.N_PLANES, seed=E.PLANES_SEED)
    bucketed = lsh_bucket(emb, "embedding", "vec_id", planes).cache()
    bucketed.count()
    try:
        qb = bucketed.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qe"), F.col("bucket").alias("qbucket")
        )
        radii = sorted(LSH_RECALL) + [E.N_PLANES]
        got = {}
        for radius in radii:
            cand = bucketed.crossJoin(F.broadcast(qb)).filter(
                F.bit_count(
                    F.col("bucket").bitwiseXOR(F.col("qbucket"))
                ) <= radius
            )
            ids = [
                r.vec_id
                for r in cand.select(
                    "vec_id",
                    F.round(
                        cosine(_vec("embedding"), _vec("qe")), 6
                    ).alias("s"),
                )
                .orderBy(F.desc("s"), "vec_id")
                .limit(10)
                .collect()
            ]
            got[radius] = _recall(ids, exact10)
        assert {k: got[k] for k in LSH_RECALL} == LSH_RECALL
        seq = [got[k] for k in radii]
        assert seq == sorted(seq)  # monotone in radius
        assert got[E.N_PLANES] == 1.0  # radius n_planes admits everything
    finally:
        bucketed.unpersist()


def test_pq_recall_vs_rerank_factor(emb, qvec, exact10):
    sub = E.EMB_DIMS // E.N_PQ_M
    rows = (
        emb.filter(F.col("embedding").isNotNull())
        .orderBy("vec_id")
        .limit(E.N_PQ_CODES)
        .collect()
    )
    normed = []
    for r in rows:
        v = [float(x) for x in r.embedding]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        normed.append([x / n for x in v])
    books = [
        [nv[j * sub:(j + 1) * sub] for nv in normed]
        for j in range(E.N_PQ_M)
    ]
    enc = pq_encode(emb, "embedding", books).cache()
    enc.count()
    try:
        got = {}
        for factor in (1, E.N_PQ_RERANK, 50):
            ids = [
                r.vec_id
                for r in pq_topk(
                    enc, books, "vec_id", qvec, k=10,
                    rerank=emb, vec_col="embedding", rerank_factor=factor,
                ).collect()
            ]
            got[factor] = _recall(ids, exact10)
        assert got[E.N_PQ_RERANK] == GATE_RECALL["pq"]
        seq = [got[k] for k in sorted(got)]
        assert seq == sorted(seq)  # shortlist grows with the factor
        assert got[50] == 1.0  # 500-row shortlist reranks the full table
    finally:
        enc.unpersist()


def test_gate_recall_legs_pinned_at_sf001(spark):
    lsh = {
        r["part"]: r["score"]
        for r in E.queries()["q_lsh_ann_topk"](spark, SF01).collect()
        if r["part"] == "recall"
    }
    assert lsh == {"recall": GATE_RECALL["lsh"]}
    ivf = {
        r["part"]: r["score"]
        for r in E.queries()["q_ivf_ann_topk"](spark, SF01).collect()
        if r["part"].endswith("_recall")
    }
    assert ivf == {
        "ivf_recall": GATE_RECALL["ivf"],
        "pq_recall": GATE_RECALL["pq"],
        # r15: 8-bit scalar quantization is near-lossless -> the exact
        # top-10 is recovered in full at gate SF
        "sq8_recall": GATE_RECALL["sq8"],
    }


# heavy battery file: certification tier only (r15 tiering, VERDICT r14 #9)
pytestmark = pytest.mark.slow
