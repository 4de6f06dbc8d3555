"""Pins for the round-13 ADVICE fixes (applied in round 14).

1. (low) simsearch._near_dup_pairs_banded no longer localCheckpoint()s
   its shared base frame — it persists (MEMORY_AND_DISK, lineage
   retained) and materializes with an explicit count(), so an executor
   loss recomputes instead of failing. Pinned behaviorally: the banded
   path's pair set still equals the per-band-union fallback's on a
   fixture where numpy/Catalyst bucket ties cannot occur.
2. (low) the banded docstring no longer overclaims bit-identical pair
   sets — it now states "up to float-summation-order bucket ties".
3. (low) corpus.pair_counts filters empty tokens from the ARRAY before
   pairing, so a custom ``sep`` (e.g. '_') cannot leak empty-token
   pairs and pairs spanning an empty token are bridged, matching
   token_counts' empty-token semantics.
4. (low) plans/sql._match_postagg_chain verifies the matched call's
   closing paren is the last char of the text; an expression argument
   like ``ST_AsText(ST_Union(g) || x)`` now falls through to the
   ordinary scalar path and its clear unsupported-shape error instead
   of failing resolution with a garbled aggregate argument.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_spatial_spark.operators.corpus import (
    pair_counts,
    token_counts,
)
from datafusion_spatial_spark.operators.simsearch import (
    _near_dup_pairs_banded,
    _near_dup_pairs_one_band,
    cosine_near_dup_pairs,
    random_hyperplanes,
)
from datafusion_spatial_spark.plans.sql import _match_postagg_chain


# --- 1: banded candidate join survives the persist rewrite ----------------

def _embed_df(spark, n=40, dims=8, seed=7):
    import random as _r

    rng = _r.Random(seed)
    rows = []
    for i in range(n):
        base = [rng.uniform(-1, 1) for _ in range(dims)]
        rows.append((i * 2, base))
        # a near-duplicate of every row, so real pairs exist
        rows.append((i * 2 + 1, [v + rng.uniform(-1e-3, 1e-3) for v in base]))
    return spark.createDataFrame(rows, "id long, emb array<double>")


def test_banded_pairs_match_per_band_union(spark):
    df = _embed_df(spark)
    planes = random_hyperplanes(8, 12, seed=3)
    groups = [planes[k * 4:(k + 1) * 4] for k in range(3)]
    banded = _near_dup_pairs_banded(df, "emb", "id", 0.99, groups, None)
    assert banded is not None
    got = {(r["id_a"], r["id_b"]) for r in banded.collect()}

    fallback = None
    for grp in groups:
        p = _near_dup_pairs_one_band(df, "emb", "id", 0.99, grp, None)
        fallback = p if fallback is None else fallback.unionAll(p)
    want = {
        (r["id_a"], r["id_b"])
        for r in fallback.dropDuplicates(["id_a", "id_b"]).collect()
    }
    assert got == want
    assert len(got) >= 40  # every (2i, 2i+1) near-dup pair that co-buckets


def test_banded_base_is_persisted_not_checkpointed():
    import inspect

    from datafusion_spatial_spark.operators import simsearch

    src = inspect.getsource(simsearch._near_dup_pairs_banded)
    assert "base.localCheckpoint()" not in src  # docstring may mention it
    assert "persist" in src and "MEMORY_AND_DISK" in src
    # the docstring documents the eager side effect and softened claim
    doc = simsearch._near_dup_pairs_banded.__doc__
    assert "float-summation-order" in doc
    assert "identical to the per-band union in every case" not in doc


def test_public_near_dup_still_finds_planted_pairs(spark):
    df = _embed_df(spark, n=25)
    out = cosine_near_dup_pairs(
        df, "emb", "id", threshold=0.999, dims=8, bands=3, n_planes=4
    )
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    # planted (2i, 2i+1) duplicates overwhelmingly co-bucket; require
    # most to surface (LSH may drop a handful whose planes split them)
    planted = {(2 * i, 2 * i + 1) for i in range(25)}
    assert len(pairs & planted) >= 15


# --- 3: pair_counts with a custom separator -------------------------------

def test_pair_counts_custom_sep_no_empty_token_pairs(spark):
    # split on '-': "a--b" used to yield pairs ('a','') and ('','b');
    # now the empty token is dropped and the pair bridges to a-b.
    df = spark.createDataFrame(
        [("a-b-c",), ("a--b",), ("-a-",), ("",), (None,)],
        "text string",
    )
    got = {
        r["pair"]: r["count"]
        for r in pair_counts(df, "text", pattern="-", sep="_").collect()
    }
    assert got == {"a_b": 2, "b_c": 1}


def test_pair_counts_default_whitespace_unchanged(spark):
    df = spark.createDataFrame(
        [("x y z",), ("  x y  ",), ("solo",)], "text string"
    )
    got = {
        r["pair"]: r["count"] for r in pair_counts(df, "text").collect()
    }
    assert got == {"x y": 2, "y z": 1}


def test_pair_counts_consistent_with_token_counts_on_empties(spark):
    # token_counts drops empty tokens entirely; pair_counts must pair
    # over the SAME filtered token stream.
    df = spark.createDataFrame([("p--q-r",)], "text string")
    toks = {
        r["token"] for r in
        token_counts(df, "text", pattern="-").collect()
    }
    assert toks == {"p", "q", "r"}
    prs = {
        r["pair"] for r in
        pair_counts(df, "text", pattern="-", sep=" ").collect()
    }
    assert prs == {"p q", "q r"}


# --- 4: postagg chain matcher paren discipline ----------------------------

def test_chain_matcher_rejects_expression_argument():
    assert _match_postagg_chain("ST_AsText(ST_Union(g) || x)") is None
    assert _match_postagg_chain("ST_AsText(ST_Union(g)) || x") is None
    assert _match_postagg_chain(
        "ST_NPoints(ST_ConvexHull(ST_Union(g)) + 1)"
    ) is None


def test_chain_matcher_still_accepts_real_chains():
    m = _match_postagg_chain("ST_AsText(ST_Union(g))")
    assert m is not None
    wrappers, agg, arg = m
    assert [w[0] for w in wrappers] == ["ST_ASTEXT"]
    assert agg == "ST_UNION" and arg == "g"

    m = _match_postagg_chain(
        "ST_NPoints(ST_ConvexHull(ST_Collect(geometry)))"
    )
    assert m is not None
    wrappers, agg, arg = m
    assert [w[0] for w in wrappers] == ["ST_NPOINTS", "ST_CONVEXHULL"]
    assert agg == "ST_COLLECT" and arg == "geometry"

    m = _match_postagg_chain("ST_Buffer(ST_Union(g), 2.5)")
    assert m is not None
    assert m[0] == [("ST_BUFFER", ["2.5"])]


# --- VERDICT r13 #8: CC spanning-forest reduction -------------------------

def test_forest_reduced_cc_exactness(spark):
    import random

    from datafusion_spatial_spark.operators.dedup import (
        connected_components,
    )

    rng = random.Random(9)
    edges = []
    for _ in range(3000):
        a, b = rng.randint(0, 999), rng.randint(0, 999)
        if a != b:
            edges.append((min(a, b), max(a, b)))
    for i in range(0, 900, 60):  # chains stress the propagation depth
        for j in range(i, i + 40):
            edges.append((j, j + 1))
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    plain = {(r.id, r.component)
             for r in connected_components(df).collect()}
    for passes in (1, 2, 3):
        red = {
            (r.id, r.component)
            for r in connected_components(
                df, forest_reduce_passes=passes
            ).collect()
        }
        assert red == plain, passes


def test_semantic_dedup_forest_default_matches_plain(spark):
    import random

    from datafusion_spatial_spark.operators.simsearch import semantic_dedup

    rng = random.Random(3)
    rows = []
    for i in range(60):
        base = [rng.uniform(-1, 1) for _ in range(8)]
        rows.append((i * 2, base))
        rows.append((i * 2 + 1, [v + rng.uniform(-1e-4, 1e-4) for v in base]))
    df = spark.createDataFrame(rows, "id long, emb array<double>")
    a = {r.id for r in semantic_dedup(
        df, "emb", "id", threshold=0.999, dims=8,
        forest_reduce_passes=0).collect()}
    b = {r.id for r in semantic_dedup(
        df, "emb", "id", threshold=0.999, dims=8).collect()}  # default 2
    assert a == b and len(a) <= 61


# --- r14 fuzz finding: CRLF line keys -------------------------------------

def test_line_dedup_crlf_lines_share_keys(spark):
    """A boilerplate line must be removed whether its document uses LF
    or CRLF endings — before the \\r?\\n split fix, the CRLF variant
    keyed as 'line\\r' and each style under-counted (the repro: freq
    split 2/1 under max_doc_freq=2 and NOTHING was removed)."""
    from datafusion_spatial_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame([
        (1, "keep me\nboiler plate\nunique one"),
        (2, "boiler plate\r\nother text"),
        (3, "boiler plate\nmore stuff"),
    ], "doc_id long, text string")
    out = {
        r.doc_id: (r.clean_text, r.n_dropped)
        for r in line_dedup(
            docs, "text", "doc_id", max_doc_freq=2
        ).collect()
    }
    assert out[1] == ("keep me\nunique one", 1)
    assert out[2] == ("other text", 1)
    assert out[3] == ("more stuff", 1)


def test_text_repetition_crlf_line_fraction(spark):
    from datafusion_spatial_spark.operators.text import repetition_stats

    docs = spark.createDataFrame(
        [(1, "same\r\nsame\r\nsame")], "doc_id long, text string"
    )
    row = repetition_stats(docs, "text", "doc_id").collect()[0]
    # 3 identical lines -> 2/3 duplicated (the \r no longer splits the
    # final line's identity from its siblings)
    assert abs(row.dup_line_frac - 2 / 3) < 1e-9


# heavy battery file: certification tier only (r15 tiering, VERDICT r14 #9)
pytestmark = pytest.mark.slow
