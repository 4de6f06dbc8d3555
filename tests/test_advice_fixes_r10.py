"""Pins for the round-10 advice fixes (ADVICE r9).

1. _seq_fold_groups guards against skewed batches: one very long geometry
   among many short rows previously made the ordinal fold cost
   O(max_vertices x rows); the guard finishes the long tail per-group in
   Python while keeping the result bit-identical to the sequential fold.
2. mixture_sample's hash-mode key is injective: the source value is
   length-prefixed, so source 'a:1'/id '2' no longer hashes identically
   to source 'a'/id '1:2' (which correlated keep-draws across sources).
   The DuckDB oracle mirror in __spark_entry__ uses the same key.
3. _sweep_dead_scratch gains an mtime-age second signal: dirs older than
   the threshold sweep even when a recycled PID probe reads "alive", and
   fresh dirs of live PIDs stay.
"""

from __future__ import annotations

import pytest

import os
import time

import numpy as np

from datafusion_spatial_spark.functions._fastpath import _seq_fold_groups


def _naive_fold(terms, group_start, group_len):
    out = np.zeros(group_start.size, dtype=np.float64)
    for g in range(group_start.size):
        a = np.float64(0.0)
        s, n = int(group_start[g]), int(group_len[g])
        for t in terms[s : s + n]:
            a = a + t
        out[g] = a
    return out


def test_seq_fold_groups_skewed_batch_bit_exact():
    rng = np.random.default_rng(10)
    # 1000 short groups (2 terms) + one 20_000-term giant: engages the guard
    lens = np.full(1001, 2, dtype=np.int64)
    lens[500] = 20_000
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    terms = rng.standard_normal(int(lens.sum())) * rng.choice(
        [1e-9, 1.0, 1e9], size=int(lens.sum())
    )
    got = _seq_fold_groups(terms, starts, lens)
    exp = _naive_fold(terms, starts, lens)
    assert got.shape == exp.shape
    assert np.array_equal(got, exp)  # bit-exact, NaN-free input


def test_seq_fold_groups_uniform_and_empty_paths_unchanged():
    rng = np.random.default_rng(11)
    lens = rng.integers(0, 7, size=50).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    terms = rng.standard_normal(int(lens.sum()))
    assert np.array_equal(
        _seq_fold_groups(terms, starts, lens), _naive_fold(terms, starts, lens)
    )
    empty = np.zeros(0, dtype=np.float64)
    assert _seq_fold_groups(empty, np.zeros(0, np.int64), np.zeros(0, np.int64)).size == 0


def test_seq_fold_groups_skew_guard_is_fast():
    # the pre-fix fold pays maxlen x ng masked steps; with the guard the
    # skewed case must not be drastically slower than the naive total-work
    # bound. A loose wall-clock sanity pin, not a micro-benchmark.
    lens = np.full(20_000, 2, dtype=np.int64)
    lens[0] = 200_000
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    terms = np.ones(int(lens.sum()), dtype=np.float64)
    t0 = time.perf_counter()
    out = _seq_fold_groups(terms, starts, lens)
    elapsed = time.perf_counter() - t0
    assert out[0] == 200_000.0 and out[1] == 2.0
    # pre-fix this shape runs ~200k steps x 20k-wide masks (minutes);
    # guarded it is ~2 vectorized steps + one 200k-term Python fold
    assert elapsed < 5.0


def _mixture_fracs(counts: dict, weights: dict) -> dict:
    """mixture_sample's fraction arithmetic, operation-for-operation."""
    total_w = sum(weights.values())
    matched = [s for s in weights if s in counts and weights[s] > 0]
    scale = min(counts[s] / (weights[s] / total_w) for s in matched)
    return {
        s: min(1.0, (weights.get(s, 0.0) / total_w) * scale / counts[s])
        for s in counts
    }


def test_mixture_hash_key_injective_across_colon_sources(spark):
    from datafusion_spatial_spark.operators.corpus import mixture_sample

    # ('a:1', 'X') and ('a', '1:X') built identical keys pre-fix, so their
    # keep-draws were perfectly correlated. Source 'b' is over-demanded so
    # both ambiguous sources land at fraction 0.5 (not the trivial 1.0).
    rows = (
        [("a:1", str(i)) for i in range(400)]
        + [("a", "1:" + str(i)) for i in range(400)]
        + [("b", "b" + str(i)) for i in range(400)]
    )
    df = spark.createDataFrame(rows, "source string, doc_id string")
    weights = {"a:1": 1.0, "a": 1.0, "b": 2.0}
    fr = _mixture_fracs({"a:1": 400, "a": 400, "b": 400}, weights)
    assert fr["a:1"] == fr["a"] and fr["a:1"] < 1.0  # test is meaningful
    out = mixture_sample(
        df, "source", target_weights=weights, seed=3, method="hash",
        id_col="doc_id",
    ).collect()
    kept_a1 = {r.doc_id for r in out if r.source == "a:1"}
    kept_a = {r.doc_id[2:] for r in out if r.source == "a"}
    # pre-fix these sets were EQUAL by construction (same u, same frac);
    # post-fix the 400 draws are independent -> equality has p ~ 2^-400
    assert kept_a1 != kept_a


@pytest.mark.slow
def test_mixture_hash_oracle_mirror_matches_spark(spark, tmp_path):
    """The entry oracle's length-prefixed key reproduces Spark's kept set
    on colon-bearing sources (the gate corpus has no ':' sources, so this
    pins the mirror on the adversarial case directly)."""
    import duckdb

    from datafusion_spatial_spark.operators.corpus import mixture_sample
    from datafusion_spatial_spark.operators.hashing import P, poly_hash_str_duckdb

    rows = (
        [("a:1", str(i)) for i in range(120)]
        + [("a", "1:" + str(i)) for i in range(120)]
        + [("b", "b" + str(i)) for i in range(120)]
    )
    df = spark.createDataFrame(rows, "source string, doc_id string")
    pq = str(tmp_path / "docs.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(pq)
    weights = {"a:1": 1.0, "a": 1.0, "b": 2.0}
    kept = mixture_sample(
        df, "source", target_weights=weights, seed=7, method="hash",
        id_col="doc_id",
    )
    got = sorted((r.source, r.doc_id) for r in kept.collect())

    fr = _mixture_fracs({"a:1": 120, "a": 120, "b": 120}, weights)
    mph = poly_hash_str_duckdb(
        "concat(cast(length(source) AS VARCHAR), ':', source, ':', "
        "cast(doc_id AS VARCHAR), ':mix:7')"
    )
    frac_case = " ".join(
        f"WHEN '{s}' THEN CAST({v!r} AS DOUBLE)" for s, v in fr.items()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}/*.parquet')"
    )
    oracle = con.execute(
        f"""
        SELECT source, doc_id FROM documents
        WHERE {mph} / {float(P)!r} < CASE source {frac_case} END
        ORDER BY source, doc_id
        """
    ).fetchall()
    assert got == sorted(oracle)
    assert len(got) > 0


def test_sweep_dead_scratch_age_signal(tmp_path):
    """r11 advice revision: an old dir whose PID is verifiably alive AND
    started before the dir existed is the legitimate owner — KEPT (a >24h
    replay must not lose its scratch mid-run). The age signal only sweeps
    when ownership is unverifiable; see test_advice_fixes_r11 for the
    recycled-PID and EPERM branches."""
    import __spark_entry__ as entry_mod

    root = str(tmp_path)
    # dir named with a LIVE pid (our parent, started long before the dir)
    # and ancient mtime -> KEPT: the owner is alive and verifiable
    live_pid = os.getppid()
    old_live = os.path.join(root, f"gate-{live_pid}")
    os.makedirs(old_live)
    past = time.time() - 3 * 86400
    os.utime(old_live, (past, past))
    # fresh dir of the same live pid -> kept (PID probe says alive)
    fresh_live = os.path.join(root, f"other-{live_pid}")
    os.makedirs(fresh_live)
    # dead-pid dir, fresh -> swept by the PID signal as before
    dead = os.path.join(root, "gate-999999999")
    os.makedirs(dead)
    # non-pid-suffixed dir -> never touched, however old
    plain = os.path.join(root, "not-a-scratch")
    os.makedirs(plain)
    os.utime(plain, (past, past))

    entry_mod._sweep_dead_scratch(root)
    assert os.path.isdir(old_live)
    assert os.path.isdir(fresh_live)
    assert not os.path.isdir(dead)
    assert os.path.isdir(plain)
