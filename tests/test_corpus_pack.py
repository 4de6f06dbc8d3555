"""shuffle_shards (deterministic global training shuffle) and
pack_sequences (exact greedy sequence packing) — r7 corpus ops."""

import pytest
from pyspark.sql import functions as F

from datafusion_spatial_spark.operators.corpus import (
    pack_sequences,
    shuffle_shards,
)


class TestShuffleShards:
    def test_deterministic_and_partition_independent(self, spark):
        df1 = spark.range(500).withColumnRenamed("id", "doc_id")
        df2 = (
            spark.range(500)
            .withColumnRenamed("id", "doc_id")
            .repartition(13)
            .sort(F.desc("doc_id"))
        )
        a = sorted(map(tuple, shuffle_shards(df1, "doc_id", 8).collect()))
        b = sorted(map(tuple, shuffle_shards(df2, "doc_id", 8).collect()))
        assert a == b  # identical (doc_id, shard, shard_pos) regardless

    def test_shard_range_and_positions(self, spark):
        df = spark.range(300).withColumnRenamed("id", "doc_id")
        out = shuffle_shards(df, "doc_id", 4).collect()
        shards = {}
        for r in out:
            assert 0 <= r.shard < 4
            shards.setdefault(r.shard, []).append(r.shard_pos)
        for poss in shards.values():
            assert sorted(poss) == list(range(len(poss)))  # dense 0..n-1

    def test_seed_changes_layout(self, spark):
        df = spark.range(200).withColumnRenamed("id", "doc_id")
        a = {r.doc_id: r.shard for r in shuffle_shards(df, "doc_id", 8, seed=1).collect()}
        b = {r.doc_id: r.shard for r in shuffle_shards(df, "doc_id", 8, seed=2).collect()}
        assert a != b

    def test_roughly_balanced(self, spark):
        df = spark.range(4000).withColumnRenamed("id", "doc_id")
        sizes = (
            shuffle_shards(df, "doc_id", 8)
            .groupBy("shard").count().collect()
        )
        for r in sizes:
            assert 350 < r["count"] < 650  # 500 expected


def greedy_oracle(pairs, budget):
    """Reference greedy pack: pairs = [(id, n)] sorted by id."""
    out, seq, total = {}, -1, 0
    for i, n in pairs:
        if seq < 0 or total + n > budget:
            seq, total = seq + 1, 0
        out[i] = (seq, total)
        total += n
    return out


class TestPackSequences:
    def test_matches_reference_greedy(self, spark):
        import random

        rng = random.Random(7)
        rows = [(i, rng.randint(1, 600)) for i in range(400)]
        df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
        got = {
            r.doc_id: (r.seq_id, r.seq_offset)
            for r in pack_sequences(df, "doc_id", "n_tokens", 2048).collect()
        }
        assert got == greedy_oracle(sorted(rows), 2048)

    def test_never_overflows_budget(self, spark):
        import random

        rng = random.Random(11)
        rows = [(i, rng.randint(1, 900)) for i in range(300)]
        df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
        out = pack_sequences(df, "doc_id", "n_tokens", 1000)
        totals = out.groupBy("seq_id").agg(F.sum("n_tokens").alias("t")).collect()
        assert all(r.t <= 1000 for r in totals)

    def test_oversized_doc_isolated(self, spark):
        rows = [(1, 100), (2, 5000), (3, 100)]
        df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
        got = {
            r.doc_id: (r.seq_id, r.seq_offset)
            for r in pack_sequences(df, "doc_id", "n_tokens", 1000).collect()
        }
        assert got[2] == (1, 0)  # alone in its own sequence
        assert got[1] == (0, 0) and got[3] == (2, 0)

    def test_sharded_packing(self, spark):
        rows = [(i, 300, i % 3) for i in range(90)]
        df = spark.createDataFrame(rows, ["doc_id", "n_tokens", "shard"])
        out = pack_sequences(df, "doc_id", "n_tokens", 1000, shard_col="shard")
        # within each shard: 3 docs of 300 per sequence (4th would hit 1200)
        per = (
            out.groupBy("shard", "seq_id").count().collect()
        )
        assert all(r["count"] == 3 for r in per)
        assert out.count() == 90

    def test_payload_columns_survive(self, spark):
        rows = [(1, 10, "hello"), (2, 20, "world")]
        df = spark.createDataFrame(rows, ["doc_id", "n_tokens", "text"])
        out = pack_sequences(df, "doc_id", "n_tokens", 64).collect()
        assert {r.text for r in out} == {"hello", "world"}


class TestMixtureSample:
    def _counts(self, df):
        from collections import Counter
        return Counter(r.source for r in df.collect())

    def test_temperature_flattens(self, spark):
        rows = [(i, "big") for i in range(4000)] + [
            (10_000 + i, "small") for i in range(250)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "source"])
        from datafusion_spatial_spark.operators.corpus import mixture_sample

        out = self._counts(mixture_sample(df, "source", temperature=4.0))
        # T=4: weights 4000^.25 : 250^.25 = 1.59 : 0.79 ≈ 2 : 1.
        # 'small' is the binding source (kept ~fully); 'big' downsamples
        # to ~2x small ≈ 500.
        assert out["small"] > 200
        assert 350 < out["big"] < 700
        ratio = out["big"] / out["small"]
        assert 1.4 < ratio < 2.9  # targets 2.0, Bernoulli noise allowed

    def test_explicit_weights_ratio(self, spark):
        rows = [(i, "a") for i in range(3000)] + [
            (10_000 + i, "b") for i in range(3000)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "source"])
        from datafusion_spatial_spark.operators.corpus import mixture_sample

        out = self._counts(
            mixture_sample(df, "source", target_weights={"a": 3.0, "b": 1.0})
        )
        assert out["a"] == 3000  # over-demanded source kept whole
        assert 800 < out["b"] < 1200  # ~1000

    def test_missing_source_dropped(self, spark):
        rows = [(1, "a"), (2, "b")]
        df = spark.createDataFrame(rows, ["doc_id", "source"])
        from datafusion_spatial_spark.operators.corpus import mixture_sample

        out = self._counts(
            mixture_sample(df, "source", target_weights={"a": 1.0})
        )
        assert out.get("b", 0) == 0 and out["a"] == 1

    def test_arg_validation(self, spark):
        import pytest as _pt

        from datafusion_spatial_spark.operators.corpus import mixture_sample

        df = spark.createDataFrame([(1, "a")], ["doc_id", "source"])
        with _pt.raises(ValueError):
            mixture_sample(df, "source")
        with _pt.raises(ValueError):
            mixture_sample(df, "source", target_weights={"a": 1}, temperature=2)
        with _pt.raises(ValueError):
            mixture_sample(df, "source", target_weights={"a": 1}, method="bogus")
        with _pt.raises(ValueError):
            mixture_sample(df, "source", target_weights={"a": 1}, method="hash")

    def test_hash_mode_partition_invariant(self, spark):
        """hash-mode membership depends only on row VALUES: repartitioning
        must keep the exact same kept set (sampleBy's Bernoulli draw does
        not have this property — its RNG is seeded per partition)."""
        rows = [(i, "a") for i in range(600)] + [
            (10_000 + i, "b") for i in range(600)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "source"])
        from datafusion_spatial_spark.operators.corpus import mixture_sample

        kept = [
            {
                r.doc_id
                for r in mixture_sample(
                    df.repartition(parts), "source",
                    target_weights={"a": 2.0, "b": 1.0},
                    method="hash", id_col="doc_id",
                ).collect()
            }
            for parts in (1, 7, 32)
        ]
        assert kept[0] == kept[1] == kept[2]
        # the binding source is kept whole; the other downsampled to ~half
        a = sum(1 for i in kept[0] if i < 10_000)
        b = len(kept[0]) - a
        assert a == 600
        assert 220 < b < 380

    def test_hash_mode_null_source_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (2, None), (3, "a")], ["doc_id", "source"]
        )
        from datafusion_spatial_spark.operators.corpus import mixture_sample

        out = mixture_sample(
            df, "source", target_weights={"a": 1.0},
            method="hash", id_col="doc_id",
        ).collect()
        assert {r.doc_id for r in out} == {1, 3}

    def test_hash_mode_numeric_source_column(self, spark):
        """hash mode keys on cast(source AS STRING), so a numeric source
        column works (r9 self-review fix — bare concat on an int column
        was an AnalysisException)."""
        rows = [(i, i % 3) for i in range(300)]
        df = spark.createDataFrame(rows, ["doc_id", "source"])
        from datafusion_spatial_spark.operators.corpus import mixture_sample

        out = mixture_sample(
            df, "source", target_weights={0: 2.0, 1: 1.0},
            method="hash", id_col="doc_id",
        ).collect()
        srcs = {r.source for r in out}
        assert srcs <= {0, 1} and len(out) > 0
