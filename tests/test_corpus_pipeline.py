"""End-to-end corpus pipeline integration (r7): line cleanup →
filter → dedup → decontaminate → split → shard → pack, plus a
randomized line_dedup reference-parity battery."""

import random

import pytest
from pyspark.sql import functions as F

from datafusion_spatial_spark.operators.corpus import (
    pack_sequences,
    prepare_training_corpus,
    shuffle_shards,
)
from datafusion_spatial_spark.operators.dedup import line_dedup
from datafusion_spatial_spark.operators.text import token_count


def _mk_docs(spark):
    banner = "SUBSCRIBE TO OUR NEWSLETTER TODAY please"
    uniq = [
        " ".join(f"w{i}t{j}" for j in range(30)) for i in range(12)
    ]
    rows = []
    for i, u in enumerate(uniq):
        rows.append((i, banner + "\n" + u))
    rows.append((100, banner + "\n" + uniq[0]))  # exact dup of doc 0
    rows.append((101, "tiny"))  # fails min_tokens
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestPreparePipeline:
    def test_all_stages_compose(self, spark):
        docs = _mk_docs(spark)
        bench = spark.createDataFrame(
            [(" ".join(f"w3t{j}" for j in range(30)),)], ["text"]
        )  # contaminates doc 3 (whole-line 13-gram overlap)
        out = prepare_training_corpus(
            docs, "text", "doc_id",
            min_quality=0.0, min_tokens=5, near_dup=False,
            line_max_doc_freq=2,  # banner is in 14 docs -> removed
            bench_df=bench,
        )
        rows = {r.doc_id: r for r in out.collect()}
        # 101 (tiny) filtered; one of {0,100} deduped; 3 decontaminated
        assert 101 not in rows and 3 not in rows
        assert len({0, 100} & set(rows)) == 1
        # banner stripped from every surviving text
        assert all("SUBSCRIBE" not in r.text for r in rows.values())
        assert all(r.split in ("train", "val", "test") for r in rows.values())

    def test_then_shard_and_pack(self, spark):
        docs = _mk_docs(spark)
        out = prepare_training_corpus(
            docs, "text", "doc_id", min_quality=0.0, min_tokens=5,
            near_dup=False, line_max_doc_freq=2,
        ).withColumn("n_tokens", token_count("text"))
        packed = pack_sequences(
            shuffle_shards(out, "doc_id", 2), "doc_id", "n_tokens", 64,
            shard_col="shard",
        )
        tot = packed.groupBy("shard", "seq_id").agg(
            F.sum("n_tokens").alias("t"), F.count("*").alias("n")
        ).collect()
        assert all(r.t <= 64 or r.n == 1 for r in tot)
        assert packed.count() == out.count()


def _line_dedup_oracle(rows, max_doc_freq, min_line_chars):
    from collections import defaultdict

    docfreq = defaultdict(set)
    for i, t in rows:
        for ln in t.split("\n"):
            k = ln.strip()
            if len(k) >= min_line_chars:
                docfreq[k].add(i)
    hot = {k for k, ids in docfreq.items() if len(ids) > max_doc_freq}
    out = {}
    for i, t in rows:
        lines = t.split("\n")
        kept = [
            ln for ln in lines
            if not (len(ln.strip()) >= min_line_chars and ln.strip() in hot)
        ]
        dropped = len(lines) - len(kept)
        out[i] = ("\n".join(kept), len(lines), dropped)
    return out


class TestLineDedupRandomized:
    @pytest.mark.parametrize("seed", [3, 17, 99])
    def test_reference_parity(self, spark, seed):
        rng = random.Random(seed)
        vocab = [f"tok{i}" for i in range(12)]
        shared = [
            " ".join(rng.choices(vocab, k=rng.randint(1, 6)))
            for _ in range(8)
        ]
        rows = []
        for i in range(40):
            lines = []
            for _ in range(rng.randint(1, 8)):
                if rng.random() < 0.4:
                    lines.append(rng.choice(shared))
                else:
                    lines.append(
                        " ".join(rng.choices(vocab, k=rng.randint(0, 5)))
                    )
            rows.append((i, "\n".join(lines)))
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {
            r.doc_id: (r.clean_text, r.n_lines, r.n_dropped)
            for r in line_dedup(
                df, "text", "doc_id", max_doc_freq=2, min_line_chars=4,
                hash_fn="exact",
            ).collect()
        }
        assert got == _line_dedup_oracle(rows, 2, 4)


def test_chunk_documents(spark):
    from datafusion_spatial_spark.operators.corpus import chunk_documents

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y"), (3, "")],
        "doc_id long, text string",
    )
    out = chunk_documents(
        df, "text", "doc_id", chunk_tokens=3, overlap_tokens=1
    ).orderBy("doc_id", "chunk_index").collect()
    got = [(r.doc_id, r.chunk_index, r.chunk) for r in out]
    assert got == [
        (1, 0, "a b c"), (1, 1, "c d e"), (1, 2, "e f g"), (1, 3, "g"),
        (2, 0, "x y"), (3, 0, ""),
    ]
    # overlap invariant: consecutive chunks share exactly overlap tokens
    # (when both are full windows)
    full = [c for _, _, c in got[:3]]
    for a, b in zip(full, full[1:]):
        assert a.split()[-1] == b.split()[0]
    # no shuffle in the plan: chunking must stay map-only
    plan = chunk_documents(
        df, "text", "doc_id", chunk_tokens=3, overlap_tokens=1
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    with pytest.raises(ValueError):
        chunk_documents(df, "text", "doc_id", chunk_tokens=4, overlap_tokens=4)


def test_semantic_dedup(spark):
    from datafusion_spatial_spark.operators.simsearch import semantic_dedup

    rows = [
        (1, [1.0, 0.0]), (2, [0.999, 0.03]), (3, [0.0, 1.0]),
        (4, [1.0, 0.001]), (5, [0.0, 0.999]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, emb array<double>")
    surv = sorted(
        r.vec_id
        for r in semantic_dedup(
            df, "emb", "vec_id", threshold=0.999, dims=2, n_planes=4
        ).collect()
    )
    # {1,2,4} collapse to 1; {3,5} collapse to 3
    assert surv == [1, 3]
    # survivors carry the full input row (payload never re-exchanged)
    row = semantic_dedup(
        df, "emb", "vec_id", threshold=0.999, dims=2, n_planes=4
    ).filter("vec_id = 1").collect()[0]
    assert list(row.emb) == [1.0, 0.0]
    # threshold high enough that nothing pairs -> everything survives
    all_surv = semantic_dedup(
        df, "emb", "vec_id", threshold=1.0000001, dims=2, n_planes=4
    ).count()
    assert all_surv == 5


def test_semantic_dedup_small_corpus_single_band(spark):
    """r12 (VERDICT r11 #3): at or below _BANDS1_CORPUS_ROWS the banded
    defaults collapse to bands=1 using the count the op already takes —
    the result must be IDENTICAL to the explicit single-band call with
    the same auto-scaled plane count (bands=1 slices the first r planes
    of the same seeded sequence), and the threshold still respects the
    probe scales staying banded."""
    import math

    from datafusion_spatial_spark.operators import simsearch as ss

    rows = [(i, [math.cos(i * 0.37), math.sin(i * 0.37)]) for i in range(40)]
    rows += [(100 + i, rows[i][1]) for i in range(10)]  # exact dups
    df = spark.createDataFrame(rows, "vec_id long, emb array<double>")
    n = df.count()
    assert n <= ss._BANDS1_CORPUS_ROWS  # the collapse engages
    # auto path (defaults: bands=4, auto_scale_target=64) vs explicit
    # single band at the same derived r
    r = max(8, math.ceil(math.log2(max(2.0, n / 64.0))))
    auto = sorted(
        x.vec_id for x in ss.semantic_dedup(
            df, "emb", "vec_id", threshold=0.999, dims=2
        ).collect()
    )
    explicit = sorted(
        x.vec_id for x in ss.semantic_dedup(
            df, "emb", "vec_id", threshold=0.999,
            planes=ss.random_hyperplanes(2, r, 42),
        ).collect()
    )
    assert auto == explicit
    # the probe scales (60k / 200k rows) must remain ABOVE the collapse
    # threshold so the 100x re-probe still measures the banded path
    assert ss._BANDS1_CORPUS_ROWS < 60_000


def test_token_counts_and_vocab(spark):
    """r13: corpus token-frequency table + ranked vocabulary
    (tokenizer-training preprocessing). Deterministic (count desc,
    token asc) total order; min_count prunes the tail; null/blank text
    contributes nothing."""
    from datafusion_spatial_spark.operators.corpus import (
        token_counts,
        vocab,
    )

    df = spark.createDataFrame(
        [(1, "x y y z z z"), (2, "z w w x"), (3, None), (4, "   ")],
        "id long, text string",
    )
    tc = {r["token"]: r["count"] for r in token_counts(df, "text").collect()}
    assert tc == {"x": 2, "y": 2, "z": 4, "w": 2}
    tc2 = {r["token"]: r["count"]
           for r in token_counts(df, "text", min_count=3).collect()}
    assert tc2 == {"z": 4}
    v = vocab(df, "text", size=3).collect()
    assert [(r["token"], r["count"], r["rank"]) for r in v] == [
        ("z", 4, 1), ("w", 2, 2), ("x", 2, 3),
    ]
    # TakeOrderedAndProject (bounded top-k merge), never a global sort
    plan = vocab(df, "text", size=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_pair_counts_bpe_statistic(spark):
    """r13: adjacent token-pair counts (the BPE merge statistic) —
    zip_with shift, no self-join; single-token/null/blank rows
    contribute nothing."""
    from datafusion_spatial_spark.operators.corpus import pair_counts

    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "b c"), (3, None), (4, "solo"), (5, " ")],
        "id long, text string",
    )
    pc = {r["pair"]: r["count"] for r in pair_counts(df, "text").collect()}
    assert pc == {"a b": 2, "b a": 1, "b c": 2}
    pc2 = {r["pair"]: r["count"]
           for r in pair_counts(df, "text", min_count=2).collect()}
    assert pc2 == {"a b": 2, "b c": 2}


# heavy battery file: certification tier only (r15 tiering, VERDICT r14 #9)
pytestmark = pytest.mark.slow
