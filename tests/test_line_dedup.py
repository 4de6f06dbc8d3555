"""line_dedup (C4/RefinedWeb boilerplate-line removal) and the
ensure_min_parallelism under-parallel-scan guard (both r7)."""

import pytest
from pyspark.sql import functions as F

from datafusion_spatial_spark.operators.dedup import line_dedup
from datafusion_spatial_spark.operators.skew import ensure_min_parallelism


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "COOKIE BANNER\nalpha unique text\nfooter legal line"),
        (2, "COOKIE BANNER\nbeta body text\nfooter legal line"),
        (3, "COOKIE BANNER\ngamma content here\nfooter legal line"),
        (4, "delta standalone doc\nxy"),  # 'xy' short: kept, never counted
        (5, "COOKIE BANNER"),  # reduces to empty
    ]
    return spark.createDataFrame(rows, ["doc_id", "content"])


class TestLineDedup:
    def test_hot_lines_removed_everywhere(self, docs):
        out = {
            r.doc_id: r
            for r in line_dedup(
                docs, "content", "doc_id", max_doc_freq=2,
                min_line_chars=3, hash_fn="exact",
            ).collect()
        }
        # banner+footer occur in 3 docs (> 2) -> dropped from all of them
        assert out[1].clean_text == "alpha unique text"
        assert out[2].clean_text == "beta body text"
        assert out[3].clean_text == "gamma content here"
        assert out[1].n_lines == 3 and out[1].n_dropped == 2

    def test_short_lines_immune(self, docs):
        out = {
            r.doc_id: r
            for r in line_dedup(
                docs, "content", "doc_id", max_doc_freq=2,
                min_line_chars=3, hash_fn="exact",
            ).collect()
        }
        assert out[4].clean_text == "delta standalone doc\nxy"
        assert out[4].n_dropped == 0

    def test_fully_boilerplate_doc_kept_as_empty(self, docs):
        out = {
            r.doc_id: r
            for r in line_dedup(
                docs, "content", "doc_id", max_doc_freq=2,
                min_line_chars=3, hash_fn="exact",
            ).collect()
        }
        # every input doc survives as a row, even when emptied
        assert set(out) == {1, 2, 3, 4, 5}
        assert out[5].clean_text == "" and out[5].n_dropped == 1

    def test_freq_threshold_boundary(self, docs):
        # max_doc_freq=3: the footer appears in exactly 3 docs -> kept;
        # the banner appears in 4 (docs 1,2,3,5) -> still dropped from all 4
        out = {
            r.doc_id: r
            for r in line_dedup(
                docs, "content", "doc_id", max_doc_freq=3,
                min_line_chars=3, hash_fn="exact",
            ).collect()
        }
        assert sum(r.n_dropped for r in out.values()) == 4
        assert out[1].clean_text == "alpha unique text\nfooter legal line"
        assert out[5].clean_text == ""

    def test_order_preserved(self, spark):
        text = "\n".join(f"unique line number {i}" for i in range(20))
        df = spark.createDataFrame([(1, text)], ["doc_id", "content"])
        out = line_dedup(
            df, "content", "doc_id", max_doc_freq=1, hash_fn="exact"
        ).collect()[0]
        assert out.clean_text == text  # nothing hot, original order intact


    def test_null_text_row_survives(self, spark):
        # r7 review fix: posexplode of a null split array emits nothing,
        # so a NULL-text document silently vanished from the output
        rows = [(1, "keep me"), (2, None)]
        df = spark.createDataFrame(rows, "doc_id int, content string")
        out = {
            r.doc_id: r
            for r in line_dedup(
                df, "content", "doc_id", max_doc_freq=1, hash_fn="exact"
            ).collect()
        }
        assert set(out) == {1, 2}
        assert out[2].clean_text == "" and out[2].n_dropped == 0

    @pytest.mark.parametrize("hash_fn", ["poly", "xxhash64"])
    def test_hash_paths_match_exact(self, docs, hash_fn):
        kw = dict(max_doc_freq=2, min_line_chars=3)
        exact = line_dedup(docs, "content", "doc_id", hash_fn="exact", **kw)
        hashed = line_dedup(docs, "content", "doc_id", hash_fn=hash_fn, **kw)
        assert sorted(map(tuple, exact.collect())) == sorted(
            map(tuple, hashed.collect())
        )


class TestEnsureMinParallelism:
    def test_spreads_single_partition(self, spark):
        df = spark.range(1000).coalesce(1)
        out = ensure_min_parallelism(df, min_partitions=8)
        assert out.rdd.getNumPartitions() == 8
        assert out.count() == 1000

    def test_noop_when_parallel_enough(self, spark):
        df = spark.range(1000).repartition(8)
        out = ensure_min_parallelism(df, min_partitions=4)
        assert out is df  # structurally untouched — no added shuffle


class TestPlanShape:
    def test_line_dedup_plan(self, spark):
        # scale contract: equi-joins only (no cartesian), bounded shuffles
        rows = [(i, f"line a\nline b{i}\nline c") for i in range(50)]
        df = spark.createDataFrame(rows, ["doc_id", "content"])
        out = line_dedup(df, "content", "doc_id", max_doc_freq=2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_pack_sequences_payload_stays_jvm_side(self, spark):
        # only (group, id, n) enter the Python worker: the payload column
        # must not appear in the ArrowEvalPython/FlatMapGroupsInPandas input
        from datafusion_spatial_spark.operators.corpus import pack_sequences

        rows = [(i, 10, "p" * 100) for i in range(20)]
        df = spark.createDataFrame(rows, ["doc_id", "n_tokens", "payload"])
        out = pack_sequences(df, "doc_id", "n_tokens", 64)
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        import re
        m = re.search(r"FlatMapGroupsInPandas.*", plan)
        assert m and "payload" not in m.group(0)


def test_duplicate_spans_basic(spark):
    """ExactSubstr-style duplicate spans (r12): k-windows repeated in >=
    min_doc_count distinct docs merge into maximal per-doc spans."""
    from datafusion_spatial_spark.operators.dedup import duplicate_spans

    rows = [
        (1, "a b c d e f g h unique one two three"),
        (2, "x y a b c d e f g h z w"),
        (3, "totally different words here only"),
        (4, "a b c d e f g h padding a b c d e f g h"),
        (5, None),
        (6, "short text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = duplicate_spans(
        df, "text", "doc_id", k=8, min_doc_count=2, hash_fn="exact"
    )
    res = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
        for r in out.collect()
    )
    # the shared 8-token run a..h: doc1 at [0,8), doc2 at [2,10),
    # doc4 twice (non-overlapping -> two spans); doc3/5/6 emit nothing
    assert res == [(1, 0, 8, 1), (2, 2, 10, 1), (4, 0, 8, 1),
                   (4, 9, 17, 1)]


def test_duplicate_spans_merging_and_hash_fns(spark):
    """Overlapping duplicate windows merge into ONE span; hash_fn
    variants agree with the exact-string keying."""
    from datafusion_spatial_spark.operators.dedup import duplicate_spans

    shared = "one two three four five six seven eight nine ten"
    rows = [
        (1, f"{shared} tail_a"),
        (2, f"head_b {shared}"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for fn in ("exact", "xxhash64", "poly"):
        out = sorted(
            (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
            for r in duplicate_spans(
                df, "text", "doc_id", k=8, min_doc_count=2, hash_fn=fn
            ).collect()
        )
        # 10 shared tokens, k=8 -> 3 overlapping windows each,
        # merged to one span per doc
        assert out == [(1, 0, 10, 3), (2, 1, 11, 3)], fn


def test_duplicate_spans_plan_shape(spark):
    """Scale-shape pin: no cartesian/BNLJ, no Python, equi-joins only."""
    from datafusion_spatial_spark.operators.dedup import duplicate_spans

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id long, text string"
    )
    out = duplicate_spans(df, "text", "doc_id", k=2, min_doc_count=2)
    plan = out._jdf.queryExecution().executedPlan().toString() if (
        out.collect() is not None
    ) else ""
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "Python" not in plan  # pure Catalyst end-to-end


def test_remove_duplicate_spans(spark):
    """Span REMOVAL composition: duplicated spans drop from every doc,
    survivors re-join on single spaces; empty/NULL docs count 0 tokens."""
    from datafusion_spatial_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    rows = [
        (1, "a b c d e f g h unique one two three"),
        (2, "x y a b c d e f g h z w"),
        (3, "totally different words here only"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(
        (r["doc_id"], r["clean_text"], r["n_tokens"],
         r["n_dropped_tokens"])
        for r in remove_duplicate_spans(
            df, "text", "doc_id", k=8, min_doc_count=2, hash_fn="exact"
        ).collect()
    )
    assert out == [
        (1, "unique one two three", 12, 8),
        (2, "x y z w", 12, 8),
        (3, "totally different words here only", 5, 0),
        (5, "", 0, 0),
    ]
