"""r7 training-pipeline extras: benchmark decontamination, PII redaction,
Gopher-style repetition statistics."""

import pytest
from pyspark.sql import functions as F

from datafusion_spatial_spark.operators.dedup import decontaminate
from datafusion_spatial_spark.operators.text import (
    pii_counts,
    redact_pii,
    repetition_stats,
)


class TestDecontaminate:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rows = [
            (1, "the quick brown fox jumps over the lazy dog every day"),
            (2, "completely unrelated text about spark query planning"),
            (3, "a document that contains the quick brown fox jumps over "
                "the lazy dog inside a longer passage"),
            (4, "short doc"),
        ]
        return spark.createDataFrame(rows, ["doc_id", "text"])

    @pytest.fixture(scope="class")
    def bench(self, spark):
        return spark.createDataFrame(
            [("the quick brown fox jumps over the lazy dog",)], ["text"]
        )

    def test_overlapping_docs_removed(self, corpus, bench):
        out = decontaminate(
            corpus, "text", "doc_id", bench, "text", ngram_k=9
        )
        ids = {r.doc_id for r in out.collect()}
        # docs 1 and 3 contain the benchmark 9-gram; 2 and 4 survive
        assert ids == {2, 4}

    def test_no_overlap_keeps_all(self, corpus, spark):
        bench = spark.createDataFrame(
            [("nothing here matches anything at all in the corpus nope",)],
            ["text"],
        )
        out = decontaminate(corpus, "text", "doc_id", bench, "text", ngram_k=9)
        assert out.count() == 4

    def test_short_doc_only_whole_text_match(self, corpus, spark):
        # 'short doc' is < k words -> single whole-text shingle; an exact
        # whole-text benchmark row flags it, a superstring does not
        bench_exact = spark.createDataFrame([("short doc",)], ["text"])
        ids = {
            r.doc_id
            for r in decontaminate(
                corpus, "text", "doc_id", bench_exact, "text", ngram_k=9
            ).collect()
        }
        assert 4 not in ids

    def test_broadcast_in_plan(self, corpus, bench):
        out = decontaminate(corpus, "text", "doc_id", bench, "text", ngram_k=9)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Broadcast" in plan


class TestPiiRedaction:
    def test_each_kind(self, spark):
        rows = [
            ("mail me at jane.doe+x@example.co.uk thanks",),
            ("server at 192.168.1.254 port 80",),
            ("call (555) 123-4567 or 555-123-4567 now",),
            ("ssn 123-45-6789 end",),
        ]
        df = spark.createDataFrame(rows, ["t"])
        out = [r[0] for r in df.select(redact_pii("t")).collect()]
        assert out[0] == "mail me at [PII] thanks"
        assert out[1] == "server at [PII] port 80"
        assert out[2] == "call [PII] or [PII] now"
        assert out[3] == "ssn [PII] end"

    def test_clean_text_untouched(self, spark):
        df = spark.createDataFrame(
            [("just words, a date 2024-01-02, and v1.2 notation",)], ["t"]
        )
        out = df.select(redact_pii("t")).collect()[0][0]
        assert out == "just words, a date 2024-01-02, and v1.2 notation"

    def test_counts(self, spark):
        df = spark.createDataFrame(
            [("a@b.io and c@d.org from 10.0.0.1",)], ["t"]
        )
        r = df.select(pii_counts("t").alias("c")).collect()[0]["c"]
        assert r["email"] == 2 and r["ipv4"] == 1
        assert r["phone"] == 0 and r["ssn"] == 0


class TestRepetitionStats:
    def test_no_repetition(self, spark):
        df = spark.createDataFrame(
            [(1, "one two three four five six seven")], ["doc_id", "text"]
        )
        r = repetition_stats(df, "text", "doc_id").collect()[0]
        assert r.dup_line_frac == 0.0
        assert r.dup_2gram_frac == 0.0 and r.dup_3gram_frac == 0.0

    def test_repeated_ngrams(self, spark):
        # 'a b ' * 4 -> 2-grams: [a b, b a, a b, b a, a b, b a, a b] = 7,
        # distinct 2 -> dup frac 5/7
        df = spark.createDataFrame(
            [(1, "a b a b a b a b")], ["doc_id", "text"]
        )
        r = repetition_stats(df, "text", "doc_id", ngram_ks=(2,)).collect()[0]
        assert abs(r.dup_2gram_frac - 5 / 7) < 1e-9

    def test_repeated_lines(self, spark):
        df = spark.createDataFrame(
            [(1, "same line\nsame line\nother line\nsame line")],
            ["doc_id", "text"],
        )
        r = repetition_stats(df, "text", "doc_id").collect()[0]
        assert abs(r.dup_line_frac - 2 / 4) < 1e-9

    def test_empty_text(self, spark):
        df = spark.createDataFrame([(1, "")], ["doc_id", "text"])
        r = repetition_stats(df, "text", "doc_id").collect()[0]
        # split('') yields one empty line/token — no repeats, no NaN/err
        assert r.dup_line_frac == 0.0
