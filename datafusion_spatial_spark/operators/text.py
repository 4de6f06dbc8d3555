"""Text-analysis operators for training-data pipelines.

Everything here is pure Catalyst (split/regexp/length/higher-order
functions): map-only stages that stream over any corpus size with zero
shuffle and zero Python. Each operator is also expressible in ANSI SQL for
the DuckDB oracle (see __spark_entry__.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datafusion_spatial_spark.exprcache import cached_columns
from datafusion_spatial_spark.operators.hashing import poly_hash_str
from datafusion_spatial_spark.operators.skew import ensure_min_parallelism

# Tiny deterministic stopword lists per language (heuristic language ID).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "de": ["der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "en", "que", "pour"],
}

PUNCT_CLASS = r"[^.!?,;:]"  # punct ratio = chars surviving this removal / len
BPE_ISH_TOKEN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"  # word / number / symbol


def words(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(words(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count via a BPE-flavored regex (letters runs,
    digit runs, single symbols)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_TOKEN), F.lit(0)))


def punct_ratio(col: Column | str) -> Column:
    """Punctuation chars / total chars (0 for empty)."""
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(F.regexp_replace(c, PUNCT_CLASS, ""))
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(
        n_punct / F.length(c)
    )


def stopword_hits(col: Column | str, lang: str = "en") -> Column:
    """Count of stopword tokens (lowercased exact match)."""
    w = F.transform(words(col), F.lower)
    stops = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    return F.size(F.filter(w, lambda x: F.array_contains(stops, x)))


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    return stopword_hits(col, lang) / token_count(col)


def lang_id(col: Column | str) -> Column:
    """Heuristic language ID: argmax of stopword hits over the known
    languages, deterministic tie-break by language-code order, 'und' when no
    hits at all."""
    hits = {lang: stopword_hits(col, lang) for lang in sorted(STOPWORDS)}
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    # iterate in reverse-sorted order so earlier languages win ties via >=
    for lang in sorted(STOPWORDS, reverse=True):
        h = hits[lang]
        cond = (h > 0) & (h >= best_hits)
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_hits = F.greatest(h, best_hits)
    return best_lang


def quality_score(col: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic: rewards mid-length documents
    and word diversity, penalizes punctuation soup.

    score = 0.4·min(tokens/100, 1) + 0.4·(distinct words/tokens)
          + 0.2·(1 − min(4·punct_ratio, 1))
    """
    n = token_count(col)
    distinct_ratio = F.size(F.array_distinct(F.transform(words(col), F.lower))) / n
    len_term = F.least(n / F.lit(100.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(F.lit(4.0) * punct_ratio(col), F.lit(1.0))
    return (
        F.lit(0.4) * len_term + F.lit(0.4) * distinct_ratio + F.lit(0.2) * punct_term
    )


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: polynomial rolling hash of the
    lowercased, whitespace-normalized text (mod 1e9+7). Identical content →
    identical fingerprint across engines (oracle-reproducible)."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.array_join(F.split(F.trim(F.lower(c)), r"\s+"), " ")
    return poly_hash_str(normalized)


def _hits_from(words_lower: Column, lang: str) -> Column:
    stops = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    return F.size(F.filter(words_lower, lambda x: F.array_contains(stops, x)))


def text_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    extra_cols=None,
    extra_key: tuple | None = None,
) -> DataFrame:
    """One row per document with the full stat set.

    The tokenization is materialized ONCE (``__wl`` projection) and every
    stat derives from it — Catalyst does not CSE across lambda bodies, so
    the naive per-stat form re-split the text ~10× (measured 30% slower at
    bench scale).

    ``extra_cols`` (r16, VERDICT r15 #7): a callable ``text Column ->
    iterable of aliased Columns`` appended to the output projection —
    sibling per-row stats (PII counters, repetition fractions) computed
    from the SAME scan instead of re-scanning the corpus and joining back
    on the id. ``extra_key`` must be a hashable tag that fully determines
    ``extra_cols``'s expressions (it extends the exprcache key); when
    omitted the build is simply not memoized."""
    df = ensure_min_parallelism(df)  # tokenization is the heavy map stage

    def _build():
        cols1 = (
            F.col(id_col),
            F.col(text_col).alias("__t"),
            F.transform(words(text_col), F.lower).alias("__wl"),
        )
        cols2 = (
            F.col(id_col),
            F.col("__t"),
            F.col("__wl"),
            F.size("__wl").alias("__n"),
            F.length(
                F.regexp_replace(F.col("__t"), PUNCT_CLASS, "")
            ).alias("__npunct"),
        )
        hits = {lang: _hits_from(F.col("__wl"), lang) for lang in sorted(STOPWORDS)}
        best_lang = F.lit("und")
        best_hits = F.lit(0)
        for lang in sorted(STOPWORDS, reverse=True):
            h = hits[lang]
            best_lang = F.when(
                (h > 0) & (h >= best_hits), F.lit(lang)
            ).otherwise(best_lang)
            best_hits = F.greatest(h, best_hits)
        punct = F.when(F.length("__t") == 0, F.lit(0.0)).otherwise(
            F.col("__npunct") / F.length("__t")
        )
        distinct_ratio = F.size(F.array_distinct("__wl")) / F.col("__n")
        quality = (
            F.lit(0.4) * F.least(F.col("__n") / F.lit(100.0), F.lit(1.0))
            + F.lit(0.4) * distinct_ratio
            + F.lit(0.2) * (F.lit(1.0) - F.least(F.lit(4.0) * punct, F.lit(1.0)))
        )
        cols3 = (
            F.col(id_col),
            F.length("__t").alias("n_chars_computed"),
            F.col("__n").alias("n_tokens"),
            F.size(
                F.regexp_extract_all(F.col("__t"), F.lit(BPE_ISH_TOKEN), F.lit(0))
            ).alias("n_bpe_tokens"),
            F.round(punct, 6).alias("punct_ratio"),
            F.round(hits["en"] / F.col("__n"), 6).alias("stopword_ratio_en"),
            best_lang.alias("lang_guess"),
            F.round(quality, 6).alias("quality"),
            poly_hash_str(F.array_join(F.col("__wl"), " ")).alias("fingerprint"),
        )
        if extra_cols is not None:
            cols3 = cols3 + tuple(extra_cols(F.col("__t")))
        return cols1, cols2, cols3

    # the whole stat tree is (text_col, id_col[, extra_key])-static —
    # memoized (exprcache) unless extras are passed without a key
    if extra_cols is not None and extra_key is None:
        cols1, cols2, cols3 = _build()
    else:
        key = ("text_stats", text_col, id_col) + (
            (extra_key,) if extra_cols is not None else ()
        )
        cols1, cols2, cols3 = cached_columns(key, _build)
    return df.select(*cols1).select(*cols2).select(*cols3)


# ---------------------------------------------------------------------------
# PII redaction (pure Catalyst regexp_replace — map-only, zero Python)


PII_PATTERNS: dict[str, str] = {
    # ordered: longer/more-specific first so e.g. an email isn't half-eaten
    # by the phone pattern after partial redaction
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"(?<!\d)(?:\+?\d{1,2}[\s.\-]?)?(?:\(\d{3}\)|\d{3})[\s.\-]\d{3}[\s.\-]\d{4}(?!\d)",
    "ssn": r"(?<!\d)\d{3}-\d{2}-\d{4}(?!\d)",
}

# lookaround-free CORES of the digit-boundary-guarded patterns (r11,
# VERDICT r10 #6): the cores consume exactly the PII span — no boundary
# characters — so `split(text, core)` yields the between-match segments
# and the (?<!\d)/(?!\d) guards become plain checks on the last/first
# character of the adjacent segments. Valid in Java regex AND RE2 with
# identical scan semantics, which is what lets DuckDB mirror the counts.
PII_CORES: dict[str, str] = {
    "phone": r"(?:\+?\d{1,2}[\s.\-]?)?(?:\(\d{3}\)|\d{3})[\s.\-]\d{3}[\s.\-]\d{4}",
    "ssn": r"\d{3}-\d{2}-\d{4}",
}


def _boundary_count(c: Column, core: str) -> Column:
    """Matches of ``core`` whose neighbors are not digits — the
    lookaround semantics, expressed as split + segment-edge checks (pure
    Catalyst; the same construction mirrors 1:1 into DuckDB SQL). The
    raw-scan difference from a true lookaround scan (an invalid match
    hiding an overlapping later candidate inside its own span) requires
    adversarial digit soup and is pinned by cross-engine fixtures."""
    segs = F.split(c, core, -1)
    n = F.size(segs)
    ok = F.filter(
        F.sequence(F.lit(1), n - 1),
        lambda i: (~F.element_at(segs, i).rlike("[0-9]$"))
        & (~F.element_at(segs, i + 1).rlike("^[0-9]")),
    )
    return F.when(n <= 1, F.lit(0)).otherwise(F.size(ok))


def redact_pii(
    col: Column | str,
    kinds: tuple[str, ...] = ("email", "ipv4", "phone", "ssn"),
    token: str = "[PII]",
) -> Column:
    """Replace common PII shapes (email / IPv4 / NANP phone / SSN) with
    ``token``. Chained ``regexp_replace`` — one codegen'd map stage, no
    shuffle, no Python; the standard pre-training scrub pass."""
    c = F.col(col) if isinstance(col, str) else col
    for k in kinds:
        c = F.regexp_replace(c, PII_PATTERNS[k], token)
    return c


def pii_counts(
    col: Column | str, kinds: tuple[str, ...] = ("email", "ipv4", "phone", "ssn")
) -> Column:
    """struct of per-kind match counts (audit/reporting companion to
    :func:`redact_pii`). phone/ssn count via the lookaround-free
    split-boundary construction (r11) so the DuckDB oracle can compute
    the identical numbers; email/ipv4 stay plain ``regexp_count``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.struct(
        *[
            (
                _boundary_count(c, PII_CORES[k])
                if k in PII_CORES
                else F.regexp_count(c, F.lit(PII_PATTERNS[k]))
            ).alias(k)
            for k in kinds
        ]
    )


# ---------------------------------------------------------------------------
# repetition statistics (Gopher/MassiveText-style repetition filters)


def repetition_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    ngram_ks: tuple[int, ...] = (2, 3, 4),
) -> DataFrame:
    """Per-document repetition fractions used by Gopher/MassiveText-class
    quality filters: ``dup_line_frac`` (fraction of lines that are exact
    repeats of an earlier line in the SAME document) and, per k in
    ``ngram_ks``, ``dup_{k}gram_frac`` (fraction of word k-grams that are
    repeats within the document). Map-only Catalyst — documents never
    shuffle; filter downstream with e.g. ``dup_3gram_frac < 0.3``.
    """
    return df.select(
        F.col(id_col), *repetition_cols(F.col(text_col), ngram_ks)
    )


def repetition_cols(
    text: Column, ngram_ks: tuple[int, ...] = (2, 3, 4)
) -> list[Column]:
    """The aliased per-row repetition columns of :func:`repetition_stats`,
    exposed so shared-scan composites can append them to another
    projection of the same scan (r16)."""
    from datafusion_spatial_spark.operators.dedup import word_shingles

    def dup_frac(arr: Column) -> Column:
        n = F.size(arr)
        return F.when(n <= 0, F.lit(0.0)).otherwise(
            (n - F.size(F.array_distinct(arr))) / n
        )

    # \r?\n (r14, with line_dedup): CRLF text's final line lacks the \r
    # its siblings carry, skewing the distinct count; consume the \r
    lines = F.split(text, r"\r?\n")
    cols = [dup_frac(lines).alias("dup_line_frac")]
    for k in ngram_ks:
        cols.append(
            dup_frac(word_shingles(text, k)).alias(f"dup_{k}gram_frac")
        )
    return cols
