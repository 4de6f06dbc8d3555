"""Corpus-pipeline conveniences: the composition layer a training-data
pipeline runs after the per-operator stages (dedup / text stats / media).

Everything is pure Catalyst and deterministic — split membership depends
only on the id value, never on partitioning or run order, so re-runs and
backfills land every document in the same split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datafusion_spatial_spark.operators.hashing import P, poly_hash_str
from datafusion_spatial_spark.operators.text import lang_id, quality_score


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "split",
    hash_fn: str = "poly",
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket = hash(id ++ salt)
    mod P mapped onto cumulative weight ranges. Adds a ``split`` column.

    ``poly`` hashing keeps the assignment reproducible in any engine (the
    DuckDB oracle included); ``xxhash64`` is the faster JVM path.
    """
    total = sum(weights.values())
    key = F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))
    if hash_fn == "poly":
        h = poly_hash_str(key)
    elif hash_fn == "xxhash64":
        h = F.pmod(F.xxhash64(key), F.lit(P))
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    u = h / F.lit(float(P))  # uniform-ish in [0, 1)
    expr: Column | None = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sampling (``sampleBy``): cap over-represented
    strata (languages, sources) without a shuffle."""
    return df.sampleBy(strata_col, fractions, seed=seed)


def filter_corpus(
    df: DataFrame,
    text_col: str,
    min_quality: float = 0.0,
    langs: list[str] | None = None,
    min_tokens: int = 1,
    max_tokens: int | None = None,
) -> DataFrame:
    """Quality gate: keep documents passing the heuristic quality score,
    language allowlist, and token-count band — the standard pre-training
    filter chain as one map-only stage."""
    n = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    cond = (quality_score(text_col) >= F.lit(float(min_quality))) & (
        n >= F.lit(int(min_tokens))
    )
    if max_tokens is not None:
        cond = cond & (n <= F.lit(int(max_tokens)))
    if langs:
        cond = cond & lang_id(text_col).isin(list(langs))
    return df.filter(cond)
