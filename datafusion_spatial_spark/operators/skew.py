"""Skew-mitigation operators: salting for hot keys.

AQE's skew-join splitting handles most cases at runtime; these helpers cover
the two shapes AQE can't fix: (a) a single hot *aggregation* key whose
map-side combine still funnels one partition, and (b) a broadcast-infeasible
join against a dimension where a handful of keys dominate. Both are the
standard two-phase salt/unsalt rewrites, pure Catalyst.
"""

from __future__ import annotations

import weakref

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# df -> {target: result} — ``df.rdd`` re-plans the whole frame on every
# call (tens of ms driver-side); the answer is a pure function of the
# frame's plan, so memoize per DataFrame *object* (plans are immutable;
# the relation cache hands back the same object across query builds).
_MIN_PAR_MEMO: "weakref.WeakKeyDictionary[DataFrame, dict]" = (
    weakref.WeakKeyDictionary()
)


def ensure_min_parallelism(
    df: DataFrame, min_partitions: int | None = None
) -> DataFrame:
    """Spread a scan whose file layout under-parallelizes CPU-heavy
    downstream map work.

    Parquet splits at row-group granularity, so a corpus written as one
    fat file yields a handful of input splits no matter how many cores
    exist — the r7 10x scale audit caught the shingle explode of
    ``ngram_jaccard_pairs`` running on 2 of 32 cores for minutes. A
    round-robin repartition to ``defaultParallelism`` fixes the local /
    fat-row-group case; at real cluster scale (thousands of files) the
    partition count already exceeds the target and this is a no-op with
    zero added shuffle.
    """
    if df.isStreaming:  # .rdd is undefined on streaming frames
        return df
    try:
        memo = _MIN_PAR_MEMO.setdefault(df, {})
    except TypeError:  # unhashable/unweakrefable frame implementation
        memo = {}
    if min_partitions in memo:
        # None = "no repartition needed, return df unchanged". Storing df
        # itself would make the WeakKey entry's value strongly reference
        # its own key, pinning every pass-through frame forever (ADVICE
        # r15): a self-referential WeakKeyDictionary entry never dies.
        cached = memo[min_partitions]
        return df if cached is None else cached
    try:
        sc = df.sparkSession.sparkContext
        target = min_partitions or sc.defaultParallelism
        n = df.rdd.getNumPartitions()
    except Exception:
        # Spark Connect (no .rdd / sparkContext) — the guard is a local
        # fat-row-group mitigation; on a connect cluster just pass through
        return df
    out = df.repartition(target) if n < target else df
    memo[min_partitions] = None if out is df else out
    return out


def salted_count_sum(
    df: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase groupBy for count/sum aggregates under key skew: phase 1
    groups on (keys, salt) — spreading a hot key over ``salt_buckets``
    reducers — phase 2 merges the partials. Result ≡ plain groupBy."""
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("__salt")
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            F.count("*").alias("__cnt"),
            *[F.sum(c).alias(f"__sum_{c}") for c in sum_cols],
        )
    )
    return (
        phase1.groupBy(*keys)
        .agg(
            F.sum("__cnt").alias("count"),
            *[F.sum(f"__sum_{c}").alias(f"sum_{c}") for c in sum_cols],
        )
    )


def salted_join_skewed_left(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join where ``left`` has hot keys and ``right`` is too large to
    broadcast: salt the left key, explode the right side ``salt_buckets``×
    (one replica per salt), join on (key, salt). The hot key's rows spread
    over ``salt_buckets`` tasks instead of one."""
    l = left.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    r = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    out = l.join(r, [on, "__salt"])
    return out.drop("__salt")
