"""Storage-layout operators: partitioned & bucketed writes for shuffle-free
downstream joins/aggregations.

At 100 TB the physical layout *is* the query plan: a fact table bucketed on
its join key lets every later equi-join/groupBy on that key run with ZERO
exchange (Spark reads co-located buckets), and partition columns prune whole
directories before any IO. These helpers standardize that layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Directory-partitioned parquet: queries filtering on partition_cols
    prune at the file-listing level (visible as PartitionFilters in explain).
    """
    w = df.write.mode(mode).partitionBy(*partition_cols)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed (+optionally sorted) table. Joins/aggregations on
    ``bucket_cols`` between tables with the same bucketing skip the shuffle
    entirely; sorting additionally enables shuffle-AND-sort-free sort-merge
    joins. ``path`` makes it an external table (bypasses the static
    warehouse-dir conf)."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join_is_shuffle_free(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> bool:
    """Diagnostic: True iff a sort-merge join of the two bucketed tables on
    ``on`` needs no shuffle exchange (the whole point of bucketing). The
    MERGE hint rules out broadcast, which would trivially have no shuffle
    on tiny test data."""
    df = (
        spark.table(left_table)
        .hint("merge")
        .join(spark.table(right_table), on)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan
