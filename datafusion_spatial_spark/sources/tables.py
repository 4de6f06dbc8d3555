"""Loaders for the driver's testdata tables (TESTDATA.md).

``load_table`` applies per-table physical fixups so every engine component
sees clean Spark types:

* ``events.ts`` is INT64 TIMESTAMP(NANOS) in parquet, which Spark cannot
  read natively; with ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as
  a long that we floor-divide to microseconds — the same truncation DuckDB
  applies (µs-precision timestamps), keeping the oracle comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _ensure_session_confs(spark: SparkSession) -> None:
    """Defensive runtime confs: the caller's session (e.g. the driver's) may
    not have gone through session.get_spark. Both are runtime-settable SQL
    confs; without nanosAsLong the events table is unreadable, and a
    non-UTC timezone would skew timestamp-string outputs vs the oracle."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        _ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer division: ns epoch values exceed double's 2^53 exactness
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for name in names or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
