"""Lakehouse table-format connectors (Delta / Iceberg / Hudi).

The jars are not on this image's classpath, so each reader/writer probes for
its format and raises a clear, actionable error instead of a cryptic
ClassNotFoundException. On a cluster with the jars present
(``spark.jars.packages=io.delta:delta-spark_...`` etc.) the same calls work
unchanged — the gating is runtime, not code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_FORMAT_PROBE_TABLE = {
    "delta": "io.delta.sql.DeltaSparkSessionExtension",
    "iceberg": "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
    "hudi": "org.apache.hudi.DefaultSource",
}


def _format_available(spark: SparkSession, fmt: str) -> bool | None:
    """True/False from a JVM class probe; ``None`` when the session cannot
    be probed at all (Spark Connect has no ``_jvm``) — gating must not
    misreport a fully-configured Connect server as missing jars."""
    cls = _FORMAT_PROBE_TABLE[fmt]
    try:
        jvm = spark._jvm  # noqa: SLF001
    except Exception:
        return None  # Spark Connect: unknowable from the client
    if jvm is None:
        return None
    try:
        jvm.java.lang.Class.forName(cls)
        return True
    except Exception:
        return False


def _require(spark: SparkSession, fmt: str) -> None:
    if _format_available(spark, fmt) is False:
        raise NotImplementedError(
            f"the {fmt!r} connector jars are not on this cluster's classpath; "
            f"add them via spark.jars.packages (needs {_FORMAT_PROBE_TABLE[fmt]}). "
            "Parquet/GeoParquet paths work without extra jars."
        )


def read_table(spark: SparkSession, fmt: str, path: str) -> DataFrame:
    """Read a Delta/Iceberg/Hudi table at ``path``."""
    _require(spark, fmt)
    return spark.read.format(fmt).load(path)


def write_table(
    df: DataFrame, fmt: str, path: str, mode: str = "overwrite", **options
) -> None:
    _require(df.sparkSession, fmt)
    df.write.format(fmt).mode(mode).options(**options).save(path)
