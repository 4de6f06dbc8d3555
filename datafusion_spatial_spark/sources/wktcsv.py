"""WKT CSV source — the reference's third fixture format
(data-<type>-wkt.csv; generate_test_data.py:42-43 writes `col,geometry` with
WKT text and empty cells for null).

Reads the CSV with Spark's CSV source (schema'd, no inference) and converts
the WKT column to WKB binary via the codec UDF, attaching WKB GeometryMeta —
after which the whole st_* surface applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_spatial_spark.functions.scalar import st_geomfromtext
from datafusion_spatial_spark.meta import GeometryMeta, with_geo_meta


def read_wkt_csv(
    spark: SparkSession,
    path: str,
    geometry_col: str = "geometry",
    geometry_types: tuple[str, ...] = (),
    view: str | None = None,
) -> DataFrame:
    """Read a CSV whose ``geometry_col`` holds WKT; returns a DataFrame with
    that column as WKB binary + attached GeometryMeta."""
    df = spark.read.csv(path, header=True, inferSchema=False)
    if "col" in df.columns and geometry_col != "col":
        # the reference fixtures' single integer id column
        df = df.withColumn("col", F.col("col").cast("bigint"))
    df = df.withColumn(geometry_col, st_geomfromtext(F.col(geometry_col)))
    df = with_geo_meta(
        df,
        geometry_col,
        GeometryMeta(encoding="WKB", geometry_types=tuple(geometry_types)),
    )
    if view:
        df.createOrReplaceTempView(view)
    return df
