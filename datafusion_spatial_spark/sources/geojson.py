"""GeoJSON source: FeatureCollection documents and newline-delimited
features (NDJSON — the scale path) → DataFrame with a WKB geometry column
and a JSON ``properties`` column.

The reference reads only GeoParquet (examples/main.rs:43-48); GeoJSON is
extension surface for interchange. Scale notes: NDJSON mode is fully
distributed (one feature per line, ``spark.read.text`` splits by line);
FeatureCollection mode necessarily parses whole documents (a JSON array
cannot be split mid-file), so each *file* is one task — shard large
collections into NDJSON for parallelism.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datafusion_spatial_spark import wkb as _wkb
from datafusion_spatial_spark.meta import WKB, GeometryMeta, with_geo_meta

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("feature_id", T.StringType()),
        T.StructField("geometry", T.BinaryType()),
        T.StructField("properties", T.StringType()),
    ]
)


def _feature_to_row(feat: dict):
    geom = feat.get("geometry")
    fid = feat.get("id")
    props = feat.get("properties")
    return (
        None if fid is None else str(fid),
        None if geom is None else _wkb.dumps(_wkb.from_geojson(geom)),
        None if props is None else json.dumps(props, separators=(",", ":")),
    )


def read_geojson(
    spark: SparkSession, path: str, *, ndjson: bool = False, view: str | None = None
) -> DataFrame:
    """Read GeoJSON into ``(feature_id, geometry: WKB, properties: json)``
    with WKB GeometryMeta attached to ``geometry``. ``ndjson=True`` reads
    one feature (or bare geometry) per line — distributed by line;
    otherwise whole FeatureCollection documents are parsed per file."""
    if ndjson:
        raw = spark.read.text(path)

        def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for b in batches:
                rows = []
                for line in b["value"]:
                    line = (line or "").strip().rstrip(",")
                    if not line or line in ("[", "]"):
                        continue
                    obj = json.loads(line)
                    if obj.get("type") == "Feature":
                        rows.append(_feature_to_row(obj))
                    else:  # bare geometry per line
                        rows.append(
                            (None, _wkb.dumps(_wkb.from_geojson(obj)), None)
                        )
                yield pd.DataFrame(
                    rows, columns=["feature_id", "geometry", "properties"]
                )

        out = raw.mapInPandas(parse, _OUT_SCHEMA)
    else:
        raw = spark.read.text(path, wholetext=True)

        def parse_doc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for b in batches:
                rows = []
                for doc in b["value"]:
                    # empty/whitespace part file (interrupted writer):
                    # skip like the ndjson branch's blank-line guard
                    if doc is None or not doc.strip():
                        continue
                    obj = json.loads(doc)
                    t = obj.get("type")
                    if t == "FeatureCollection":
                        for feat in obj.get("features", []):
                            rows.append(_feature_to_row(feat))
                    elif t == "Feature":
                        rows.append(_feature_to_row(obj))
                    else:
                        rows.append(
                            (None, _wkb.dumps(_wkb.from_geojson(obj)), None)
                        )
                yield pd.DataFrame(
                    rows, columns=["feature_id", "geometry", "properties"]
                )

        out = raw.mapInPandas(parse_doc, _OUT_SCHEMA)
    out = with_geo_meta(out, "geometry", GeometryMeta(encoding=WKB))
    if view:
        out.createOrReplaceTempView(view)
    return out
