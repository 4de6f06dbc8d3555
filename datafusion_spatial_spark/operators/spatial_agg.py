"""Distributed geometry aggregation (dissolve / union-by-key).

PostGIS ``ST_Union`` as an aggregate is a single-reducer-per-group
operation; at scale the shuffle carries every input geometry to its
group's reducer. ``dissolve`` adds the map-side combine Catalyst cannot
plan for an opaque pandas aggregate: a partition-local partial union via
``mapInPandas`` first, so the exchange moves one already-dissolved
geometry per (input partition × key) instead of every row. The final
per-key union then merges at most ``num_partitions`` geometries per key.

Reference parity note: the reference engine has no geometry aggregates at
all (its only UDAF is extent, src/udafs/extent.rs); this is parity-plus
surface PostGIS/DuckDB-spatial users expect.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame

from datafusion_spatial_spark import geom_ops, wkb
from datafusion_spatial_spark.functions.aggregates import _union_agg_wkb
from datafusion_spatial_spark.functions.scalar import st_asbinary
from datafusion_spatial_spark.meta import GeometryMeta


def dissolve(
    df: DataFrame,
    keys: Sequence[str],
    geom_col: str,
    meta: GeometryMeta,
    out_col: str = "geometry",
) -> DataFrame:
    """Union all geometries per key group (GIS "dissolve").

    Two-phase: partition-local partial union (map-side combine), then a
    per-key final union. Output column ``out_col`` is WKB (pair with
    ``GeometryMeta("WKB")``).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from datafusion_spatial_spark.functions.aggregates import (
        _wkb_series_to_geoms,
    )

    key_names = list(keys)
    # Keys travel through the pandas partial phase as one JSON string, not
    # as raw columns: Arrow→pandas turns a nullable int64 key column into
    # float64, which corrupts sibling ids above 2^53 and merges groups
    # within one float ulp (r7 review fix). JSON round-trips every key
    # type losslessly; from_json restores the original columns at the end.
    key_schema = T.StructType(
        [df.schema[k] for k in key_names]
    )
    tmp = df.select(
        F.to_json(
            F.struct(*key_names), {"ignoreNullFields": "false"}
        ).alias("__k"),
        st_asbinary(geom_col, meta).alias("__wkb"),
    )
    schema = tmp.schema

    def partial(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for kv, grp in pdf.groupby("__k", dropna=False, sort=False):
                geoms = _wkb_series_to_geoms(grp["__wkb"])
                u = wkb.dumps(geom_ops.union_many(geoms)) if geoms else None
                rows.append((kv, u))
            yield pd.DataFrame(rows, columns=["__k", "__wkb"])

    partial_df = tmp.mapInPandas(partial, schema)
    final = partial_df.groupBy("__k").agg(
        _union_agg_wkb("__wkb").alias(out_col)
    )
    return final.select(
        F.from_json("__k", key_schema).alias("__keys"), F.col(out_col)
    ).select("__keys.*", out_col)
