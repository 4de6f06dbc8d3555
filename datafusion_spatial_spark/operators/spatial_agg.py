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
    key_names = list(keys)
    tmp = df.select(*key_names, st_asbinary(geom_col, meta).alias("__wkb"))
    schema = tmp.schema

    def partial(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for kv, grp in pdf.groupby(key_names, dropna=False, sort=False):
                geoms = [
                    wkb.loads(bytes(v)) for v in grp["__wkb"] if v is not None
                ]
                u = wkb.dumps(geom_ops.union_many(geoms)) if geoms else None
                if not isinstance(kv, tuple):
                    kv = (kv,)
                rows.append((*kv, u))
            yield pd.DataFrame(rows, columns=key_names + ["__wkb"])

    partial_df = tmp.mapInPandas(partial, schema)
    return partial_df.groupBy(*key_names).agg(
        _union_agg_wkb("__wkb").alias(out_col)
    )
