"""GeoParquet source/sink.

The reference registers Parquet tables with ``skip_metadata=false`` so the
``geo`` footer key survives onto the Arrow schema (reference
examples/main.rs:17-18,43-48). Spark's Parquet reader *drops* file-level
key/value metadata, so we harvest it with pyarrow (footer read only — no data
IO) and re-attach it per geometry column as ``StructField.metadata["geo"]``.

Scale note: reading the footer of ONE file is enough — GeoParquet datasets
carry identical ``geo`` metadata on every file, so this stays O(1) even for a
100 TB multi-file dataset; the data itself is read by Spark's distributed
vectorized Parquet scan with the usual pushdown/pruning.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame, SparkSession

from datafusion_spatial_spark.meta import (
    GeometryMeta,
    _sniff_layout,
    parse_geo_footer,
    with_geo_meta,
)


def _require_local(path: str, what: str) -> None:
    """Footer harvest / stamping walk the filesystem with driver- or
    task-side pyarrow, which only sees local (or locally-mounted) paths.
    A remote scheme used to degrade SILENTLY (glob returns nothing → no
    metadata, no stamp) — r7 review fix: refuse loudly instead."""
    scheme = path.split("://", 1)[0] if "://" in path else ""
    if scheme in ("", "file"):
        return
    raise NotImplementedError(
        f"{what} reads parquet footers via local-filesystem pyarrow and "
        f"does not support the {scheme!r} scheme; read the data with "
        "spark.read.parquet and attach metadata explicitly "
        "(meta.with_geo_meta), or run against a locally-mounted path"
    )


def _local_path(path: str) -> str:
    """A ``file:`` URI as the plain filesystem path (Spark accepts both
    spellings; the driver-side pyarrow footer harvest needs the latter —
    the raw URI used to glob nothing and silently drop all metadata)."""
    if path.startswith("file://"):
        from urllib.parse import unquote, urlparse

        u = urlparse(path)
        return unquote(u.path)
    if path.startswith("file:"):
        return path[len("file:"):]
    return path


def _first_parquet_file(path: str) -> str | None:
    path = _local_path(path)
    if os.path.isfile(path):
        return path
    esc = glob.escape(path)  # literal dirs may contain glob metachars
    hits = sorted(glob.glob(os.path.join(esc, "*.parquet"))) or sorted(
        glob.glob(os.path.join(esc, "**", "*.parquet"), recursive=True)
    )
    return hits[0] if hits else None


def read_geo_footer(path: str) -> dict[str, GeometryMeta]:
    """Harvest {column: GeometryMeta} from a parquet file/directory footer."""
    import pyarrow.parquet as pq

    _require_local(path, "read_geo_footer")
    f = _first_parquet_file(path)
    if f is None:
        return {}
    md = pq.read_schema(f).metadata or {}
    raw = md.get(b"geo")
    if raw is None:
        return {}
    return parse_geo_footer(raw)


def read_geo_footer_raw(path: str) -> dict:
    """The parsed ``geo`` footer JSON as-is (incl. GeoParquet 1.1 keys like
    ``covering`` that GeometryMeta doesn't model)."""
    import pyarrow.parquet as pq

    _require_local(path, "read_geo_footer_raw")
    f = _first_parquet_file(path)
    if f is None:
        return {}
    md = pq.read_schema(f).metadata or {}
    raw = md.get(b"geo")
    return json.loads(raw.decode()) if raw else {}


def sniff_interleaved_dims(path: str, column: str) -> int | None:
    """Structural coord-tuple width (2/3/4) of an interleaved native
    geometry column, recovered from the parquet file itself.

    The reference sniffs this directly off the Arrow type — a
    ``FixedSizeList[3]`` leaf is XYZ (src/helpers.rs:49-71) — but Spark
    erases fixed-size-list lengths to plain ``array<double>``, so the
    declared schema alone cannot distinguish XY from XYZ. Recover it here:
    from the arrow footer schema when the leaf is a fixed_size_list (O(1),
    no data IO), else from the leaf list lengths of the first file's row
    groups (plain ``list_`` writers; reads the one column, first non-empty
    row group only — O(row group), driver-side, never at 100 TB scan cost
    because GeoParquet layouts are uniform across files).

    Returns 2/3/4, or None when the column is missing, not list-leafed
    floats, empty, or has mixed tuple lengths (caller leaves the declared
    metadata alone). Results are cached per (file, mtime, size, column) —
    the plain-list data probe reads a whole column chunk, and a re-read
    of the same path must not pay it twice.
    """
    _require_local(path, "sniff_interleaved_dims")
    f = _first_parquet_file(path)
    if f is None:
        return None
    st = os.stat(f)
    ck = (f, st.st_mtime_ns, st.st_size, column)
    if ck in _SNIFF_DIMS_CACHE:
        return _SNIFF_DIMS_CACHE[ck]
    d = _sniff_interleaved_dims_impl(f, column)
    if len(_SNIFF_DIMS_CACHE) > 1024:
        _SNIFF_DIMS_CACHE.clear()
    _SNIFF_DIMS_CACHE[ck] = d
    return d


_SNIFF_DIMS_CACHE: dict = {}


def _sniff_interleaved_dims_impl(f: str, column: str) -> int | None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    def _is_list(t) -> bool:
        return (
            pa.types.is_list(t)
            or pa.types.is_large_list(t)
            or pa.types.is_fixed_size_list(t)
        )

    sch = pq.read_schema(f)
    if column not in sch.names:
        return None
    t = sch.field(column).type
    if not _is_list(t):
        return None
    # walk to the innermost list — the per-coordinate tuple level
    while _is_list(t.value_type):
        t = t.value_type
    if not pa.types.is_floating(t.value_type):
        return None
    if pa.types.is_fixed_size_list(t):
        return int(t.list_size) if t.list_size in (2, 3, 4) else None

    # plain list leaf: probe actual tuple lengths
    import pyarrow.compute as pc

    pf = pq.ParquetFile(f)
    for rg in range(pf.metadata.num_row_groups):
        arr = pf.read_row_group(rg, columns=[column]).column(0).combine_chunks()
        while _is_list(arr.type) and _is_list(arr.type.value_type):
            arr = arr.flatten()
        if not _is_list(arr.type):
            return None
        lengths = pc.list_value_length(arr)
        uniq = {v for v in lengths.to_pylist() if v is not None}
        if not uniq:
            continue  # all-null row group — try the next
        if len(uniq) == 1:
            d = uniq.pop()
            return d if d in (2, 3, 4) else None
        return None  # mixed tuple lengths: not a uniform coord layout
    return None


def read_geoparquet(
    spark: SparkSession,
    path: str,
    view: str | None = None,
    window: tuple[float, float, float, float] | None = None,
) -> DataFrame:
    """Read parquet and attach GeoParquet ``geo`` metadata to its geometry
    columns (the PySpark analog of the reference's metadata-preserving scan,
    examples/main.rs:17-18 + rules.rs:39-49).

    With ``window`` (xmin, ymin, xmax, ymax) and a GeoParquet 1.1
    ``covering.bbox`` declaration in the footer, the bbox-overlap filter is
    applied on the covering struct's fields — nested-column predicates push
    down to parquet row-group statistics, so the window prunes IO before
    any geometry is decoded (the 100 TB window-query shape; see also
    operators/storage.write_spatial for the Hilbert-clustered layout that
    makes those statistics tight)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    # parse the footer ONCE; metas, coverings and primary all derive from
    # it (this used to re-glob + re-read the footer up to three times).
    # Remote schemes: the driver-side pyarrow footer harvest only sees
    # local paths. For a plain read that's a degraded-but-working read
    # (data loads, metadata absent — warn); only window= pruning, which
    # NEEDS the covering declaration, fails loudly (r8 advice fix — the
    # unconditional harvest was a hard regression for s3://+window=None).
    scheme = path.split("://", 1)[0] if "://" in path else ""
    if scheme not in ("", "file"):
        if window is not None:
            _require_local(path, "read_geoparquet(window=)")
        import warnings

        warnings.warn(
            f"read_geoparquet: cannot harvest the geo footer from the "
            f"{scheme!r} scheme; returning data without geometry metadata "
            "(attach it explicitly with meta.with_geo_meta)",
            stacklevel=2,
        )
        footer = {}
    else:
        footer = read_geo_footer_raw(path)
    metas = parse_geo_footer(json.dumps(footer).encode()) if footer else {}
    for col, meta in metas.items():
        if col not in df.columns:
            continue
        # Structural Z/ZM sniff for interleaved columns whose footer does
        # not declare a dimension: Spark erases FixedSizeList lengths, so
        # without this an undeclared XYZ column would silently read as XY
        # pairs. The reference sees the length structurally
        # (helpers.rs:49-71); recover it from the file (O(1) when the
        # writer kept fixed_size_list, one row group otherwise). 3-wide
        # tuples default to XYZ per the GeoArrow convention — declare
        # "Point M" in the footer for XYM data.
        if (
            meta.is_native
            and not meta.has_z
            and not meta.has_m
            and _sniff_layout(df.schema[col].dataType) == "interleaved"
        ):
            dims = sniff_interleaved_dims(path, col)
            if dims in (3, 4):
                from dataclasses import replace

                suffix = " Z" if dims == 3 else " ZM"
                types = tuple(
                    t + suffix for t in meta.geometry_types
                ) or (meta.native_type + suffix,)
                meta = replace(meta, geometry_types=types)
        df = with_geo_meta(df, col, meta)
    if window is not None:
        raw = {
            c: (spec.get("covering") or {}).get("bbox")
            for c, spec in (footer.get("columns") or {}).items()
            if (spec.get("covering") or {}).get("bbox")
        }
        if not raw:
            raise ValueError(
                "window= requires a GeoParquet covering.bbox declaration "
                "(write with write_geoparquet(..., covering=True))"
            )
        wxmin, wymin, wxmax, wymax = (float(v) for v in window)
        # filter on the PRIMARY column's covering — windowing any other
        # column's bbox would silently drop rows whose primary geometry
        # intersects the window (r7 review fix: the old single-covering
        # fallback did exactly that when the primary had no covering)
        primary = footer.get("primary_column")
        if primary in raw:
            refs = raw[primary]
        elif primary is None and len(raw) == 1:
            refs = next(iter(raw.values()))
        else:
            raise ValueError(
                "window= needs a covering.bbox on the primary column "
                f"(primary_column={primary!r}, coverings present on "
                f"{sorted(raw)}); rewrite with write_geoparquet(..., "
                "covering=True) or filter explicitly"
            )
        col_of = lambda k: F.col(".".join(refs[k]))  # noqa: E731
        df = df.filter(
            (col_of("xmin") <= wxmax)
            & (col_of("xmax") >= wxmin)
            & (col_of("ymin") <= wymax)
            & (col_of("ymax") >= wymin)
        )
    if view:
        df.createOrReplaceTempView(view)
    return df


def read_geoparquet_covering(path: str) -> dict[str, dict[str, list[str]]]:
    """{geometry column: {"xmin": [field path], ...}} for every column with
    a GeoParquet 1.1 ``covering.bbox`` declaration."""
    out = {}
    for col, spec in (read_geo_footer_raw(path).get("columns") or {}).items():
        bbox = (spec.get("covering") or {}).get("bbox")
        if bbox:
            out[col] = bbox
    return out


def write_geoparquet(
    df: DataFrame,
    path: str,
    geo_columns: dict[str, GeometryMeta] | None = None,
    mode: str = "overwrite",
    primary_column: str | None = None,
    covering: bool = False,
) -> None:
    """Write parquet, then stamp the ``geo`` footer onto every produced file.

    ``geo_columns`` defaults to whatever GeometryMeta is attached to the
    DataFrame's StructField metadata. GeoParquet interop requires the footer
    key, and parquet footers live at the file tail, so attaching one means
    rewriting each file — the rewrite is therefore DISTRIBUTED: the file
    list is parallelized and every task re-streams its own files row-group
    by row-group through task-side pyarrow (row-group boundaries and
    statistics preserved, memory bounded by one row group). The driver
    never reads a data file; at 100 TB the stamp costs one distributed
    pass, the same order as the write itself.

    ``covering=True`` adds the GeoParquet 1.1 ``covering.bbox`` column for
    the primary geometry (a ``bbox`` struct{xmin,ymin,xmax,ymax} stamped
    per row and declared in the footer) so ANY spec-compliant reader — and
    :func:`read_geoparquet`'s ``window=`` — can prune row groups from
    parquet min/max statistics without touching geometry bytes.
    """
    if geo_columns is None:
        geo_columns = {}
        for fld in df.schema.fields:
            if fld.metadata and "geo" in fld.metadata:
                geo_columns[fld.name] = GeometryMeta.from_dict(fld.metadata["geo"])
    primary = primary_column or (next(iter(geo_columns)) if geo_columns else None)
    if geo_columns:
        _require_local(path, "write_geoparquet's geo-footer stamp")
    if primary is not None and primary not in geo_columns:
        raise ValueError(
            f"primary_column {primary!r} has no GeometryMeta: attach it "
            "with meta.with_geo_meta or pass geo_columns= explicitly "
            f"(known geometry columns: {sorted(geo_columns)})"
        )
    covering_decl = {}
    if covering:
        if primary is None:
            raise ValueError("covering=True needs a geometry column")
        from datafusion_spatial_spark.functions.scalar import st_bbox

        df = df.withColumn("bbox", st_bbox(primary, geo_columns[primary]))
        covering_decl = {
            "covering": {
                "bbox": {
                    "xmin": ["bbox", "xmin"],
                    "ymin": ["bbox", "ymin"],
                    "xmax": ["bbox", "xmax"],
                    "ymax": ["bbox", "ymax"],
                }
            }
        }
    df.write.mode(mode).parquet(path)
    if not geo_columns:
        return
    geo_json = json.dumps(
        {
            "version": "1.1.0",
            "primary_column": primary,
            "columns": {
                c: {**m.to_dict(), **(covering_decl if c == primary else {})}
                for c, m in geo_columns.items()
            },
        }
    )
    files = sorted(
        glob.glob(os.path.join(glob.escape(_local_path(path)), "*.parquet"))
    )
    if not files:
        return
    geo_bytes = geo_json.encode()

    def _stamp(paths):
        # runs INSIDE a task: stream each file row-group-by-row-group with
        # task-side pyarrow, writing the same data under a schema that
        # carries the geo footer; atomic replace keeps readers safe
        import os as _os

        import pyarrow.parquet as _pq

        for f in paths:
            pf = _pq.ParquetFile(f)
            md = dict(pf.schema_arrow.metadata or {})
            md[b"geo"] = geo_bytes
            schema = pf.schema_arrow.with_metadata(md)
            tmp = f + ".geo.tmp"
            with _pq.ParquetWriter(tmp, schema) as w:
                for rg in range(pf.num_row_groups):
                    w.write_table(pf.read_row_group(rg))
            pf.close()
            _os.replace(tmp, f)
            # drop Spark's .crc sidecar — the rewrite invalidates its checksum
            crc = _os.path.join(
                _os.path.dirname(f), f".{_os.path.basename(f)}.crc"
            )
            if _os.path.exists(crc):
                _os.remove(crc)
        return iter(())

    sc = df.sparkSession.sparkContext
    n_slices = max(1, min(len(files), sc.defaultParallelism))
    sc.parallelize(files, n_slices).foreachPartition(_stamp)
