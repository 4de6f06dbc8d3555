"""Geometry column metadata: the ``geo`` side-channel.

The reference carries spatial semantics out-of-band: a ``geo`` JSON key in
the Parquet footer declares, per column, the encoding (``"WKB"`` or a native
shape name) and the set of geometry types (reference src/rules.rs:41-48,
data/generate_test_data.py:26-35). Its analyzer rule turns that into two
literal arguments injected into every ``ST_*`` call (src/rules.rs:62-116).

Here the same information lives in ``StructField.metadata["geo"]`` — attached
by :func:`datafusion_spatial_spark.sources.geoparquet.read_geoparquet` — and
is resolved *eagerly* when an ``st_*`` expression is built. When metadata is
missing (e.g. a computed column), :func:`sniff_type` reproduces the
reference's structural type inference (src/helpers.rs:49-71 ``coord_type`` /
nesting-depth walk).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

WKB = "WKB"

# native encoding name (GeoParquet 1.1) -> canonical geometry type name
NATIVE_ENCODINGS = {
    "point": "Point",
    "linestring": "LineString",
    "polygon": "Polygon",
    "multipoint": "MultiPoint",
    "multilinestring": "MultiLineString",
    "multipolygon": "MultiPolygon",
}

GEOMETRY_TYPES = (
    "Point",
    "LineString",
    "Polygon",
    "MultiPoint",
    "MultiLineString",
    "MultiPolygon",
    "GeometryCollection",
)

# nesting depth of list<> levels above the coord struct, per geometry type
# (reference data model: generate_test_data.py:72-77,96,146,171-173,200)
NESTING_DEPTH = {
    "Point": 0,
    "LineString": 1,
    "MultiPoint": 1,
    "Polygon": 2,
    "MultiLineString": 2,
    "MultiPolygon": 3,
}


@dataclass(frozen=True)
class GeometryMeta:
    """Per-column spatial metadata (≈ reference GeoParquetMetadata column
    entry, src/rules.rs:140-153)."""

    encoding: str  # "WKB" or one of NATIVE_ENCODINGS keys
    geometry_types: tuple[str, ...] = ()
    crs: str | None = None
    # physical coord layout of native encodings (reference helpers.rs:49-71
    # sniffs both): "separated" = struct<x,y>; "interleaved" =
    # fixed_size_list<double>[2] — surfaced in Spark as array<double>
    coord_layout: str = "separated"

    @property
    def is_wkb(self) -> bool:
        return self.encoding.upper() == WKB

    @property
    def is_native(self) -> bool:
        return self.encoding.lower() in NATIVE_ENCODINGS

    @property
    def geometry_type(self) -> str:
        """Single type name, or "Unknown"/"Mixed" — the reference's 0/1/many
        rule (src/rules.rs:143-147)."""
        if len(self.geometry_types) == 0:
            return "Unknown"
        if len(self.geometry_types) == 1:
            return self.geometry_types[0]
        return "Mixed"

    @property
    def native_type(self) -> str:
        """For native encodings, the shape name implied by the encoding."""
        return NATIVE_ENCODINGS.get(self.encoding.lower(), self.geometry_type)

    @property
    def has_z(self) -> bool:
        """True when the declared geometry types are Z variants ("Point Z"
        / "Point ZM" — the reference's 14-type taxonomy,
        src/helpers.rs:117-132)."""
        return any(
            t.rstrip().endswith(("Z", "ZM")) for t in self.geometry_types
        )

    @property
    def has_m(self) -> bool:
        """True for measured variants ("Point M" / "Point ZM")."""
        return any(t.rstrip().endswith("M") for t in self.geometry_types)

    def to_dict(self) -> dict:
        d: dict = {
            "encoding": self.encoding,
            "geometry_types": list(self.geometry_types),
        }
        if self.crs is not None:
            d["crs"] = self.crs
        if self.coord_layout != "separated":
            d["coord_layout"] = self.coord_layout
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "GeometryMeta":
        return cls(
            encoding=d.get("encoding", WKB),
            geometry_types=tuple(d.get("geometry_types", ()) or ()),
            crs=d.get("crs"),
            coord_layout=d.get("coord_layout", "separated"),
        )


def parse_geo_footer(geo_json: str | bytes) -> dict[str, GeometryMeta]:
    """Parse a GeoParquet ``geo`` footer value into {column: GeometryMeta}."""
    obj = json.loads(geo_json)
    return {
        name: GeometryMeta.from_dict(colmeta)
        for name, colmeta in obj.get("columns", {}).items()
    }


def with_geo_meta(df: DataFrame, column: str, meta: GeometryMeta) -> DataFrame:
    """Attach ``meta`` to ``column`` via StructField.metadata (survives
    select/alias chains; the session-level source of truth is the eager
    resolution in st_* builders, not the plan)."""
    existing = df.schema[column].metadata or {}
    md = dict(existing)
    md["geo"] = meta.to_dict()
    return df.withColumn(column, F.col(column).alias(column, metadata=md))


def resolve_meta(df: DataFrame, column: str) -> GeometryMeta:
    """Resolve the GeometryMeta for ``df[column]``: explicit field metadata
    first, else structural sniff (the analyzer-rule analog). The physical
    coord layout is always re-sniffed from the Spark type — GeoParquet
    footers do not declare it (the reference sniffs structurally too,
    helpers.rs:49-71)."""
    from dataclasses import replace

    fld = df.schema[column]
    md = fld.metadata or {}
    if "geo" in md:
        meta = GeometryMeta.from_dict(md["geo"])
        if meta.is_native:
            layout = _sniff_layout(fld.dataType)
            if layout is not None and layout != meta.coord_layout:
                meta = replace(meta, coord_layout=layout)
        return meta
    return sniff_meta(fld.dataType)


def _sniff_layout(dt: T.DataType) -> str | None:
    """Physical coord layout of a native Spark geometry type, or None."""
    cur = dt
    depth = 0
    while isinstance(cur, T.ArrayType) and depth <= 4:
        cur = cur.elementType
        depth += 1
    if _is_coord_struct(cur):
        return "separated"
    if isinstance(cur, T.DoubleType) and depth >= 1:
        return "interleaved"
    return None


def sniff_meta(dt: T.DataType) -> GeometryMeta:
    """Structurally infer a GeometryMeta from a Spark type, mirroring the
    reference's coord_type/nesting walk (src/helpers.rs:49-71).

    Binary → WKB with unknown types. Nested coord types → the *ambiguity-
    default* shape for that depth (depth 1 = LineString, depth 2 = Polygon,
    depth 3 = MultiPolygon); LineString-vs-MultiPoint and
    Polygon-vs-MultiLineString are physically identical and need declared
    metadata to distinguish — same limitation as the reference. An
    ``array<double>`` leaf is the interleaved layout (fixed-size-list
    lengths are erased by Spark, so XY is assumed — declare ``"Point Z"``
    etc. in metadata for XYZ interleaved data).
    """
    if isinstance(dt, T.BinaryType):
        return GeometryMeta(encoding=WKB)
    depth = 0
    cur = dt
    while isinstance(cur, T.ArrayType) and depth <= 4:
        cur = cur.elementType
        depth += 1
    by_depth = {0: "point", 1: "linestring", 2: "polygon", 3: "multipolygon"}
    if _is_coord_struct(cur):
        if depth in by_depth:
            enc = by_depth[depth]
            name = NATIVE_ENCODINGS[enc]
            z = any(f.name == "z" for f in cur.fields)
            m = any(f.name == "m" for f in cur.fields)
            if z and m:
                name += " ZM"
            elif z:
                name += " Z"
            elif m:
                name += " M"
            return GeometryMeta(encoding=enc, geometry_types=(name,))
    if isinstance(cur, T.DoubleType) and depth >= 1 and (depth - 1) in by_depth:
        enc = by_depth[depth - 1]
        return GeometryMeta(
            encoding=enc,
            geometry_types=(NATIVE_ENCODINGS[enc],),
            coord_layout="interleaved",
        )
    raise ValueError(f"cannot infer geometry metadata from Spark type {dt}")


def _is_coord_struct(dt: T.DataType) -> bool:
    if not isinstance(dt, T.StructType):
        return False
    names = [f.name for f in dt.fields]
    return names[:2] == ["x", "y"] and all(
        isinstance(f.dataType, T.DoubleType) for f in dt.fields[:2]
    )


def coord_struct_type(dims: int = 2, with_m: bool = False) -> T.StructType:
    fields = [
        T.StructField("x", T.DoubleType(), False),
        T.StructField("y", T.DoubleType(), False),
    ]
    if dims == 3:
        fields.append(T.StructField("z", T.DoubleType(), False))
    if with_m:
        fields.append(T.StructField("m", T.DoubleType(), False))
    return T.StructType(fields)


def to_separated(col: Column, meta: GeometryMeta) -> tuple[Column, GeometryMeta]:
    """Normalize an interleaved native geometry column (``array<double>``
    coords) to the separated ``struct<x,y[,z]>`` layout at the expression
    level, so every native kernel is single-layout. The reference computes
    over interleaved buffers directly with a chunk-by-D fold
    (compute.rs:19-44); in Catalyst a ``transform`` to structs is equally
    map-only and fuses into downstream whole-stage codegen. No-op for WKB
    and already-separated input."""
    if not meta.is_native or meta.coord_layout != "interleaved":
        return col, meta
    from dataclasses import replace

    z, m = meta.has_z, meta.has_m

    def c2s(c: Column) -> Column:
        fields = [c[0].alias("x"), c[1].alias("y")]
        i = 2
        if z:
            fields.append(c[i].alias("z"))
            i += 1
        if m:
            fields.append(c[i].alias("m"))
        return F.struct(*fields)

    depth = NESTING_DEPTH[meta.native_type]
    if depth == 0:
        out_type = T.StructType(
            [T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())]
            + ([T.StructField("z", T.DoubleType())] if z else [])
            + ([T.StructField("m", T.DoubleType())] if m else [])
        )
        out = F.when(col.isNull(), F.lit(None).cast(out_type)).otherwise(c2s(col))
    elif depth == 1:
        out = F.transform(col, c2s)
    elif depth == 2:
        out = F.transform(col, lambda r: F.transform(r, c2s))
    else:
        out = F.transform(
            col, lambda p: F.transform(p, lambda r: F.transform(r, c2s))
        )
    return out, replace(meta, coord_layout="separated")


def native_spark_type(
    geometry_type: str, dims: int = 2, with_m: bool = False
) -> T.DataType:
    """Spark type for a native-encoded geometry column of ``geometry_type``."""
    dt: T.DataType = coord_struct_type(dims, with_m)
    for _ in range(NESTING_DEPTH[geometry_type]):
        dt = T.ArrayType(dt, containsNull=False)
    return dt
