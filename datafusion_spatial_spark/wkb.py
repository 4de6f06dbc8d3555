"""Clean-room WKB / WKT codec (pure Python, no GEOS dependency).

The reference decodes WKB header bytes to classify geometry
(src/udfs/geometry_type.rs:119-146), converts WKB → WKT through the geo
crate (src/udfs/as_text.rs:84-107) and computes WKB bounding boxes via
``geo::BoundingRect`` (src/udfs/envelope.rs:98-127). This module provides the
same capabilities for the engine's Python side. It is used ONLY inside
Arrow-batched pandas UDFs on the WKB path; native-encoded geometry never
touches Python (pure Catalyst expressions instead).

Geometry value model (matches the native nesting of the data model):
  Point                     -> (x, y[, z]) tuple
  LineString / MultiPoint   -> [coord, ...]
  Polygon / MultiLineString -> [[coord, ...], ...]
  MultiPolygon              -> [[[coord, ...], ...], ...]
  GeometryCollection        -> [Geom, ...]
Empty geometries have empty coord lists; POINT EMPTY is (nan, nan) per the
GeoParquet convention (reference data/generate_test_data.py:78-82).
"""

from __future__ import annotations

import math
import re
import struct
from dataclasses import dataclass

_TYPE_NAMES = {
    1: "Point",
    2: "LineString",
    3: "Polygon",
    4: "MultiPoint",
    5: "MultiLineString",
    6: "MultiPolygon",
    7: "GeometryCollection",
}
_TYPE_CODES = {v: k for k, v in _TYPE_NAMES.items()}

# EWKB dimension/SRID flag bits
_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000


@dataclass
class Geom:
    type_name: str  # one of _TYPE_NAMES values
    coords: object  # nested per the module docstring
    has_z: bool = False
    srid: int | None = None
    # measured coordinates: coord tuples are (x, y[, z][, m]) in ISO XYZM
    # order (reference WKT writer dim tokens, scalar.rs:215-238)
    has_m: bool = False

    @property
    def is_empty(self) -> bool:
        if self.type_name == "Point":
            return self.coords is None or any(
                isinstance(c, float) and math.isnan(c) for c in self.coords
            )
        return not self.coords


class WKBError(ValueError):
    pass


def header_type_name(buf: bytes) -> str:
    """Classify a WKB buffer from its header only — the cheap path used by
    ``ST_GeometryType`` (cf. reference geometry_type.rs:119-146). Returns
    e.g. "Point" or "Point Z"."""
    if buf is None or len(buf) < 5:
        raise WKBError("buffer too short for WKB header")
    endian = "<" if buf[0] == 1 else ">"
    (raw,) = struct.unpack_from(endian + "I", buf, 1)
    code, has_z, has_m, _ = _decode_type_code(raw)
    name = _TYPE_NAMES.get(code)
    if name is None:
        raise WKBError(f"unknown WKB geometry type code {raw}")
    return name + _dim_suffix(has_z, has_m)


def _decode_type_code(raw: int) -> tuple[int, bool, bool, bool]:
    """Handle both ISO (1001 = PointZ) and EWKB (0x80000001) type codes."""
    has_srid = bool(raw & _EWKB_SRID)
    has_z = bool(raw & _EWKB_Z)
    has_m = bool(raw & _EWKB_M)
    code = raw & 0x0FFFFFFF
    if code >= 3000:  # ISO ZM
        code -= 3000
        has_z = has_m = True
    elif code >= 2000:  # ISO M
        code -= 2000
        has_m = True
    elif code >= 1000:  # ISO Z
        code -= 1000
        has_z = True
    return code, has_z, has_m, has_srid


def _dim_suffix(has_z: bool, has_m: bool) -> str:
    if has_z and has_m:
        return " ZM"
    if has_z:
        return " Z"
    if has_m:
        return " M"
    return ""


# Nesting guard (r14 fuzz finding): a crafted buffer of back-to-back
# GeometryCollection headers recursed once per level and killed the
# worker with an uncontrolled RecursionError at ~1000 levels. Real
# geometries nest a handful of levels; 64 is far beyond any legitimate
# WKB while keeping the guard unreachable for honest data.
_MAX_NESTING = 64


class _Reader:
    __slots__ = ("buf", "pos", "depth")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        self.depth = 0

    def geometry(self) -> Geom:
        self.depth += 1
        if self.depth > _MAX_NESTING:
            raise WKBError(
                f"WKB nesting exceeds {_MAX_NESTING} levels — rejecting "
                "malformed/adversarial buffer"
            )
        try:
            return self._geometry()
        finally:
            self.depth -= 1

    def _geometry(self) -> Geom:
        endian = "<" if self.buf[self.pos] == 1 else ">"
        (raw,) = struct.unpack_from(endian + "I", self.buf, self.pos + 1)
        self.pos += 5
        code, has_z, has_m, has_srid = _decode_type_code(raw)
        srid = None
        if has_srid:
            (srid,) = struct.unpack_from(endian + "I", self.buf, self.pos)
            self.pos += 4
        name = _TYPE_NAMES.get(code)
        if name is None:
            raise WKBError(f"unknown WKB geometry type code {raw}")
        ndim = 2 + (1 if has_z else 0) + (1 if has_m else 0)

        def coord():
            vals = struct.unpack_from(endian + "d" * ndim, self.buf, self.pos)
            self.pos += 8 * ndim
            return vals  # (x, y[, z][, m]) — M values preserved

        def ring():
            (n,) = struct.unpack_from(endian + "I", self.buf, self.pos)
            self.pos += 4
            return [coord() for _ in range(n)]

        def count():
            (n,) = struct.unpack_from(endian + "I", self.buf, self.pos)
            self.pos += 4
            return n

        if name == "Point":
            c = coord()
            return Geom("Point", c, has_z, srid, has_m)
        if name == "LineString":
            return Geom("LineString", ring(), has_z, srid, has_m)
        if name == "Polygon":
            return Geom(
                "Polygon", [ring() for _ in range(count())], has_z, srid, has_m
            )
        if name == "MultiPoint":
            n = count()
            pts = []
            for _ in range(n):
                g = self.geometry()
                pts.append(g.coords)
            return Geom("MultiPoint", pts, has_z, srid, has_m)
        if name == "MultiLineString":
            n = count()
            return Geom(
                "MultiLineString", [self.geometry().coords for _ in range(n)],
                has_z, srid, has_m,
            )
        if name == "MultiPolygon":
            n = count()
            return Geom(
                "MultiPolygon", [self.geometry().coords for _ in range(n)],
                has_z, srid, has_m,
            )
        # GeometryCollection
        n = count()
        return Geom(
            "GeometryCollection", [self.geometry() for _ in range(n)], has_z,
            srid, has_m,
        )


def loads(buf: bytes) -> Geom:
    """Parse WKB bytes into a Geom."""
    if buf is None:
        raise WKBError("null buffer")
    return _Reader(bytes(buf)).geometry()


def dumps(geom: Geom) -> bytes:
    """Serialize a Geom to little-endian ISO WKB."""
    out = bytearray()
    _write_geom(out, geom)
    return bytes(out)


def _write_geom(out: bytearray, geom: Geom) -> None:
    code = _TYPE_CODES[geom.type_name]
    if geom.has_z:
        code += 1000
    if geom.has_m:
        code += 2000
    out += b"\x01"
    out += struct.pack("<I", code)
    ndim = 2 + (1 if geom.has_z else 0) + (1 if geom.has_m else 0)
    pack = struct.Struct("<" + "d" * ndim).pack

    def wcoord(c):
        vals = tuple(c[:ndim])
        if len(vals) < ndim:  # e.g. EMPTY point parsed as (nan, nan)
            vals += (math.nan,) * (ndim - len(vals))
        out.extend(pack(*vals))

    def wring(r):
        out.extend(struct.pack("<I", len(r)))
        for c in r:
            wcoord(c)

    t = geom.type_name
    if t == "Point":
        c = geom.coords
        if c is None or len(c) == 0:
            wcoord((math.nan,) * ndim)
        else:
            wcoord(c)
    elif t == "LineString":
        wring(geom.coords)
    elif t == "Polygon":
        out.extend(struct.pack("<I", len(geom.coords)))
        for r in geom.coords:
            wring(r)
    elif t == "MultiPoint":
        out.extend(struct.pack("<I", len(geom.coords)))
        for c in geom.coords:
            _write_geom(out, Geom("Point", c, geom.has_z, None, geom.has_m))
    elif t == "MultiLineString":
        out.extend(struct.pack("<I", len(geom.coords)))
        for line in geom.coords:
            _write_geom(out, Geom("LineString", line, geom.has_z, None, geom.has_m))
    elif t == "MultiPolygon":
        out.extend(struct.pack("<I", len(geom.coords)))
        for poly in geom.coords:
            _write_geom(out, Geom("Polygon", poly, geom.has_z, None, geom.has_m))
    elif t == "GeometryCollection":
        out.extend(struct.pack("<I", len(geom.coords)))
        for g in geom.coords:
            _write_geom(out, g)
    else:  # pragma: no cover
        raise WKBError(f"cannot serialize {t}")


# ---------------------------------------------------------------------------
# WKT


def _fmt(v: float) -> str:
    """DuckDB/PostGIS-style number formatting: integral floats print without
    a decimal part ("30", not the reference's Rust-debug "30.0" — SURVEY §7
    chooses oracle formatting). One shared rule with the native-encoding
    Catalyst path (scalar.fmt_coord_num): fixed 8-decimal format with
    trailing zeros (and bare trailing dot) trimmed — never scientific
    notation, so WKB and native ST_AsText agree byte-for-byte.

    A nonzero value that the 8-decimal rendering would collapse to zero
    (|v| < 5e-9) falls back to repr so data is never silently erased, and
    negative zero normalizes to "0" (no "-0" drift between paths)."""
    if v != v:  # NaN
        return "nan"
    out = _TRAILING_ZEROS.sub("", f"{v:.8f}")
    if out in ("0", "-0"):
        return "0" if v == 0.0 else repr(v)
    return out


_TRAILING_ZEROS = re.compile(r"\.?0+$")


def _coord_wkt(c) -> str:
    return " ".join(_fmt(v) for v in c)


def to_wkt(geom: Geom) -> str:
    t = geom.type_name.upper()
    z = _dim_suffix(geom.has_z, geom.has_m)
    if geom.is_empty:
        return f"{t}{z} EMPTY"
    c = geom.coords
    if geom.type_name == "Point":
        return f"POINT{z} ({_coord_wkt(c)})"
    if geom.type_name == "LineString":
        return f"LINESTRING{z} ({', '.join(_coord_wkt(p) for p in c)})"
    if geom.type_name == "Polygon":
        rings = ", ".join(
            "(" + ", ".join(_coord_wkt(p) for p in r) + ")" for r in c
        )
        return f"POLYGON{z} ({rings})"
    if geom.type_name == "MultiPoint":
        return f"MULTIPOINT{z} ({', '.join('(' + _coord_wkt(p) + ')' for p in c)})"
    if geom.type_name == "MultiLineString":
        lines = ", ".join(
            "(" + ", ".join(_coord_wkt(p) for p in line) + ")" for line in c
        )
        return f"MULTILINESTRING{z} ({lines})"
    if geom.type_name == "MultiPolygon":
        polys = ", ".join(
            "("
            + ", ".join(
                "(" + ", ".join(_coord_wkt(p) for p in r) + ")" for r in poly
            )
            + ")"
            for poly in c
        )
        return f"MULTIPOLYGON{z} ({polys})"
    # GeometryCollection
    return f"GEOMETRYCOLLECTION{z} ({', '.join(to_wkt(g) for g in c)})"


# ---------------------------------------------------------------------------
# WKT parsing (for the CSV fixtures and st_geomfromtext)


def from_geojson(obj, _depth: int = 0) -> Geom:
    """GeoJSON geometry (dict or JSON text) → Geom. The GeoJSON coordinate
    nesting matches the Geom value model exactly (Point [x,y],
    LineString [[x,y],...], Polygon [rings], Multi* one level deeper), so
    this is a structural relabel. A 3rd coordinate is Z per RFC 7946.
    Same GeometryCollection nesting guard as the WKB/WKT parsers (r14
    fuzz finding: an adversarial deeply-nested collection recursed into
    an uncontrolled RecursionError)."""
    import json

    if _depth > _MAX_NESTING:
        raise WKBError(
            f"GeoJSON nesting exceeds {_MAX_NESTING} levels — rejecting "
            "malformed/adversarial input"
        )
    if isinstance(obj, (str, bytes)):
        obj = json.loads(obj)
    t = obj.get("type")
    if t == "GeometryCollection":
        members = [
            from_geojson(g, _depth + 1) for g in obj.get("geometries", [])
        ]
        return Geom("GeometryCollection", members,
                    any(m.has_z for m in members))
    if t not in _TYPE_CODES:
        raise WKBError(f"unknown GeoJSON geometry type {t!r}")
    coords = obj.get("coordinates")

    def depth_first(c):
        while isinstance(c, (list, tuple)) and c and isinstance(c[0], (list, tuple)):
            c = c[0]
        return c

    first = depth_first(coords) if coords else []
    has_z = isinstance(first, (list, tuple)) and len(first) >= 3

    def conv(c, d):
        if d == 0:
            return tuple(float(v) for v in c[: 3 if has_z else 2])
        return [conv(x, d - 1) for x in c]

    depth = {"Point": 0, "LineString": 1, "MultiPoint": 1, "Polygon": 2,
             "MultiLineString": 2, "MultiPolygon": 3}[t]
    if coords is None or (depth == 0 and not coords) or (depth > 0 and not coords):
        return Geom(t, (math.nan, math.nan) if t == "Point" else [], has_z)
    return Geom(t, conv(coords, depth), has_z)


def to_geojson(geom: Geom) -> str:
    """Geom → GeoJSON geometry text (RFC 7946; M measures are dropped —
    GeoJSON has no M)."""
    import json

    def strip(c, d):
        if d == 0:
            return list(c[: 3 if geom.has_z else 2])
        return [strip(x, d - 1) for x in c]

    t = geom.type_name
    if t == "GeometryCollection":
        return json.dumps(
            {"type": t,
             "geometries": [json.loads(to_geojson(g)) for g in geom.coords]},
            separators=(",", ":"),
        )
    depth = {"Point": 0, "LineString": 1, "MultiPoint": 1, "Polygon": 2,
             "MultiLineString": 2, "MultiPolygon": 3}[t]
    if geom.is_empty:
        coords = [] if t != "Point" else []
    else:
        coords = strip(geom.coords, depth)
    return json.dumps({"type": t, "coordinates": coords},
                      separators=(",", ":"))


def from_wkt(text: str) -> Geom:
    p = _WktParser(text)
    g = p.geometry()
    p.skip_ws()
    if p.pos != len(p.s):
        raise WKBError(f"trailing WKT input at {p.pos}: {text!r}")
    return g


class _WktParser:
    def __init__(self, s: str):
        self.s = s.strip()
        self.pos = 0
        self.depth = 0

    def skip_ws(self):
        while self.pos < len(self.s) and self.s[self.pos].isspace():
            self.pos += 1

    def expect(self, ch: str):
        self.skip_ws()
        if self.pos >= len(self.s) or self.s[self.pos] != ch:
            raise WKBError(f"expected {ch!r} at {self.pos} in {self.s!r}")
        self.pos += 1

    def peek(self) -> str:
        self.skip_ws()
        return self.s[self.pos] if self.pos < len(self.s) else ""

    def word(self) -> str:
        self.skip_ws()
        start = self.pos
        while self.pos < len(self.s) and (
            self.s[self.pos].isalpha() or self.s[self.pos] == "_"
        ):
            self.pos += 1
        return self.s[start : self.pos].upper()

    def number(self) -> float:
        self.skip_ws()
        start = self.pos
        while self.pos < len(self.s) and self.s[self.pos] not in " ,()\t\n":
            self.pos += 1
        return float(self.s[start : self.pos])

    def coord(self, ndim: int):
        vals = [self.number()]
        while True:
            self.skip_ws()
            if self.pos < len(self.s) and self.s[self.pos] not in ",)":
                vals.append(self.number())
            else:
                break
        return tuple(vals)

    def coord_seq(self, ndim: int):
        self.expect("(")
        out = [self.coord(ndim)]
        while self.peek() == ",":
            self.pos += 1
            out.append(self.coord(ndim))
        self.expect(")")
        return out

    def paren_list(self, inner):
        self.expect("(")
        out = [inner()]
        while self.peek() == ",":
            self.pos += 1
            out.append(inner())
        self.expect(")")
        return out

    def geometry(self) -> Geom:
        # same nesting guard as the WKB reader (r14 fuzz finding): a
        # "GEOMETRYCOLLECTION (" * N bomb recursed once per level and
        # raised an uncontrolled RecursionError at ~1000 levels
        self.depth += 1
        if self.depth > _MAX_NESTING:
            raise WKBError(
                f"WKT nesting exceeds {_MAX_NESTING} levels — rejecting "
                "malformed/adversarial input"
            )
        try:
            return self._geometry()
        finally:
            self.depth -= 1

    def _geometry(self) -> Geom:
        name_raw = self.word()
        has_z = False
        has_m = False
        for suffix in ("ZM", "Z", "M"):
            if name_raw.endswith(suffix) and name_raw not in (
                "MULTIPOINT",
                "MULTILINESTRING",
                "MULTIPOLYGON",
            ):
                # dimension token attached (POINTZ / POINTM) — normalize
                base = name_raw[: -len(suffix)]
                if base in (t.upper() for t in _TYPE_CODES):
                    name_raw = base
                    has_z = "Z" in suffix
                    has_m = "M" in suffix
                break
        canonical = {t.upper(): t for t in _TYPE_CODES}
        if name_raw not in canonical:
            raise WKBError(f"unknown WKT type {name_raw!r}")
        name = canonical[name_raw]
        # optional separate dimension token: POINT Z (...) / POINT ZM (...)
        save = self.pos
        tok = self.word()
        if tok in ("Z", "M", "ZM"):
            has_z = "Z" in tok
            has_m = "M" in tok
        elif tok == "EMPTY":
            return Geom(
                name, (math.nan, math.nan) if name == "Point" else [], has_z,
                None, has_m,
            )
        else:
            self.pos = save
        self.skip_ws()
        if self.s[self.pos :].upper().startswith("EMPTY"):
            self.pos += 5
            return Geom(
                name, (math.nan, math.nan) if name == "Point" else [], has_z,
                None, has_m,
            )
        ndim = 2 + (1 if has_z else 0) + (1 if has_m else 0)
        if name == "Point":
            self.expect("(")
            c = self.coord(ndim)
            self.expect(")")
            return Geom(name, c, has_z, None, has_m)
        if name in ("LineString",):
            return Geom(name, self.coord_seq(ndim), has_z, None, has_m)
        if name in ("Polygon", "MultiLineString"):
            return Geom(
                name, self.paren_list(lambda: self.coord_seq(ndim)), has_z,
                None, has_m,
            )
        if name == "MultiPoint":
            # members may be parenthesized "((1 2), (3 4))" or bare "(1 2, 3 4)"
            def member():
                if self.peek() == "(":
                    self.expect("(")
                    c = self.coord(ndim)
                    self.expect(")")
                    return c
                return self.coord(ndim)

            return Geom(name, self.paren_list(member), has_z, None, has_m)
        if name == "MultiPolygon":
            return Geom(
                name,
                self.paren_list(
                    lambda: self.paren_list(lambda: self.coord_seq(ndim))
                ),
                has_z, None, has_m,
            )
        # GeometryCollection
        return Geom(name, self.paren_list(self.geometry), has_z, None, has_m)


# ---------------------------------------------------------------------------
# geometry math used by the WKB pandas-UDF paths


def bbox(geom: Geom) -> tuple[float, float, float, float] | None:
    """(xmin, ymin, xmax, ymax) over all coords, NaN-excluded (the
    reference's NaN-aware fold, src/compute.rs:19-73). None when empty."""
    xmin = ymin = math.inf
    xmax = ymax = -math.inf

    def fold(coords):
        nonlocal xmin, ymin, xmax, ymax
        if coords is None:
            return
        if isinstance(coords, tuple):
            x, y = coords[0], coords[1]
            if x == x and y == y:
                xmin = min(xmin, x)
                ymin = min(ymin, y)
                xmax = max(xmax, x)
                ymax = max(ymax, y)
            return
        for c in coords:
            fold(c)

    if geom.type_name == "GeometryCollection":
        for g in geom.coords:
            b = bbox(g)
            if b:
                xmin = min(xmin, b[0])
                ymin = min(ymin, b[1])
                xmax = max(xmax, b[2])
                ymax = max(ymax, b[3])
    else:
        fold(geom.coords)
    if xmin > xmax:
        return None
    return (xmin, ymin, xmax, ymax)


def envelope_ring(geom: Geom) -> list[tuple[float, float]]:
    """5-point closed envelope ring, CCW starting at (xmin,ymin) — the
    reference's ring convention (src/udfs/envelope.rs:338-350). Empty input
    → empty ring."""
    b = bbox(geom)
    if b is None:
        return []
    xmin, ymin, xmax, ymax = b
    return [
        (xmin, ymin),
        (xmax, ymin),
        (xmax, ymax),
        (xmin, ymax),
        (xmin, ymin),
    ]
