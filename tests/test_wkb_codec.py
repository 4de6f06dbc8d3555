"""Unit tests for the clean-room WKB/WKT codec — ports of the reference's
WKT golden assertions (src/wkt/scalar.rs:280-391) normalized to oracle float
formatting (FIXTURES.md §2), plus round-trip and bbox properties."""

import math

import pytest

from datafusion_spatial_spark import wkb

GOLDEN_WKTS = [
    "POINT (30 10)",
    "POINT EMPTY",
    "POINT (40 40)",
    "LINESTRING (30 10, 10 30, 40 40)",
    "LINESTRING EMPTY",
    "POLYGON ((30 10, 40 40, 20 40, 10 20, 30 10))",
    "POLYGON ((35 10, 45 45, 15 40, 10 20, 35 10), (20 30, 35 35, 30 20, 20 30))",
    "POLYGON EMPTY",
    "MULTIPOINT ((30 10))",
    "MULTIPOINT ((10 40), (40 30), (20 20), (30 10))",
    "MULTIPOINT EMPTY",
    "MULTILINESTRING ((30 10, 10 30, 40 40))",
    "MULTILINESTRING ((10 10, 20 20, 10 40), (40 40, 30 30, 40 20, 30 10))",
    "MULTILINESTRING EMPTY",
    "MULTIPOLYGON (((30 10, 40 40, 20 40, 10 20, 30 10)))",
    "MULTIPOLYGON (((30 20, 45 40, 10 40, 30 20)), ((15 5, 40 10, 10 20, 5 10, 15 5)))",
    "MULTIPOLYGON (((40 40, 20 45, 45 30, 40 40)), ((20 35, 10 30, 10 10, 30 5, 45 20, 20 35), (30 20, 20 15, 20 25, 30 20)))",
    "MULTIPOLYGON EMPTY",
]


@pytest.mark.parametrize("wkt", GOLDEN_WKTS)
def test_wkt_roundtrip(wkt):
    g = wkb.from_wkt(wkt)
    assert wkb.to_wkt(g) == wkt


@pytest.mark.parametrize("wkt", GOLDEN_WKTS)
def test_wkb_roundtrip(wkt):
    g = wkb.from_wkt(wkt)
    buf = wkb.dumps(g)
    g2 = wkb.loads(buf)
    assert wkb.to_wkt(g2) == wkt


def test_reference_unit_goldens():
    # src/wkt/scalar.rs:301,316,332,347,364-367 — semantic match, oracle fmt
    assert wkb.to_wkt(wkb.Geom("Point", (1.0, 2.0))) == "POINT (1 2)"
    assert (
        wkb.to_wkt(wkb.Geom("LineString", [(1, 2), (3, 4), (5, 6)]))
        == "LINESTRING (1 2, 3 4, 5 6)"
    )
    assert (
        wkb.to_wkt(wkb.Geom("Polygon", [[(0, 0), (4, 0), (2, 4), (0, 0)]]))
        == "POLYGON ((0 0, 4 0, 2 4, 0 0))"
    )
    assert (
        wkb.to_wkt(wkb.Geom("MultiPoint", [(0, 0), (4, 0), (2, 4)]))
        == "MULTIPOINT ((0 0), (4 0), (2 4))"
    )


def test_header_type_name():
    for wkt, want in [
        ("POINT (1 2)", "Point"),
        ("MULTIPOLYGON EMPTY", "MultiPolygon"),
    ]:
        assert wkb.header_type_name(wkb.dumps(wkb.from_wkt(wkt))) == want
    # big-endian + ISO Z code
    import struct

    buf = struct.pack(">BI", 0, 1001) + struct.pack(">ddd", 1, 2, 3)
    assert wkb.header_type_name(buf) == "Point Z"
    g = wkb.loads(buf)
    assert g.coords == (1.0, 2.0, 3.0) and g.has_z


def test_ewkb_flags():
    import struct

    # EWKB point with SRID + Z flag
    buf = (
        struct.pack("<BI", 1, 0x80000001 | 0x20000000)
        + struct.pack("<I", 4326)
        + struct.pack("<ddd", 1, 2, 3)
    )
    g = wkb.loads(buf)
    assert g.type_name == "Point" and g.srid == 4326 and g.has_z


def test_bbox_and_envelope():
    g = wkb.from_wkt("POLYGON ((30 10, 40 40, 20 40, 10 20, 30 10))")
    assert wkb.bbox(g) == (10.0, 10.0, 40.0, 40.0)
    assert wkb.envelope_ring(g) == [
        (10.0, 10.0),
        (40.0, 10.0),
        (40.0, 40.0),
        (10.0, 40.0),
        (10.0, 10.0),
    ]
    assert wkb.bbox(wkb.from_wkt("POINT EMPTY")) is None
    assert wkb.envelope_ring(wkb.from_wkt("LINESTRING EMPTY")) == []


def test_geometrycollection():
    wkt = "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 3 4))"
    g = wkb.from_wkt(wkt)
    assert wkb.to_wkt(g) == wkt
    assert wkb.bbox(g) == (0.0, 0.0, 3.0, 4.0)
    assert wkb.to_wkt(wkb.loads(wkb.dumps(g))) == wkt


def test_point_empty_nan():
    g = wkb.from_wkt("POINT EMPTY")
    assert g.is_empty
    assert all(math.isnan(v) for v in g.coords)


class TestMeasuredCoordinates:
    """M / ZM round-trip — parity with the reference WKT writer's dimension
    tokens (scalar.rs:215-238)."""

    CASES = [
        "POINT M (1 2 3)",
        "POINT ZM (1 2 3 4)",
        "LINESTRING M (0 0 1, 10 0 2)",
        "LINESTRING ZM (0 0 1 2, 10 0 3 4)",
        "POLYGON M ((0 0 1, 10 0 2, 10 10 3, 0 0 1))",
        "MULTIPOINT ZM ((1 2 3 4), (5 6 7 8))",
        "POINT M EMPTY",
        "POINT ZM EMPTY",
    ]

    def test_wkt_wkb_wkt_roundtrip(self):
        from datafusion_spatial_spark import wkb

        for w in self.CASES:
            g = wkb.from_wkt(w)
            assert wkb.to_wkt(wkb.loads(wkb.dumps(g))) == w

    def test_header_type_name_reports_dim(self):
        from datafusion_spatial_spark import wkb

        assert wkb.header_type_name(
            wkb.dumps(wkb.from_wkt("POINT M (1 2 3)"))
        ) == "Point M"
        assert wkb.header_type_name(
            wkb.dumps(wkb.from_wkt("POINT ZM (1 2 3 4)"))
        ) == "Point ZM"

    def test_m_values_preserved(self):
        from datafusion_spatial_spark import wkb

        g = wkb.loads(wkb.dumps(wkb.from_wkt("LINESTRING M (0 0 7, 1 1 9)")))
        assert g.has_m and not g.has_z
        assert [c[2] for c in g.coords] == [7.0, 9.0]

    def test_ewkb_m_flag_decoded(self):
        import struct

        from datafusion_spatial_spark import wkb

        # EWKB little-endian Point with M flag (0x40000001), coords (1, 2, 5)
        buf = b"\x01" + struct.pack("<I", 0x40000001) + struct.pack("<ddd", 1, 2, 5)
        g = wkb.loads(buf)
        assert g.has_m and g.coords == (1.0, 2.0, 5.0)
        assert wkb.to_wkt(g) == "POINT M (1 2 5)"
