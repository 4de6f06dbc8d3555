"""Tests for the SQL-string ST_ resolver (plans/sql.py) — the reference's
analyzer-rule behavior (rules.rs:20-129) reproduced at SQL-text level,
including the demo queries from examples/main.rs:50,55."""

import pytest

from datafusion_spatial_spark.plans.sql import SpatialSQL

REFDATA = "/root/reference/data"


@pytest.fixture(scope="module")
def ssql(spark):
    s = SpatialSQL(spark)
    for typ in ["point", "polygon"]:
        for enc in ["native", "wkb"]:
            s.register_geoparquet(
                f"{typ}_{enc}", f"{REFDATA}/data-{typ}-encoding_{enc}.parquet"
            )
    return s


def test_demo_projection(ssql):
    # examples/main.rs:50
    rows = ssql.sql(
        "SELECT ST_Envelope(geometry), ST_AsText(geometry) FROM polygon_native"
    ).collect()
    assert len(rows) == 4
    wkts = [r[1] for r in rows]
    assert "POLYGON ((30 10, 40 40, 20 40, 10 20, 30 10))" in wkts


def test_demo_aggregate(ssql):
    # examples/main.rs:55
    row = ssql.sql("SELECT ST_Extent(geometry) FROM polygon_native").collect()[0][0]
    assert (row.xmin, row.ymin, row.xmax, row.ymax) == (10.0, 10.0, 45.0, 45.0)


def test_nested_call(ssql):
    # nested resolution ≈ rules.rs:157-164
    rows = ssql.sql(
        "SELECT col, ST_AsText(ST_Envelope(geometry)) AS env_wkt "
        "FROM polygon_native ORDER BY col"
    ).collect()
    assert rows[0].env_wkt == "POLYGON ((10 10, 40 10, 40 40, 10 40, 10 10))"
    assert rows[2].env_wkt == "POLYGON EMPTY"
    assert rows[3].env_wkt is None


def test_wkb_view_filtering(ssql):
    rows = ssql.sql(
        "SELECT ST_GeometryType(geometry) AS t FROM point_wkb "
        "WHERE geometry IS NOT NULL"
    ).collect()
    assert all(r.t == "ST_Point" for r in rows)


def test_mixed_with_plain_sql(ssql):
    rows = ssql.sql(
        "SELECT count(*) AS n, ST_Extent(geometry) AS e FROM point_native "
        "WHERE col > 0"
    ).collect()
    assert rows[0].n == 3


def test_two_arg_predicates(ssql):
    rows = ssql.sql(
        "SELECT col, ST_Intersects(geometry, geometry) AS self_i, "
        "ST_Distance(geometry, geometry) AS self_d, "
        "ST_Area(geometry) AS area "
        "FROM polygon_native ORDER BY col"
    ).collect()
    assert rows[0].self_i is True and rows[0].self_d == 0.0
    assert rows[0].area == 550.0  # shoelace of the fixture polygon
    assert rows[3].self_i is None  # null row


def test_buffer_and_nested_measure(ssql):
    rows = ssql.sql(
        "SELECT ST_Area(ST_Buffer(geometry, 2)) AS a FROM point_native "
        "WHERE col = 0"
    ).collect()
    import math

    assert abs(rows[0].a - math.pi * 4) < 0.05


def test_unknown_function_raises(ssql):
    with pytest.raises(ValueError, match="unsupported"):
        ssql.resolve("SELECT ST_Bogus(geometry) FROM point_native")


def test_unregistered_column_raises(ssql):
    with pytest.raises(ValueError, match="no geometry metadata"):
        ssql.resolve("SELECT ST_AsText(mystery) FROM point_native")


def test_st_inside_string_literal_untouched(ssql):
    # quote-awareness: an ST_...(...) inside a SQL string literal is data
    rows = ssql.sql(
        "SELECT 'ST_AsText(geometry)' AS lit, ST_GeometryType(geometry) AS t "
        "FROM point_native WHERE geometry IS NOT NULL"
    ).collect()
    assert all(r.lit == "ST_AsText(geometry)" for r in rows)
    assert all(r.t == "ST_Point" for r in rows)
