"""Mirror of the driver's correctness gate: run every ``queries()`` entry on
Spark and its ``oracle_sql()`` twin on DuckDB at sf0.001 and compare
row-count, column names, and values exactly (the driver hashes values, so
exact equality is the bar)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

import os

# default sf0.001 for CI speed; set SPARK_GRAFT_ORACLE_SF_DIR=/root/testdata/sf0.01
# to mirror the driver's gate SF exactly (verified manually each round)
SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 vs 0.0 and float32/64 printing
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, int):
        return float(v) if abs(v) < 2**52 else v
    return v


def _rows(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in data),
        key=lambda row: tuple((v is None, str(v)) for v in row),
    )


QUERIES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        # rows-only contract (non-SQL-expressible op): smoke-run ≥1 row
        rows = q(spark, SF_DIR).collect()
        assert len(rows) >= 1
        return
    sdf = q(spark, SF_DIR)
    srows_raw = sdf.collect()
    scols = sdf.columns
    res = duck.execute(oracle)
    dcols = [d[0] for d in res.description]
    drows_raw = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows_raw) == len(drows_raw), (
        f"{name}: row count {len(srows_raw)} vs oracle {len(drows_raw)}"
    )
    srows = _rows(scols, [[r[c] for c in scols] for r in srows_raw])
    drows = _rows(dcols, drows_raw)
    mismatches = [
        (a, b) for a, b in zip(srows, drows) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert {"region", "extent", "revenue", "n_customers"} <= set(df.columns)


# heavy battery file: certification tier only (r15 tiering, VERDICT r14 #9)
pytestmark = pytest.mark.slow
