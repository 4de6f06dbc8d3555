"""One-call literal arrays (r16, VERDICT r15 #6).

``F.array(*[F.lit(x) for x in vec])`` costs one py4j round trip per
element (~0.3 ms each) — a 64-dim literal vector is ~100 ms of pure driver
socket latency, and the ANN builders ship dozens of them (pivots, PQ
codebooks/LUTs, SQ8 params) on every build. Rendering the same literal as
ONE SQL string via ``F.expr`` is a single round trip (~1 ms) and parses to
bit-identical doubles: Python ``repr`` emits the shortest round-trip
decimal form and Spark's double literal parser (Java ``parseDouble``)
maps it back to the exact same IEEE-754 value — verified down to
denormals. Non-finite values (inf/nan) have no SQL literal form, so those
fall back to the per-element path.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _render(values: list[float]) -> str:
    return "array(" + ",".join(f"{v!r}D" for v in values) + ")"


def finite_doubles(values) -> "list[float] | None":
    """values as floats if non-empty and all finite (SQL-renderable),
    else None — callers fall back to the per-element Column path."""
    vals = [float(v) for v in values]
    if vals and all(math.isfinite(v) for v in vals):
        return vals
    return None


def render_double_array(values: list[float]) -> str:
    """SQL text of a literal array<double> (caller guarantees finite)."""
    return _render(values)


def quote_col(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


# --- SQL renderings of the vector-math Column builders (r16) -------------
#
# Each renders the EXACT expression tree its Column-API twin builds
# (same operations, same order, same neutral literals), but in one
# ``F.expr`` round trip instead of one py4j call per node — the ANN
# builders' higher-order-function lambdas alone cost ~20 ms each to
# construct. Bit-identical results are pinned by the oracle equality
# gates and tests/test_exprlit_r16.py.


def vec_sql(col_name: str) -> str:
    """transform(col, x -> cast(x as double)) — the _vec twin."""
    return f"transform({quote_col(col_name)}, __v -> cast(__v as double))"


def dot_sql(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (__x, __y) -> __x * __y), "
        f"0.0D, (__a, __x) -> __a + __x)"
    )


def norm_sql(a: str) -> str:
    return f"sqrt(aggregate({a}, 0.0D, (__a, __x) -> __a + __x * __x))"


def cosine_sql(a: str, b: str) -> str:
    """NaN-safe cosine — the simsearch.cosine twin."""
    raw = f"({dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}))"
    return f"CASE WHEN NOT isnan({raw}) THEN {raw} END"


def sqdist_sql(a: str, b: str) -> str:
    """Sequential squared-L2 — the simsearch.sqdist twin."""
    return (
        f"aggregate(zip_with({a}, {b}, "
        f"(__x, __y) -> (__x - __y) * (__x - __y)), "
        f"0.0D, (__a, __x) -> __a + __x)"
    )


def lit_double_array(values) -> Column:
    """Literal ``array<double>`` column in one py4j call."""
    vals = [float(v) for v in values]
    if vals and all(math.isfinite(v) for v in vals):
        return F.expr(_render(vals))
    return F.array(*[F.lit(v) for v in vals])


def lit_double_matrix(rows) -> Column:
    """Literal ``array<array<double>>`` column in one py4j call."""
    mat = [[float(v) for v in row] for row in rows]
    if mat and all(row and all(math.isfinite(v) for v in row) for row in mat):
        return F.expr(
            "array(" + ",".join(_render(row) for row in mat) + ")"
        )
    return F.array(*[F.array(*[F.lit(v) for v in row]) for row in mat])
