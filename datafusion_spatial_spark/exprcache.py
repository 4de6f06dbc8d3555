"""Memoization for immutable Catalyst Column trees (r15 optimization).

Building a PySpark ``Column`` costs one py4j round trip (~0.3 ms) per
expression node; the engine's heavier builders (MinHash signatures, the
spatial-join grid expressions, the text-stats set) spend 0.3–1.1 s of pure
driver-side socket latency per query build, rebuilding byte-identical
expression trees on every call. ``Column`` objects are immutable plan
fragments — reusing one across queries (and sessions of the same JVM) is
safe, exactly like reusing a parsed SQL string.

``cached_columns(key, build)`` memoizes whatever ``build()`` returns
(a Column or a tuple/list of Columns) keyed by ``key`` plus the live py4j
gateway, so a JVM restart invalidates everything automatically. The cache
holds EXPRESSION PLANS only — never DataFrames, data, or results.

Callers must only use it when ``key`` fully determines the expression
(column *names* and plain-value params — never Column objects).
Set ``SPARK_GRAFT_NO_EXPR_CACHE=1`` to disable.
"""

from __future__ import annotations

import os
from typing import Any, Callable

_CACHE: dict[tuple, tuple[Any, Any]] = {}


def _gateway() -> Any:
    from pyspark import SparkContext

    return getattr(SparkContext, "_gateway", None)


def cached_columns(key: tuple, build: Callable[[], Any]) -> Any:
    if os.environ.get("SPARK_GRAFT_NO_EXPR_CACHE", "") == "1":
        return build()
    gw = _gateway()
    ent = _CACHE.get(key)
    if ent is not None and ent[0] is gw and gw is not None:
        return ent[1]
    val = build()
    _CACHE[key] = (gw, val)
    return val
