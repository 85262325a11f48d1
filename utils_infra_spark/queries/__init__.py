"""Named query registry — the driver contract surface.

Every implemented operator from SURVEY.md §2 registers a named query
(spark builder over the driver's star schema) and, where the
semantics are ANSI-SQL-expressible, a DuckDB oracle string. The
driver executes both at sf=0.01 and compares row-count + schema +
order-insensitive value hash.

Cross-engine determinism rules used throughout (see
operators/aggregations.py): money sums go through DECIMAL (exact,
order-independent); averages/ratios round at a precision far above
float noise; ranking ties always break on a unique id; derived ints
cast to bigint to match DuckDB's default integer width.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load()
    return {name: q.fn for name, q in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


_loaded = False


def _load() -> None:
    global _loaded
    if _loaded:
        return
    from . import (  # noqa: F401
        advanced_queries,
        analytics_queries,
        dsl_queries,
        geo_queries,
        pipeline_queries,
        relational,
        sampling_queries,
        scalar_queries,
        window_queries,
    )

    _loaded = True
