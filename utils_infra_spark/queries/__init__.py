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

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def _app_id(spark: SparkSession) -> str:
    """applicationId with the Py4J roundtrip paid once per session.

    The property call is a JVM roundtrip (~ms); it is on the plan-cache
    hot path, so memoize it on the session object itself — attribute
    lifetime == session lifetime, no stale-id risk after a restart.
    """
    cached = getattr(spark, "_uis_app_id", None)
    if cached is None:
        cached = spark.sparkContext.applicationId
        spark._uis_app_id = cached
    return cached


# Prepared-plan cache: (appId, sf_dir, query name) -> DataFrame.
# A DataFrame is an immutable logical plan, so re-serving the same
# object for the same (session, input, query) is semantically a no-op
# — it skips only the driver-side plan RE-construction (Python → JVM
# expression building, ~0.05-0.5 s per query under Py4J latency; see
# docs/SCALE.md). The same idea as load_table's table cache, one
# level up: any engine that fields repeated named queries keeps a
# prepared-plan cache keyed by query identity. Keyed by applicationId
# so a stopped/rebuilt session never serves plans bound to a dead JVM.
_PLAN_CACHE: dict[tuple[str, str, str], DataFrame] = {}


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check
    doc: str = ""

    def plan(self, spark: SparkSession, sf_dir: str) -> DataFrame:
        """Build (or re-serve) this query's DataFrame via the plan cache."""
        key = (_app_id(spark), os.path.abspath(sf_dir), self.name)
        cached = _PLAN_CACHE.get(key)
        if cached is None:
            cached = self.fn(spark, sf_dir)
            _PLAN_CACHE[key] = cached
        return cached


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load()
    return {name: q.plan for name, q in REGISTRY.items()}


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
