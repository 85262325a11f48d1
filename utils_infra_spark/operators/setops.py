"""Set / sort / limit operators (SURVEY.md §2.7, O1–O7)."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_all(dfs: list[DataFrame]) -> DataFrame:
    """O4 (ref power-outages/server.js:144-146): union heterogeneous
    normalized sources by column NAME, tolerating missing columns —
    the 8-scraper fan-in. unionByName is a zero-shuffle concat."""
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)
