"""Aggregation operators (SURVEY.md §2.5, A1–A10).

All are `groupBy().agg()` chains — Spark executes them as partial
(map-side) aggregation + shuffle-on-key + final merge, which is the
scalable shape: at 100 TB the shuffle carries only the partial
aggregates, not the rows. Exact-arithmetic note: money-like sums cast
to DECIMAL first so results are associative and match any oracle
bit-for-bit regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# DECIMAL sums are order-independent (integer arithmetic underneath),
# so a 32-partition Spark plan and a single-threaded oracle agree
# exactly. Double sums differ in the last ulps across partitionings.
DEC = "decimal(28,6)"


def dsum(col: str | Column, alias: str) -> Column:
    """Exact decimal sum, cast back to double for a stable wire type."""
    col = F.col(col) if isinstance(col, str) else col
    return F.sum(col.cast(DEC)).cast("double").alias(alias)


def davg(col: str | Column, alias: str, scale: int = 6) -> Column:
    """Order-independent average: decimal-sum / count, rounded."""
    col = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(col.cast(DEC)) / F.count(col), scale).cast("double").alias(alias)


def grouped_sum(df: DataFrame, keys: list[str], value: str, *, sum_alias: str = "total", count_alias: str = "n") -> DataFrame:
    """A1 (ref power-outages/server.js:92-125): SUM + COUNT per key."""
    return df.groupBy(*keys).agg(dsum(value, sum_alias), F.count(F.lit(1)).alias(count_alias))


def ratio_pct(numer: Column | str, denom: Column | str, alias: str, dp: int = 4) -> Column:
    """A2 (ref power-outages/server.js:100): percentage with fixed
    decimal places, guarded for zero denominators."""
    numer = F.col(numer) if isinstance(numer, str) else numer
    denom = F.col(denom) if isinstance(denom, str) else denom
    pct = F.round(numer.cast(DEC) * 100 / denom.cast(DEC), dp).cast("double")
    return F.when(denom > 0, pct).alias(alias)


def pivot_counts(df: DataFrame, category: str, values: list[str], *, total_alias: str = "total") -> DataFrame:
    """A4 (ref ais-proxy/server.js:744-768): category counts as one
    wide row via conditional sums — one pass, no pivot shuffle."""
    aggs = [F.sum(F.when(F.col(category) == v, 1).otherwise(0)).alias(v) for v in values]
    aggs.append(F.count(F.lit(1)).alias(total_alias))
    return df.agg(*aggs)


def value_counts(df: DataFrame, col: str, *, count_alias: str = "n") -> DataFrame:
    """A6 (ref scripts/find-missing-types.js:51-78): value histogram,
    most frequent first."""
    return df.groupBy(col).agg(F.count(F.lit(1)).alias(count_alias)).orderBy(F.desc(count_alias), col)
