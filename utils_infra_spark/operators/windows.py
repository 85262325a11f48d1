"""Window / ranking operators (SURVEY.md §2.6, W1–W4).

W1 (keep-latest-per-key) lives in joins.latest_wins since the
reference uses it as a merge primitive. These are the ranking and
time-window forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_n_per_group(df: DataFrame, partition: list[str], order: list, n: int, *, rank_alias: str = "rnk") -> DataFrame:
    """W2 (ref ais-proxy/server.js:174-190): retain top-N per group by
    an ordering (the reference's recency-based cache eviction).

    Empty ``partition`` = global top-N. That case routes through
    ``orderBy().limit(n)`` (TakeOrderedAndProject: parallel per-
    partition heaps, driver-side merge of n rows) instead of a
    row_number over an unpartitioned window, which would sort the
    whole input through a single task. The rank column is then
    derived on the already-limited n-row frame, where a global
    window costs nothing, so the output schema is identical on both
    branches."""
    if not partition:
        top = df.orderBy(*order).limit(n)
        w = Window.orderBy(*order)
        return top.withColumn(rank_alias, F.row_number().over(w))
    w = Window.partitionBy(*partition).orderBy(*order)
    return df.withColumn(rank_alias, F.row_number().over(w)).where(F.col(rank_alias) <= n)


def keep_latest(df: DataFrame, key: str | list[str], ts: str, *tie_break: str) -> DataFrame:
    """W1 — re-export of the latest-wins merge for discoverability."""
    from .joins import latest_wins

    return latest_wins(df, key, ts, *tie_break)


def last_non_null_per_key(df: DataFrame, key: str, ts: str, value_cols: list[str], *tie_break: str) -> DataFrame:
    """W1's per-field form (ref ais-proxy/server.js:390-592): the
    vessel cache keeps the latest NON-NULL value per field per key
    (position messages don't carry static fields and vice versa).
    `last(ignorenulls=True)` over a full-frame window, then one row
    per key. Extra ``tie_break`` columns (e.g. a unique event id)
    make the winner deterministic when timestamps collide."""
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), *[F.col(t).asc() for t in tie_break])
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    cols = [F.col(key)] + [F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols]
    cols.append(F.max(F.col(ts)).over(w).alias(ts))
    return df.select(*cols).dropDuplicates([key])


def tumbling_counts(df: DataFrame, ts: str, duration: str, extra_keys: list[str] | None = None) -> DataFrame:
    """W3 (ref ais-proxy/server.js:193-208 rate window): event counts
    per time bucket (per extra key). Batch analog of the streaming
    rate-limit window; in streaming this is `window()` + watermark."""
    keys = [F.window(F.col(ts), duration).alias("win")] + [F.col(k) for k in (extra_keys or [])]
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n")).select(
        F.col("win.start").alias("win_start"), *(extra_keys or []), "n"
    )
