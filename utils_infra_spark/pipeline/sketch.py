"""Count-min sketch as a mergeable DataFrame structure.

A CMS is the streaming/distributed answer to "approximate counts for
any item, bounded memory": depth d hash rows x width w counters;
estimate = min over rows; error is one-sided (always an
OVERestimate, never under) and bounded by ~2N/w with probability
1 - (1/2)^d (Cormode & Muthukrishnan 2005).

Representation: the sketch IS a DataFrame (row_idx, bucket, cnt) —
at most d*w rows regardless of input size. That makes it:
- mergeable: union two sketches and re-sum per cell (the same
  property that lets 100 TB of per-partition partial sketches reduce
  tree-wise through one tiny shuffle);
- queryable: estimating a batch of items is a broadcast-sized join
  against the sketch, not a scan of the corpus.

Hashing is md5-derived (row-salted prefix, mod width) — the same
cross-engine-deterministic idiom as pipeline/sampling.py, so a
DuckDB oracle reproduces the sketch cell-for-cell. At 100 TB the
corpus scan computes d narrow hash columns (codegen'd JVM md5), the
shuffle carries (row, bucket) partial counts — map-side combine
collapses them to ≤ d*w rows per task before network.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_bucket(item: Column | str, row_idx: int, width: int) -> Column:
    """Row-salted bucket id: int(md5('<row>:' + item)[:8], 16) % width.

    Oracle fragment:
    ``CAST('0x' || substr(md5('<row>:' || item), 1, 8) AS BIGINT) % width``.
    """
    item = F.col(item) if isinstance(item, str) else item
    h = F.conv(F.substring(F.md5(F.concat(F.lit(f"{row_idx}:"), item)), 1, 8), 16, 10)
    return (h.cast("bigint") % width).alias("bucket")


def count_min_sketch(
    df: DataFrame, item_col: str, *, width: int = 512, depth: int = 4
) -> DataFrame:
    """Build the sketch: (row_idx int, bucket bigint, cnt bigint).

    One pass: each item fans out to ``depth`` cells inside the scan
    partition (inline array explode — no join, no extra shuffle),
    then a single groupBy over ≤ depth*width distinct cells.
    """
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row_idx"), cms_bucket(item_col, i, width).alias("bucket")
                )
                for i in range(depth)
            ]
        )
    ).alias("c")
    return (
        df.select(F.col(item_col), cells)
        .groupBy(F.col("c.row_idx").alias("row_idx"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the same (width, depth): cell-wise
    sum. CMS(x ∪ y) == merge(CMS(x), CMS(y)) exactly."""
    return (
        a.unionByName(b)
        .groupBy("row_idx", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, items: DataFrame, item_col: str, *, width: int, depth: int
) -> DataFrame:
    """Point-query a batch of items: est = min over the item's depth
    cells (missing cell ⇒ 0). Adds ``cms_est`` to ``items``.

    The items side explodes to depth probe rows and joins the ≤ d*w-row
    sketch — broadcast the sketch side; the corpus is never touched.
    """
    probes = items.select(
        F.col(item_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("row_idx"), cms_bucket(item_col, i, width).alias("bucket"))
                    for i in range(depth)
                ]
            )
        ).alias("p"),
    ).select(F.col(item_col), F.col("p.row_idx").alias("row_idx"), F.col("p.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(sketch), ["row_idx", "bucket"], "left")
    est = joined.groupBy(item_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est")
    )
    return items.join(est, item_col)
