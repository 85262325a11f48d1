"""Parquet table loaders for the driver's synthetic star schema.

At 100 TB the fact tables (lineitem / orders / events / documents /
embeddings) are partitioned parquet or Iceberg/Delta; the loaders
here are plain ``spark.read.parquet`` so Catalyst gets predicate
pushdown + column pruning on every scan (verify with
``df.explain('formatted')`` → ``PushedFilters`` / ``ReadSchema``).
Dimension tables (region, nation, supplier, part at small sf) stay
under the broadcast threshold and join map-side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Plan-level cache: (appId, sf_dir, name) -> DataFrame. A DataFrame
# is an immutable logical plan, so handing the same object to every
# query is safe and skips the per-read file listing + footer read
# (~80 ms each on the driver — pure fixed overhead that multiplies by
# tables-per-query × queries-per-session). Keyed by applicationId so
# a stopped/rebuilt session never serves stale plans.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table. Schema comes from parquet footers (no inference cost).

    Spark 4 rejects TIMESTAMP(NANOS) parquet columns (PARQUET_TYPE_ILLEGAL),
    and the driver's `events.ts` is nanos — so nanos read as long
    (legacy conf, set here so any session works) and convert to a
    microsecond TIMESTAMP, matching DuckDB's own ns→us truncation.
    """
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    _TABLE_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read all star-schema tables into a dict keyed by name."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def spread(df: DataFrame, partitions: int | None = None, min_bytes: int | None = None) -> DataFrame:
    """Round-robin repartition before CPU-heavy per-row compute.

    Parquet split sizing is byte-based (maxPartitionBytes), so a small
    file lands in ONE partition even when the projection over it (hash
    signatures, 64-dim dots) is compute-bound — leaving every other
    core idle. One cheap shuffle of the narrow input buys full
    parallelism for the expensive stage. At 100 TB inputs already
    arrive in thousands of splits and this becomes a no-op cost-wise;
    it still guards against few-large-files layouts.

    The shuffle only pays for itself when the input is BOTH too few
    partitions to use the cluster AND big enough that the per-row
    compute dwarfs the exchange latency — so it is gated on input
    bytes (`min_bytes`, default 32 MB ≈ a quarter of one parquet
    split). Below the gate the exchange is pure added latency: the
    whole stage finishes in the time the shuffle alone would take.
    At 100 TB inputs arrive in thousands of splits, the partition
    check short-circuits, and this is a no-op either way.

    Callers whose per-row compute dwarfs row width (vector math,
    per-key fetch fan-out, sketching) pass ``min_bytes=0``: for them
    even a tiny input deserves every core, and the exchange moves
    almost nothing.
    """
    if partitions is None:
        partitions = df.sparkSession.sparkContext.defaultParallelism
    if min_bytes is None:
        min_bytes = _SPREAD_MIN_BYTES
    try:
        files = df.inputFiles()
    except Exception:  # multi-source / non-file plans: keep the exchange
        files = []
    if files:
        # many-splits layout: already parallel, shuffle adds nothing
        if len(files) >= partitions:
            return df
        total = 0
        for f in files:
            path = f.removeprefix("file:")
            if not path.startswith("/"):
                total = None  # remote store: size unknown, keep the guard
                break
            try:
                total += os.path.getsize(path)
            except OSError:
                total = None
                break
        if total is not None and total < min_bytes:
            return df
    return df.repartition(partitions)


# gate below which spread() skips its exchange (see docstring)
_SPREAD_MIN_BYTES = 32 * 1024 * 1024
