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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table. Schema comes from parquet footers (no inference cost).

    Spark 4 rejects TIMESTAMP(NANOS) parquet columns (PARQUET_TYPE_ILLEGAL),
    and the driver's `events.ts` is nanos — so nanos read as long
    (legacy conf, set here so any session works) and convert to a
    microsecond TIMESTAMP, matching DuckDB's own ns→us truncation.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read all star-schema tables into a dict keyed by name."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition before CPU-heavy per-row compute.

    Parquet split sizing is byte-based (maxPartitionBytes), so a small
    file lands in ONE partition even when the projection over it (hash
    signatures, 64-dim dots) is compute-bound — leaving every other
    core idle. One cheap shuffle of the narrow input buys full
    parallelism for the expensive stage. At 100 TB inputs already
    arrive in thousands of splits and this becomes a no-op cost-wise;
    it still guards against few-large-files layouts.
    """
    if partitions is None:
        partitions = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(partitions)
