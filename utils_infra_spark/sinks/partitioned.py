"""Partitioned parquet layout sink — the ingest-side write pattern
that makes every downstream query in this engine cheap at 100 TB.

Three decisions matter at scale, and this sink makes all of them:

1. **Hive partitioning on a low-cardinality key** (usually the event
   date): readers filtering on the key scan only matching directories
   (partition pruning — zero I/O for excluded partitions, visible as
   ``PartitionFilters`` in the read plan).
2. **One shuffle onto the partition key before the write**: without
   it, every one of the N write tasks appends a file to every one of
   the P hive partitions — N×P small files, the classic layout
   killer. Repartitioning first writes each hive partition from a
   bounded set of tasks. A salt column caps per-task volume when one
   day is hot (skew).
3. **Sort within partitions on the secondary filter column**: parquet
   row-group min/max stats then let readers skip row groups inside a
   partition (data skipping below the directory level), and sorted
   runs compress better. ``maxRecordsPerFile`` bounds any single
   file so downstream split planning stays balanced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    *,
    sort_cols: list[str] | None = None,
    max_records_per_file: int = 5_000_000,
    files_per_partition: int = 1,
) -> None:
    """Write ``df`` as hive-partitioned parquet with a scale-safe
    layout: shuffle onto the partition key (plus a small salt when
    ``files_per_partition > 1`` — parallelism for hot partitions
    without the N×P file explosion), sort within write tasks for
    row-group stats, bound file size.
    """
    # whole-row salt via xxhash64 (accepts every column type, struct/
    # map included — concat_ws-based salts crash on non-atomic
    # columns) — the same deterministic spread operators/skew.py uses
    salt = F.pmod(F.xxhash64(*df.columns), F.lit(files_per_partition)).alias("__salt")
    keyed = df.withColumn("__salt", salt)
    arranged = keyed.repartition(*[F.col(c) for c in partition_cols], F.col("__salt"))
    if sort_cols:
        arranged = arranged.sortWithinPartitions(*partition_cols, *sort_cols)
    (
        arranged.drop("__salt")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )
