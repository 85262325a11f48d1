"""SparkSession factory with scale-appropriate defaults.

Local testing runs ``local[N]``; the same config block is what we'd
ship on a 1000-executor cluster — AQE on (runtime re-plan, skew-join
splitting, partition coalescing), broadcast threshold sized for dim
tables, Arrow enabled for the pandas-UDF surface.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "utils-infra-spark", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) and
    only affects local mode; on a real cluster the master URL comes
    from the environment and these configs carry over unchanged.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        # --- adaptive execution: runtime re-plan, skew splitting ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- shuffle sizing: start at cpus; AQE coalesces down ---
        .config("spark.sql.shuffle.partitions", str(max(cpus, 32)))
        # --- dim joins broadcast (largest dim here is ~MBs) ---
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # --- Arrow for the pandas-UDF surface ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- scan sizing: 128 MB splits, the parquet sweet spot ---
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        # --- deterministic session TZ so date math is reproducible ---
        .config("spark.sql.session.timeZone", "UTC")
        # local mode: the driver IS the executor — size the heap for
        # 32 concurrent tasks + accumulated broadcasts (GC thrash at
        # 8g showed up as 10x query-time variance in long sessions)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
