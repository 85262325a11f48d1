"""SparkSession factory with scale-appropriate defaults.

Local testing runs ``local[N]``; the same config block is what we'd
ship on a 1000-executor cluster — AQE on (runtime re-plan, skew-join
splitting, partition coalescing), broadcast threshold sized for dim
tables, Arrow enabled for the pandas-UDF surface.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import SparkSession

# Below this many input bytes the workload is latency-bound, not
# throughput-bound: per-task scheduling + AQE's sequential stage
# materialization dominate actual work (measured floor table in
# docs/SCALE.md). 256 MB ≈ a couple of parquet row groups per core
# on local[32] — far below anything a real cluster run would see.
TINY_INPUT_BYTES = 256 * 1024 * 1024


def tune_for_input(spark: SparkSession, data_dir: str, *, tiny_bytes: int = TINY_INPUT_BYTES) -> int:
    """Adapt runtime-settable session knobs to the measured input size.

    Gates on actual bytes on disk (not the scale-factor name) so the
    same call is a no-op on production-sized inputs:

    - tiny input (< ``tiny_bytes``): 8 shuffle partitions instead of
      32 (shuffles carry KBs; 32 tasks = 32 schedulings of ~nothing.
      Under the r4 single-partition-scan regime p4 ≈ p2 won; with the
      r5 block-manager input cache feeding parallel map sides, the
      cached-mode A/B measured p8 ~15% under p4 and ~10% under p16)
      and AQE off (each AQE stage materializes as its own job — a
      sequential driver round-trip per shuffle that exists to re-plan
      statistics a 15 MB input doesn't need). Measured at sf0.1:
      2.4x faster warm headline total (docs/SCALE.md).
    - otherwise: leave the cluster-oriented defaults from
      :func:`get_spark` untouched (AQE on, partitions sized to cores).

    Returns the measured input bytes so callers can log the decision.
    """
    total = sum(f.stat().st_size for f in Path(data_dir).glob("**/*.parquet"))
    tiny = bool(total and total < tiny_bytes)
    if tiny:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    # record the measurement so plan builders can make the same
    # size-based choices AQE would have made (AQE is off in the tiny
    # regime precisely because its per-stage jobs cost more than they
    # save there) — see is_tiny_input
    spark.conf.set(TINY_INPUT_CONF, str(tiny).lower())
    return total


# session-conf key recording tune_for_input's measurement
TINY_INPUT_CONF = "spark.utils_infra.tiny_input"


def is_tiny_input(spark: SparkSession) -> bool:
    """True iff tune_for_input measured this session's input as tiny.

    Plan builders use this for the ONE decision class Catalyst's
    static planner gets wrong without AQE: physical join strategy on
    a tiny input (e.g. shuffled-hash instead of sort-merge when both
    sides are KBs and a sort is pure overhead). Defaults to False —
    an untuned session always gets the spill-safe at-scale plans.
    """
    try:
        return spark.conf.get(TINY_INPUT_CONF, "false") == "true"
    except Exception:
        return False


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
        # UI off by default (saves ~50 MB + a jetty thread per
        # session); SPARK_GRAFT_UI flips it on for the stage-timeline
        # profilers (tools/profile_topk_timeline.py), which read the
        # /api/v1 REST endpoint. Normalized to a strict boolean string
        # (r13, on advice): any truthy spelling ("1"/"yes"/"TRUE")
        # passed verbatim made every get_spark() fail at session build
        .config(
            "spark.ui.enabled",
            str(os.environ.get("SPARK_GRAFT_UI", "").strip().lower() in ("true", "1", "yes")).lower(),
        )
    )
    return builder.getOrCreate()
