"""Partitioned-layout sink: directory structure, file counts (the
N×P small-file explosion must NOT happen), partition pruning and
row-group predicate pushdown on read-back, and value fidelity."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from utils_infra_spark.sinks.partitioned import write_partitioned_parquet
from utils_infra_spark.sources import load_table


def _plan(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_partitioned_write_layout_and_pruning(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_by_day")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts").cast("string")
    )
    n_in = ev.count()
    n_days = ev.select("event_date").distinct().count()

    write_partitioned_parquet(
        ev, out, ["event_date"], sort_cols=["user_id"], files_per_partition=1
    )

    # hive directory per day
    part_dirs = sorted(glob.glob(os.path.join(out, "event_date=*")))
    assert len(part_dirs) == n_days

    # ONE data file per partition (not one per input task x partition)
    for d in part_dirs:
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)

    back = spark.read.parquet(out)
    assert back.count() == n_in

    # partition pruning: a date filter must land in PartitionFilters,
    # and the pruned read touches only that partition's rows
    one_day = back.select("event_date").first()[0]
    filtered = back.where(F.col("event_date") == one_day)
    plan = _plan(filtered)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "event_date" in pf[0], plan

    # row-group skipping inside a partition: user_id predicate reaches
    # the parquet scan (sorted layout makes the min/max stats tight)
    by_user = back.where(F.col("user_id") == 1)
    plan2 = _plan(by_user)
    pushed = [ln for ln in plan2.splitlines() if "PushedFilters" in ln]
    assert pushed and "user_id" in pushed[0], plan2

    # fidelity: per-day counts identical to the source (partition
    # column type-inference reads the key back as DATE — normalize
    # both indexes to strings before comparing)
    src = ev.groupBy("event_date").count().toPandas().set_index("event_date")["count"]
    dst = back.groupBy("event_date").count().toPandas().set_index("event_date")["count"]
    src.index, dst.index = src.index.astype(str), dst.index.astype(str)
    assert src.sort_index().equals(dst.sort_index())


def test_partitioned_write_salt_caps_files(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_salted")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts").cast("string")
    )
    write_partitioned_parquet(ev, out, ["event_date"], files_per_partition=3)
    for d in glob.glob(os.path.join(out, "event_date=*")):
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        # salt gives hot partitions write parallelism, but the file
        # count stays bounded by the salt width — never task-count x P
        assert 1 <= len(files) <= 3, (d, files)
    n = spark.read.parquet(out).count()
    assert n == ev.count()


def test_partitioned_write_accepts_struct_columns(spark, tmp_path):
    """The whole-row salt must accept every column type (xxhash64) —
    the earlier concat_ws salt crashed on struct/map columns."""
    from pyspark.sql import functions as F

    from utils_infra_spark.sinks.partitioned import write_partitioned_parquet

    df = spark.range(20).select(
        (F.col("id") % 2).alias("day"),
        F.struct(F.col("id").alias("a"), (F.col("id") * 2).alias("b")).alias("props"),
        F.col("id"),
    )
    out = str(tmp_path / "structed")
    write_partitioned_parquet(df, out, ["day"], files_per_partition=2)
    back = spark.read.parquet(out)
    assert back.count() == 20
    assert back.where("props.a = 3").count() == 1
