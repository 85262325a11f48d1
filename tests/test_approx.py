"""Approximation-error bounds for the documented 100 TB swap-ins:
approx_percentile vs exact percentile, and approx_count_distinct
(HLL++) vs exact — pins that the cheap mergeable forms stay inside
their advertised error envelopes on this data, so swapping them in at
scale is a measured decision, not a hope."""

from __future__ import annotations

from pyspark.sql import functions as F

from utils_infra_spark.sources import load_table


def test_approx_percentile_within_accuracy_envelope(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact = F.percentile("l_quantity", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    # accuracy=10000 -> rank error <= n/10000
    approx = F.approx_percentile(
        "l_quantity", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), F.lit(10000)
    )
    rows = (
        li.groupBy("l_returnflag")
        .agg(exact.alias("ex"), approx.alias("ap"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert rows
    for r in rows:
        for e, a in zip(r.ex, r.ap):
            # l_quantity is 1..50 integers: a <=n/10000 rank slip can
            # move the value by at most a couple of adjacent levels
            assert abs(e - a) <= 2.0, (r.l_returnflag, r.ex, r.ap)


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        # 2% rsd -> allow 4 sigma
        assert abs(r.approx - r.exact) <= max(4, 0.08 * r.exact), (
            r.event_type,
            r.exact,
            r.approx,
        )
