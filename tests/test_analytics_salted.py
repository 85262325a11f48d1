"""Salted twins of the user_id-keyed analytics (purchase_funnel /
weekly_retention): result parity with the unsalted registered queries
plus plan-shape proof that the salted path actually splits the key.

Why these queries: both shuffle on user_id, and at 100 TB a bot or
service account is a textbook hot key — one task gets that user's
entire event history while 999 executors idle. MIN is additive over
a salt split, so the two-stage form is exact (operators/skew.py).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from utils_infra_spark.queries import REGISTRY, _load
from utils_infra_spark.queries.analytics_queries import (
    purchase_funnel_salted,
    weekly_retention_salted,
)

_load()


def _sorted(df):
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(cols).reset_index(drop=True)


def test_salted_funnel_matches_unsalted(spark, sf_dir):
    base = _sorted(REGISTRY["purchase_funnel"].fn(spark, sf_dir))
    salted = _sorted(purchase_funnel_salted(spark, sf_dir, salt_buckets=8))
    assert base.equals(salted)


def test_salted_retention_matches_unsalted(spark, sf_dir):
    base = _sorted(REGISTRY["weekly_retention"].fn(spark, sf_dir))
    salted = _sorted(weekly_retention_salted(spark, sf_dir, salt_buckets=8))
    assert base.equals(salted)


def _plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_salted_funnel_plan_splits_key(spark, sf_dir):
    plan = _plan(spark, purchase_funnel_salted(spark, sf_dir, salt_buckets=8))
    # stage-1 partials group on (user_id, __salt): the salt must appear
    # in a hash exchange, and the merge exchange on user_id alone must
    # also exist
    exchange_lines = [
        ln for ln in plan.splitlines() if ln.strip().startswith("Arguments: hashpartitioning")
    ]
    assert any("__salt" in ln for ln in exchange_lines), exchange_lines
    assert any("user_id" in ln and "__salt" not in ln for ln in exchange_lines), exchange_lines
    # the unsalted registered query never carries a salt column
    base_plan = _plan(spark, REGISTRY["purchase_funnel"].fn(spark, sf_dir))
    assert "__salt" not in base_plan


def test_salted_funnel_keeps_pushed_stage_filters(spark, sf_dir):
    # salting must not cost the per-stage event_type pushdown
    plan = _plan(spark, purchase_funnel_salted(spark, sf_dir, salt_buckets=8))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln and "event_type" in ln]
    assert len(pushed) >= 3, f"expected >=3 pushed event_type filters, got {len(pushed)}"


# ---------------------------------------------------------- hot-key fixture
# The uniform driver fixtures prove the salted twins EQUAL their
# unsalted forms, but never exercise them under the condition they
# exist for. This fixture manufactures the textbook hot key — one
# user (bot/service account) remapped onto ~10% of ALL events — and
# re-proves (a) parity under skew and (b) that the salt actually
# spreads the hot key across partial groups.

HOT_USER = 424242


@pytest.fixture(scope="module")
def skewed_sf_dir(spark, sf_dir, tmp_path_factory):
    from utils_infra_spark.sources.tables import load_table

    out = tmp_path_factory.mktemp("skewed_sf")
    ev = load_table(spark, sf_dir, "events")
    skewed = ev.withColumn(
        "user_id",
        F.when(F.pmod("event_id", F.lit(10)) == 0, F.lit(HOT_USER)).otherwise(F.col("user_id")),
    )
    skewed.write.parquet(str(out / "events.parquet"))
    return str(out)


def test_salted_funnel_parity_under_hot_key(spark, skewed_sf_dir):
    base = _sorted(REGISTRY["purchase_funnel"].fn(spark, skewed_sf_dir))
    salted = _sorted(purchase_funnel_salted(spark, skewed_sf_dir, salt_buckets=8))
    assert base.equals(salted)


def test_salted_retention_parity_under_hot_key(spark, skewed_sf_dir):
    base = _sorted(REGISTRY["weekly_retention"].fn(spark, skewed_sf_dir))
    salted = _sorted(weekly_retention_salted(spark, skewed_sf_dir, salt_buckets=8))
    assert base.equals(salted)


def test_salt_spreads_hot_key_across_partials(spark, skewed_sf_dir):
    """The hot key's rows must land in >= salt_buckets/2 distinct
    partial groups — measured with the operator's OWN salt expression
    (operators/skew.py salt_column), on the same (user_id, ts)
    projection the funnel's stage-1 aggregate salts."""
    from utils_infra_spark.operators.skew import salt_column
    from utils_infra_spark.sources.tables import load_table

    buckets = 8
    ev = load_table(spark, skewed_sf_dir, "events")
    hot = ev.where(F.col("user_id") == HOT_USER).select("user_id", "ts")
    assert hot.count() >= 100  # the fixture really made a hot key (~10% of events)
    n_partials = (
        hot.withColumn("__salt", salt_column(hot, buckets)).select("__salt").distinct().count()
    )
    assert n_partials >= buckets // 2, f"hot key spread over only {n_partials}/{buckets} partials"
