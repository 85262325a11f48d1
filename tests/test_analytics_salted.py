"""Salted twins of the user_id-keyed analytics (purchase_funnel /
weekly_retention): result parity with the unsalted registered queries
plus plan-shape proof that the salted path actually splits the key.

Why these queries: both shuffle on user_id, and at 100 TB a bot or
service account is a textbook hot key — one task gets that user's
entire event history while 999 executors idle. MIN is additive over
a salt split, so the two-stage form is exact (operators/skew.py).
"""

from __future__ import annotations

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
