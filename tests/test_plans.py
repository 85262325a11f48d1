"""Plan-quality regression tests: assert the physical plans keep the
shapes SCALE.md promises — pushdown reaching the scan, dims
broadcast, digests (not documents) in the dedup shuffle. A plan
regression here is a silent 10-100x cost at 100 TB even when results
stay correct.
"""

from __future__ import annotations

import pytest

from utils_infra_spark.queries import REGISTRY, _load

_load()


def plan_of(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q6_predicates_reach_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "forecast_revenue_filter")
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, "no PushedFilters in scan"
    line = pushed[0]
    for fragment in ("l_shipdate", "l_discount", "l_quantity"):
        assert fragment in line, f"{fragment} not pushed: {line}"


def test_pricing_summary_prunes_columns(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "pricing_summary")
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_comment" not in read and "l_orderkey" not in read
    assert "l_quantity" in read and "l_returnflag" in read


def test_nation_revenue_broadcasts_dims(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "nation_revenue")
    assert "BroadcastHashJoin" in plan
    # no dim should arrive via a sort-merge join at this scale
    assert plan.count("BroadcastExchange") >= 2


def test_dedup_shuffles_digests_not_text(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "dedup_exact_documents")
    exchange_lines = [
        ln for ln in plan.splitlines() if ln.strip().startswith("Arguments: hashpartitioning")
    ]
    assert exchange_lines, "no hash exchange found"
    assert any("fp" in ln for ln in exchange_lines), exchange_lines
    # the raw text column must not appear in any exchange
    assert not any("text" in ln for ln in exchange_lines), exchange_lines


def test_semi_join_stays_semi(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "orders_semi_building")
    assert "LeftSemi" in plan
