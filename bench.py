"""Benchmark runner: executes the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Timing methodology: per query, force full execution with a
count-style action over the materialized result (write to noop would
hide collect cost; .count() after .cache() would double-count —
we use df.write.format('noop') which executes the full plan exactly
once with no driver collect bottleneck).
"""

from __future__ import annotations

import json
import os
import time

from utils_infra_spark.queries import REGISTRY, _load
from utils_infra_spark.session import get_spark

# headline set: one per operator family + the heavy pipeline ops
HEADLINE = [
    "pricing_summary",
    "composite_agg_orders",
    "order_revenue_top10",
    "nation_revenue",
    "latest_event_per_user",
    "enrich_customer_nation",
    "top3_orders_per_customer",
    "union_distinct_orders",
    "sliding_window_counts",
    "dsl_filter_events",
    "mercator_tile_cover",
    "point_in_polygon_regions",
    "dedup_exact_documents",
    "minhash_near_dup_documents",
    "embedding_topk_cosine",
    "embedding_bucketed_pairs",
    "text_stats_documents",
    "token_histogram",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("utils-infra-bench")
    _load()

    # JVM/codegen warmup + parquet footer cache so q1 isn't charged
    # for session fixed costs
    spark.range(1000).selectExpr("sum(id)").collect()
    from utils_infra_spark.sources.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).limit(1).collect()

    # Each query runs three times: run 1 pays whole-stage-codegen
    # compile + JIT (a per-plan-shape constant that amortizes to zero
    # on real workloads — at 100 TB a query runs minutes, not
    # milliseconds); warm = min of the two steady-state runs, which
    # damps shared-host CPU noise (identical warm runs measured up to
    # ±80% apart on this VM) without hiding any real cost. Headline
    # value = warm total; cold totals reported alongside.
    warm: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE:
        q = REGISTRY[name]
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
            # drop per-query persisted intermediates (e.g. LSH
            # sketches) so runs and queries are timed independently
            spark.catalog.clearCache()
        cold[name] = round(runs[0], 3)
        warm[name] = round(min(runs[1:]), 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime_warm",
                "value": round(sum(warm.values()), 3),
                "unit": "sec",
                "queries": warm,
                "cold_total": round(sum(cold.values()), 3),
                "cold_queries": cold,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
