"""A/B: bloom_novelty_documents spread width at tiny scale.

Motivation (r13 core-scaling diagnostic): the sf0.1 bench at
SPARK_GRAFT_CPUS=8 ran bloom_novelty 45% FASTER than at 32
(0.181 s vs 0.329 s warm) — the operator's per-row work (4 md5
digests) is light enough that 32-way fan-out pays more in task
scheduling + allocation contention than it buys in parallelism
(guide §2.2: fewer, larger partitions). This script measures the
production `bloom_novelty` path with ONLY the spread width patched,
and asserts the verdict set is identical at every width
(round-robin repartition cannot change bit_or/groupBy results).

Run: python tools/ab_bloom_spread.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from utils_infra_spark.session import get_spark, is_tiny_input, tune_for_input  # noqa: E402
from utils_infra_spark.sources import tables  # noqa: E402
from utils_infra_spark.sources.tables import cache_base_tables, set_input_mode  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = 6
WIDTHS = [32, 16, 8, 4, 2, 1]

_real_spread = tables.spread


def _patched_spread_factory(width):
    def patched(df, partitions=None, min_bytes=None):
        return _real_spread(df, partitions=width, min_bytes=min_bytes)

    return patched


def build(spark):
    from utils_infra_spark.queries.pipeline_queries import bloom_novelty_documents

    return bloom_novelty_documents(spark, SF_DIR)


def main():
    import utils_infra_spark.pipeline.dedup as dedup

    spark = get_spark("ab-bloom-spread")
    tune_for_input(spark, SF_DIR)
    if is_tiny_input(spark):
        cache_base_tables(spark, SF_DIR)
        set_input_mode("cached")
    spark.range(1000).selectExpr("sum(id)").collect()

    # correctness guard: identical result multiset at every width
    baselines = {}
    for w in WIDTHS:
        dedup.spread = _patched_spread_factory(w)
        rows = sorted(map(tuple, build(spark).collect()))
        baselines[w] = rows
    ref = baselines[WIDTHS[0]]
    for w, rows in baselines.items():
        assert rows == ref, f"width {w} changed results!"
    print(f"results identical across widths ({len(ref)} rows)")

    for sweep in range(2):
        for w in WIDTHS:
            dedup.spread = _patched_spread_factory(w)
            df = build(spark)
            runs = []
            for _i in range(RUNS):
                t0 = time.perf_counter()
                df.select("*").toArrow()
                runs.append(round(time.perf_counter() - t0, 4))
            print(f"sweep{sweep} width {w:2d}: min-warm {min(runs[1:]):.4f} runs {runs}")
    dedup.spread = _real_spread
    print("loadavg:", os.getloadavg())
    set_input_mode("parquet")
    spark.stop()


if __name__ == "__main__":
    main()
