"""A/B: union_distinct_orders two-scan UNION vs single-scan OR-filter
+ distinct (r12 verdict Missing #2). Bench-identical methodology:
tuned session, cached input, fresh QueryExecution per run, Arrow
delivery, min-of-warm. Run: python tools/ab_union_distinct.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from utils_infra_spark.operators.setops import union_all  # noqa: E402
from utils_infra_spark.session import get_spark, is_tiny_input, tune_for_input  # noqa: E402
from utils_infra_spark.sources.tables import cache_base_tables, load_table, set_input_mode  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = 6

COLS = ["o_orderkey", "o_orderpriority", "o_totalprice"]


def v_union(spark):
    orders = load_table(spark, SF_DIR, "orders")
    high = orders.where(F.col("o_totalprice") > 400000).select(COLS)
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select(COLS)
    return union_all([high, urgent]).distinct()


def v_or(spark):
    orders = load_table(spark, SF_DIR, "orders")
    return (
        orders.where((F.col("o_totalprice") > 400000) | (F.col("o_orderpriority") == "1-URGENT"))
        .select(COLS)
        .distinct()
    )


def v_or_nodistinct(spark):
    # orderkey is unique in orders, so the OR scan yields no dupes —
    # is the distinct exchange itself measurable?
    orders = load_table(spark, SF_DIR, "orders")
    return orders.where(
        (F.col("o_totalprice") > 400000) | (F.col("o_orderpriority") == "1-URGENT")
    ).select(COLS)


def main():
    spark = get_spark("ab-union-distinct")
    tune_for_input(spark, SF_DIR)
    if is_tiny_input(spark):
        cache_base_tables(spark, SF_DIR)
        set_input_mode("cached")
    spark.range(1000).selectExpr("sum(id)").collect()

    variants = {"union2scan": v_union, "or1scan": v_or, "or_nodistinct": v_or_nodistinct}
    counts = {k: fn(spark).count() for k, fn in variants.items()}
    print("row counts:", counts)

    for _ in range(2):  # two sweeps
        for name, fn in variants.items():
            df = fn(spark)
            runs = []
            for _i in range(RUNS):
                t0 = time.perf_counter()
                df.select("*").toArrow()
                runs.append(round(time.perf_counter() - t0, 4))
            print(f"{name}: min-warm {min(runs[1:]):.4f} runs {runs}")
    print("loadavg:", os.getloadavg())
    set_input_mode("parquet")
    spark.stop()


if __name__ == "__main__":
    main()
