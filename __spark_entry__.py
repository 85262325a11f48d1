"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship pricing-summary query at sf0.001 (smoke).
queries()     — every implemented SURVEY.md §2 operator as a named
                query over the driver's star schema.
oracle_sql()  — matching DuckDB SQL for each SQL-expressible query;
                engine-hash-dependent ops (minhash/simhash/rolling
                fingerprints) are rows-only by design.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from utils_infra_spark.queries import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from utils_infra_spark.queries.relational import pricing_summary

    return pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
