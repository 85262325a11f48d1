"""Queries driving the filter-DSL compiler (F12) and style rules
(F13) — config-as-data filters compiled to Catalyst Columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import apply_style_rules, compile_filters
from ..sources import load_table
from . import register


@register(
    "dsl_filter_events",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE (event_type IS NOT NULL AND event_type = 'purchase'
           AND value IS NOT NULL AND value > 200)
       OR (event_type IS NOT NULL AND event_type = 'error')
       OR (user_id IS NOT NULL AND user_id % 100 = 7)
    """,
    doc="F12: list-of-filters = OR of AND-terms incl. modulo, compiled string→Column (ref tak-cot-proxy/index.mjs:125-240).",
)
def dsl_filter_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pred = compile_filters(
        [
            "event_type == purchase and value > 200",
            "event_type == error",
            "user_id % 100 == 7",
        ],
        df=ev,
    )
    return ev.where(pred).select("event_id", "user_id", "event_type", "value")


@register(
    "dsl_contains_in_docs",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE (lang IS NOT NULL AND lang IN ('en','fr') AND n_chars IS NOT NULL AND n_chars >= 200)
       OR (text IS NOT NULL AND text LIKE '%vector%' AND source IS NOT NULL AND source = 'src3')
    """,
    doc="F12: `in [..]` + `$contains(path,val)` term forms.",
)
def dsl_contains_in_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pred = compile_filters(
        [
            "lang in [en, fr] and n_chars >= 200",
            "$contains(text, vector) and source == src3",
        ],
        df=docs,
    )
    return docs.where(pred).select("doc_id", "lang", "source", "n_chars")


@register(
    "dsl_negation_null_semantics",
    oracle="""
    SELECT event_id, event_type, user_id, k
    FROM (SELECT event_id, event_type, user_id,
                 CASE WHEN user_id % 10 = 0 THEN NULL
                      ELSE CAST(json_extract_string(props, '$.k') AS INT) END AS k
          FROM events)
    WHERE k IS NULL OR k <> 5
    """,
    doc="F12 null semantics: missing field PASSES `!=` against a concrete value (ref index.mjs:181-199).",
)
def dsl_negation_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # derive a nullable field from the JSON props column (§2.8 JSON path get)
    with_k = ev.select(
        "event_id",
        "event_type",
        "user_id",
        F.when(F.col("user_id") % 10 == 0, F.lit(None))
        .otherwise(F.get_json_object("props", "$.k").cast("int"))
        .alias("k"),
    )
    pred = compile_filters(["k != 5"], df=with_k)
    return with_k.where(pred)


@register(
    "style_rules_orders",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           CASE WHEN o_orderstatus = 'F' THEN 'gray'
                WHEN o_totalprice IS NOT NULL AND o_totalprice > 300000 THEN 'red'
                ELSE 'blue' END AS marker_color,
           CAST(CASE WHEN o_orderstatus = 'F' THEN 1.0
                WHEN o_totalprice IS NOT NULL AND o_totalprice > 300000 THEN 3.0
                ELSE 2.0 END AS DOUBLE) AS "stroke-width"
    FROM orders
    WHERE NOT (o_orderstatus = 'P' AND o_totalprice IS NOT NULL AND o_totalprice < 50000)
    """,
    doc="F13 ordered style rules, first-match-wins, delete:true drops rows, numeric coercion (ref tak-cot-proxy/index.mjs:256-306).",
)
def style_rules_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", F.lit("Point").alias("geometry_type")
    )
    rules = [
        {"query": "o_orderstatus == P and o_totalprice < 50000", "styles": {}, "delete": True},
        {"query": "o_orderstatus == F", "styles": {"marker_color": "gray", "stroke-width": 1.0}},
        {"query": "o_totalprice > 300000", "styles": {"marker_color": "red", "stroke-width": 3.0}},
    ]
    defaults = {"Point": {"marker_color": "blue", "stroke-width": 2.0}}
    styled = apply_style_rules(orders, rules, defaults=defaults)
    return styled.select("o_orderkey", "o_orderstatus", "o_totalprice", "marker_color", "stroke-width")
