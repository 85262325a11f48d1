"""Scalar-function family queries (SURVEY.md §2.8): string, date,
math, array/JSON — each family exercised end-to-end with a DuckDB
oracle, plus the derived-key self-join (J9) and multi-join analytics
(the TPC-H-shaped plans the 100 TB tier runs on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregations import dsum
from ..operators.joins import literal_lookup_maps

from ..sources import load_table
from . import register


@register(
    "string_funcs_part",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           substring(p_brand, 7, 2) AS brand_num,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
           split_part(p_type, ' ', 1) AS type_head,
           CAST(length(p_name) AS INT) AS name_len,
           CASE WHEN p_name LIKE '%a%' THEN true ELSE false END AS has_a,
           trim(concat('  ', p_name, '  ')) AS trimmed_roundtrip
    FROM part
    """,
    doc="§2.8 strings: upper/substring/lpad/regexp_extract/split/length/contains/trim (ref ais-proxy/server.js:482-535, orion.js:11,35).",
)
def string_funcs_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_brand", 7, 2).alias("brand_num"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_head"),
        F.length("p_name").cast("int").alias("name_len"),
        F.col("p_name").contains("a").alias("has_a"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed_roundtrip"),
    )


@register(
    "date_funcs_orders",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mth,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(dayofmonth(o_orderdate) AS INT) AS dom,
           strftime(o_orderdate, '%Y-%m') AS ym,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') AS BIGINT) AS days_to_y2k
    FROM orders
    """,
    doc="§2.8 date/time: parts, format, epoch, interval add, datediff (ref ais-proxy/server.js:416,1218-1227; index.html:1095-1107).",
)
def date_funcs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mth"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        F.dayofmonth("o_orderdate").cast("int").alias("dom"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.unix_timestamp("o_orderdate").cast("bigint").alias("epoch_s"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")).cast("bigint").alias("days_to_y2k"),
    )


@register(
    "math_funcs_lineitem",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS disc_price,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           greatest(l_quantity, 25.0) AS qty_hi,
           least(l_quantity, 25.0) AS qty_lo,
           CAST(pow(2, l_linenumber) AS DOUBLE) AS pow2,
           CAST(l_partkey % 16 AS BIGINT) AS pk_mod,
           ROUND(sqrt(l_extendedprice), 4) AS price_sqrt,
           ROUND(ln(l_extendedprice + 1), 6) AS price_ln,
           abs(l_discount - 0.05) AS disc_dev
    FROM lineitem
    """,
    doc="§2.8 math: round/floor/clamp/pow/mod/sqrt/ln/abs (ref weather-proxy/server.js:339-347; terrain-proxy/server.js:56-59,133).",
)
def math_funcs_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # raw IEEE product, NOT round(x,2): the 2-decimal source data
        # makes exact .xx5 halfway points common, and Spark (BigDecimal
        # of the binary value) and DuckDB round those differently
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        F.floor("l_quantity").cast("bigint").alias("qty_floor"),
        F.greatest(F.col("l_quantity"), F.lit(25.0)).alias("qty_hi"),
        F.least(F.col("l_quantity"), F.lit(25.0)).alias("qty_lo"),
        F.pow(F.lit(2), F.col("l_linenumber")).cast("double").alias("pow2"),
        (F.col("l_partkey") % 16).cast("bigint").alias("pk_mod"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
    )


@register(
    "json_props_events",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k,
           CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) >= 50 THEN 'high' ELSE 'low' END AS k_band,
           COUNT(*) OVER (PARTITION BY CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) >= 50 THEN 'high' ELSE 'low' END) AS band_n
    FROM events
    """,
    doc="§2.8 JSON path get + banded CASE + window count (ref tak-cot-proxy/index.mjs:100-108; weather-proxy/server.js:242-259).",
)
def json_props_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    banded = ev.select(
        "event_id", k.alias("k"), F.when(k >= 50, F.lit("high")).otherwise(F.lit("low")).alias("k_band")
    )
    return banded.withColumn("band_n", F.count(F.lit(1)).over(Window.partitionBy("k_band")))


@register(
    "array_funcs_documents",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           toks[1] AS first_tok,
           toks[-1] AS last_tok,
           toks[CAST(floor(len(toks) / 2) AS INT) + 1] AS mid_tok,
           CAST(len(toks) AS INT) AS n_toks,
           array_to_string(toks[1:3], '_') AS head3,
           CAST(list_contains(toks, 'spark') AS BOOLEAN) AS has_spark,
           CAST(len(list_distinct(toks)) AS INT) AS n_distinct
    FROM t
    """,
    doc="§2.8 arrays: element_at first/last/midpoint, slice, contains, distinct (ref index.py:309-327; index.html:1151-1156).",
)
def array_funcs_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.split("text", " ").alias("toks"))
    return t.select(
        "doc_id",
        F.element_at("toks", 1).alias("first_tok"),
        F.element_at("toks", -1).alias("last_tok"),
        F.element_at("toks", (F.floor(F.size("toks") / 2) + 1).cast("int")).alias("mid_tok"),
        F.size("toks").cast("int").alias("n_toks"),
        F.array_join(F.slice("toks", 1, 3), "_").alias("head3"),
        F.array_contains("toks", "spark").alias("has_spark"),
        F.size(F.array_distinct("toks")).cast("int").alias("n_distinct"),
    )


@register(
    "derived_key_self_join",
    oracle="""
    WITH centers AS (
      SELECT concat('D', CAST(doc_id AS VARCHAR), '-center') AS center_id, n_chars
      FROM documents WHERE doc_id % 7 = 0
    )
    SELECT d.doc_id, c.center_id, d.lang, c.n_chars AS center_chars
    FROM centers c
    JOIN documents d ON concat('D', CAST(d.doc_id AS VARCHAR)) = regexp_replace(c.center_id, '-center$', '')
    """,
    doc="J9 self-join by regex-derived key (ref display-proxy/index.html:1190-1204: '<id>-center' → polygon id).",
)
def derived_key_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    centers = docs.where(F.col("doc_id") % 7 == 0).select(
        F.concat(F.lit("D"), F.col("doc_id").cast("string"), F.lit("-center")).alias("center_id"),
        F.col("n_chars").alias("center_chars"),
    )
    return centers.join(
        docs,
        F.concat(F.lit("D"), docs["doc_id"].cast("string")) == F.regexp_replace(centers["center_id"], "-center$", ""),
    ).select("doc_id", "center_id", "lang", "center_chars")


# ------------------------------------------------------------ multi-join analytics
@register(
    "order_revenue_top10",
    oracle="""
    SELECT o.o_orderkey,
           CAST(SUM(CAST(FLOOR((l.l_extendedprice * (1 - l.l_discount))*1000000 + 0.5) AS BIGINT)) AS DOUBLE)/1000000 AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey LIMIT 10
    """,
    doc="TPC-H-Q3-shaped 3-way join + agg + top-k: the fact-to-fact shuffle-join plan the 100 TB tier must get right.",
)
def order_revenue_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    # c_custkey is the customer PK, so the inner join to customer is
    # purely a FILTER on orders — expressed as a broadcast LEFT SEMI
    # (the filtered segment is a fraction of an already-small dim; no
    # customer column survives into the output). That removes a whole
    # fact-side wide join: the only remaining join is li ⋈ orders,
    # where both sides are (filtered) BASE TABLES, so Catalyst's
    # file-size estimate picks broadcast at KB scale and spill-safe
    # sort-merge at TB scale — and never sees a driver-materialized
    # intermediate on the build side (the semi output's estimate stays
    # the orders file size).
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    of = orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"], "left_semi")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # No join hint: Catalyst's stats-based choice (broadcast while the
    # filtered orders side fits the threshold, spill-safe sort-merge
    # at TB scale). An r10 A/B had favored a tiny-input SHUFFLE_HASH
    # hint here (0.180 s vs 0.245 s warm at sf0.1); the r12 re-A/B on
    # the current session tuning could not reproduce any SHJ advantage
    # (mins 0.2405 SHJ vs 0.2394 broadcast, medians favoring
    # broadcast in both interleaved pairs), so the special-case was
    # dropped per the r11 verdict's rule — fewer hand-tuned branches,
    # and the at-scale path was always Catalyst's anyway.
    return (
        li.join(of, li["l_orderkey"] == of["o_orderkey"])
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue, "revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@register(
    "nation_revenue",
    oracle="""
    SELECT n.n_name AS nation, r.r_name AS region,
           CAST(SUM(CAST(FLOOR((l.l_extendedprice * (1 - l.l_discount))*1000000 + 0.5) AS BIGINT)) AS DOUBLE)/1000000 AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY n.n_name, r.r_name
    """,
    doc="TPC-H-Q5-shaped 5-way join: two big-table shuffle joins + broadcast dims, grouped revenue per nation.",
)
def nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # li⋈orders carries NO hint: every non-broadcast side here is a
    # FILTERED BASE TABLE, so Catalyst's size estimate is the file
    # size — at small sf it broadcasts the filtered orders (no shuffle
    # of lineitem at all, measured fastest), at 100 TB the same
    # estimate keeps sort-merge. Only intermediates need protecting
    # from mis-broadcast (see order_revenue_top10).
    joined = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    )
    # snowflake micro-dims (25 nations x 5 regions, fixed at ANY sf)
    # bake into literal maps — two fewer BroadcastExchange builds per
    # execution (each is its own job: ~40-60 ms of pure scheduling on
    # a 25-row build). The pre-join of region into nation is INNER, so
    # inner-drop semantics are reproduced by KEY MEMBERSHIP in the
    # literal map (not value nullness: a dim row with a NULL name but
    # matching keys survives an inner join and must group under NULL,
    # exactly as the broadcast fallback below has it).
    dim = nation.join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"]).select(
        "n_nationkey", "n_name", "r_name"
    )
    maps = literal_lookup_maps(dim, "n_nationkey", ["n_name", "r_name"])
    if maps is None:  # dim outgrew the literal budget: broadcast join
        enriched = joined.join(F.broadcast(dim), cust["c_nationkey"] == dim["n_nationkey"]).select(
            F.col("n_name").alias("nation"), F.col("r_name").alias("region"), revenue.alias("rev")
        )
    else:
        in_dim = F.array_contains(F.map_keys(maps["n_name"]), F.col("c_nationkey"))
        enriched = joined.where(in_dim).select(
            maps["n_name"][F.col("c_nationkey")].alias("nation"),
            maps["r_name"][F.col("c_nationkey")].alias("region"),
            revenue.alias("rev"),
        )
    return enriched.groupBy("nation", "region").agg(
        dsum(F.col("rev"), "revenue"), F.count(F.lit(1)).alias("n_lineitems")
    )


@register(
    "forecast_revenue_filter",
    oracle="""
    SELECT CAST(SUM(CAST(FLOOR((l_extendedprice * l_discount)*1000000 + 0.5) AS BIGINT)) AS DOUBLE)/1000000 AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24
    """,
    doc="TPC-H-Q6-shaped filter+sum: every predicate must reach the parquet scan (PushedFilters) — the pushdown benchmark query.",
)
def forecast_revenue_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.04, 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "priority_order_check",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H-Q4-shaped: EXISTS semi-join with a cross-table condition, then grouped counts.",
)
def priority_order_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    matched = orders.join(
        li, (li["l_orderkey"] == orders["o_orderkey"]) & (li["l_shipdate"] > orders["o_orderdate"]), "left_semi"
    )
    return matched.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "status_bucket_counts",
    oracle="""
    SELECT o_orderstatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY o_orderstatus
    """,
    doc="TPC-H-Q12-shaped: conditional bucket counts inside one grouped pass (no pivot shuffle).",
)
def status_bucket_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return orders.groupBy("o_orderstatus").agg(
        F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
    )


@register(
    "brand_revenue_share",
    oracle="""
    SELECT ROUND(
             CAST(SUM(CASE WHEN p.p_brand IN ('Brand#1','Brand#2','Brand#3')
                      THEN CAST(FLOOR((l.l_extendedprice * (1 - l.l_discount))*1000000 + 0.5) AS BIGINT) ELSE 0 END) AS DOUBLE)
             * 100 / CAST(SUM(CAST(FLOOR((l.l_extendedprice * (1 - l.l_discount))*1000000 + 0.5) AS BIGINT)) AS DOUBLE), 4) AS brand_share_pct,
           COUNT(*) AS n
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1997-07-01'
    """,
    doc="TPC-H-Q14-shaped: ratio-of-conditional-sums over a fact⟕dim join (promo-revenue pattern).",
)
def brand_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    # fixed-point quantized revenue: the 10^6 scale cancels in the
    # ratio, so numerator/denominator stay exact integer sums
    rev_q = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(1e6) + F.lit(0.5)).cast(
        "decimal(38,0)"
    )
    zero = F.lit(0).cast("decimal(38,0)")
    joined = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    branded = F.when(F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"), rev_q).otherwise(zero)
    return joined.agg(
        F.round(F.sum(branded).cast("double") * 100 / F.sum(rev_q).cast("double"), 4).alias("brand_share_pct"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "nation_pair_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           CAST(SUM(CAST(FLOOR((l.l_extendedprice * (1 - l.l_discount))*1000000 + 0.5) AS BIGINT)) AS DOUBLE)/1000000 AS revenue,
           COUNT(*) AS n
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_14')
        OR (n1.n_name = 'NATION_14' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
    doc="TPC-H-Q7-shaped: shipping volume between a nation pair (both directions) by year — 5-way join, two broadcast dims aliased twice, fact-to-fact merge join.",
)
def nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_14")
    ) | ((F.col("supp_nation") == "NATION_14") & (F.col("cust_nation") == "NATION_3"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders.hint("merge"), li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(n1), supp["s_nationkey"] == F.col("sn_key"))
        .join(F.broadcast(n2), cust["c_nationkey"] == F.col("cn_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(dsum(revenue, "revenue"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "product_profit_by_nation",
    oracle="""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(FLOOR((l.l_extendedprice * (1 - l.l_discount) - 0.6 * p.p_retailprice * l.l_quantity)*1000000 + 0.5) AS BIGINT)) AS DOUBLE)/1000000 AS profit
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%ring%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
    doc="TPC-H-Q9-shaped: product-line profit (revenue minus a cost proxy off p_retailprice — no partsupp table in this schema) by supplier nation and order year, part-name pattern filter pushed to the dim.",
)
def product_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").contains("ring"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(orders.hint("merge"), li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(dsum(profit, "profit"))
    )


@register(
    "returned_items_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(FLOOR((l.l_extendedprice * (1 - l.l_discount))*1000000 + 0.5) AS BIGINT)) AS DOUBLE)/1000000 AS revenue,
           n.n_name AS nation
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01' AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H-Q10-shaped: top-20 customers by returned-item revenue in one quarter — deterministic LIMIT via (quantized revenue desc, custkey) ordering; TakeOrderedAndProject, never a full sort.",
)
def returned_items_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        orders.join(li.hint("merge"), li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(dsum(revenue, "revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "nation")
    )
