"""Graph-analytics queries: link analysis over edge lists derived
from the star schema (companions to near_dup_clusters' connected
components in pipeline/cluster.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline.graph import pagerank
from ..sources import load_table
from . import register


@register(
    "pagerank_user_type_graph",
    oracle="""
    WITH fwd AS (
      SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS src,
             't:' || event_type AS dst
      FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    ),
    edges AS (
      SELECT src, dst FROM fwd
      UNION ALL
      SELECT dst AS src, src AS dst FROM fwd
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges
              UNION SELECT DISTINCT dst FROM edges),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src),
    r0 AS (SELECT node, CAST(1000000000000 AS BIGINT) // n AS rank_fp, n
           FROM nodes, nn),
    s1 AS (SELECT r0.node, rank_fp // deg AS share FROM r0 JOIN deg USING (node)),
    c1 AS (SELECT e.dst AS node, SUM(share) AS contrib
           FROM edges e JOIN s1 ON e.src = s1.node GROUP BY e.dst),
    r1 AS (SELECT r0.node,
                  ((15 * (CAST(1000000000000 AS BIGINT) // n)) // 100)
                  + ((85 * COALESCE(c1.contrib, 0)) // 100) AS rank_fp, n
           FROM r0 LEFT JOIN c1 USING (node)),
    s2 AS (SELECT r1.node, rank_fp // deg AS share FROM r1 JOIN deg USING (node)),
    c2 AS (SELECT e.dst AS node, SUM(share) AS contrib
           FROM edges e JOIN s2 ON e.src = s2.node GROUP BY e.dst),
    r2 AS (SELECT r1.node,
                  ((15 * (CAST(1000000000000 AS BIGINT) // n)) // 100)
                  + ((85 * COALESCE(c2.contrib, 0)) // 100) AS rank_fp
           FROM r1 LEFT JOIN c2 USING (node))
    SELECT node, CAST(rank_fp AS BIGINT) AS rank_fp FROM r2
    """,
    doc="PageRank (2 iterations, damping 0.85) over the bipartite "
    "user<->event-type graph, in INTEGER fixed-point (picorank, scale 1e12) "
    "so every engine and every partitioning produces the same bits — the "
    "oracle unrolls both iterations as CTEs (the kmeans proof shape). Per "
    "iteration the plan shuffles one narrow (node, bigint) rank table plus "
    "the edge list once with map-side combine; vertex payloads never move. "
    "Dangling-node mass leaks by spec (non-normalized PageRank variant).",
)
def pagerank_user_type_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    fwd = ev.select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("src"),
        F.concat(F.lit("t:"), F.col("event_type")).alias("dst"),
    ).distinct()
    edges = fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return pagerank(edges, iterations=2, damping_pct=85, scale=10**12)


@register(
    "pagerank_redistribute_user_type",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS src,
             't:' || event_type AS dst
      FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges
              UNION SELECT DISTINCT dst FROM edges),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src),
    r0 AS (SELECT node, CAST(1000000000000 AS BIGINT) // n AS rank_fp, n
           FROM nodes, nn),
    d1 AS (SELECT COALESCE(SUM(r0.rank_fp), 0) AS dm
           FROM r0 LEFT JOIN deg USING (node) WHERE deg.deg IS NULL),
    s1 AS (SELECT r0.node, rank_fp // deg AS share FROM r0 JOIN deg USING (node)),
    c1 AS (SELECT e.dst AS node, SUM(share) AS contrib
           FROM edges e JOIN s1 ON e.src = s1.node GROUP BY e.dst),
    r1 AS (SELECT r0.node,
                  ((15 * (CAST(1000000000000 AS BIGINT) // n)) // 100)
                  + ((85 * (COALESCE(c1.contrib, 0) + (d1.dm // n))) // 100) AS rank_fp, n
           FROM r0 LEFT JOIN c1 USING (node) CROSS JOIN d1),
    d2 AS (SELECT COALESCE(SUM(r1.rank_fp), 0) AS dm
           FROM r1 LEFT JOIN deg USING (node) WHERE deg.deg IS NULL),
    s2 AS (SELECT r1.node, rank_fp // deg AS share FROM r1 JOIN deg USING (node)),
    c2 AS (SELECT e.dst AS node, SUM(share) AS contrib
           FROM edges e JOIN s2 ON e.src = s2.node GROUP BY e.dst),
    r2 AS (SELECT r1.node,
                  ((15 * (CAST(1000000000000 AS BIGINT) // n)) // 100)
                  + ((85 * (COALESCE(c2.contrib, 0) + (d2.dm // n))) // 100) AS rank_fp
           FROM r1 LEFT JOIN c2 USING (node) CROSS JOIN d2)
    SELECT node, CAST(rank_fp AS BIGINT) AS rank_fp FROM r2
    """,
    doc="Mass-conserving PageRank (r10; the redistribute-dangling "
    "variant real link analysis wants) over the DIRECTED user->event-"
    "type graph, where every event-type node is dangling — the "
    "strongest exercise of the dangling term: each iteration adds one "
    "scalar aggregate (dangling mass via anti-join with the degree "
    "table) broadcast into every rank row, rank' = teleport + d*("
    "contrib + dm DIV n) DIV 100, all integer picorank so mass is "
    "conserved up to DIV truncation and the result is partition-"
    "invariant. Oracle unrolls both iterations as CTEs with the same "
    "d1/d2 dangling-mass terms (the kmeans/pagerank proof shape).",
)
def pagerank_redistribute_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    edges = ev.select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("src"),
        F.concat(F.lit("t:"), F.col("event_type")).alias("dst"),
    ).distinct()
    return pagerank(
        edges, iterations=2, damping_pct=85, scale=10**12, dangling="redistribute"
    )


@register(
    "triangle_count_copurchase",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS triangles
    FROM edges e1
    JOIN edges e2 ON e1.v = e2.u
    JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    """,
    doc="Triangle count over the part co-purchase graph (parts paired "
    "within an order; triangle = three parts each pair of which "
    "co-occurs somewhere). Engine side is DEGREE-ORDERED (Suri & "
    "Vassilvitskii 2011): edges orient low->high (degree, id), capping "
    "every out-degree at O(sqrt(m)) so wedge work is O(m^1.5) and no "
    "reducer inherits a celebrity node's d^2 wedges — the oracle uses "
    "the naive id-ordered 3-join, which must (and does) give the same "
    "count, proving the orientation trick loses nothing. Joins carry id "
    "pairs only; basket-pair expansion is bounded by order size.",
)
def triangle_count_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipeline.graph import triangle_count

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "ok")
        .where(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    return triangle_count(edges, "u", "v")
