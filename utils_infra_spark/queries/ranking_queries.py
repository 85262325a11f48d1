"""Ranking-primitive queries: sorted-neighborhood dedup blocking and
reciprocal-rank fusion — both on `operators/ranking.py:global_rank`,
the distributed (no single-task window) ``row_number() OVER (ORDER
BY ...)``.

The oracles use DuckDB's plain window row_number — single-node, fine
for an oracle — so the parity check proves the two-level binned rank
IS the textbook rank, bit for bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.datetimes import epoch_micros
from ..operators.ranking import global_rank, sorted_neighborhood_pairs
from ..sources import load_table
from . import register


@register(
    "sorted_neighborhood_part_pairs",
    oracle="""
    WITH ranked AS (
      SELECT p_partkey, p_name,
             row_number() OVER (ORDER BY lower(p_name), p_partkey) AS rnk
      FROM part WHERE p_name IS NOT NULL
    )
    SELECT a.p_partkey AS p_partkey_l, a.p_name AS p_name_l,
           b.p_partkey AS p_partkey_r, b.p_name AS p_name_r,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM ranked a JOIN ranked b ON b.rnk > a.rnk AND b.rnk <= a.rnk + 5
    WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 4
    """,
    doc="Sorted-neighborhood dedup blocking (Hernández–Stolfo): sort parts on the "
    "folded name, compare each row only to its 5 rank-neighbors, keep near-miss "
    "pairs (edit distance 1–4; 0 = exact dup, handled by dedup_exact). The rank "
    "comes from the two-level value-binned global_rank (no single-task window) "
    "and the w-neighborhood is an EQUI-join on rank DIV w buckets (left side "
    "replicated to exactly 2 buckets — bounded 2x, no inequality-join BNLJ): "
    "n*w candidates instead of the n^2 all-pairs, the third blocking family "
    "next to prefix (jaccard_prefix_pairs) and bands (minhash).",
)
def sorted_neighborhood_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    # NULL names sort NULLS FIRST in Spark but NULLS LAST in DuckDB —
    # they carry no comparable key, so both engines exclude them.
    # Cross-engine contract: levenshtein and lower() agree
    # per-codepoint on ASCII (p_name's domain); non-ASCII case folding
    # (İ/ß) and grapheme-vs-codepoint edit counts are engine-defined —
    # ascii_guarded RAISES on a non-ASCII key instead of silently
    # diverging (fold with fold_diacritics first if the domain widens).
    from ..functions.strings import ascii_guarded

    base = part.where(F.col("p_name").isNotNull()).select(
        "p_partkey",
        "p_name",
        F.lower(ascii_guarded("p_name", "sorted_neighborhood_part_pairs")).alias("nk"),
    )
    pairs = sorted_neighborhood_pairs(
        base, ["nk"], "p_partkey", window=5, carry_cols=["p_partkey", "p_name"]
    )
    dist = F.levenshtein("p_name_l", "p_name_r")
    return pairs.where(dist.between(1, 4)).select(
        "p_partkey_l", "p_name_l", "p_partkey_r", "p_name_r", dist.cast("bigint").alias("dist")
    )


@register(
    "rrf_orders_value_recency",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
      WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL
    ),
    r1 AS (
      SELECT o_orderkey,
             row_number() OVER (ORDER BY -o_totalprice, o_orderkey) AS rank_value
      FROM base
    ),
    r2 AS (
      SELECT o_orderkey,
             row_number() OVER (ORDER BY -epoch_us(o_orderdate), o_orderkey) AS rank_recency
      FROM base
    )
    SELECT r1.o_orderkey, rank_value, rank_recency,
           (1000000000 // (60 + rank_value)) + (1000000000 // (60 + rank_recency)) AS rrf_score
    FROM r1 JOIN r2 USING (o_orderkey)
    ORDER BY rrf_score DESC, o_orderkey LIMIT 20
    """,
    doc="Reciprocal-rank fusion (Cormack et al.) of two full orderings of orders — "
    "by value (totalprice desc) and by recency (orderdate desc) — the standard "
    "hybrid-retrieval combiner (BM25 x dense ranks fuse the same way). Scores are "
    "INTEGER micro-units, floor(1e9/(60+rank)), so the fused ordering is "
    "hash-exact across engines (a double 1/(k+r) sum is order-dependent in the "
    "last ulp). Both ranks come from the two-level global_rank: at 100 TB each "
    "ranking is one corpus pass + a <=4096-row offset table, never a one-reducer "
    "sort; the fusion join hashes on the key and top-20 is a TakeOrdered, not a "
    "global sort.",
)
def rrf_orders_value_recency(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    base = orders.where(F.col("o_totalprice").isNotNull() & F.col("o_orderdate").isNotNull())
    em = epoch_micros(base, "o_orderdate")
    proj = base.select(
        "o_orderkey",
        (-F.col("o_totalprice")).alias("neg_price"),
        (-em).alias("neg_ts"),
    )
    r1 = global_rank(proj.select("o_orderkey", "neg_price"), ["neg_price", "o_orderkey"], rank_col="rank_value")
    r2 = global_rank(proj.select("o_orderkey", "neg_ts"), ["neg_ts", "o_orderkey"], rank_col="rank_recency")
    fused = (
        r1.select("o_orderkey", "rank_value")
        .join(r2.select("o_orderkey", "rank_recency"), "o_orderkey")
        .withColumn(
            "rrf_score",
            F.expr("1000000000 DIV (60 + rank_value) + 1000000000 DIV (60 + rank_recency)"),
        )
    )
    return fused.orderBy(F.desc("rrf_score"), "o_orderkey").limit(20)


@register(
    "entity_resolution_parts",
    oracle="""
    WITH RECURSIVE ranked AS (
      SELECT p_partkey, p_name,
             row_number() OVER (ORDER BY lower(p_name), p_partkey) AS rnk
      FROM part WHERE p_name IS NOT NULL
    ),
    edges AS (
      SELECT a.p_partkey AS src, b.p_partkey AS dst
      FROM ranked a JOIN ranked b ON b.rnk > a.rnk AND b.rnk <= a.rnk + 5
      WHERE levenshtein(a.p_name, b.p_name) <= 2
    ),
    sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
    reach(node, comp) AS (
      SELECT src, src FROM sym
      UNION
      SELECT s.dst, r.comp FROM reach r JOIN sym s ON s.src = r.node
    ),
    cc AS (SELECT node, MIN(comp) AS comp FROM reach GROUP BY node)
    SELECT p.p_partkey,
           COALESCE(cc.comp, p.p_partkey) AS cluster_id,
           COUNT(*) OVER (PARTITION BY COALESCE(cc.comp, p.p_partkey)) AS cluster_size,
           p.p_partkey = COALESCE(cc.comp, p.p_partkey) AS is_representative
    FROM part p LEFT JOIN cc ON cc.node = p.p_partkey
    """,
    doc="Entity-resolution capstone: sorted-neighborhood blocking (folded name, "
    "w=5) -> match predicate (edit distance <= 2: exact dups + singular/plural "
    "near-misses) -> transitive closure -> one canonical record per entity "
    "(min-id representative). The classic record-linkage pipeline, every stage "
    "the scale-safe family member: blocking is n*w via the binned global_rank "
    "(never all-pairs), closure is alternating large-star/small-star connected "
    "components (O(log^2 n) rounds, shuffles 16-byte edges, never records). "
    "The oracle recomputes the closure with a recursive CTE over the plain "
    "window-rank pairs — proving blocking, matching, and clustering end to end. "
    "NULL-name parts carry no blocking key: singleton clusters in both engines.",
)
def entity_resolution_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipeline.cluster import cluster_documents

    # same ASCII levenshtein/lower contract as
    # sorted_neighborhood_part_pairs (the blocking stage above):
    # ascii_guarded raises on a non-ASCII key, never silently diverges
    from ..functions.strings import ascii_guarded

    part = load_table(spark, sf_dir, "part")
    base = part.where(F.col("p_name").isNotNull()).select(
        "p_partkey",
        "p_name",
        F.lower(ascii_guarded("p_name", "entity_resolution_parts")).alias("nk"),
    )
    pairs = sorted_neighborhood_pairs(
        base, ["nk"], "p_partkey", window=5, carry_cols=["p_partkey", "p_name"]
    )
    edges = pairs.where(F.levenshtein("p_name_l", "p_name_r") <= 2).select(
        F.col("p_partkey_l").alias("src"), F.col("p_partkey_r").alias("dst")
    )
    return cluster_documents(part.select("p_partkey"), edges, "p_partkey")


@register(
    "gini_revenue_by_segment",
    oracle="""
    WITH b AS (
      SELECT c_mktsegment, CAST(FLOOR(o_totalprice * 1000000 + 0.5) AS BIGINT) AS v,
             o_orderkey
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE o_totalprice IS NOT NULL AND c_mktsegment IS NOT NULL
    ), r AS (
      SELECT c_mktsegment, v,
             row_number() OVER (PARTITION BY c_mktsegment ORDER BY v, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
      FROM b
    ), s AS (
      SELECT c_mktsegment, MAX(n) AS n,
             SUM(CAST(v AS HUGEINT)) AS sv,
             SUM(CAST(rn AS HUGEINT) * v) AS srv
      FROM r GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, CAST(n AS BIGINT) AS n,
           CASE WHEN sv > 0 AND n > 1 THEN
             ROUND((2.0 * CAST(srv AS DOUBLE) - CAST((n + 1) * sv AS DOUBLE))
                   / CAST(n * sv AS DOUBLE), 6)
           END AS gini
    FROM s
    """,
    doc="Gini concentration of order revenue per market segment — the standard "
    "inequality statistic (is revenue spread across orders or concentrated in "
    "a few?), via the sorted-rank identity G = (2*sum(i*v_i) - (n+1)*sum(v)) / "
    "(n*sum(v)) with v ascending. Ranks from grouped global_rank (no per-group "
    "one-task window, full (value, orderkey) tiebreak — ties with distinct "
    "ranks leave the identity exact); every sum an exact integer (DECIMAL(38,0) "
    "/ HUGEINT), one correctly-rounded double division. NULL for degenerate "
    "groups (n=1 or zero total).",
)
def gini_revenue_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    b = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .where(F.col("o_totalprice").isNotNull() & F.col("c_mktsegment").isNotNull())
        .select(
            "c_mktsegment",
            F.expr("CAST(FLOOR(o_totalprice * 1000000 + 0.5) AS BIGINT)").alias("v"),
            "o_orderkey",
        )
    )
    ranked = global_rank(b, ["v", "o_orderkey"], partition_cols=["c_mktsegment"], rank_col="rn")
    dec = "decimal(38,0)"
    s = ranked.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast(dec)).alias("sv"),
        # cast rn to the wide type BEFORE the product (at 1e12-row
        # groups rank*value overflows BIGINT; the oracle's HUGEINT
        # cast sits in the same place)
        F.sum(F.col("rn").cast(dec) * F.col("v")).alias("srv"),
    )
    gini = F.when(
        (F.col("sv") > 0) & (F.col("n") > 1),
        F.round(
            (F.lit(2.0) * F.col("srv").cast("double")
             - ((F.col("n") + 1) * F.col("sv")).cast("double"))
            / (F.col("n") * F.col("sv")).cast("double"),
            6,
        ),
    )
    return s.select("c_mktsegment", F.col("n").cast("bigint").alias("n"), gini.alias("gini"))


@register(
    "doc_length_position_pct_by_lang",
    oracle="""
    WITH r AS (
      SELECT doc_id, lang, n_chars,
             row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL
    )
    SELECT doc_id, lang, n_chars,
           CASE WHEN n > 1 THEN ((rn - 1) * 1000000) // (n - 1) END AS pos_pct_micro
    FROM r
    """,
    doc="Rank-based score normalization: each document's position in its "
    "language's length distribution as INTEGER MICRO-UNITS of percent-rank, "
    "(rank-1)*1e6 DIV (n-1) — the quantile-normalization step sampling "
    "strategies (DSIR-style importance buckets, curriculum mixing) apply to "
    "heterogeneous quality scores before comparing across slices. Row-number "
    "ranks with the doc_id tiebreak (deterministic; SQL percent_rank's "
    "tie-sharing RANK would be a different, float-valued contract). Grouped "
    "global_rank: a billion-doc language spreads over its length bins, never "
    "one task; single-doc languages get NULL (undefined position).",
)
def doc_length_position_pct_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.where(F.col("lang").isNotNull() & F.col("n_chars").isNotNull()).select(
        "doc_id", "lang", "n_chars"
    )
    ranked = global_rank(base, ["n_chars", "doc_id"], partition_cols=["lang"], rank_col="rn")
    totals = base.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    return (
        ranked.join(F.broadcast(totals), "lang")
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.expr("CASE WHEN n > 1 THEN ((rn - 1) * 1000000) DIV (n - 1) END").alias("pos_pct_micro"),
        )
    )
