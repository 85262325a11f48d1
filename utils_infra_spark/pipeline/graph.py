"""Iterative graph ranking over edge lists (beyond the reference's
query surface — the link-analysis sibling of pipeline/cluster.py's
connected components).

PageRank (Page/Brin/Motwani/Winograd 1999) in INTEGER fixed-point so
the result is deterministic and engine-exact: every quantity is a
bigint "picorank" (scale = 1e12 by default) and every division is
integer DIV, so two engines (or two partitionings) produce the SAME
bits — the fixed-point trick char_lm/DSIR/HLL already use, applied to
an iterative algorithm. An oracle can unroll a fixed iteration count
as CTEs (the same proof shape as kmeans_refine_assignments).

100 TB shape: ranks and degrees are one narrow row per node; each
iteration shuffles (a) the rank table on node for the degree join and
(b) the EDGE list once for the contribution aggregate (map-side
partial combine on dst) — payloads are (id, bigint) pairs, never
vertex data. The driver loop only builds the plan; with a small fixed
iteration count the whole thing is ONE static DAG. For long runs pass
``checkpoint_every`` so lineage stays bounded (same pattern as
connected_components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    iterations: int = 2,
    damping_pct: int = 85,
    scale: int = 10**12,
    checkpoint_every: int = 0,
    dangling: str = "leak",
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Returns ``(node, rank_fp)`` where ``rank_fp`` is the bigint
    fixed-point rank (divide by ``scale`` for the float). Spec, per
    iteration, all in non-negative integer arithmetic (DIV truncates
    = floors for non-negatives, identical across engines):

        share(u)   = rank(u) DIV out_deg(u)          (u with edges)
        contrib(v) = SUM share(u) over edges u -> v
        rank'(v)   = ((100-d) * (scale DIV n)) DIV 100
                     + (d * contrib(v)) DIV 100

    Dangling nodes (no out-edges) are handled per ``dangling``:

    - ``"leak"`` (default): they keep their rank but contribute
      nothing — mass leaks, as in the non-normalized PageRank variant;
      ranks are comparable only within one run's parameters.
    - ``"redistribute"``: the mass-conserving variant real link
      analysis usually wants — each iteration adds every node an equal
      share of the dangling mass before damping:

          dm        = SUM rank(u) over dangling u     (scalar)
          rank'(v)  = teleport + (d * (contrib(v) + dm DIV n)) DIV 100

      Total mass is conserved up to DIV truncation (< n + 100 units
      per iteration — picorank dust, never a rank inversion). Costs
      one tiny scalar aggregate + broadcast per iteration; the
      per-iteration shuffle shape is unchanged.

    Deterministic by construction either way: integer sums are
    order-free, so the result is partition-invariant and
    hash-checkable.
    """
    if not (0 <= damping_pct <= 100):
        raise ValueError(f"damping_pct={damping_pct} outside [0, 100]")
    if dangling not in ("leak", "redistribute"):
        raise ValueError(f"dangling={dangling!r} not in ('leak', 'redistribute')")
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    # 1-row node count broadcast into every rank row (the declarative
    # scalar-subquery spelling — no collect, no shuffle added)
    n_df = nodes.agg(F.count(F.lit(1)).alias("__n"))
    deg = edges.groupBy(F.col(src).alias("node")).agg(F.count(F.lit(1)).alias("__deg"))
    teleport = F.expr(f"(({100 - damping_pct}) * (CAST({scale} AS BIGINT) DIV __n)) DIV 100")
    ranks = nodes.crossJoin(F.broadcast(n_df)).select(
        "node", "__n", F.expr(f"CAST({scale} AS BIGINT) DIV __n").alias("rank_fp")
    )
    elist = edges.select(F.col(src).alias("node"), F.col(dst).alias("__dst"))
    for i in range(iterations):
        shares = ranks.join(deg, "node").select(
            "node", F.expr("rank_fp DIV __deg").alias("__share")
        )
        contrib = (
            elist.join(shares, "node")
            .groupBy(F.col("__dst").alias("node"))
            .agg(F.sum("__share").alias("__contrib"))
        )
        joined = ranks.join(contrib, "node", "left")
        if dangling == "redistribute":
            # dangling mass this iteration: one scalar aggregate over
            # the anti-join of ranks with the out-degree table,
            # broadcast into every rank row (same scalar-subquery
            # spelling as __n — no collect)
            dm = (
                ranks.join(deg, "node", "left_anti")
                .agg(F.coalesce(F.sum("rank_fp"), F.lit(0)).cast("bigint").alias("__dm"))
            )
            ranks = joined.crossJoin(F.broadcast(dm)).select(
                "node",
                "__n",
                (
                    teleport
                    + F.expr(
                        f"({damping_pct} * (COALESCE(__contrib, CAST(0 AS BIGINT))"
                        " + (__dm DIV __n))) DIV 100"
                    )
                ).alias("rank_fp"),
            )
        else:
            ranks = joined.select(
                "node",
                "__n",
                (
                    teleport
                    + F.expr(f"({damping_pct} * COALESCE(__contrib, CAST(0 AS BIGINT))) DIV 100")
                ).alias("rank_fp"),
            )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", "rank_fp")


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Global triangle count over an UNDIRECTED edge list, degree-
    ordered (Suri & Vassilvitskii 2011, "Counting Triangles and the
    Curse of the Last Reducer") — each triangle is counted exactly
    once, from its lowest-(degree, id) corner.

    Naive wedge enumeration explodes on hot nodes: a degree-d vertex
    yields d² wedges (the "celebrity problem"). Orienting every edge
    from its lower-(degree, id) endpoint to the higher one caps every
    vertex's OUT-degree at O(sqrt(m)), so the wedge set is O(m^1.5)
    total — the published bound — and no single reducer inherits a
    celebrity's d² work.

    Plan: normalize (dedupe, drop self-loops) → degree aggregate →
    orient → one self-join on the wedge pivot + one join to close the
    wedge — all joins key on node ids, payloads are id pairs; nothing
    collects. Returns one row: ``triangles`` (bigint).
    """
    a, b = F.col(src).alias("u"), F.col(dst).alias("v")
    und = (
        edges.select(F.least(a, b).alias("u"), F.greatest(a, b).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    sym = und.union(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d")).withColumnRenamed("u", "n")
    # orient: s -> t iff (deg(s), s) < (deg(t), t) — a total order, so
    # every undirected edge gets exactly one direction
    withdeg = (
        und.join(deg, und["u"] == deg["n"]).drop("n").withColumnRenamed("d", "du")
        .join(deg, und["v"] == deg["n"]).drop("n").withColumnRenamed("d", "dv")
    )
    lt = (F.col("du") < F.col("dv")) | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    oriented = withdeg.select(
        F.when(lt, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(lt, F.col("v")).otherwise(F.col("u")).alias("t"),
        F.when(lt, F.col("dv")).otherwise(F.col("du")).alias("dt"),
    )
    e1 = oriented.select(F.col("s"), F.col("t").alias("x"), F.col("dt").alias("dx"))
    e2 = oriented.select(F.col("s"), F.col("t").alias("y"), F.col("dt").alias("dy"))
    wedges = e1.join(e2, "s").where(
        (F.col("dx") < F.col("dy")) | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closing = oriented.select(F.col("s").alias("x"), F.col("t").alias("y"))
    return wedges.join(closing, ["x", "y"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("triangles")
    )
