"""Connected components over duplicate-candidate graphs.

Near-dup detection (minhash / simhash / exact-prefix / jaccard — see
``pipeline.dedup``) emits PAIRS; a training corpus needs CLUSTERS:
if A≈B and B≈C then {A,B,C} must collapse to one representative even
when A and C were never directly compared. That closure is a
connected-components problem on the candidate graph.

Algorithm: the alternating large-star / small-star method of
Kiveris et al., "Connected Components in MapReduce and Beyond"
(SoCC 2014) — the published shuffle-native CC algorithm. Each round
is two DataFrame aggregations + joins (no Python in the loop body),
and the edge set converges to stars centered at each component's
minimum id in O(log² n) rounds — crucially, long CHAINS (the
worst case that makes naive min-label propagation take O(diameter)
rounds) collapse logarithmically.

100 TB shape: each round shuffles the EDGE set on node id (candidate
pairs are ~16 B/edge — the documents themselves never move);
``localCheckpoint`` truncates lineage per round so the plan does not
grow with iterations (on a cluster: a reliable checkpoint dir). The
driver-side loop runs one tiny count-style action per round to test
convergence — the accepted pattern for iterative graph algorithms
(GraphX/GraphFrames do the same).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _normalize(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge list → distinct (hi, lo) pairs, self-loops dropped."""
    a, b = F.col(src).alias("hi"), F.col(dst).alias("lo")
    return (
        edges.select(F.greatest(a, b).alias("hi"), F.least(a, b).alias("lo"))
        .where(F.col("hi") != F.col("lo"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u: connect every STRICTLY LARGER neighbor to
    m = min(N(u) ∪ {u}). Emitted edges are (v, m) with v > u ≥ m, so
    the output is already (hi, lo)-normalized."""
    sym = e.union(e.select(F.col("lo").alias("hi"), F.col("hi").alias("lo")))
    mins = sym.groupBy("hi").agg(F.least(F.min("lo"), F.first("hi")).alias("m"))
    return (
        sym.join(mins, "hi")
        .where(F.col("lo") > F.col("hi"))
        .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
        .union(mins.where(F.col("m") < F.col("hi")).select("hi", F.col("m").alias("lo")))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """For each node u: connect every neighbor ≤ u (and u itself) to
    m = min(N≤(u) ∪ {u}). On (hi, lo)-normalized input all stored
    neighbors of ``hi`` are already ≤ hi."""
    mins = e.groupBy("hi").agg(F.min("lo").alias("m"))
    j = e.join(mins, "hi")
    return (
        j.where(F.col("lo") != F.col("m")).select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
        .union(mins.select("hi", F.col("m").alias("lo")))
        .distinct()
    )


def _digest(e: DataFrame) -> tuple[int, int]:
    """(count, order-independent hash) of an edge set — one action."""
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("hi", "lo")), F.lit(0)).alias("h"),
    ).first()
    return row["n"], row["h"]


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", *, max_iter: int = 25
) -> DataFrame:
    """(node, comp) for every node appearing in ``edges``; ``comp`` is
    the smallest node id in the component (a stable, deterministic
    cluster id). Nodes with no edges are absent — callers that need
    singletons coalesce comp to the node id after a left join.

    Raises RuntimeError if the edge set has not stabilized after
    ``max_iter`` alternating rounds (log² n bound ⇒ 25 rounds covers
    any graph that fits on hardware).

    Memory note: intermediate rounds are unpersisted as they are
    superseded, but the FINAL converged edge set stays checkpointed —
    it is the returned frame's lineage (bounded by the edge count,
    ~16 B/edge, freed when the result is garbage-collected)."""
    from ..sources.tables import checkpoint_with_ids, unpersist_rdd_ids

    spark = edges.sparkSession

    # Per-round checkpoints carry their persistent-RDD ids
    # (checkpoint_with_ids reads the id directly off the returned
    # plan) because freeing superseded rounds NEEDS the id:
    # Dataset.unpersist on a checkpointed frame is a silent no-op (it
    # consults only the SQL CacheManager, which localCheckpoint never
    # registers with) — the same trap uncache_base_tables documents.
    # On the non-convergence path the final round's blocks are freed
    # too (no result frame survives to own them).
    e_ids: set[int] = set()
    try:
        e, e_ids = checkpoint_with_ids(_normalize(edges, src, dst), eager=False)
        sig = _digest(e)  # first action materializes the checkpoint
        for _ in range(max_iter):
            e2, e2_ids = checkpoint_with_ids(_small_star(_large_star(e)), eager=False)
            try:
                sig2 = _digest(e2)
            except BaseException:
                unpersist_rdd_ids(spark, e2_ids)
                raise
            unpersist_rdd_ids(spark, e_ids)
            e, e_ids = e2, e2_ids
            if sig2 == sig:
                break
            sig = sig2
        else:
            raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    except BaseException:
        # any failure path (non-convergence, executor loss mid-round,
        # cancellation): no result frame survives to own the current
        # round's blocks, so free them instead of pinning
        # edge-set-sized memory in a long-lived session
        unpersist_rdd_ids(spark, e_ids)
        raise
    # Converged: e is a star graph (node → component min). Centers
    # map to themselves.
    members = e.select(F.col("hi").alias("node"), F.col("lo").alias("comp"))
    centers = e.select(F.col("lo").alias("node"), F.col("lo").alias("comp")).distinct()
    return members.union(centers).distinct()


def cluster_documents(
    docs: DataFrame, edges: DataFrame, id_col: str, *, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Assign every document a duplicate-cluster id and mark the
    representative to keep (smallest id — deterministic across runs
    and partitionings).

    Adds: ``cluster_id`` (= component min, or own id for singletons),
    ``cluster_size``, ``is_representative``. Downstream corpus dedup
    is ``where(is_representative)``.
    """
    cc = connected_components(edges, src, dst)
    out = docs.join(cc, docs[id_col] == cc["node"], "left").select(
        docs["*"], F.coalesce(cc["comp"], docs[id_col]).alias("cluster_id")
    )
    w_cnt = F.count(F.lit(1)).over(Window.partitionBy("cluster_id"))
    return out.select(
        "*",
        w_cnt.alias("cluster_size"),
        (F.col(id_col) == F.col("cluster_id")).alias("is_representative"),
    )
