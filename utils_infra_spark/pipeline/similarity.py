"""Embedding similarity search over array<float> columns.

Brute-force cosine top-k is the exactness baseline; the scale path
buckets candidates (IVF-style coarse quantization on broadcast
centroids, or LSH sign-bands) so each probe touches 1/nlist of the
data. Dot products use `zip_with`+`aggregate` higher-order functions:
JVM-side, no Python, no explode — a 64-dim cosine is one codegen
expression.

Determinism note: ranking uses the cosine ROUNDED to 6 dp with id as
tie-break, so results are reproducible across engines/partitionings
(float sums are order-sensitive only below that precision here since
per-row expression evaluation order is fixed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DOUBLE = "double"


def _vec(col: Column | str) -> Column:
    col = F.col(col) if isinstance(col, str) else col
    return F.transform(col, lambda x: x.cast(DOUBLE))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate — sequential, deterministic."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    round_dp: int = 6,
) -> DataFrame:
    """Exact cosine top-k per query via broadcast of the query set.

    The QUERY side broadcasts (queries are few); the candidate scan
    stays partition-parallel with no shuffle until the final per-query
    top-k, which shuffles only (query_id, cand_id, cosine) triples.
    """
    from ..sources.tables import spread

    q = queries.select(F.col(id_col).alias("query_id"), _vec(vec_col).alias("qv")).withColumn(
        "nq", norm(F.col("qv"))
    )
    c = spread(candidates.select(F.col(id_col).alias("cand_id"), _vec(vec_col).alias("cv"))).withColumn(
        "nc", norm(F.col("cv"))
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(dot(F.col("qv"), F.col("cv")) / (F.col("nq") * F.col("nc")), round_dp).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "cand_id", "cos_sim", F.col("rnk").cast("int").alias("rnk"))
    )


def bucketed_pairs(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_col: str = "label",
    threshold: float = 0.9,
    round_dp: int = 6,
    broadcast_build: bool = True,
) -> DataFrame:
    """Near-duplicate embedding pairs within a coarse bucket
    (IVF-style: only intra-bucket pairs are scored — the quadratic
    term shrinks by nlist×).

    Join strategy: a shuffle join on the bucket key caps parallelism
    at bucket cardinality (10 labels → 10 busy tasks). With
    ``broadcast_build`` (default) the build side broadcasts and the
    probe side keeps its round-robin spread, so every core scores
    pairs. Set it False when the corpus is too big to broadcast — at
    that scale you also want a high-cardinality bucket (IVF nlist ≫
    cores), which makes the shuffle join the right plan.
    """
    from ..sources.tables import spread

    # norms precomputed per ROW (attribute boundary) so the quadratic
    # pair stage evaluates one 64-flop dot, not dot + two norms
    base = df.select(
        F.col(id_col).alias("vid"), F.col(bucket_col).alias("bucket"), _vec(vec_col).alias("v")
    ).withColumn("nv", norm(F.col("v")))
    a = spread(base).alias("a")
    b = (F.broadcast(base) if broadcast_build else base).alias("b")
    cos = dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nv") * F.col("b.nv"))
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vid") < F.col("b.vid")))
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            F.col("a.bucket").alias("bucket"),
            F.round(cos, round_dp).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def sign_lsh_bucket(vec: Column | str, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: sign bit per plane, packed to
    a long. Planes are literals (broadcast by closure) — bucket
    assignment is one codegen expression per row; similar vectors
    collide with prob 1 - θ/π per bit."""
    v = _vec(vec)
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(v, plane) > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(bit)
    return bucket


def centroids_by_key(df: DataFrame, *, vec_col: str = "embedding", key_col: str = "label") -> DataFrame:
    """Per-key mean vector (IVF coarse codebook bootstrap): element-wise
    array sum via aggregate over collected groups would not scale, so
    this explodes to (key, pos, val) and re-assembles — one shuffle on
    (key, pos), fully parallel."""
    exploded = df.select(F.col(key_col).alias("key"), F.posexplode(_vec(vec_col)).alias("pos", "val"))
    summed = exploded.groupBy("key", "pos").agg(F.avg("val").alias("mean_val"))
    return (
        summed.groupBy("key")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "mean_val"))).alias("pairs"))
        .select("key", F.transform("pairs", lambda s: s["mean_val"]).alias("centroid"))
    )
