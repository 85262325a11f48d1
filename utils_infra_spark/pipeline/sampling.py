"""Deterministic sampling, train/val/test splitting, chunking, and
benchmark-contamination screening — the dataset-preparation ops a
training pipeline runs after dedup/quality filtering.

Everything here is HASH-deterministic, not RNG-based: membership is a
pure function of the row's id (md5 prefix), so a split/sample is
reproducible across engines, re-runs, and re-partitioning — `rand()`
with a seed is NOT stable across partitioning changes, which silently
reshuffles a 100 TB split when the input layout changes. md5 produces
identical lowercase hex in Spark and DuckDB, so every operator here is
oracle-checkable end to end.

Scale notes:
- split/sample are pure narrow projections + filters: no shuffle, no
  state; the filter sits directly on top of the scan.
- stratified top-k shuffles once on the stratum key (the same shape as
  any grouped ranking); k rows per stratum survive.
- chunking is a generate (explode) over an arithmetic sequence — row
  expansion happens AFTER the scan partition, never on the driver.
- contamination broadcasts the benchmark n-gram set (bounded by
  benchmark size, which is small by definition) and map-side joins the
  corpus grams against it: the 100 TB corpus never shuffles raw text,
  only (doc_id, partial count) pairs after the join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import shingles_from_tokens

# 4 hex digits = 65536 uniform buckets; plenty of resolution for
# split fractions while keeping thresholds printable/lexicographic
_BUCKETS = 16**4


def split_threshold(fraction: float) -> str:
    """Lexicographic md5-prefix threshold covering ~``fraction`` of
    rows: 4-digit lowercase hex, comparable as a plain string in any
    engine (fixed-length lowercase hex sorts numerically)."""
    return format(min(int(fraction * _BUCKETS), _BUCKETS - 1), "04x")


def hash_prefix(id_col: Column | str) -> Column:
    """First 4 hex chars of md5(id-as-string) — the uniform bucket key
    every operator in this module derives membership from."""
    id_col = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.substring(F.md5(id_col.cast("string")), 1, 4)


def assign_split(id_col: Column | str, fractions: dict[str, float]) -> Column:
    """Deterministic split label from cumulative md5-prefix thresholds.

    ``fractions`` maps label → fraction in assignment order; the LAST
    label takes the remainder (its fraction is implied — pass it for
    readability, it is not used). Every row gets exactly one label, and
    the same row gets the same label forever, on any engine.

    Leakage-safe splitting: pass a GROUP key instead of the row id —
    a URL domain, or the cluster id from
    ``pipeline/cluster.py:connected_components`` over near-dup pairs
    — and every member of the group lands in the same split, so
    near-duplicates can never straddle train/validation. Still a
    narrow projection: the group key is a row attribute, no shuffle.
    """
    labels = list(fractions)
    h = hash_prefix(id_col)
    expr = None
    cum = 0.0
    for label in labels[:-1]:
        cum += fractions[label]
        cond = h < split_threshold(cum)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return (expr.otherwise(labels[-1]) if expr is not None else F.lit(labels[-1])).alias("split")


def deterministic_sample(df: DataFrame, id_col: str, rate: float) -> DataFrame:
    """Keep ~``rate`` of rows by md5-prefix threshold — a pushdown-able
    narrow filter (no shuffle, no RNG state), stable under re-runs and
    re-partitioning."""
    return df.where(hash_prefix(id_col) < split_threshold(rate))


def mixture_resample(
    df: DataFrame, group_col: str, id_col: str, rates: dict[str, float], default_rate: float = 1.0
) -> DataFrame:
    """Deterministic per-group resampling to hit a target source mix —
    the data-mixing step of a pretraining pipeline (downsample the
    over-represented web crawl, keep the rare sources whole). Each
    group gets its own md5-prefix threshold, so membership is a narrow
    pushdown-able filter: no RNG state, no shuffle, stable under
    re-partitioning and re-runs, and the same document never flips
    between mixes when only OTHER groups' rates change.
    """
    def thr_str(rate: float) -> str:
        # "g" sorts above every hex digit: rate >= 1.0 keeps ALL rows
        # (split_threshold caps at "ffff", which would drop the
        # 1/65536 of ids whose prefix IS "ffff")
        return "g" if rate >= 1.0 else split_threshold(rate)

    thr = None
    for g, rate in rates.items():
        cond = F.col(group_col) == g
        t = F.lit(thr_str(rate))
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    thr = F.lit(thr_str(default_rate)) if thr is None else thr.otherwise(F.lit(thr_str(default_rate)))
    return df.where(hash_prefix(id_col) < thr)


def stratified_topk(
    df: DataFrame, stratum: str, id_col: str, k: int, *, rank_alias: str = "rn"
) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample: rank rows inside each
    stratum by (md5(id), id) and keep the first k. One shuffle on the
    stratum key; the md5 ordering makes the choice uniform-random-like
    yet fully reproducible."""
    w = Window.partitionBy(stratum).orderBy(F.md5(F.col(id_col).cast("string")), id_col)
    return df.withColumn(rank_alias, F.row_number().over(w)).where(F.col(rank_alias) <= k)


def token_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    chunk_size: int = 40,
    overlap: int = 10,
) -> DataFrame:
    """Split each document into fixed-size token windows with overlap —
    the context-window packing step before tokenization/training.

    Emits one row per (doc, window start): ``(id, start, n_tokens,
    chunk)`` where ``start`` steps by ``chunk_size - overlap``. The
    expansion is a generate over an arithmetic sequence computed from
    the token count — per-row work distributed with the scan, never a
    driver loop.
    """
    step = chunk_size - overlap
    if step <= 0:
        raise ValueError("overlap must be smaller than chunk_size")
    toks = F.split(F.trim(F.col(text_col)), "[ \\t\\n\\x0B\\f\\r]+")
    # a start past size - overlap - 1 would emit a chunk fully
    # contained in its predecessor (the tail already covered via the
    # overlap) — redundant duplicated training text, exactly what the
    # pipeline dedups elsewhere
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("__toks") - F.lit(overlap) - 1, F.lit(0)), F.lit(step)
    )
    return (
        df.select(F.col(id_col), toks.alias("__toks"))
        .select(id_col, "__toks", F.explode(starts).alias("__start"))
        .select(
            id_col,
            F.col("__start").cast("bigint").alias("start"),
            F.least(F.size("__toks") - F.col("__start"), F.lit(chunk_size))
            .cast("bigint")
            .alias("n_tokens"),
            F.array_join(F.slice("__toks", F.col("__start") + 1, F.lit(chunk_size)), " ").alias(
                "chunk"
            ),
        )
    )


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 8,
) -> DataFrame:
    """Benchmark-contamination screen: count, per corpus document, how
    many of its distinct token k-grams also appear in the benchmark
    set (the standard 13-gram-style overlap test run before training).

    The benchmark's distinct gram set is broadcast (small by
    definition); corpus grams are generated and joined map-side, so the
    only shuffle carries (doc_id, partial count). Documents shorter
    than k tokens contribute their whole text as a single gram.
    Returns (id, n_collisions) for contaminated documents only.
    """

    def grams(frame: DataFrame, keep_id: bool) -> DataFrame:
        cols = [F.col(id_col)] if keep_id else []
        tokenized = frame.select(*cols, F.split(F.trim(F.col(text_col)), "[ \\t\\n\\x0B\\f\\r]+").alias("__toks"))
        exploded = tokenized.select(
            *([id_col] if keep_id else []),
            F.explode(shingles_from_tokens("__toks", k)).alias("gram"),
        )
        return exploded.dropDuplicates([id_col, "gram"] if keep_id else ["gram"])

    bench_grams = grams(benchmark, keep_id=False)
    corpus_grams = grams(corpus, keep_id=True)
    return (
        corpus_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_collisions"))
    )


def pack_by_cumsum(
    df: DataFrame,
    part_col: str,
    id_col: str,
    size_col: str,
    capacity: int,
) -> DataFrame:
    """Greedy deterministic shard packing: within each ``part_col``
    stratum, order rows by (md5(id), id), take the running total of
    ``size_col``, and assign shard ``floor(total_before/capacity)`` —
    the linear-pass packing a training pipeline uses to group
    documents into bounded shards/context batches.

    One shuffle on the stratum key (the window and nothing else);
    packing is parallel ACROSS strata — the global-order variant would
    serialize 100 TB through one partition, so the stratum key is the
    parallelism knob. Deterministic: same rows → same shard ids,
    any engine, any partitioning.
    """
    w = (
        Window.partitionBy(part_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(size_col).over(w)
    return df.withColumn(
        "shard", F.floor((cum - F.col(size_col)) / F.lit(float(capacity))).cast("bigint")
    )


def weighted_sample(df: DataFrame, id_col: str, weight: Column) -> DataFrame:
    """Per-row weighted deterministic sampling: keep each row with
    probability ``weight`` (a Column in [0, 1] — e.g. a quality
    score), decided by comparing the row's md5 prefix against the
    row's own threshold. The quality-weighted resampling step of a
    training pipeline, with the same guarantees as
    :func:`deterministic_sample`: no RNG state, no shuffle, stable
    under re-partitioning and re-runs, and monotone — raising a row's
    weight can only keep it, never drop it.

    weight >= 1.0 keeps EVERY row ('g' sorts above any hex prefix —
    the same sentinel mixture_resample uses): clamping the threshold
    to 'ffff' would silently drop the 1/65536 of ids hashing to
    'ffff' even at weight 1.0.
    """
    thresh = F.least(F.floor(weight * _BUCKETS).cast("int"), F.lit(_BUCKETS - 1))
    thresh_str = F.when(weight >= 1.0, F.lit("g")).otherwise(F.format_string("%04x", thresh))
    return df.where(hash_prefix(id_col) < thresh_str)


def weighted_topk_sample(
    df: DataFrame,
    id_col: str,
    weight_expr: str,
    k: int,
    *,
    stratum_col: str | None = None,
    max_weight: int = 16,
) -> DataFrame:
    """EXACTLY-k weighted sampling WITHOUT replacement (per stratum
    when ``stratum_col`` is given) — the Efraimidis–Spirakis A-ES
    scheme specialized to INTEGER weights so it stays deterministic
    and engine-exact: a row with weight w draws w independent md5
    uniforms (``md5(id || ':' || i)``, i = 1..w) and competes with its
    MAXIMUM draw; the top-k keys win. max-of-w-uniforms has exactly
    the u^(1/w) distribution A-ES uses, but needs no pow()/ln() —
    the whole construction is md5 + hex-string comparison, identical
    in Spark and DuckDB, so the sample is hash-checkable and immune to
    partitioning, retries, and engine swaps (the rand()-based
    alternative is none of these). Weights clamp to [1, max_weight]
    (the draw array is materialized per row).

    Emits the input row plus ``weight`` and ``sample_key``.

    Ordering ties break on ``id_col`` ascending (rows sharing an id
    share every md5 draw, so without the tiebreak the exact-k winner
    set would be partition-order-dependent). For FULL determinism
    ``id_col`` should be unique — two rows with the SAME id and
    different payloads are indistinguishable to the ranking.

    Engine shape at 100 TB: the draws are one in-row projection;
    global top-k is TakeOrderedAndProject (per-partition heaps, no
    global sort), stratified top-k one window keyed on the stratum.
    """
    w_clamped = f"GREATEST(1, LEAST({int(max_weight)}, CAST({weight_expr} AS INT)))"
    keyed = df.selectExpr(
        "*",
        f"{w_clamped} AS weight",
        f"array_max(transform(sequence(1, {w_clamped}),"
        f" i -> md5(concat(CAST({id_col} AS STRING), ':', CAST(i AS STRING)))))"
        " AS sample_key",
    )
    if stratum_col is None:
        return keyed.orderBy(F.desc("sample_key"), F.col(id_col).asc()).limit(k)
    w = Window.partitionBy(stratum_col).orderBy(F.desc("sample_key"), F.col(id_col).asc())
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
