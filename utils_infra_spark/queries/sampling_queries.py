"""Dataset-preparation queries: deterministic splits, sampling,
chunking, and contamination screening over the documents table.

All membership decisions are md5-hash-deterministic (see
pipeline/sampling.py), so every query here has an exact DuckDB oracle
— the same rows land in the same split/sample on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline.sampling import (
    assign_split,
    deterministic_sample,
    ngram_contamination,
    stratified_topk,
    token_chunks,
)
from ..sources import load_table
from . import register

# md5-prefix thresholds for 80/10/10 (see split_threshold): cumulative
# 0.8 -> 0xcccc, 0.9 -> 0xe666 of 65536 buckets
_SPLIT_SQL = """
    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
         ELSE 'test' END
"""


@register(
    "train_val_test_split",
    oracle=f"""
    SELECT {_SPLIT_SQL} AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY 1
    """,
    doc="Deterministic 80/10/10 train/val/test assignment by md5(doc_id) prefix — "
    "reproducible across engines, re-runs, and re-partitioning (a seeded rand() split is "
    "not). Pure narrow projection + grouped count: the split adds zero shuffles beyond "
    "the final tiny aggregate.",
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(assign_split("doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}), "n_chars")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


@register(
    "deterministic_sample_docs",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '0ccc'
    """,
    doc="~5% deterministic sample by md5 prefix ('0ccc'/65536 ≈ 0.05): a pushdown-able "
    "narrow filter — no RNG state, no shuffle; the same 5% every run at any scale.",
)
def deterministic_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return deterministic_sample(docs, "doc_id", 0.05).select("doc_id", "lang", "source", "n_chars")


@register(
    "stratified_sample_by_lang",
    oracle="""
    SELECT lang, doc_id, CAST(rn AS INT) AS rn FROM (
      SELECT lang, doc_id,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    ) WHERE rn <= 20
    """,
    doc="Exactly-20-per-language stratified sample: rank within each stratum by "
    "(md5(doc_id), doc_id) — uniform-random-like yet fully reproducible. One shuffle on "
    "the stratum key, same shape as any grouped ranking.",
)
def stratified_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return stratified_topk(docs, "lang", "doc_id", 20).select(
        "lang", "doc_id", F.col("rn").cast("int").alias("rn")
    )


@register(
    "doc_token_chunks",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+') AS toks FROM documents
    ), s AS (
      -- starts bounded at len - overlap - 1: a later start's chunk is
      -- fully contained in its predecessor (duplicated training text)
      SELECT doc_id, toks,
             unnest(range(0, greatest(len(toks) - 11, 0) + 1, 30)) AS start
      FROM t
    )
    SELECT doc_id, CAST(start AS BIGINT) AS start,
           CAST(least(len(toks) - start, 40) AS BIGINT) AS n_tokens,
           array_to_string(toks[start + 1 : start + 40], ' ') AS chunk
    FROM s
    """,
    doc="Context-window packing: each document split into 40-token chunks with 10-token "
    "overlap (stride 30). The expansion is a generate over an arithmetic sequence inside "
    "the scan partition — no driver loop, rows fan out where the data lives.",
)
def doc_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return token_chunks(docs, "doc_id", "text", chunk_size=40, overlap=10)


@register(
    "benchmark_contamination",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+') AS toks FROM documents
    ), g AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 3
                  THEN list_transform(range(1, len(toks) - 1),
                                      i -> array_to_string(toks[i : i + 2], ' '))
                  ELSE [array_to_string(toks, ' ')] END AS grams
      FROM t
    ), b AS (
      SELECT DISTINCT gram
      FROM (SELECT unnest(grams) AS gram FROM g WHERE doc_id % 97 = 0)
    ), c AS (
      SELECT DISTINCT doc_id, gram
      FROM (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 97 <> 0)
    )
    SELECT c.doc_id, COUNT(*) AS n_collisions
    FROM c JOIN b USING (gram)
    GROUP BY c.doc_id
    """,
    doc="Benchmark-contamination screen: per corpus doc, count of distinct token k-grams "
    "shared with the benchmark set (doc_id % 97 here stands in for a held-out eval set; "
    "k=3 against this synthetic vocabulary plays the role the 13-gram test plays on real "
    "text). The benchmark gram set is broadcast — the 100 TB corpus side never shuffles "
    "text, only (doc_id, partial count) pairs after the map-side join.",
)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    return ngram_contamination(corpus, bench, "doc_id", "text", k=3)


@register(
    "embedding_int8_quantize",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings
    ), s AS (
      SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS mx FROM v
    ), q AS (
      SELECT vec_id, e, mx/127.0 AS scale,
             CASE WHEN mx = 0 THEN list_transform(e, x -> 0)
                  ELSE list_transform(e, x -> CAST(greatest(least(
                         floor(x/(mx/127.0) + 0.5), 127), -127) AS INT)) END AS qv
      FROM s
    )
    SELECT vec_id, scale,
           list_max(list_transform(range(1, len(e)+1), i -> abs(e[i] - qv[i]*scale))) AS max_abs_err,
           CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS q_l1
    FROM q
    """,
    doc="Symmetric int8 quantization of each embedding (4 bytes/dim → 1): per-vector "
    "scale, exact reconstruction-error bound, and integer L1 mass. Elementwise IEEE "
    "double math on identical inputs — the quantized codes and the UNROUNDED error "
    "hash-match the oracle bit-for-bit. Pure projection: no shuffle, 4× less to move "
    "when the ANN index shuffles codes instead of floats.",
)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipeline.similarity import dequant_max_err, int8_quantize

    emb = load_table(spark, sf_dir, "embeddings")
    quant = int8_quantize("embedding")
    q = emb.select("vec_id", "embedding", quant.alias("qt"))
    return q.select(
        "vec_id",
        F.col("qt.scale").alias("scale"),
        dequant_max_err("embedding", F.col("qt")).alias("max_abs_err"),
        F.aggregate(
            F.col("qt.q"), F.lit(0).cast("bigint"), lambda acc, x: acc + F.abs(x).cast("bigint")
        ).alias("q_l1"),
    )


@register(
    "pack_documents_shards",
    oracle="""
    WITH c AS (
      SELECT lang, doc_id, n_chars,
             SUM(n_chars) OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum
      FROM documents
    )
    SELECT lang, CAST(FLOOR((cum - n_chars)/4096.0) AS BIGINT) AS shard,
           COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM c GROUP BY 1, 2
    """,
    doc="Greedy deterministic shard packing: per language, documents in md5 order are "
    "packed into ~4096-char shards by running total (floor(total_before/capacity)). "
    "Packing is parallel ACROSS strata — one shuffle on the stratum key; a global-order "
    "pack would serialize everything through one partition.",
)
def pack_documents_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipeline.sampling import pack_by_cumsum

    docs = load_table(spark, sf_dir, "documents")
    packed = pack_by_cumsum(docs, "lang", "doc_id", "n_chars", 4096)
    return packed.groupBy("lang", "shard").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars")
    )


@register(
    "weighted_sample_docs",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
          < CASE WHEN n_chars >= 500 THEN 'g'
                 ELSE printf('%04x', CAST(least(floor(least(n_chars/500.0, 1.0) * 65536), 65535) AS INT)) END
    """,
    doc="Quality-weighted deterministic sampling: each document kept with probability "
    "min(n_chars/500, 1) — longer (here: 'higher-quality') docs oversampled — by "
    "comparing the row's md5 prefix to its OWN threshold. Same scale contract as the "
    "uniform sample: narrow filter, no shuffle, stable under re-partitioning, and "
    "monotone in the weight.",
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipeline.sampling import weighted_sample

    docs = load_table(spark, sf_dir, "documents")
    w = F.least(F.col("n_chars") / 500.0, F.lit(1.0))
    return weighted_sample(docs, "doc_id", w).select("doc_id", "lang", "n_chars")

@register(
    "mixture_resample_documents",
    oracle="""
    WITH kept AS (
      SELECT lang, n_chars FROM documents
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
            CASE WHEN lang = 'en' THEN '4ccc' ELSE 'g' END)
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM kept GROUP BY lang
    """,
    doc="Data-mixing resample: downsample the over-represented source "
    "('en' to a 0.3 rate) while keeping rare sources whole, by per-group "
    "md5-prefix thresholds - deterministic, shuffle-free, pushdown-able, "
    "and stable per document when other groups' rates change (the "
    "pretraining-mixture step). Output is the per-source census of the kept "
    "mix.",
)
def mixture_resample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipeline.sampling import mixture_resample

    docs = load_table(spark, sf_dir, "documents")
    kept = mixture_resample(docs, "lang", "doc_id", {"en": 0.3}, default_rate=1.0)
    return kept.groupBy("lang").agg(
        F.expr("COUNT(1) AS n_docs"), F.expr("CAST(SUM(n_chars) AS BIGINT) AS total_chars")
    )



@register(
    "weighted_topk_sample_documents",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, lang,
             GREATEST(1, LEAST(4, CAST(FLOOR(n_chars / 300) AS INT))) AS weight,
             list_max(list_transform(range(1, GREATEST(1, LEAST(4,
                        CAST(FLOOR(n_chars / 300) AS INT))) + 1),
                      i -> md5(CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR))))
               AS sample_key
      FROM documents
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY lang
                                   ORDER BY sample_key DESC, doc_id ASC) AS rn
      FROM keyed
    )
    SELECT doc_id, lang, CAST(weight AS INT) AS weight, sample_key
    FROM ranked WHERE rn <= 25
    """,
    doc="EXACTLY-k weighted sampling without replacement per language "
    "(Efraimidis-Spirakis A-ES, integer-weight specialization): weight = "
    "clamp(n_chars/300, 1, 4); each row competes with the MAX of `weight` "
    "md5 draws — max-of-w-uniforms IS the u^(1/w) A-ES key, but needs no "
    "pow()/ln(), so the sample is deterministic, engine-exact, and "
    "hash-checkable (rand()-based sampling is none of these and silently "
    "reassigns a 100 TB sample on any repartition). Draws are one in-row "
    "projection; per-stratum top-k is one window on the stratum key.",
)
def weighted_topk_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipeline.sampling import weighted_topk_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    out = weighted_topk_sample(
        docs, "doc_id", "FLOOR(n_chars / 300)", 25, stratum_col="lang", max_weight=4
    )
    return out.selectExpr("doc_id", "lang", "CAST(weight AS INT) AS weight", "sample_key")
