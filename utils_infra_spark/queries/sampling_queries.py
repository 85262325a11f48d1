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
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
    ), s AS (
      SELECT doc_id, toks,
             unnest(range(0, greatest(len(toks) - 1, 0) + 1, 30)) AS start
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
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
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
