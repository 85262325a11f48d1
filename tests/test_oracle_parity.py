"""Emulates the driver's t2 gate: for every registered query with an
oracle, run the Spark plan AND the DuckDB SQL on the same parquet and
compare row-count + column names + order-insensitive values exactly.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from utils_infra_spark.queries import REGISTRY, _load

_load()
WITH_ORACLE = sorted(name for name, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY = sorted(name for name, q in REGISTRY.items() if q.oracle is None)


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize cell values, sort rows — the
    order-insensitive form the driver hashes."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            df[c] = col.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(col):
            # exact repr: driver-style value identity, not tolerance
            df[c] = col.map(lambda v: "nan" if v is None or (isinstance(v, float) & (v != v)) else repr(float(v)))
        elif col.dtype == object:
            df[c] = col.map(lambda v: "null" if v is None else str(v))
        else:
            df[c] = col.astype(str)
    return df.sort_values(by=list(df.columns), kind="stable").reset_index(drop=True)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(name, spark, sf_dir, duck):
    q = REGISTRY[name]
    got = q.fn(spark, sf_dir).toPandas()
    want = duck.execute(q.oracle).df()

    assert len(got) == len(want), f"{name}: row count {len(got)} != oracle {len(want)}"
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != oracle {sorted(want.columns)}"
    )
    g, w = canonicalize(got), canonicalize(want)
    mism = (g != w).any(axis=1)
    if mism.any():
        idx = mism[mism].index[:5]
        raise AssertionError(
            f"{name}: {int(mism.sum())}/{len(g)} rows differ.\nspark:\n{g.loc[idx]}\noracle:\n{w.loc[idx]}"
        )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name, spark, sf_dir):
    df = REGISTRY[name].fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.queries().keys()) >= set(e.oracle_sql().keys())


# Queries whose results pass through float-derived or order-sensitive
# reductions — the class where cross-engine/cross-partitioning bugs
# first appear at scale (event_interarrival went red only at sf0.1
# when partial-merge order changed; char_lm had the same latent shape
# until its fixed-point rewrite). The invariance probe would have
# caught both a round early, at any sf.
PARTITION_SENSITIVE = [
    "char_lm_quality_documents",
    "line_dedup_documents",
    "bloom_novelty_documents",
    "dup_span_coverage_documents",
    "event_interarrival",
    "corr_price_quantity",
    "pricing_summary",
    # r7: DSIR's fit collects bucket counts whose values must not
    # depend on partitioning, and its score is an integer sum — probe
    # both under 2/8/32 shuffle partitions
    "dsir_importance_documents",
    # r7: JL's coordinates are sign-weighted integer sums (explicitly
    # order-independent — probe pins the claim); boilerplate removal
    # reassembles from a collect_list whose order only array_sort fixes
    "embedding_jl_projection",
    "boilerplate_line_removal_documents",
    # r8 extension — the remaining r7/r8 composites with reductions or
    # kernel-stage splits: SemDeDup's per-bucket Gram + CC min-id rep,
    # k-means' Arrow argmin over a collected model, CCNet's exact
    # per-lang ntile, the fused capstone (digest agg + repetition
    # reductions), the fingerprint's min-over-windows, HLL's register
    # max-merge, and top-k's partial/global ranking split (its survivor
    # set varies WITH the partitioning — invariance pins the criterion
    # alignment between kernel lexsort and the aggregate finish)
    "semdedup_embeddings",
    "kmeans_refine_assignments",
    "paragraph_dedup_documents",
    "ccnet_perplexity_buckets",
    "pretrain_pipeline_documents",
    "doc_fingerprint_md5",
    "hll_distinct_users_by_type",
    "embedding_topk_cosine",
    # r9 newcomers with reductions the spec claims are order-free:
    # PageRank's integer DIV/sum chain, heavy hitters' per-batch
    # candidate pass (the SET must not depend on the batch split),
    # histogram bins' cumulative window over the aggregated table,
    # langid's fit counts + argmax ties, MAD's exact medians
    "pagerank_user_type_graph",
    "heavy_hitter_tokens_documents",
    "histogram_quantiles_lineitem",
    "langid_trigram_documents",
    "mad_outliers_events",
]


@pytest.mark.parametrize("name", PARTITION_SENSITIVE)
def test_partitioning_invariance(name, spark, sf_dir):
    """The published values of a query must be BYTE-IDENTICAL under
    2/8/32 shuffle partitions: partial-aggregate merge order, task
    count, and reducer layout are physical concerns and may never
    reach a result. This runs at whatever scale SPARK_GRAFT_TEST_SF_DIR
    points to — the round checklist runs it at sf0.1, where
    order-dependence first manifests in practice."""
    q = REGISTRY[name]
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    baseline = None
    try:
        for n in (2, 8, 32):
            spark.conf.set("spark.sql.shuffle.partitions", str(n))
            # q.fn, not q.plan: bypass the plan cache so builders that
            # execute at build time (char_lm's fit) also re-run under
            # the new partitioning
            c = canonicalize(q.fn(spark, sf_dir).toPandas())
            if baseline is None:
                baseline = (n, c)
            else:
                assert c.equals(baseline[1]), (
                    f"{name}: result differs between shuffle.partitions="
                    f"{baseline[0]} and {n}"
                )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
