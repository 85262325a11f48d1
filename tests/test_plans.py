"""Plan-quality regression tests: assert the physical plans keep the
shapes SCALE.md promises — pushdown reaching the scan, dims
broadcast, digests (not documents) in the dedup shuffle. A plan
regression here is a silent 10-100x cost at 100 TB even when results
stay correct.
"""

from __future__ import annotations

import pytest

from utils_infra_spark.queries import REGISTRY, _load

_load()


def plan_of(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q6_predicates_reach_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "forecast_revenue_filter")
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, "no PushedFilters in scan"
    line = pushed[0]
    for fragment in ("l_shipdate", "l_discount", "l_quantity"):
        assert fragment in line, f"{fragment} not pushed: {line}"


def test_pricing_summary_prunes_columns(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "pricing_summary")
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_comment" not in read and "l_orderkey" not in read
    assert "l_quantity" in read and "l_returnflag" in read


def test_nation_revenue_broadcasts_dims(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "nation_revenue")
    assert "BroadcastHashJoin" in plan
    # no dim should arrive via a sort-merge join at this scale
    assert plan.count("BroadcastExchange") >= 2


def test_dedup_shuffles_digests_not_text(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "dedup_exact_documents")
    exchange_lines = [
        ln for ln in plan.splitlines() if ln.strip().startswith("Arguments: hashpartitioning")
    ]
    assert exchange_lines, "no hash exchange found"
    assert any("fp" in ln for ln in exchange_lines), exchange_lines
    # the raw text column must not appear in any exchange
    assert not any("text" in ln for ln in exchange_lines), exchange_lines


def test_semi_join_stays_semi(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "orders_semi_building")
    assert "LeftSemi" in plan


def plan_of_df(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_bucketed_pairs_single_shuffle_no_broadcast(spark, sf_dir):
    """The pair kernel shuffles the corpus ONCE on the bucket key and
    never broadcasts or joins: scale-safe regardless of corpus size
    (parallelism = nlist by IVF contract)."""
    from utils_infra_spark.pipeline.similarity import bucketed_pairs
    from utils_infra_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    df = bucketed_pairs(emb, vec_col="embedding", id_col="vec_id", bucket_col="label", threshold=0.25)
    plan = plan_of_df(spark, df)
    assert "FlatMapGroupsInArrow" in plan
    # tree lines render as "Exchange (N)"; detail headers as "(N) Exchange"
    assert plan.count("Exchange (") == 1, plan
    assert "Broadcast" not in plan
    assert "Join" not in plan


def test_minhash_leaves_no_cached_rdds(spark, sf_dir):
    """minhash_near_duplicates is a single-consumption plan: nothing
    persisted, so a long session never accumulates sketch memory."""
    from utils_infra_spark.pipeline.dedup import minhash_near_duplicates
    from utils_infra_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    # delta, not absolute: other operators in the shared session
    # (connected_components) legitimately hold a checkpointed edge set
    # alive for their result's lineage.
    before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    out = minhash_near_duplicates(docs, "text", "doc_id", threshold=0.4)
    out.collect()
    after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert after <= before, f"{after - before} cached RDDs leaked by minhash"
    plan = plan_of_df(spark, out)
    assert "InMemoryRelation" not in plan


def test_q10_shape_takes_ordered_no_full_sort(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "returned_items_customers")
    assert "TakeOrderedAndProject" in plan
    # returnflag filter pushed into the lineitem scan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln and "l_returnflag" in ln]
    assert pushed, "l_returnflag not pushed to scan"


def test_q7_shape_dims_broadcast_fact_merge(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "nation_pair_volume")
    assert plan.count("BroadcastHashJoin") >= 3  # cust, supp, 2x nation (AQE may fold)
    assert "SortMergeJoin" in plan  # li x orders never broadcasts


def test_ivf_assign_is_projection_no_shuffle_before_join(spark, sf_dir):
    """The coarse-quantize kernel adds NO exchange of its own — the
    only exchanges in ivf_assign_lists serve the id re-join."""
    plan = plan_of(spark, sf_dir, "ivf_assign_lists")
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan or "PythonMapInArrow" in plan, plan[:500]


def test_asof_join_single_exchange_no_nested_loop(spark, sf_dir):
    """The as-of join must be the union+window form: ONE hash exchange
    on the key, and never an inequality BroadcastNestedLoopJoin."""
    plan = plan_of(spark, sf_dir, "asof_click_purchase")
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    exchanges = [
        ln for ln in plan.splitlines() if ln.strip().startswith("Arguments: hashpartitioning")
    ]
    assert len(exchanges) == 1, exchanges
    assert "__k" in exchanges[0]


def test_range_join_is_equi_join_on_bin(spark, sf_dir):
    """Binned range join must run as an equi join keyed on the bin id,
    not a nested-loop inequality join."""
    plan = plan_of(spark, sf_dir, "events_in_user_window")
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "__bin" in plan


def test_rollup_single_aggregate_pass(spark, sf_dir):
    """ROLLUP expands grouping sets map-side (Expand), with the
    customer dim broadcast — one shuffle total for all grouping sets."""
    plan = plan_of(spark, sf_dir, "rollup_segment_priority")
    assert "Expand" in plan
    assert "BroadcastHashJoin" in plan
    exchanges = [
        ln for ln in plan.splitlines() if ln.strip().startswith("Arguments: hashpartitioning")
    ]
    assert len(exchanges) == 1, exchanges


def test_large_orders_having_prunes_before_joins(spark, sf_dir):
    """Q18 shape: the HAVING-filtered aggregate must sit BELOW the
    joins (prune first), and the customer dim must broadcast."""
    plan = plan_of(spark, sf_dir, "large_orders")
    assert "BroadcastExchange" in plan
    lines = plan.splitlines()
    agg_idx = min(i for i, ln in enumerate(lines) if "HashAggregate" in ln)
    join_idx = min(i for i, ln in enumerate(lines) if "Join" in ln and "Broadcast" not in ln)
    assert agg_idx > 0 and join_idx > 0


def test_deterministic_sample_no_shuffle(spark, sf_dir):
    # md5-threshold sampling must stay a narrow filter: scan -> filter
    # -> project, with zero exchanges (at 100 TB an accidental shuffle
    # here would move the whole corpus to sample 5% of it)
    plan = plan_of(spark, sf_dir, "deterministic_sample_docs")
    assert "Exchange" not in plan, plan


def test_contamination_broadcasts_benchmark_grams(spark, sf_dir):
    # the benchmark gram set is bounded-small; the corpus side must
    # join against it map-side, never shuffle its grams
    plan = plan_of(spark, sf_dir, "benchmark_contamination")
    assert "BroadcastHashJoin" in plan
    # the only hash exchanges should be on doc_id/gram dedup + final
    # count agg, never a sort-merge join of the corpus grams
    assert "SortMergeJoin" not in plan


def test_split_assignment_single_aggregate_exchange(spark, sf_dir):
    # split label is a pure projection; only the final 3-row aggregate
    # shuffles, and it shuffles the label, not doc rows pre-agg
    plan = plan_of(spark, sf_dir, "train_val_test_split")
    exchange_lines = [
        ln for ln in plan.splitlines() if ln.strip().startswith("Arguments: hashpartitioning")
    ]
    assert len(exchange_lines) == 1, exchange_lines
    assert "split" in exchange_lines[0]
    assert "HashAggregate" in plan  # partial agg before the exchange


def test_chunking_generates_after_scan_partition(spark, sf_dir):
    # the row expansion is a Generate over sequence() with no exchange
    # in front of it: chunks fan out inside the scan partition
    plan = plan_of(spark, sf_dir, "doc_token_chunks")
    assert "Generate" in plan
    assert "Exchange" not in plan, plan


def test_prefix_filter_join_no_nested_loop(spark, sf_dir):
    # the whole point of prefix filtering: candidates come from an
    # EQUI-join on rare shingles, never a quadratic nested loop.
    plan = plan_of(spark, sf_dir, "jaccard_prefix_pairs")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_running_total_single_window_exchange(spark, sf_dir):
    # one hash exchange on custkey feeds the window; no global sort.
    plan = plan_of(spark, sf_dir, "running_customer_revenue")
    assert plan.count("Exchange") <= 2  # custkey hash + AQE read
    assert "Window" in plan


def test_histogram_partial_aggregates(spark, sf_dir):
    # map-side combine: a partial HashAggregate must appear below the
    # exchange so the shuffle carries (bin, partials), not rows.
    plan = plan_of(spark, sf_dir, "event_value_histogram")
    # formatted explain prints root-first, so the partial aggregate
    # (map side) must appear AFTER the shuffle exchange in the text.
    assert "partial_count" in plan or "partial" in plan.lower()
    assert plan.rindex("HashAggregate") > plan.index("Exchange")


def test_bm25_topk_takes_ordered_no_global_window_sort(spark, sf_dir):
    """Top-10 ranking must be TakeOrderedAndProject (parallel partial
    heaps), not a row_number over an unpartitioned window funneling
    every scored doc through one task."""
    plan = plan_of(spark, sf_dir, "bm25_search")
    assert "TakeOrderedAndProject" in plan
    # the only Window left runs over the already-limited 10-row frame,
    # i.e. downstream of the TakeOrdered, never over the scored set
    take_pos = plan.index("TakeOrderedAndProject")
    win_pos = plan.find("Window")
    assert win_pos == -1 or win_pos < take_pos  # formatted plans list parents first


def test_global_topn_takes_ordered(spark, sf_dir):
    """top_n_per_group with partition=[] routes through
    orderBy().limit(n), so the heavy input never crosses a
    single-partition window Exchange."""
    plan = plan_of(spark, sf_dir, "top_customers_by_balance")
    assert "TakeOrderedAndProject" in plan


def test_prepared_plan_cache_reserves_same_object(spark, sf_dir):
    # the registry memoizes built plans per (session, input, query):
    # a DataFrame is an immutable logical plan, so re-serving it is
    # semantically a no-op that skips only driver-side rebuild cost
    q = REGISTRY["pricing_summary"]
    a = q.plan(spark, sf_dir)
    b = q.plan(spark, sf_dir)
    assert a is b
    # distinct inputs never share a cache slot
    c = q.plan(spark, "/root/testdata/sf0.01")
    assert c is not a
    # the cached plan still executes correctly
    assert a.count() > 0


def test_fresh_select_reexecutes_map_stages(spark, sf_dir):
    """bench.py's warm rule: a fresh QueryExecution per run
    (`select("*")`) re-runs ALL stages. Re-executing the HELD Dataset
    would reuse shuffle outputs and silently skip the scan/map stages
    — this test pins both behaviors so the bench never regresses into
    measuring reduce-only work.
    """
    st = spark.sparkContext.statusTracker()

    def completed_tasks_since(prev: set[int]) -> tuple[int, set[int]]:
        ids = set(st.getJobIdsForGroup())
        total = 0
        for j in ids - prev:
            info = st.getJobInfo(j)
            if info is None:
                continue
            total += sum(
                (st.getStageInfo(s).numCompletedTasks if st.getStageInfo(s) else 0)
                for s in info.stageIds
            )
        return total, ids

    df = REGISTRY["pricing_summary"].plan(spark, sf_dir)
    seen = set(st.getJobIdsForGroup())
    a = df.select("*").toPandas()
    full, seen = completed_tasks_since(seen)
    b = df.select("*").toPandas()
    again, seen = completed_tasks_since(seen)
    assert again == full, f"fresh select skipped stages: {again} vs {full} tasks"
    # contrast: re-running the held Dataset reuses its shuffle outputs
    # — the second run completes fewer tasks (map stages skipped)
    df.toPandas()
    _, seen = completed_tasks_since(seen)
    df.toPandas()
    held_again, seen = completed_tasks_since(seen)
    assert held_again < full, f"expected shuffle reuse on held Dataset ({held_again} vs {full})"
    assert a.equals(b)


def test_grouping_sets_single_aggregate_pass(spark, sf_dir):
    """GROUPING SETS expands map-side (Expand) with the customer dim
    broadcast — one shuffle total, same contract as rollup/cube."""
    plan = plan_of(spark, sf_dir, "grouping_sets_segment_priority")
    assert "Expand" in plan
    assert "BroadcastHashJoin" in plan
    exchanges = [
        ln for ln in plan.splitlines() if ln.strip().startswith("Arguments: hashpartitioning")
    ]
    assert len(exchanges) == 1, exchanges


def test_fuzzy_pairs_equi_join_on_block_key(spark, sf_dir):
    """Blocking must run as an equi join on the block key — a regression
    to a nested-loop join over the levenshtein predicate would be
    all-pairs at 100 TB."""
    plan = plan_of(spark, sf_dir, "fuzzy_part_name_pairs")
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "blk" in plan


def test_funnel_pushes_stage_type_filters(spark, sf_dir):
    """Each funnel stage scans only its own event_type: the equality
    filter must reach the parquet scan."""
    plan = plan_of(spark, sf_dir, "purchase_funnel")
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln and "event_type" in ln]
    assert len(pushed) >= 3, f"expected >=3 pushed event_type filters, got {len(pushed)}"


def test_cached_input_fresh_select_reexecutes(spark, sf_dir):
    """Extends the fresh-QueryExecution honesty rule to the warm-path
    input cache (sources/tables.py:cache_base_tables). Input caching
    prepays ONLY parquet decode — a fresh select over the cached copy
    must still run its full task counts (scan of every cached
    partition + shuffle map + reduce), or the bench would be timing
    reduce-only work again. Also pins the plan/parallelism shape:
    the cached mode scans ExistingRDD (no parquet scan) at the
    repartitioned width, and results are identical to parquet mode.
    """
    from utils_infra_spark.sources.tables import (
        cache_base_tables,
        set_input_mode,
        uncache_base_tables,
    )

    st = spark.sparkContext.statusTracker()

    def completed_tasks_since(prev: set[int]) -> tuple[int, set[int]]:
        ids = set(st.getJobIdsForGroup())
        total = 0
        for j in ids - prev:
            info = st.getJobInfo(j)
            if info is None:
                continue
            total += sum(
                (st.getStageInfo(s).numCompletedTasks if st.getStageInfo(s) else 0)
                for s in info.stageIds
            )
        return total, ids

    parquet_res = REGISTRY["pricing_summary"].plan(spark, sf_dir).toPandas()
    # force every table into >1 cached partition so the map-stage
    # parallelism assertion is meaningful even at sf0.001 sizes
    placed = cache_base_tables(spark, sf_dir, partitions=4, bytes_per_split=1)
    assert placed["lineitem"] == 4
    set_input_mode("cached")
    try:
        df = REGISTRY["pricing_summary"].plan(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "ExistingRDD" in plan
        assert "Scan parquet" not in plan
        seen = set(st.getJobIdsForGroup())
        a = df.select("*").toPandas()
        full, seen = completed_tasks_since(seen)
        b = df.select("*").toPandas()
        again, seen = completed_tasks_since(seen)
        # full re-execution per run — identical task counts, and at
        # least the 4 cached lineitem partitions' scan tasks
        assert again == full, f"fresh select over cached input skipped stages: {again} vs {full}"
        assert full >= 4, f"expected >=4 map tasks over the cached partitions, got {full}"
        assert a.equals(b)
        # cached copy answers exactly like the parquet scan
        cols = list(parquet_res.columns)
        assert (
            a.sort_values(cols).reset_index(drop=True).equals(
                parquet_res.sort_values(cols).reset_index(drop=True)
            )
        )
    finally:
        set_input_mode("parquet")
        uncache_base_tables(spark)


def test_cached_input_headline_equivalence(spark, sf_dir):
    """Every headline query the bench times against the block-manager
    input cache must answer EXACTLY as it does over the parquet scan —
    otherwise the timed artifact measures a different computation.
    Doubles as a partitioning-independence pin for the Arrow kernels
    (top-k, bucketed pairs) and the minhash pipeline: the cached
    copies are round-robin repartitioned, so any partition-order
    sensitivity in a kernel or a quantization rule would surface here.
    """
    from bench import HEADLINE
    from utils_infra_spark.sources.tables import (
        cache_base_tables,
        set_input_mode,
        uncache_base_tables,
    )

    parquet_res = {}
    for name in HEADLINE:
        parquet_res[name] = REGISTRY[name].fn(spark, sf_dir).toPandas()
    cache_base_tables(spark, sf_dir, partitions=4, bytes_per_split=1)
    set_input_mode("cached")
    try:
        for name in HEADLINE:
            got = REGISTRY[name].fn(spark, sf_dir).toPandas()
            want = parquet_res[name]
            cols = list(want.columns)
            assert list(got.columns) == cols, name
            got = got.sort_values(cols).reset_index(drop=True)
            want = want.sort_values(cols).reset_index(drop=True)
            assert got.equals(want), f"{name}: cached-input result differs from parquet"
    finally:
        set_input_mode("parquet")
        uncache_base_tables(spark)


def test_input_cache_survives_clear_cache(spark, sf_dir):
    """bench.py calls spark.catalog.clearCache() between runs to drop
    per-query persisted intermediates; the base-table input cache
    lives at the RDD layer (localCheckpoint) precisely so that sweep
    cannot silently evict it mid-bench."""
    from utils_infra_spark.sources.tables import (
        cache_base_tables,
        load_table,
        set_input_mode,
        uncache_base_tables,
    )

    cache_base_tables(spark, sf_dir, partitions=2, bytes_per_split=1)
    set_input_mode("cached")
    try:
        before = load_table(spark, sf_dir, "orders").count()
        spark.catalog.clearCache()
        df = load_table(spark, sf_dir, "orders")
        # still the block-manager copy (not silently rebuilt parquet)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "ExistingRDD" in plan
        assert df.count() == before
    finally:
        set_input_mode("parquet")
        uncache_base_tables(spark)


def test_enrich_customer_nation_literal_map_no_join(spark, sf_dir):
    """The 25x5-row snowflake micro-dims bake into create_map literals
    (operators/joins.py:literal_lookup_maps): the plan must be a pure
    projection over the customer scan — no join operator, no broadcast
    build, no exchange. A regression to a per-execution broadcast
    join is ~0.1 s of pure fixed overhead for a 25-row lookup."""
    plan = plan_of(spark, sf_dir, "enrich_customer_nation")
    assert "Join" not in plan
    assert "Exchange" not in plan
    assert "keys:" in plan or "map(" in plan.lower() or "Project" in plan


def test_order_revenue_semi_filter_and_size_driven_join(spark, sf_dir):
    """order_revenue_top10 expresses its customer join as a broadcast
    LEFT SEMI (c_custkey is the PK and no customer column survives, so
    the join is purely a filter on orders — one whole fact-side wide
    join removed). The one remaining join, li ⋈ orders, has filtered
    BASE TABLES on both sides, so its strategy comes from Catalyst's
    file-size estimates: broadcast at KB scale; with broadcast off the
    fallback must be the spill-safe sort-merge, never a plan that
    materializes an intermediate through the driver."""
    plan = plan_of(spark, sf_dir, "order_revenue_top10")
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(spark, sf_dir, "order_revenue_top10")
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    # tiny-measured session: SAME plan as the default — the r10
    # SHUFFLE_HASH special-case was dropped in r12 after its measured
    # advantage stopped reproducing (re-A/B at sf0.1: mins 0.2405 SHJ
    # vs 0.2394 broadcast, medians favoring broadcast); Catalyst's
    # stats-based choice now rules at every scale
    from utils_infra_spark.session import TINY_INPUT_CONF

    spark.conf.set(TINY_INPUT_CONF, "true")
    try:
        plan = plan_of(spark, sf_dir, "order_revenue_top10")
        assert "ShuffledHashJoin" not in plan
        assert "BroadcastHashJoin" in plan
        assert "LeftSemi" in plan
    finally:
        spark.conf.set(TINY_INPUT_CONF, "false")


def test_nation_revenue_micro_dims_are_literal_maps(spark, sf_dir):
    """nation_revenue folds the 25x5-row nation⋈region snowflake into
    create_map literals: at most TWO join operators may remain in the
    plan (li⋈orders, ⋈customer) — a regression to broadcast-joining
    the micro-dims re-adds two per-execution BroadcastExchange builds
    (each its own job, ~40-60 ms of scheduling for a 25-row build)."""
    plan = plan_of(spark, sf_dir, "nation_revenue")
    import re

    # formatted explain shows each operator twice (tree + numbered
    # detail); count the numbered detail headers only
    joins = re.findall(r"\(\d+\) (?:\w*HashJoin|SortMergeJoin)", plan)
    assert len(joins) <= 2, joins


def test_literal_lookup_maps_empty_dim_falls_back(spark):
    """A 0-row (or all-NULL-key) dim must return None — an
    argument-less create_map() types as map<void,void> and any probe
    against it fails analysis; the join path returns the correct
    empty/all-NULL result instead."""
    from utils_infra_spark.operators.joins import literal_lookup_maps

    empty = spark.createDataFrame([], "k bigint, v string")
    assert literal_lookup_maps(empty, "k", ["v"]) is None
    all_null = spark.createDataFrame([(None, "x")], "k bigint, v string")
    assert literal_lookup_maps(all_null, "k", ["v"]) is None


def test_literal_map_inner_semantics_keep_null_values(spark):
    """Key-membership (not value nullness) reproduces inner-join
    drops: a dim row with matching keys but a NULL value must survive
    and group under NULL, exactly as the broadcast join has it."""
    from pyspark.sql import functions as F

    from utils_infra_spark.operators.joins import literal_lookup_maps

    dim = spark.createDataFrame([(1, None), (2, "b")], "k bigint, name string")
    fact = spark.createDataFrame([(1,), (2,), (3,)], "k bigint")
    maps = literal_lookup_maps(dim, "k", ["name"])
    in_dim = F.array_contains(F.map_keys(maps["name"]), F.col("k"))
    got = sorted(
        (r.k, r.name)
        for r in fact.where(in_dim).select("k", maps["name"][F.col("k")].alias("name")).collect()
    )
    want = sorted(
        (r.k, r.name)
        for r in fact.join(F.broadcast(dim), "k").select("k", "name").collect()
    )
    assert got == want == [(1, None), (2, "b")]


def test_plan_cache_keys_on_tiny_input_measurement(spark, sf_dir):
    """Builders bake size-gated physical hints into the plan, so the
    prepared-plan cache must rebuild when the tune_for_input
    measurement changes — not re-serve the stale strategy."""
    from utils_infra_spark.session import TINY_INPUT_CONF

    # exemplar: embedding_topk_cosine's size-gated top-k finish (the
    # untuned/at-scale plan pre-top-ks per (partition, query) — its
    # marker is the spark_partition_id grouping key; the tiny plan
    # skips that whole stage). order_revenue_top10 was the previous
    # exemplar until its SHJ special-case was dropped in r12.
    q = REGISTRY["embedding_topk_cosine"]
    spark.conf.set(TINY_INPUT_CONF, "false")
    try:
        untuned = q.plan(spark, sf_dir)
        spark.conf.set(TINY_INPUT_CONF, "true")
        tuned = q.plan(spark, sf_dir)
        assert tuned is not untuned
        assert "SPARK_PARTITION_ID" in plan_of_df(spark, untuned).upper()
        assert "SPARK_PARTITION_ID" not in plan_of_df(spark, tuned).upper()
        # same measurement -> same prepared object
        assert q.plan(spark, sf_dir) is tuned
    finally:
        spark.conf.set(TINY_INPUT_CONF, "false")


def test_uncache_frees_block_manager_copies(spark, sf_dir):
    """uncache_base_tables must free the actual checkpoint blocks:
    the persistent-RDD set returns to its baseline (df.rdd.unpersist
    on a derived RDD was a silent no-op)."""
    from utils_infra_spark.sources.tables import (
        _persistent_rdd_ids,
        cache_base_tables,
        set_input_mode,
        uncache_base_tables,
    )

    base = _persistent_rdd_ids(spark)
    cache_base_tables(spark, sf_dir, partitions=2, bytes_per_split=1)
    set_input_mode("parquet")
    after = _persistent_rdd_ids(spark)
    assert after - base, "cache_base_tables left nothing persisted"
    uncache_base_tables(spark)
    assert _persistent_rdd_ids(spark) - base == set()


def test_md5_band_keys_twin_shuffles_sketches_not_text(spark, sf_dir):
    """The md5 LSH twin must keep the production sketch plan shape:
    map-side-combined MIN partials, a doc_id exchange that carries the
    sketch signature (never the document text or shingles), and no
    joins anywhere in candidate generation."""
    from utils_infra_spark.pipeline.dedup import minhash_band_keys
    from utils_infra_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    df = minhash_band_keys(docs, "text", "doc_id", hash_family="md5")
    plan = plan_of_df(spark, df)
    # min(string) buffers aren't hash-mappable, so Spark plans
    # SortAggregate here (the xxhash64 production path gets
    # HashAggregate over longs); either way a partial/final pair must
    # straddle the exchange — map-side combine is the point
    assert plan.count("SortAggregate") + plan.count("HashAggregate") >= 2
    exchange_lines = [
        ln for ln in plan.splitlines() if ln.strip().startswith("Arguments: hashpartitioning")
    ]
    assert exchange_lines and all("doc_id" in ln for ln in exchange_lines), exchange_lines
    assert not any("text" in ln or "shingle" in ln for ln in exchange_lines), exchange_lines
    assert "Join" not in plan


def test_md5_simhash_twin_groups_votes_map_side(spark, sf_dir):
    """The md5 simhash twin keeps the staged-votes shape: exploded
    nibble projection, 16 codegen'd SUM votes combined map-side, one
    doc_id shuffle of partial votes."""
    from utils_infra_spark.pipeline.dedup import simhash16_md5
    from utils_infra_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    df = simhash16_md5(docs, "text", "doc_id")
    plan = plan_of_df(spark, df)
    assert "HashAggregate" in plan
    exchange_lines = [
        ln for ln in plan.splitlines() if ln.strip().startswith("Arguments: hashpartitioning")
    ]
    assert exchange_lines and all("doc_id" in ln for ln in exchange_lines), exchange_lines
    assert not any("text" in ln or "tok" in ln for ln in exchange_lines), exchange_lines


def test_line_dedup_aggregates_not_window(spark, sf_dir):
    """Corpus line dedup must be hash AGGREGATES, never a window over
    the line key: min(struct(doc_id, line_no)) partial-combines a
    10^7-occurrence boilerplate line map-side, where row_number()
    would sort every occurrence on one reducer (the hot-key mode).
    Three hash exchanges (winner agg, reassembly, per-doc totals) and
    the dropped-count join — no Window, no sort of the line rows, no
    cartesian."""
    from utils_infra_spark.pipeline.dedup import line_dedup_corpus
    from utils_infra_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = line_dedup_corpus(docs, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan[:2000]
    assert plan.count("Exchange hashpartitioning") <= 4, plan[:2000]
    assert "partial_min" in plan or "partial min" in plan.lower(), plan[:2000]
    assert "CartesianProduct" not in plan
    # struct-min compiles to SortAggregate (per-task LOCAL sorts —
    # fine); what must never appear is a sort keyed on `line` that is
    # NOT immediately under an aggregate, i.e. a window-style global
    # ordering of the line rows. Pin: every Sort over `line` in the
    # plan belongs to a SortAggregate pair.
    import re as _re
    sorts_on_line = _re.findall(r"Sort \[line", plan)
    assert len(sorts_on_line) <= 2, plan[:2000]  # map-side + reduce-side agg sorts only


def test_char_lm_scoring_joins_broadcast(spark, sf_dir):
    """The model — bounded by charset^3 regardless of corpus size —
    must reach the scoring join as a single broadcast local relation
    (collected + quantized driver-side): nothing about scoring may
    shuffle or re-aggregate the corpus-side trigrams for a join.
    (A zero-shuffle in-row variant via `aggregate` HOF was measured
    2.5x slower — HOF lambdas run interpreted — so the codegen'd
    explode+join shape is the pinned one.)"""
    from utils_infra_spark.pipeline.text import char_trigram_lm_scores
    from utils_infra_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = (
        char_trigram_lm_scores(docs, "text", "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastExchange") == 1, plan[:1500]
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    # the model reached the plan as a COLLECTED local relation...
    assert "LocalTableScan" in plan, plan[:1500]
    # ...so scoring must never re-run the fit: no aggregate keyed on
    # the trigram anywhere in the score plan (the per-doc reduction
    # keys on doc_id only). String-level but materialization-proof —
    # it holds whether tris prints as a live explode or as the
    # persisted InMemoryRelation.
    assert "keys=[tri" not in plan, plan[:1500]


def test_uncacheable_plan_rebuilds_per_call(spark, sf_dir):
    """char_lm's builder EXECUTES the model fit at build time, so its
    plan must never be re-served from the cache — otherwise a timing
    loop over plan() silently stops paying the fit after run 1 (the
    result-cache-in-disguise failure mode the bench methodology
    forbids). Cached queries keep returning the same object."""
    from utils_infra_spark.queries import REGISTRY, _load

    _load()
    q = REGISTRY["char_lm_quality_documents"]
    assert q.cache_plan is False
    assert q.plan(spark, sf_dir) is not q.plan(spark, sf_dir)
    qc = REGISTRY["pricing_summary"]
    assert qc.plan(spark, sf_dir) is qc.plan(spark, sf_dir)


def test_dup_span_coverage_shuffles_hashes_not_text(spark, sf_dir):
    """Window hashing happens in-row; every exchange downstream
    carries hashes or (doc_id, idx) pairs. No Window operator, no
    cartesian, and the dup-set reduction is a partial-combined hash
    aggregate."""
    from utils_infra_spark.pipeline.dedup import dup_span_coverage
    from utils_infra_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = (
        dup_span_coverage(docs, "text", "doc_id", window=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan, plan[:1500]
    assert "partial_count" in plan or "partial count" in plan.lower(), plan[:1500]
    # the claimed invariant, actually pinned: no exchange carries the
    # token array or raw text — hashes, positions, ids only
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "toks" not in ln and "text" not in ln, ln


def test_bench_stdout_line_fits_driver_capture():
    """The driver json-parses the LAST 2000 bytes of bench.py's
    output; r4-r6 all shipped `parsed: null` because the line carried
    per-query dicts and methodology prose past that window. Pin the
    contract: a representative full-payload compact line (current
    headline set, worst-case-width values) parses, keeps the driver's
    required keys, and stays under the capture budget."""
    import json

    from bench import HEADLINE, _LINE_BUDGET, compact_line

    payload = {
        "metric": "headline_queries_total_runtime_warm",
        "value": 123.456,
        "unit": "sec",
        "queries": {name: 123.4567 for name in HEADLINE},
        "cold_queries": {name: 123.4567 for name in HEADLINE},  # must be dropped
        "duck_queries": {name: 123.4567 for name in HEADLINE},  # must be dropped
        "sf": 0.1,
        "cold_total": 123.456,
        "spark_oracle_subset_total": 123.456,
        "duck_total": 123.456,
        "ratio_warm": 12.34,
        "spark_full_total": 123.456,
        "duck_full_total": 123.456,
        "ratio_warm_full": 12.34,
        "floor_sec": 0.1234,
        "loadavg_1m": [12.34, 12.34],
        "load_signal": [12.34, 12.34],
        "floor_probe": [0.1234, 0.1234],
        "probe_mean": 0.1234,
        "probe_frac_suspect": 0.123,
        "mid_probes": [0.1234] * 42,  # must be dropped (42 floats)
        "banked_candidates": 12,
        "banked_live": False,
        "banked_best_value": 123.456,
        "banked_best_ratio": 12.34,
        "cold_stormy": True,
        "cold_from_attempt": 1,
        "cold_loadavg_1m": [12.34, 12.34],
        "attempts": 3,
        "attempt_summaries": [{"x": 1}] * 3,  # must be dropped
        "methodology": "x" * 1200,  # must be dropped
        "input_bytes": 17504410,
        "input_cached": True,
        "input_cache_build_sec": 12.345,
        "input_cache_partitions": {name: 20 for name in HEADLINE},  # must be dropped
        "tuned_confs": {"spark.sql.shuffle.partitions": "8", "spark.sql.adaptive.enabled": "false"},
        "ratio_spread": {"min": 12.34, "median": 12.34, "max": 12.34, "n": 12},
        "detail": "BENCH_result.json",
    }
    line = compact_line(payload)
    assert len(line) <= _LINE_BUDGET, len(line)
    parsed = json.loads(line)
    for k in ("metric", "value", "unit", "queries", "sf", "ratio_warm", "ratio_warm_full"):
        assert k in parsed, k
    for k in ("cold_queries", "duck_queries", "attempt_summaries", "methodology",
              "input_cache_partitions", "mid_probes"):
        assert k not in parsed, k


def test_bench_candidate_selection_is_outcome_blind():
    """Cross-invocation banking must pick the weather-cleanest
    candidate — storm-free first, then lowest MID-SWEEP probe mean,
    then lowest pre-attempt load, then lowest worst edge probe,
    earliest on ties — and must NEVER read a ratio: the best-looking
    number on a stormy window loses to a worse-looking number on a
    clean one."""
    from bench import candidate_weather_key

    def cand(ts, load_pre, post_1m, probes, ratio, pmean=0.03, pfrac=0.0):
        return {
            "ts": ts,
            "payload": {
                "load_signal": [load_pre, 9.9],
                "loadavg_1m": [load_pre, post_1m],
                "floor_probe": probes,
                "probe_mean": pmean,
                "probe_frac_suspect": pfrac,
                "ratio_warm_full": ratio,
            },
        }

    stormy_fast = cand(1.0, 0.3, 8.2, [0.03, 0.03], 1.2)   # storm: post-1m
    probed_fast = cand(2.0, 0.3, 2.0, [0.03, 0.19], 1.3)   # storm: edge probe
    midstorm_fast = cand(2.5, 0.2, 2.0, [0.03, 0.03], 1.1, pmean=0.08, pfrac=0.5)  # storm: mid-sweep
    clean_slow = cand(3.0, 0.9, 3.1, [0.034, 0.04], 2.4, pmean=0.031)
    cleaner_slow = cand(4.0, 0.5, 3.1, [0.05, 0.04], 2.6, pmean=0.028)
    pool = [stormy_fast, probed_fast, midstorm_fast, clean_slow, cleaner_slow]
    # lowest probe_mean wins among the storm-free, whatever the ratio
    assert min(pool, key=candidate_weather_key) is cleaner_slow
    # probe-mean ties break by pre-load, then earliest ts
    a = cand(5.0, 0.5, 3.0, [0.03, 0.03], 9.9, pmean=0.025)
    b = cand(6.0, 0.5, 3.0, [0.03, 0.03], 0.1, pmean=0.025)
    assert min([b, a, cleaner_slow], key=candidate_weather_key) is a
    # a mid-sweep-suspect candidate loses to a clean one even with a
    # better mean on every other axis
    assert min([midstorm_fast, clean_slow], key=candidate_weather_key) is clean_slow
    # a candidate missing floor_probe (pre-r12 artifact) ranks stormy
    legacy = cand(0.5, 0.1, 1.0, None, 0.5)
    del legacy["payload"]["floor_probe"]
    assert min([legacy, clean_slow], key=candidate_weather_key) is clean_slow
    # a candidate missing probe_mean (early-r12 artifact) ranks after
    # any candidate that has one
    early = cand(0.7, 0.1, 1.0, [0.03, 0.03], 0.5)
    del early["payload"]["probe_mean"]
    assert min([early, clean_slow], key=candidate_weather_key) is clean_slow
    # r13 (advice): a parseable-but-malformed banked line — payload
    # missing load fields entirely, or no payload at all — must rank
    # LAST instead of raising KeyError at emit time
    malformed = {"ts": 0.1, "payload": {"ratio_warm_full": 0.5}}
    assert min([malformed, clean_slow], key=candidate_weather_key) is clean_slow
    no_payload = {"ts": 0.1}
    assert min([no_payload, clean_slow], key=candidate_weather_key) is clean_slow


def test_char_lm_rebuild_never_reuses_previous_cache(spark, sf_dir):
    """char_lm persists its trigram stream so fit+score share one
    explode WITHIN a build. Across builds the pin must hold: each
    rebuild unpersists the predecessor (Spark's CacheManager matches
    by logical-plan equality, so a stale entry would silently serve
    the old run's explode — cross-run amortization the cache_plan=False
    honesty pin forbids). Observable contract: persistent-RDD count
    grows by at most ONE cached tris no matter how many times the
    builder runs."""
    from utils_infra_spark.pipeline.text import char_trigram_lm_scores
    from utils_infra_spark.sources import load_table
    from utils_infra_spark.sources.tables import _persistent_rdd_ids

    spark.catalog.clearCache()
    base = len(_persistent_rdd_ids(spark))
    docs = load_table(spark, sf_dir, "documents")
    for _ in range(3):
        char_trigram_lm_scores(docs, "text", "doc_id").collect()
    assert len(_persistent_rdd_ids(spark)) <= base + 1
    spark.catalog.clearCache()


def test_pretrain_pipeline_fused_gates_shape(spark, sf_dir):
    """The capstone's three in-row gates (C4 / Gopher quality /
    encoding screen) are fused into ONE projection riding the dup
    digest's scan — the r7 shape materialized each gate as its own
    branch and equi-joined back on doc_id (9 documents scans, 8 joins,
    13 exchanges); fused it is 5 scans (2 outside the repetition
    branch), 4 joins, 9 exchanges. At 100 TB the delta is 4 corpus
    scans and 3 corpus-wide shuffle joins. Sf0.1 timing: ~1.29 s →
    ~1.06 s warm (the structural win is what matters at 100x)."""
    import re

    plan = plan_of(spark, sf_dir, "pretrain_pipeline_documents")
    # formatted mode prints each scan twice (tree row + detail block);
    # count the numbered detail headers only
    scans = len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))
    assert scans <= 5, f"documents scanned {scans}x — gate fusion regressed"
    joins = len(
        re.findall(
            r"^\(\d+\) (?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan, re.M
        )
    )
    assert joins <= 4, f"{joins} joins — the in-row gates grew join-backs again"
    # skew guard: the dup flag must stay an aggregate + join-back,
    # never a window partitioned by the text digest (unbounded
    # partitions when one document repeats corpus-wide)
    win = [ln for ln in plan.splitlines() if "Window" in ln and "__dig" in ln]
    assert not win, f"window over digest: {win}"


def test_embedding_topk_cosine_is_all_jvm(spark, sf_dir):
    """r10 rewrite: the bench headliner's warm cost was two Python
    Arrow crossings; the codegen path must keep the whole plan JVM-side
    — no Python eval nodes, no window over a per-query hot key, and
    the dot-product aggregate keyed on the candidate id (map-side
    partial combine collapses 64 exploded rows to one per candidate
    before the exchange)."""
    from utils_infra_spark.queries import REGISTRY, _load

    _load()
    plan = (
        REGISTRY["embedding_topk_cosine"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("ArrowEval", "MapInArrow", "BatchEval", "PythonUDF", "MapInPandas", "Window"):
        assert bad not in plan, f"{bad} in plan:\n{plan[:2000]}"
    assert "Generate explode" in plan or "Generate posexplode" in plan, plan[:1500]
    assert plan.count("Exchange") <= 3, plan[:2000]


def test_rrf_top20_is_take_ordered(spark, sf_dir):
    """The fused top-20 must be a TakeOrderedAndProject (bounded
    per-partition heaps), never a global Sort over the ranked corpus."""
    plan = plan_of(spark, sf_dir, "rrf_orders_value_recency")
    assert "TakeOrderedAndProject" in plan
    # the only Sorts allowed are the local window sorts (partitioned by
    # __bin) — no global Exchange rangepartitioning for the final order
    assert "rangepartitioning(rrf_score" not in plan


def test_frequent_item_pairs_joins_on_order_not_item(spark, sf_dir):
    """The basket self-join must key on the order id (work bounded by
    basket size squared) — keying on the item would funnel hot items;
    and the A-priori prune must stay a semi-join below it."""
    import re

    plan = (
        REGISTRY["frequent_item_pairs"].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    sj = [ln for ln in plan.splitlines() if re.search(r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin", ln)]
    inner = [ln for ln in sj if "LeftSemi" not in ln]
    assert inner, "no basket self-join found"
    assert any("l_orderkey" in ln for ln in inner), inner
    assert any("LeftSemi" in ln for ln in sj), "A-priori semi-join prune missing"


def test_entity_resolution_no_nested_loop(spark, sf_dir):
    """Blocking must keep the pair generation an equi-join: no
    BroadcastNestedLoopJoin (the all-pairs fallback) anywhere in the
    capstone plan."""
    plan = plan_of(spark, sf_dir, "entity_resolution_parts")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_equi_depth_no_unpartitioned_window_over_data(spark, sf_dir):
    """The per-group rank must ride (flag, bin)-partitioned windows;
    the only unpartitioned window sits over the aggregated bin table."""
    import re

    plan = REGISTRY["equi_depth_price_histogram"].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    for m in re.finditer(r"Window \[[^\]]*row_number[^\]]*\], \[([^\]]*)\]", plan):
        assert "__bin" in m.group(0), f"row_number window without bin partition:\n{m.group(0)}"
