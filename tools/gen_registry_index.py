"""Emit REGISTRY.json — a self-describing index of the named-query
registry so coverage accounting (the SURVEY §2 operator table, the
driver's first-50 sampling window, the proven/unproven split) is
machine-checkable instead of hand-maintained.

Per query: sampling position, defining module, oracle-backed flag,
SURVEY §2 operator ids it evidences (OPERATOR_IDS map below), the
rounds whose driver CORRECTNESS snapshot proved it (hash-green, or
ran-with-rows for rows-only queries), and the first doc line.

Run from the repo root:  python tools/gen_registry_index.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# query name -> SURVEY.md §2 operator ids (+ pipeline-op tags) it
# evidences. Kept here — next to the artifact generator — rather than
# in the decorators so the frozen registry modules stay untouched;
# names absent from this map get ops: [] (evidence still counted via
# module + oracle flags).
OPERATOR_IDS: dict[str, list[str]] = {
    "embedded_json_extract": ["S6", "geo"],
    "segment_rollup": ["S11", "A7"],
    "geojson_features_emit": ["K5"],
    "template_render": ["K6"],
    "range_filter_events": ["F1"],
    "prefix_set_filter_orders": ["F2"],
    "coordinate_validity": ["F3"],
    "not_future_orders": ["F5"],
    "param_filter_documents": ["F6"],
    "fresh_events": ["F7", "A10"],
    "quality_filter_documents": ["F8"],
    "nested_struct_features": ["F9"],
    "prefix_filter_part": ["F10"],
    "category_include_events": ["F11"],
    "dsl_filter_events": ["F12"],
    "dsl_contains_in_docs": ["F12"],
    "dsl_negation_null_semantics": ["F12", "F14"],
    "style_rules_orders": ["F13", "W4"],
    "wire_projection_customer": ["F15"],
    "enrich_coalesce_fill": ["J1"],
    "latest_event_per_user": ["J2", "W1"],
    "enrich_customer_nation": ["J4"],
    "point_in_polygon_regions": ["J5"],
    "region_outage_join": ["J6"],
    "orders_semi_building": ["J7"],
    "customers_without_orders": ["J8"],
    "derived_key_self_join": ["J9"],
    "user_rollup_events": ["J10"],
    "salted_user_rollup": ["J10", "skew"],
    "salted_join_segment_revenue": ["skew"],
    "grouped_sum_orders": ["A1"],
    "affected_ratio_by_nation": ["A2"],
    "promo_revenue_ratio": ["A2"],
    "composite_agg_orders": ["A3"],
    "pricing_summary": ["A3", "A8"],
    "event_value_pivot": ["A4"],
    "distinct_users_by_type": ["A5"],
    "order_count_distribution": ["A5"],
    "value_counts_brand": ["A6"],
    "recent_activity_24h": ["A9"],
    "events_in_user_window": ["A9"],
    "last_nonnull_state_events": ["W1"],
    "top3_orders_per_customer": ["W2"],
    "sliding_window_counts": ["W3"],
    "rolling_1h_user_value": ["W3"],
    "running_customer_revenue": ["W3"],
    "event_interarrival": ["W3"],
    "sessionize_events": ["W3"],
    "union_distinct_orders": ["O4"],
    "urgent_fulfilled_setops": ["O6"],
    "string_funcs_part": ["scalar-strings"],
    "date_funcs_orders": ["scalar-datetime"],
    "math_funcs_lineitem": ["scalar-math"],
    "array_funcs_documents": ["scalar-array"],
    "json_props_events": ["scalar-json"],
    "mercator_tile_cover": ["geo"],
    "haversine_nearest": ["geo"],
    "nztm_projection": ["geo"],
    "zorder_customer_grid": ["geo"],
    "tile_pipeline_stats": ["R1", "R4"],
    "terrain_reproject_pipeline": ["R2", "R3"],
    "image_phash_near_dups": ["multimodal-image"],
    "audio_features_pipeline": ["multimodal-audio"],
    "dedup_exact_documents": ["dedup-exact"],
    "minhash_near_dup_documents": ["dedup-minhash-lsh"],
    "minhash_band_keys_md5": ["dedup-minhash-lsh"],
    "simhash_documents": ["dedup-simhash"],
    "simhash_documents_md5": ["dedup-simhash"],
    "ngram_jaccard_bucketed": ["dedup-ngram-jaccard"],
    "jaccard_prefix_pairs": ["dedup-allpairs-ppjoin"],
    "near_dup_clusters": ["dedup-clustering"],
    "embedding_topk_cosine": ["ann-brute-force"],
    "embedding_bucketed_pairs": ["ann-ivf-bucketed"],
    "ivf_assign_lists": ["ann-ivf"],
    "ivf_topk_probes": ["ann-ivf"],
    "fuzzy_part_name_pairs": ["fuzzy-blocking"],
    "token_counts_cms": ["sketch-cms"],
    "bm25_search": ["text-bm25"],
    "top_terms_tfidf": ["text-tfidf"],
    "inverted_index_postings": ["text-inverted-index"],
    "benchmark_contamination": ["contamination"],
    "text_stats_documents": ["text-stats"],
    "token_histogram": ["text-tokens"],
    "lang_distribution": ["text-lang"],
    "doc_fingerprints": ["text-fingerprint"],
    "pii_redact_documents": ["text-pii"],
    "purchase_funnel": ["analytics-funnel"],
    "event_transitions": ["analytics-transitions"],
    "weekly_retention": ["analytics-retention"],
    "snapshot_diff_documents": ["dataset-diff"],
    "train_val_test_split": ["sampling-split"],
    "deterministic_sample_docs": ["sampling-deterministic"],
    "stratified_sample_by_lang": ["sampling-stratified"],
    "weighted_sample_docs": ["sampling-weighted"],
    "mixture_resample_documents": ["sampling-mixture"],
    "asof_click_purchase": ["temporal-asof"],
    "boilerplate_gram_ratio": ["text-boilerplate"],
    "column_profile_events": ["profiling"],
    "top_customers_by_balance": ["O1", "W2"],
    "daily_event_counts": ["A1", "scalar-datetime"],
    "distinct_segments": ["O6"],
    "doc_token_chunks": ["chunking"],
    "embedding_int8_quantize": ["ann-quantize"],
    "pack_documents_shards": ["packing"],
    "order_revenue_top10": ["W2", "J7"],
    "nation_revenue": ["J4", "A1"],
    "forecast_revenue_filter": ["F5", "A2"],
    "priority_order_check": ["F4"],
    "status_bucket_counts": ["A5", "F4"],
    "brand_revenue_share": ["A2", "A6"],
    "nation_pair_volume": ["J9", "A3"],
    "product_profit_by_nation": ["J4", "A3"],
    "returned_items_customers": ["J7", "F11"],
    "user_sessions": ["W3", "analytics-sessions"],
    "rate_limit_violations": ["W3", "F7"],
    "sitrep_summarize": ["udf-summarize"],
    "zscore_by_segment": ["analytics-zscore"],
    "approx_distinct_users": ["sketch-hll"],
    "large_orders": ["F6", "A1"],
    "high_balance_inactive": ["J8", "F6"],
    "corr_price_quantity": ["agg-corr"],
    "bitmap_distinct_rollup": ["sketch-bitmap"],
    "small_quantity_part_revenue": ["J4", "A2"],
    "top_supplier_by_revenue": ["W2", "J4"],
    "sole_late_supplier_orders": ["J9", "F4"],
    "event_value_histogram": ["analytics-histogram"],
    "quality_decile_stats": ["text-quality", "analytics-decile"],
    "label_centroids": ["ann-ivf"],
    "embedding_lsh_ann": ["ann-lsh"],
    "category_counts_events": ["A5", "F11"],
    "rollup_segment_priority": ["agg-rollup"],
    "cube_event_type_hour": ["agg-cube"],
    "grouping_sets_segment_priority": ["agg-grouping-sets"],
    "percentile_quantities": ["agg-percentile"],
}


def proven_rounds() -> dict[str, list[int]]:
    out: dict[str, list[int]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            snap = json.load(f)
        for name, res in snap.items():
            ok = bool(res.get("hash_match")) or (
                res.get("err") == "no_oracle" and res.get("spark_rows") is not None
            )
            if ok:
                out.setdefault(name, []).append(rnd)
    return out


def print_next_priority() -> None:
    """Print the recommended next-round _SAMPLING_PRIORITY literal:
    every still-unproven oracle-backed name (current relative order)
    first, then unproven rows-only names — paste into
    queries/__init__.py after each round's CORRECTNESS snapshot
    lands, so the driver's first-50 window always holds fresh names."""
    from utils_infra_spark.queries import REGISTRY, _load

    _load()
    proven = proven_rounds()
    unproven = [n for n in REGISTRY if n not in proven]
    oracle_first = [n for n in unproven if REGISTRY[n].oracle is not None] + [
        n for n in unproven if REGISTRY[n].oracle is None
    ]
    print("_SAMPLING_PRIORITY = [")
    for n in oracle_first:
        tag = "" if REGISTRY[n].oracle is not None else "  # rows-only"
        print(f'    "{n}",{tag}')
    print("]")
    print(f"# {len(oracle_first)} unproven ({sum(1 for n in oracle_first if REGISTRY[n].oracle)} oracle-backed)")


def main() -> None:
    from utils_infra_spark.queries import DRIVER_SAMPLE_WINDOW, REGISTRY, _load

    _load()
    proven = proven_rounds()
    index = {}
    for pos, (name, q) in enumerate(REGISTRY.items()):
        index[name] = {
            "position": pos,
            "in_driver_sample_window": pos < DRIVER_SAMPLE_WINDOW,
            "module": q.fn.__module__.rsplit(".", 1)[-1],
            "oracle_backed": q.oracle is not None,
            "ops": OPERATOR_IDS.get(name, []),
            "proven_rounds": proven.get(name, []),
            "doc": (q.doc or "").strip().splitlines()[0] if (q.doc or "").strip() else "",
        }
    payload = {
        "total": len(index),
        "oracle_backed": sum(1 for v in index.values() if v["oracle_backed"]),
        "rows_only": sum(1 for v in index.values() if not v["oracle_backed"]),
        "driver_proven_unique": sum(1 for v in index.values() if v["proven_rounds"]),
        "never_proven": sorted(n for n, v in index.items() if not v["proven_rounds"]),
        "queries": index,
    }
    out_path = os.path.join(REPO, "REGISTRY.json")
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=False)
        f.write("\n")
    print(
        f"wrote {out_path}: {payload['total']} queries, "
        f"{payload['oracle_backed']} oracle-backed, "
        f"{payload['driver_proven_unique']} driver-proven, "
        f"{len(payload['never_proven'])} never proven"
    )


if __name__ == "__main__":
    if "--priority" in sys.argv:
        print_next_priority()
    else:
        main()
