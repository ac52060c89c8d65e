"""Decode bench.py's compact FINAL line back to {query: seconds}.

The driver captures only the last 2000 chars of bench output; once the
registry outgrew what a JSON dict of per-query times could carry in
that budget (round 11: 29 entries silently dropped), bench.py switched
the overflow stage to a PACKED STRING (r11 VERDICT ask #2):

    {"metric":"wall", ..., "qunit":"ds", "qfmt":"pack",
     "n_omitted":0, "queries":"<alias>:<ds> <alias>:<ds> ...", ...}

at ~7 chars/entry every registry query fits with ~35 entries of
headroom. This script inverts it — and the plain dict forms — using
bench.BENCH_KEY_ALIASES / REF_BENCH_KEYS.

Usage:
    python scripts/decode_bench_line.py BENCH_r12.json      # driver artifact
    python scripts/decode_bench_line.py '<raw json line>'   # pasted line
Prints one "name seconds" row per query, slowest first, then the wall.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_KEY_ALIASES  # noqa: E402

# invert to the names the verbose line / timings dict uses (the five
# Athena-path queries decode to their ref_* keys, same as verbose)
_ALIAS_TO_NAME = {v: k for k, v in BENCH_KEY_ALIASES.items()}

#: round-12's packed final line (BENCH_r12.json) used a since-reverted
#: wholesale 2-char alias regeneration; its alias->name map is embedded
#: verbatim so that artifact stays decodable after the r13 map freeze.
_R12_PACK_ALIAS_TO_NAME = {
    "a0": "streaming_value_quantiles", "a1": "streaming_asof_rates", "a2": "emb_pq_distortion",
    "a3": "docs_split_balance", "a4": "events_session_profile", "a5": "retrieval_margin_profile",
    "aa": "ann_topk_ivfpq_trained", "ab": "ann_topk_lsh_multi", "ac": "ann_centroid_drift",
    "ad": "ann_label_audit_clustered", "ae": "events_value_hour_corr", "af": "ann_filtered_recall_audit",
    "ag": "events_value_outliers_mad", "ah": "ann_topk_lsh", "ai": "ann_index_health",
    "aj": "events_variant_props", "ak": "streaming_payment_match", "al": "ann_label_audit",
    "am": "streaming_payment_match_full", "an": "ann_topk_ivfpq_filtered", "ao": "streaming_payment_match_outer",
    "ap": "ann_topk_pq", "aq": "ann_topk_ivfpq", "ar": "ann_recall_audit",
    "as": "asof_priority_rates", "at": "ann_topk_brute", "au": "streaming_quality_gate",
    "av": "streaming_running_totals_final", "aw": "streaming_session_windows", "ax": "streaming_sliding_1h_15m",
    "ay": "streaming_topk_users", "az": "streaming_user_anomalies", "bb": "brand_basket_affinity",
    "be": "events_benford_audit", "bl": "sketch_bloom_fpr", "bo": "streaming_boilerplate_gate",
    "bs": "bucketed_sales_join", "cb": "corpus_mixture_bpe", "cc": "corpus_content_hashes",
    "cd": "corpus_delete_apply", "ce": "corpus_funnel_by_source", "cf": "cdc_snapshot_diff",
    "cg": "customers_k_generalize", "ck": "customers_k_anonymity", "cl": "customers_l_diversity",
    "cm": "corpus_mixture_actuals", "cn": "corpus_curriculum_plan", "co": "dedup_components",
    "cp": "corpus_mixture_plan", "cr": "customer_retention", "cs": "cdc_scd2_history",
    "ct": "corpus_funnel_report", "cu": "customers_t_closeness", "cw": "customers_with_urgent_orders",
    "d0": "docs_split_leakage_audit", "d1": "docs_split_leakage_safe", "da": "dedup_components_delta",
    "db": "dedup_band_load_octaves", "dc": "dedup_canonical_docs", "dd": "dedup_decontaminate",
    "de": "dedup_decontaminate_semantic", "df": "dedup_remove_substrings", "dg": "dedup_exact_substring",
    "dh": "dedup_minhash_lsh", "di": "dedup_incremental_delta", "dj": "dedup_ngram_jaccard",
    "dk": "dedup_simhash_fingerprints", "dl": "dedup_boilerplate_lines", "dm": "dedup_cluster_size_histogram",
    "dn": "dedup_contamination", "do": "docs_chunk_overlap", "dp": "dedup_simhash_pairs",
    "dq": "docs_expectations", "dr": "dedup_components_star", "ds": "dedup_benchmark_canaries",
    "dt": "dedup_chunks_exact", "du": "docs_pack_manifest", "dv": "dedup_source_vocab_overlap",
    "dw": "docs_sample_fixed_per_lang", "dx": "dedup_source_matrix", "dy": "dedup_lsh_quality",
    "dz": "docs_sample_weighted_k", "e0": "events_hll_users_daily", "e1": "events_lateness_profile",
    "e2": "events_seasonal_backtest", "e3": "events_sessionization", "e4": "events_transition_matrix",
    "e5": "events_trimmed_mean", "e6": "events_type_value_quantiles", "e7": "events_user_cusum",
    "e8": "events_user_gini", "e9": "events_user_skew", "ea": "emb_anisotropy_audit",
    "eb": "emb_bitext_mine", "ec": "emb_semantic_contamination", "ed": "emb_distance_octaves",
    "ee": "er_entity_ids", "ef": "events_attribution", "eg": "events_attribution_positional",
    "eh": "emb_hard_negatives", "ei": "emb_near_dup_lsh_multi", "ej": "events_concurrency_curve",
    "ek": "emb_kmeans_step", "el": "er_link_dirty_names", "em": "events_cusum_changepoint",
    "en": "dedup_ensemble", "eo": "events_daily_stats", "ep": "emb_pca_power",
    "eq": "events_daily_trend", "er": "events_cohort_retention", "es": "emb_pq_codes",
    "et": "etl_derive_tables", "eu": "events_active_users", "ev": "events_anomaly_days",
    "ew": "events_drift_tvd", "ex": "dedup_exact_recrawl", "ey": "events_cms_users_daily",
    "ez": "events_ewma_daily", "fc": "fuzzy_customer_names", "fi": "text_fingerprint",
    "fk": "streaming_fk_gate", "fr": "mm_frame_sample", "fu": "events_funnel",
    "fw": "docs_quality_floor_sweep", "fy": "events_funnel_latency", "ga": "events_gapfill",
    "gc": "graph_communities_lpa", "gd": "graph_degree_octaves", "gk": "graph_kcore_purchases",
    "gp": "graph_pagerank_suppliers", "gs": "graph_supplier_similarity", "gt": "graph_triangles_cosupply",
    "he": "sketch_heavy_hitters", "hl": "docs_hll_distinct_audit", "ho": "events_hourly_acf",
    "in": "events_interarrival_quantiles", "is": "incremental_sales_rollup", "js": "events_json_props",
    "la": "docs_language_confusion", "lo": "q5_local_supplier_volume", "ma": "mm_afp_near_dup",
    "mb": "mm_storage_profile", "mc": "mm_canonical_assets", "me": "mm_extract_features",
    "mf": "mm_fingerprint", "mi": "corpus_mixture_temperature", "mm": "mm_canonical_media",
    "mn": "mm_phash_near_dup", "mp": "mm_phash_distance_histogram", "mr": "mm_resize_images",
    "ms": "mm_asset_stats", "mv": "mm_video_near_dup", "ne": "emb_near_dup_lsh",
    "nt": "events_ntile_quartiles", "or": "top_orders_per_customer", "os": "orders_ship_latency",
    "pa": "docs_pack_chunks", "pc": "pipeline_compaction", "pd": "pipeline_envelope_decode",
    "pe": "events_pettitt_changepoint", "pi": "curation_pipeline", "pn": "pipeline_streaming_drain",
    "po": "scd2_point_in_time", "pp": "pipeline_partition_scan", "pr": "profile_documents",
    "ps": "parts_abc_analysis", "pt": "payment_type_share", "q1": "q1_pricing_summary",
    "q2": "q20_promotion_suppliers", "q4": "q4_late_order_priority", "q8": "q8_market_share",
    "q9": "q9_red_parts_profit", "qa": "q21_late_sole_supplier", "qc": "q22_dormant_customers",
    "qd": "q19_disjunctive_revenue", "qe": "q17_small_quantity_revenue", "qf": "q6_forecast_revenue",
    "qi": "q11_important_parts", "ql": "q18_large_orders", "qm": "q2_min_cost_supplier",
    "qo": "q13_order_count_distribution", "qp": "q14_promo_revenue", "qr": "q10_returned_items",
    "qs": "q12_ship_delay_classes", "qt": "q15_top_supplier", "qu": "docs_quality_by_length",
    "qv": "q7_volume_shipping", "qx": "quality_calibration_matrix", "qy": "q16_supplier_diversity",
    "r3": "retrieval_hybrid_rrf3", "ra": "events_range_follow", "rc": "ref_clients",
    "re": "ann_recall_clustered", "rf": "customer_rfm_segments", "rg": "ref_avg",
    "rh": "retrieval_hybrid_rrf", "ri": "ref_income", "rk": "retrieval_known_item_eval",
    "rm": "retrieval_mmr_topk", "rn": "retrieval_eval_ndcg", "ro": "events_rolling_hour_avg",
    "rp": "ref_products", "rr": "retrieval_eval_mrr", "ru": "customer_running_spend",
    "ry": "ref_country", "s0": "streaming_bloom_gate", "s1": "streaming_cusum_gate",
    "s2": "streaming_decontamination_gate", "s3": "streaming_dedup_delta", "s4": "streaming_dedup_replay",
    "s5": "streaming_drift_tvd", "s6": "streaming_enriched_nation_totals", "s7": "streaming_er_delta",
    "s8": "streaming_hll_users", "s9": "streaming_late_data_policy", "sa": "docs_sample_fixed",
    "sb": "sales_cube", "sc": "quality_scorer_agreement", "sd": "sketch_distinct_trigrams",
    "se": "dedup_semantic", "sf": "sales_yoy_full_outer", "sg": "salted_lineitem_agg",
    "sh": "q3_shipping_priority", "si": "dedup_signal_agreement", "sj": "salted_events_join",
    "sk": "sketch_accuracy_audit", "sl": "events_sliding_1h_15m", "sm": "sales_monthly_yoy",
    "sn": "sales_per_nation", "so": "curation_source_caps", "sp": "docs_split_assign",
    "sq": "sql_above_average_orders", "sr": "sales_rollup", "ss": "salted_priority_sales",
    "st": "dedup_strip_boilerplate", "su": "dedup_substring_hotspots", "sv": "sketch_value_quantiles",
    "sw": "serving_last_write_wins", "sx": "sql_lateral_top_orders", "sy": "sales_pivot_by_priority",
    "sz": "sql_recursive_rollup", "t0": "text_stratified_sample", "t1": "text_tfidf_search",
    "t2": "text_token_stats", "t3": "text_tokenizer_compare", "t4": "text_unigram_vocab",
    "t5": "text_vocab_growth", "t6": "top_parts_by_revenue", "ta": "text_pack_bpe",
    "tb": "text_bm25_search", "tc": "text_collocations", "td": "text_dsir_importance",
    "te": "text_lm_score", "tf": "text_bpe_fertility", "tg": "text_pack_sequences",
    "th": "text_phrase_search", "ti": "text_pii_extract", "tj": "text_pii_redact",
    "tk": "text_keywords", "tl": "text_language_id", "tm": "text_model_quality",
    "tn": "text_ngram_novelty", "to": "ann_topk_ivf", "tp": "text_build_postings",
    "tq": "text_length_quantiles", "tr": "ann_truncation_audit", "ts": "text_bpe_merges",
    "tt": "text_bpe_segment", "tu": "events_tumbling_30s", "tv": "text_quality_ensemble",
    "tw": "text_quality_sample", "tx": "text_quality_score", "ty": "events_type_mode",
    "tz": "text_repetition", "un": "text_unigram_segment", "us": "events_user_anomalies",
    "va": "events_value_histogram", "vo": "text_vocab_coverage", "wc": "warehouse_column_stats",
    "we": "events_weekly_profile", "wf": "warehouse_fk_audit", "wi": "customers_without_urgent_orders",
    "wn": "warehouse_null_profile", "wp": "warehouse_partition_advisor", "zi": "text_zipf_octaves",
    "zo": "events_zorder_scan",
}


def decode(parsed: dict) -> dict[str, float]:
    """parsed = json.loads of the final bench line (any format stage)."""
    q = parsed.get("queries", {})
    scale = {"cs": 100.0, "ds": 10.0, "s": 1.0}[parsed.get("qunit", "s")]
    if isinstance(q, str):  # qfmt == "pack" (round-12 lines only)
        pairs = (tok.rsplit(":", 1) for tok in q.split() if ":" in tok)
        return {
            _R12_PACK_ALIAS_TO_NAME.get(alias, alias): int(v) / scale
            for alias, v in pairs
        }
    return {
        _ALIAS_TO_NAME.get(alias, alias): val / scale
        for alias, val in q.items()
    }


def main() -> int:
    arg = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r12.json"
    if os.path.exists(arg):
        blob = json.load(open(arg))
        parsed = blob.get("parsed", blob)
    else:
        parsed = json.loads(arg)
    timings = decode(parsed)
    for name, sec in sorted(timings.items(), key=lambda kv: -kv[1]):
        print(f"{name} {sec:.1f}")
    print(f"# wall {parsed.get('value')} sec over {len(timings)} queries"
          f" (n_omitted={parsed.get('n_omitted', 0)})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
