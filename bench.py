"""Benchmark harness: ETL phase + analytics phase; prints ONE JSON line.

Mirrors the reference architecture (ingest ETL writes tables once;
analytics queries them many times — SURVEY §3.2/§3.4):

  etl_derive_tables   build nested order events from the TPC-H tables,
                      derive the 4 relational tables, write partitioned
                      snappy parquet (the Firehose→S3 path, batch form)
  ref_*               the 5 reference Athena queries via spark.sql over
                      the materialized tables (the Athena path)
  q1/sales/parts/     general analytics directly over the testdata
  events_*            (scan-agg-join surface + JSON extraction)

Usage: python bench.py
  SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local parallelism (default 32)

Output: two JSON lines — a verbose one (full-precision seconds) and a
compact FINAL one the driver parses from its 2000-char output tail:
  {"metric": "wall", "value": <total sec>, "unit": "sec",
   "qunit": "cs", "queries": {name: <int centisec>, ...}, "sf": <float>}

Partition-layout note: the reference partitions `orders` by
customer_id (terraform/main.tf:675); at bench scale that cardinality
(~10k+) is a small-files anti-pattern, so the bench writes orders
unpartitioned — the documented, deliberate deviation (SURVEY §7.3);
the other three tables keep the reference layouts.

Persist note (measured at sf0.1): the event DataFrame is deliberately
NOT persisted across the four table writes. Caching the nested
events (array<struct> rows) costs 95 s vs 13 s for plain recompute:
the in-memory columnar encode/decode of nested arrays is slower than
re-running the branch-PRUNED plans (e.g. the orders write skips the
lineitem⋈part collect_list join entirely — tests/test_plans.py pins
that pruning), and persisting forces the full nested shape for every
branch. Streaming takes the other trade: foreachBatch persists the
small per-batch slice (streaming/pipeline.py).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aws_kinesis_data_ingestion_restapi_spark import get_spark  # noqa: E402
from aws_kinesis_data_ingestion_restapi_spark.analytics import build_order_events  # noqa: E402
from aws_kinesis_data_ingestion_restapi_spark.catalog import register_derived_tables  # noqa: E402
from aws_kinesis_data_ingestion_restapi_spark.operators.transforms import derive_all_tables  # noqa: E402
from aws_kinesis_data_ingestion_restapi_spark.queries import REFERENCE_SQL  # noqa: E402
from aws_kinesis_data_ingestion_restapi_spark.registry import QUERY_FNS  # noqa: E402
from aws_kinesis_data_ingestion_restapi_spark.sinks import write_partitioned  # noqa: E402
from aws_kinesis_data_ingestion_restapi_spark.streaming import run_pipeline_once  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

#: Every registry query is benched so regressions in any operator
#: family are visible round-over-round. Exclusions, each deliberate:
#: pipeline_* and the registry ref_* run through the dedicated ETL /
#: Athena phases below (same code, materialized-table form), and
#: emb_near_dup is the documented all-pairs oracle baseline whose
#: production path (emb_near_dup_lsh*) IS benched.
ANALYTICS_QUERIES = [
    "q1_pricing_summary",
    "sales_per_nation",
    "sales_rollup",
    "sales_monthly_yoy",
    "sales_cube",
    "sales_pivot_by_priority",
    "top_parts_by_revenue",
    "parts_abc_analysis",
    "brand_basket_affinity",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q18_large_orders",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_items",
    "q12_ship_delay_classes",
    "q14_promo_revenue",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q22_dormant_customers",
    "q4_late_order_priority",
    "q9_red_parts_profit",
    "q16_supplier_diversity",
    "q21_late_sole_supplier",
    "q2_min_cost_supplier",
    "q6_forecast_revenue",
    "q11_important_parts",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q20_promotion_suppliers",
    "salted_events_join",
    "salted_lineitem_agg",
    "bucketed_sales_join",
    "payment_type_share",
    "customers_with_urgent_orders",
    "customers_without_urgent_orders",
    "customer_retention",
    "customer_rfm_segments",
    "sales_yoy_full_outer",
    "fuzzy_customer_names",
    "events_daily_stats",
    "events_json_props",
    "events_variant_props",
    "events_tumbling_30s",
    "events_sliding_1h_15m",
    "events_sessionization",
    "events_value_histogram",
    "events_type_mode",
    "events_rolling_hour_avg",
    "events_ntile_quartiles",
    "events_value_outliers_mad",
    "events_gapfill",
    "events_funnel",
    "events_cohort_retention",
    "events_active_users",
    "events_drift_tvd",
    "events_ewma_daily",
    "events_anomaly_days",
    "events_value_hour_corr",
    "events_daily_trend",
    "events_attribution",
    "events_concurrency_curve",
    "events_transition_matrix",
    "profile_documents",
    "docs_expectations",
    "sketch_distinct_trigrams",
    "sketch_heavy_hitters",
    "sketch_value_quantiles",
    "events_type_value_quantiles",
    "incremental_sales_rollup",
    "salted_priority_sales",
    "sql_above_average_orders",
    "sql_lateral_top_orders",
    "sql_recursive_rollup",
    "pipeline_envelope_decode",
    "pipeline_partition_scan",
    "pipeline_compaction",
    "serving_last_write_wins",
    # window-function surface
    "top_orders_per_customer",
    "customer_running_spend",
    # training-data extensions (documents/embeddings are fixed-size
    # side tables — these measure operator cost, not sf scaling)
    "text_token_stats",
    "text_quality_score",
    "text_language_id",
    "text_fingerprint",
    "text_pii_redact",
    "text_repetition",
    "text_bm25_search",
    "retrieval_hybrid_rrf",
    "text_length_quantiles",
    "text_pack_sequences",
    "text_stratified_sample",
    "text_quality_sample",
    "text_vocab_growth",
    "text_ngram_novelty",
    "text_bpe_merges",
    "text_bpe_segment",
    "text_pack_bpe",
    "corpus_mixture_bpe",
    "text_bpe_fertility",
    "text_dsir_importance",
    "text_lm_score",
    "text_quality_ensemble",
    "corpus_curriculum_plan",
    "text_keywords",
    "text_tfidf_search",
    "retrieval_hybrid_rrf3",
    "docs_chunk_overlap",
    "docs_pack_chunks",
    "text_collocations",
    "text_build_postings",
    "text_model_quality",
    "curation_source_caps",
    "docs_sample_fixed",
    "docs_split_assign",
    "docs_split_leakage_safe",
    "corpus_mixture_plan",
    "dedup_exact_recrawl",
    "dedup_substring_hotspots",
    "dedup_exact_substring",
    "dedup_remove_substrings",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_incremental_delta",
    "dedup_simhash_pairs",
    "dedup_simhash_fingerprints",
    "dedup_contamination",
    "dedup_decontaminate",
    "dedup_chunks_exact",
    "dedup_source_matrix",
    "dedup_ensemble",
    "dedup_semantic",
    "dedup_lsh_quality",
    "dedup_signal_agreement",
    "events_zorder_scan",
    "dedup_components",
    "dedup_components_star",
    "graph_pagerank_suppliers",
    "graph_kcore_purchases",
    "graph_communities_lpa",
    "graph_triangles_cosupply",
    "er_entity_ids",
    "streaming_topk_users",
    "events_cusum_changepoint",
    "text_unigram_vocab",
    "text_unigram_segment",
    "streaming_cusum_gate",
    "dedup_components_delta",
    "mm_afp_near_dup",
    "docs_sample_fixed_per_lang",
    "er_link_dirty_names",
    "text_tokenizer_compare",
    "docs_split_leakage_audit",
    "sketch_accuracy_audit",
    "corpus_funnel_report",
    "customers_k_anonymity",
    "scd2_point_in_time",
    "text_phrase_search",
    "corpus_content_hashes",
    "docs_sample_weighted_k",
    "events_user_anomalies",
    "streaming_user_anomalies",
    "ann_index_health",
    "dedup_canonical_docs",
    "ann_topk_brute",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "ann_topk_lsh_multi",
    "ann_recall_audit",
    "ann_recall_clustered",
    "ann_truncation_audit",
    "emb_hard_negatives",
    "emb_near_dup_lsh",
    "emb_kmeans_step",
    "emb_pca_power",
    "emb_anisotropy_audit",
    "ann_label_audit",
    "ann_label_audit_clustered",
    "emb_pq_codes",
    "ann_topk_pq",
    "ann_topk_ivfpq",
    "ann_topk_ivfpq_trained",
    "emb_near_dup_lsh_multi",
    "emb_bitext_mine",
    "mm_asset_stats",
    "mm_fingerprint",
    "mm_phash_near_dup",
    "mm_canonical_assets",
    "mm_extract_features",
    "mm_frame_sample",
    "mm_resize_images",
    # temporal joins + CDC (round-2 operator families)
    "asof_priority_rates",
    "events_range_follow",
    "cdc_snapshot_diff",
    "cdc_scd2_history",
    # the composed curation chain (dedup → quality → sample → pack)
    "curation_pipeline",
    # stateful / stream-static / stream-stream forms (each drains a
    # real stream)
    "streaming_dedup_replay",
    "streaming_dedup_delta",
    "streaming_running_totals_final",
    "streaming_enriched_nation_totals",
    "streaming_payment_match",
    "streaming_payment_match_outer",
    "streaming_payment_match_full",
    "streaming_late_data_policy",
    "streaming_session_windows",
    "streaming_sliding_1h_15m",
    "streaming_drift_tvd",
    "streaming_value_quantiles",
    # --- round 11 additions ---
    "streaming_er_delta",
    "docs_hll_distinct_audit",
    "mm_video_near_dup",
    "customers_k_generalize",
    "retrieval_mmr_topk",
    "corpus_funnel_by_source",
    "events_hll_users_daily",
    "streaming_hll_users",
    "mm_canonical_media",
    "retrieval_known_item_eval",
    "retrieval_eval_mrr",
    "text_pii_extract",
    "events_user_skew",
    "warehouse_fk_audit",
    "corpus_delete_apply",
    "events_attribution_positional",
    "events_seasonal_backtest",
    "events_lateness_profile",
    "streaming_fk_gate",
    "events_trimmed_mean",
    "warehouse_null_profile",
    "quality_scorer_agreement",
    "streaming_decontamination_gate",
    "events_user_cusum",
    "events_cms_users_daily",
    "ann_centroid_drift",
    "corpus_mixture_actuals",
    "docs_language_confusion",
    "docs_pack_manifest",
    "events_weekly_profile",
    "streaming_quality_gate",
    # --- round 12 additions ---
    "dedup_boilerplate_lines",
    "dedup_strip_boilerplate",
    "ann_topk_ivfpq_filtered",
    "ann_filtered_recall_audit",
    "emb_semantic_contamination",
    "dedup_decontaminate_semantic",
    "text_vocab_coverage",
    "customers_l_diversity",
    "corpus_mixture_temperature",
    "streaming_boilerplate_gate",
    "dedup_source_vocab_overlap",
    "warehouse_column_stats",
    "dedup_benchmark_canaries",
    "dedup_cluster_size_histogram",
    "text_zipf_octaves",
    "events_interarrival_quantiles",
    "mm_phash_distance_histogram",
    "docs_quality_by_length",
    "events_user_gini",
    "customers_t_closeness",
    "orders_ship_latency",
    "events_hourly_acf",
    "graph_supplier_similarity",
    "sketch_bloom_fpr",
    "emb_distance_octaves",
    "retrieval_eval_ndcg",
    "events_pettitt_changepoint",
    "mm_storage_profile",
    "streaming_bloom_gate",
    "events_benford_audit",
    "dedup_band_load_octaves",
    "graph_degree_octaves",
    "quality_calibration_matrix",
    "events_funnel_latency",
    "docs_quality_floor_sweep",
    "streaming_asof_rates",
    "warehouse_partition_advisor",
    "emb_pq_distortion",
    "docs_split_balance",
    "events_session_profile",
    "retrieval_margin_profile",
]


#: Bench-line aliases for the Athena-path queries (full names live in
#: queries.REFERENCE_SQL; shortened here only to keep the final JSON
#: line inside the driver's 2000-char capture).
REF_BENCH_KEYS = {
    "total_sales_per_country": "ref_country",
    # "ref_avg" (round-5): was "avg_order" in BENCH_r01-r04 — renamed to
    # keep the documented ref_* convention for all five Athena-path
    # queries (round-4 ADVICE); cross-round comparisons should map
    # avg_order ↔ ref_avg. Noted in BENCH_NOTES.
    "average_order_value": "ref_avg",
    "total_income_per_payment_method": "ref_income",
    "most_sales_products": "ref_products",
    "order_and_client_details": "ref_clients",
}

#: FINAL-LINE-ONLY aliases for the longest registry names — the
#: verbose line keeps full registry names; only the compact line the
#: driver parses uses these, so ~80 entries fit its 2000-char capture
#: at centisecond precision. 1:1, documented here and in BENCH_NOTES.
BENCH_KEY_ALIASES = {
    # round-12 FULL regeneration to 2-char codes (the r11 backlog
    # #2 'widen the alias map' option): 277 entries at 3-char codes
    # overflowed the driver's 2000-char capture under the pinned
    # pessimistic profile (2040 chars). Codes are deterministic
    # (scripts-free regeneration documented in BENCH_NOTES; decode
    # inverts THIS map at runtime, so older BENCH_r*.json lines
    # decode with their own round's committed map). 1:1, no code
    # shadows a registry name.
    "ann_centroid_drift": "ac",
    "ann_filtered_recall_audit": "af",
    "ann_index_health": "ai",
    "ann_label_audit": "al",
    "ann_label_audit_clustered": "ad",
    "ann_recall_audit": "ar",
    "ann_recall_clustered": "re",
    "ann_topk_brute": "at",
    "ann_topk_ivf": "to",
    "ann_topk_ivfpq": "aq",
    "ann_topk_ivfpq_filtered": "an",
    "ann_topk_ivfpq_trained": "aa",
    "ann_topk_lsh": "ah",
    "ann_topk_lsh_multi": "ab",
    "ann_topk_pq": "ap",
    "ann_truncation_audit": "tr",
    "asof_priority_rates": "as",
    "brand_basket_affinity": "bb",
    "bucketed_sales_join": "bs",
    "cdc_scd2_history": "cs",
    "cdc_snapshot_diff": "cf",
    "corpus_content_hashes": "cc",
    "corpus_curriculum_plan": "cn",
    "corpus_delete_apply": "cd",
    "corpus_funnel_by_source": "ce",
    "corpus_funnel_report": "ct",
    "corpus_mixture_actuals": "cm",
    "corpus_mixture_bpe": "cb",
    "corpus_mixture_plan": "cp",
    "corpus_mixture_temperature": "mi",
    "curation_pipeline": "pi",
    "curation_source_caps": "so",
    "customer_retention": "cr",
    "customer_rfm_segments": "rf",
    "customer_running_spend": "ru",
    "customers_k_anonymity": "ck",
    "customers_k_generalize": "cg",
    "customers_l_diversity": "cl",
    "customers_t_closeness": "cu",
    "customers_with_urgent_orders": "cw",
    "customers_without_urgent_orders": "wi",
    "dedup_band_load_octaves": "db",
    "dedup_benchmark_canaries": "ds",
    "dedup_boilerplate_lines": "dl",
    "dedup_canonical_docs": "dc",
    "dedup_chunks_exact": "dt",
    "dedup_cluster_size_histogram": "dm",
    "dedup_components": "co",
    "dedup_components_delta": "da",
    "dedup_components_star": "dr",
    "dedup_contamination": "dn",
    "dedup_decontaminate": "dd",
    "dedup_decontaminate_semantic": "de",
    "dedup_ensemble": "en",
    "dedup_exact_recrawl": "ex",
    "dedup_exact_substring": "dg",
    "dedup_incremental_delta": "di",
    "dedup_lsh_quality": "dy",
    "dedup_minhash_lsh": "dh",
    "dedup_ngram_jaccard": "dj",
    "dedup_remove_substrings": "df",
    "dedup_semantic": "se",
    "dedup_signal_agreement": "si",
    "dedup_simhash_fingerprints": "dk",
    "dedup_simhash_pairs": "dp",
    "dedup_source_matrix": "dx",
    "dedup_source_vocab_overlap": "dv",
    "dedup_strip_boilerplate": "st",
    "dedup_substring_hotspots": "su",
    "docs_chunk_overlap": "do",
    "docs_expectations": "dq",
    "docs_hll_distinct_audit": "hl",
    "docs_language_confusion": "la",
    "docs_pack_chunks": "pa",
    "docs_pack_manifest": "du",
    "docs_quality_by_length": "qu",
    "docs_sample_fixed": "sa",
    "docs_sample_fixed_per_lang": "dw",
    "docs_sample_weighted_k": "dz",
    "docs_split_assign": "sp",
    "docs_split_leakage_audit": "d0",
    "docs_split_leakage_safe": "d1",
    "emb_anisotropy_audit": "ea",
    "emb_bitext_mine": "eb",
    "emb_distance_octaves": "ed",
    "emb_hard_negatives": "eh",
    "emb_kmeans_step": "ek",
    "emb_near_dup_lsh": "ne",
    "emb_near_dup_lsh_multi": "ei",
    "emb_pca_power": "ep",
    "emb_pq_codes": "es",
    "emb_semantic_contamination": "ec",
    "er_entity_ids": "ee",
    "er_link_dirty_names": "el",
    "etl_derive_tables": "et",
    "events_active_users": "eu",
    "events_anomaly_days": "ev",
    "events_attribution": "ef",
    "events_attribution_positional": "eg",
    "events_benford_audit": "be",
    "events_cms_users_daily": "ey",
    "events_cohort_retention": "er",
    "events_concurrency_curve": "ej",
    "events_cusum_changepoint": "em",
    "events_daily_stats": "eo",
    "events_daily_trend": "eq",
    "events_drift_tvd": "ew",
    "events_ewma_daily": "ez",
    "events_funnel": "fu",
    "events_gapfill": "ga",
    "events_hll_users_daily": "e0",
    "events_hourly_acf": "ho",
    "events_interarrival_quantiles": "in",
    "events_json_props": "js",
    "events_lateness_profile": "e1",
    "events_ntile_quartiles": "nt",
    "events_pettitt_changepoint": "pe",
    "events_range_follow": "ra",
    "events_rolling_hour_avg": "ro",
    "events_seasonal_backtest": "e2",
    "events_sessionization": "e3",
    "events_sliding_1h_15m": "sl",
    "events_transition_matrix": "e4",
    "events_trimmed_mean": "e5",
    "events_tumbling_30s": "tu",
    "events_type_mode": "ty",
    "events_type_value_quantiles": "e6",
    "events_user_anomalies": "us",
    "events_user_cusum": "e7",
    "events_user_gini": "e8",
    "events_user_skew": "e9",
    "events_value_histogram": "va",
    "events_value_hour_corr": "ae",
    "events_value_outliers_mad": "ag",
    "events_variant_props": "aj",
    "events_weekly_profile": "we",
    "events_zorder_scan": "zo",
    "fuzzy_customer_names": "fc",
    "graph_communities_lpa": "gc",
    "graph_degree_octaves": "gd",
    "graph_kcore_purchases": "gk",
    "graph_pagerank_suppliers": "gp",
    "graph_supplier_similarity": "gs",
    "graph_triangles_cosupply": "gt",
    "incremental_sales_rollup": "is",
    "mm_afp_near_dup": "ma",
    "mm_asset_stats": "ms",
    "mm_canonical_assets": "mc",
    "mm_canonical_media": "mm",
    "mm_extract_features": "me",
    "mm_fingerprint": "mf",
    "mm_frame_sample": "fr",
    "mm_phash_distance_histogram": "mp",
    "mm_phash_near_dup": "mn",
    "mm_resize_images": "mr",
    "mm_storage_profile": "mb",
    "mm_video_near_dup": "mv",
    "orders_ship_latency": "os",
    "parts_abc_analysis": "ps",
    "payment_type_share": "pt",
    "pipeline_compaction": "pc",
    "pipeline_envelope_decode": "pd",
    "pipeline_partition_scan": "pp",
    "pipeline_streaming_drain": "pn",
    "profile_documents": "pr",
    "q10_returned_items": "qr",
    "q11_important_parts": "qi",
    "q12_ship_delay_classes": "qs",
    "q13_order_count_distribution": "qo",
    "q14_promo_revenue": "qp",
    "q15_top_supplier": "qt",
    "q16_supplier_diversity": "qy",
    "q17_small_quantity_revenue": "qe",
    "q18_large_orders": "ql",
    "q19_disjunctive_revenue": "qd",
    "q1_pricing_summary": "q1",
    "q20_promotion_suppliers": "q2",
    "q21_late_sole_supplier": "qa",
    "q22_dormant_customers": "qc",
    "q2_min_cost_supplier": "qm",
    "q3_shipping_priority": "sh",
    "q4_late_order_priority": "q4",
    "q5_local_supplier_volume": "lo",
    "q6_forecast_revenue": "qf",
    "q7_volume_shipping": "qv",
    "q8_market_share": "q8",
    "q9_red_parts_profit": "q9",
    "quality_scorer_agreement": "sc",
    "ref_avg": "rg",
    "ref_clients": "rc",
    "ref_country": "ry",
    "ref_income": "ri",
    "ref_products": "rp",
    "retrieval_eval_mrr": "rr",
    "retrieval_eval_ndcg": "rn",
    "retrieval_hybrid_rrf": "rh",
    "retrieval_hybrid_rrf3": "r3",
    "retrieval_known_item_eval": "rk",
    "retrieval_mmr_topk": "rm",
    "sales_cube": "sb",
    "sales_monthly_yoy": "sm",
    "sales_per_nation": "sn",
    "sales_pivot_by_priority": "sy",
    "sales_rollup": "sr",
    "sales_yoy_full_outer": "sf",
    "salted_events_join": "sj",
    "salted_lineitem_agg": "sg",
    "salted_priority_sales": "ss",
    "scd2_point_in_time": "po",
    "serving_last_write_wins": "sw",
    "sketch_accuracy_audit": "sk",
    "sketch_bloom_fpr": "bl",
    "sketch_distinct_trigrams": "sd",
    "sketch_heavy_hitters": "he",
    "sketch_value_quantiles": "sv",
    "sql_above_average_orders": "sq",
    "sql_lateral_top_orders": "sx",
    "sql_recursive_rollup": "sz",
    "streaming_bloom_gate": "s0",
    "streaming_boilerplate_gate": "bo",
    "streaming_cusum_gate": "s1",
    "streaming_decontamination_gate": "s2",
    "streaming_dedup_delta": "s3",
    "streaming_dedup_replay": "s4",
    "streaming_drift_tvd": "s5",
    "streaming_enriched_nation_totals": "s6",
    "streaming_er_delta": "s7",
    "streaming_fk_gate": "fk",
    "streaming_hll_users": "s8",
    "streaming_late_data_policy": "s9",
    "streaming_payment_match": "ak",
    "streaming_payment_match_full": "am",
    "streaming_payment_match_outer": "ao",
    "streaming_quality_gate": "au",
    "streaming_running_totals_final": "av",
    "streaming_session_windows": "aw",
    "streaming_sliding_1h_15m": "ax",
    "streaming_topk_users": "ay",
    "streaming_user_anomalies": "az",
    "streaming_value_quantiles": "a0",
    "text_bm25_search": "tb",
    "text_bpe_fertility": "tf",
    "text_bpe_merges": "ts",
    "text_bpe_segment": "tt",
    "text_build_postings": "tp",
    "text_collocations": "tc",
    "text_dsir_importance": "td",
    "text_fingerprint": "fi",
    "text_keywords": "tk",
    "text_language_id": "tl",
    "text_length_quantiles": "tq",
    "text_lm_score": "te",
    "text_model_quality": "tm",
    "text_ngram_novelty": "tn",
    "text_pack_bpe": "ta",
    "text_pack_sequences": "tg",
    "text_phrase_search": "th",
    "text_pii_extract": "ti",
    "text_pii_redact": "tj",
    "text_quality_ensemble": "tv",
    "text_quality_sample": "tw",
    "text_quality_score": "tx",
    "text_repetition": "tz",
    "text_stratified_sample": "t0",
    "text_tfidf_search": "t1",
    "text_token_stats": "t2",
    "text_tokenizer_compare": "t3",
    "text_unigram_segment": "un",
    "text_unigram_vocab": "t4",
    "text_vocab_coverage": "vo",
    "text_vocab_growth": "t5",
    "text_zipf_octaves": "zi",
    "top_orders_per_customer": "or",
    "top_parts_by_revenue": "t6",
    "warehouse_column_stats": "wc",
    "warehouse_fk_audit": "wf",
    "warehouse_null_profile": "wn",
    "docs_quality_floor_sweep": "fw",
    "events_funnel_latency": "fy",
    "quality_calibration_matrix": "qx",
    "emb_pq_distortion": "a2",
    "streaming_asof_rates": "a1",
    "warehouse_partition_advisor": "wp",
    "docs_split_balance": "a3",
    "events_session_profile": "a4",
    "retrieval_margin_profile": "a5",
}


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _reclaim(spark) -> None:
    """Untimed driver GC between measured queries. Spark's
    ContextCleaner releases dead shuffle files, broadcast blocks, and
    localCheckpoint RDDs only when the driver-side references are
    garbage-collected, and its own periodic GC fires every 30 MINUTES
    (spark.cleaner.periodicGC.interval) — far longer than this whole
    bench. Without this, block-manager litter from ~100 earlier
    queries inflates the tail of the sequence (round-4's
    'unattributed regressions': q3 measured 3.4 s at position ~10 of
    the full bench vs 1.0 s isolated or with any short prefix —
    reproduced and attributed round 5). Runs OUTSIDE the timing
    windows; per-query numbers measure the query, not the litter."""
    spark.sparkContext._jvm.System.gc()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="bench")
    spark.range(1).count()  # absorb session startup

    timings: dict[str, float] = {}
    warehouse = tempfile.mkdtemp(prefix="bench_wh_")
    try:
        # --- ETL phase: events -> 4 partitioned parquet tables ---
        t0 = time.perf_counter()
        events = build_order_events(spark, sf_dir)
        tables = derive_all_tables(events, with_partitions=True)
        for name, df in tables.items():
            cols = [] if name == "orders" else None  # None -> table default
            write_partitioned(df, f"{warehouse}/{name}", table=name,
                              partition_cols=cols, mode="overwrite")
        timings["etl_derive_tables"] = round(time.perf_counter() - t0, 3)

        # --- Athena-path: the 5 reference queries over materialized tables ---
        # Keys are shortened (ref_sales_country vs ref_total_sales_per_
        # country etc.) so the FINAL JSON line fits the driver's
        # 2000-char output capture — BENCH_r03 lost this family to
        # truncation. The mapping is 1:1 with queries.REFERENCE_SQL.
        register_derived_tables(spark, warehouse)
        for name, sql in REFERENCE_SQL.items():
            t0 = time.perf_counter()
            _noop(spark.sql(sql))
            timings[REF_BENCH_KEYS[name]] = round(time.perf_counter() - t0, 3)

        # --- general analytics over the raw testdata ---
        for name in ANALYTICS_QUERIES:
            _reclaim(spark)  # untimed; see _reclaim docstring
            t0 = time.perf_counter()
            _noop(QUERY_FNS[name](spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)

        # --- streaming-pipeline drain: the ETL contract end-to-end ---
        # envelope NDJSON fixture → decode → foreachBatch fan-out to all
        # 6 sinks (4 tables + serving upsert + error quarantine). The
        # fixture build is harness-side and untimed; the drain is the
        # measured unit. Tables are written unpartitioned here for the
        # same small-files reason as the batch ETL's orders deviation.
        stream_root = tempfile.mkdtemp(prefix="bench_stream_")
        try:
            events = build_order_events(spark, sf_dir)
            envelopes = events.select(
                F.lit("ingestion-bench").alias("StreamName"),
                F.lit("bench-partition").alias("PartitionKey"),
                F.base64(F.to_json(F.struct(*events.columns))).alias("Data"),
            )
            inp = f"{stream_root}/input"
            envelopes.select(
                F.to_json(F.struct("StreamName", "PartitionKey", "Data")).alias("v")
            ).write.mode("overwrite").text(inp)
            t0 = time.perf_counter()
            run_pipeline_once(
                spark,
                inp,
                f"{stream_root}/warehouse",
                f"{stream_root}/checkpoint",
                serving_path=f"{stream_root}/serving",
                errors_path=f"{stream_root}/errors",
                with_partitions=False,
            )
            timings["pipeline_streaming_drain"] = round(time.perf_counter() - t0, 3)
        finally:
            shutil.rmtree(stream_root, ignore_errors=True)
    finally:
        shutil.rmtree(warehouse, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    # Verbose line first (full-precision seconds, for local reading) —
    # the driver keeps only the LAST 2000 chars of output, so this line
    # sacrifices itself to truncation while the compact final line
    # survives whole and parses.
    print(
        json.dumps(
            {
                "metric": "etl_plus_headline_queries_wall_verbose",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    # Final line: per-query times as centisecond INTEGERS ("qunit") so
    # all ~72 entries fit the 2000-char capture (ms overflows it);
    # falls back to deciseconds if a pathological run still overflows.
    for qunit, scale in (("cs", 100), ("ds", 10)):
        line = json.dumps(
            {
                "metric": "wall",
                "value": total,
                "unit": "sec",
                "qunit": qunit,
                "queries": {
                    BENCH_KEY_ALIASES.get(k, k): int(round(v * scale))
                    for k, v in timings.items()
                },
                "sf": sf,
            },
            separators=(",", ":"),
        )
        if len(line) <= 1990:
            break
    else:
        # Dict forms overflowed (the registry outgrew the driver's
        # last-2000-chars capture at ~235 entries, round 11; r11
        # VERDICT ask #2: keep n_omitted at 0). PACKED-STRING stage:
        # "queries" becomes ONE space-separated string of
        # "<alias>:<deciseconds>" pairs — ~7 chars/entry vs ~10 for
        # the JSON dict — which carries EVERY entry at ds precision
        # well under the cap (~1800 chars at 255 entries, headroom
        # for ~25 more). qfmt="pack" labels the encoding;
        # scripts/decode_bench_line.py (and BENCH_NOTES) decode it
        # back to a {name: seconds} dict using BENCH_KEY_ALIASES.
        packed = " ".join(
            f"{BENCH_KEY_ALIASES.get(k, k)}:{int(round(v * 10))}"
            for k, v in sorted(timings.items(), key=lambda kv: -kv[1])
        )
        line = json.dumps(
            {
                "metric": "wall",
                "value": total,
                "unit": "sec",
                "qunit": "ds",
                "qfmt": "pack",
                "n_omitted": 0,
                "queries": packed,
                "sf": sf,
            },
            separators=(",", ":"),
        )
    if len(line) > 1990:
        # even the packed string overflowed — emit the SLOWEST entries
        # that fit plus an explicit omission marker — partial,
        # honestly-labeled per-query detail beats an empty dict, and
        # the verbose line above still carries every timing for local
        # reading. Greedy by cost so the entries a perf review needs
        # are exactly the ones that survive.
        ranked = sorted(timings.items(), key=lambda kv: -kv[1])
        kept: dict = {}
        for k, v in ranked:
            trial = dict(kept)
            trial[BENCH_KEY_ALIASES.get(k, k)] = int(round(v * 10))
            line = json.dumps(
                {
                    "metric": "wall",
                    "value": total,
                    "unit": "sec",
                    "qunit": "ds",
                    "n_omitted": len(timings) - len(trial),
                    "omitted_total_ds": int(
                        round(sum(x for _, x in ranked[len(trial):]) * 10)
                    ),
                    "queries": trial,
                    "sf": sf,
                },
                separators=(",", ":"),
            )
            if len(line) > 1990:
                break
            kept = trial
        line = json.dumps(
            {
                "metric": "wall",
                "value": total,
                "unit": "sec",
                "qunit": "ds",
                "n_omitted": len(timings) - len(kept),
                "omitted_total_ds": int(
                    round(sum(x for _, x in ranked[len(kept):]) * 10)
                ),
                "queries": kept,
                "sf": sf,
            },
            separators=(",", ":"),
        )
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
