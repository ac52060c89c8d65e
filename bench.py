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
    # round-8: the five previously-unaliased names + sales_cube, to
    # keep the compact line <=1900 chars after this round's new
    # queries (rename mapping in BENCH_NOTES "alias renames").
    # round-12 additions (1:1, final line only)
    "dedup_boilerplate_lines": "bpl",
    "dedup_strip_boilerplate": "sbp",
    "ann_topk_ivfpq_filtered": "ipf",
    "ann_filtered_recall_audit": "fra",
    "emb_semantic_contamination": "smc",
    "dedup_decontaminate_semantic": "dds",
    "text_vocab_coverage": "vcv",
    "customers_l_diversity": "ldv",
    "corpus_mixture_temperature": "mxt",
    "streaming_boilerplate_gate": "sbg",
    "dedup_source_vocab_overlap": "svo",
    "warehouse_column_stats": "wcs",
    "dedup_benchmark_canaries": "bcn",
    "dedup_cluster_size_histogram": "csh",
    "text_zipf_octaves": "zpf",
    "events_interarrival_quantiles": "iaq",
    "mm_phash_distance_histogram": "phd",
    "docs_quality_by_length": "qbl",
    "events_user_gini": "gin",
    # round-11 additions (1:1, final line only)
    "streaming_er_delta": "ser",
    "docs_hll_distinct_audit": "hda",
    "mm_video_near_dup": "vnd",
    "customers_k_generalize": "kgn",
    "retrieval_mmr_topk": "mmr",
    "corpus_funnel_by_source": "fns",
    "events_hll_users_daily": "hud",
    "streaming_hll_users": "shl",
    "mm_canonical_media": "cnm",
    "retrieval_known_item_eval": "kie",
    "retrieval_eval_mrr": "mrr",
    "text_pii_extract": "pix",
    "events_user_skew": "usk",
    "warehouse_fk_audit": "fka",
    "corpus_delete_apply": "dla",
    "events_attribution_positional": "atp",
    "events_seasonal_backtest": "snb",
    "events_lateness_profile": "ltp",
    "streaming_fk_gate": "sfg",
    "events_trimmed_mean": "trm",
    "warehouse_null_profile": "nlp",
    "quality_scorer_agreement": "qsa",
    "streaming_decontamination_gate": "sdg",
    "events_user_cusum": "ucu",
    "events_cms_users_daily": "cmd",
    "ann_centroid_drift": "acd",
    "corpus_mixture_actuals": "mxa",
    "docs_language_confusion": "lcf",
    "docs_pack_manifest": "pmf",
    "events_weekly_profile": "wkp",
    "streaming_quality_gate": "sqg",
    "ref_country": "rfk",
    "ref_products": "rfp",
    "ref_clients": "rfc",
    "ref_income": "rfi",
    "ref_avg": "rfa",
    "sales_cube": "cub",
    "streaming_late_data_policy": "stl",
    "streaming_value_quantiles": "stq",
    "streaming_payment_match": "spy",
    "streaming_dedup_replay": "sdd2",
    "customers_without_urgent_orders": "atu",
    "customers_with_urgent_orders": "smu",
    "dedup_simhash_fingerprints": "sfp",
    "sketch_distinct_trigrams": "skt",
    "sql_lateral_top_orders": "lat",
    "sql_above_average_orders": "aav",
    "serving_last_write_wins": "lww",
    "sales_pivot_by_priority": "piv",
    "text_stratified_sample": "str",
    "q12_ship_delay_classes": "q12",
    "q17_small_quantity_revenue": "q17",
    "q19_disjunctive_revenue": "q19",
    "q22_dormant_customers": "q22",
    # round-4 widening: 90 registry entries no longer fit the 2000-char
    # capture at centisecond precision with full names — shorten the
    # remaining long tail (still 1:1, final line only).
    "q5_local_supplier_volume": "q5l",
    "customer_running_spend": "rsp",
    "events_sessionization": "ses",
    "salted_priority_sales": "ssl",
    "top_parts_by_revenue": "tpp",
    "q3_shipping_priority": "q3s",
    "fuzzy_customer_names": "fuz",
    "dedup_canonical_docs": "can",
    "events_tumbling_30s": "tmb",
    "events_sliding_1h_15m": "sl1",
    "text_pack_sequences": "tpk",
    "dedup_exact_recrawl": "dex",
    "dedup_ngram_jaccard": "ngr",
    "dedup_simhash_pairs": "sh",
    "dedup_contamination": "ctm",
    "mm_extract_features": "mmf",
    "asof_priority_rates": "aso",
    "etl_derive_tables": "etl",
    "curation_pipeline": "cur",
    "events_json_props": "ejs",
    "profile_documents": "prf",
    "incremental_sales_rollup": "inr",
    "dedup_minhash_lsh": "mh",
    "dedup_incremental_delta": "inc",
    "text_quality_score": "tq",
    "text_language_id": "tlg",
    "mm_resize_images": "mrz",
    "mm_frame_sample": "mfr",
    "cdc_snapshot_diff": "cdd",
    "docs_expectations": "dxp",
    "text_bm25_search": "b25",
    "retrieval_hybrid_rrf": "rrf",
    "events_rolling_hour_avg": "rav",
    "events_ntile_quartiles": "ntl",
    "events_value_outliers_mad": "emd",
    "dedup_substring_hotspots": "sub",
    "q4_late_order_priority": "q4l",
    "q9_red_parts_profit": "q9p",
    "q16_supplier_diversity": "q16",
    "q21_late_sole_supplier": "q21",
    "streaming_enriched_nation_totals": "sen",
    "streaming_running_totals_final": "sru",
    "pipeline_envelope_decode": "ple",
    "pipeline_partition_scan": "plp",
    "pipeline_streaming_drain": "pls",
    "top_orders_per_customer": "tpo",
    "events_value_histogram": "ehi",
    "emb_near_dup_lsh_multi": "ndm",
    "emb_near_dup_lsh": "ndl",
    "ann_topk_brute": "anb",
    "ann_topk_lsh": "als",
    "ann_topk_ivf": "aiv",
    "cdc_scd2_history": "sc2",
    "streaming_session_windows": "sts",
    "streaming_sliding_1h_15m": "ssw",
    "streaming_drift_tvd": "sdf",
    "customer_retention": "ret",
    "payment_type_share": "psh",
    "events_cohort_retention": "coh",
    "text_quality_sample": "qsm",
    "sales_yoy_full_outer": "yyf",
    "graph_pagerank_suppliers": "pgr",
    "graph_kcore_purchases": "kco",
    "graph_communities_lpa": "lpa",
    "sql_recursive_rollup": "rec",
    "events_concurrency_curve": "cnc",
    "events_transition_matrix": "trn",
    "emb_pq_codes": "pqc",
    "ann_topk_pq": "apq",
    "ann_topk_ivfpq": "ipq",
    # round-9 additions (final line only, 1:1)
    "ann_topk_ivfpq_trained": "ipt",
    "mm_canonical_assets": "mca",
    "streaming_dedup_delta": "sdl",
    "text_pack_bpe": "tpb",
    "corpus_mixture_bpe": "mxb",
    "dedup_exact_substring": "xsb",
    "dedup_remove_substrings": "xrm",
    # round-9 session-2 additions (X119-X123)
    "text_lm_score": "lm",
    "text_tfidf_search": "tfi",
    # round-10 additions (final line only, 1:1)
    "er_entity_ids": "eri",
    "streaming_topk_users": "stk",
    "events_cusum_changepoint": "csm",
    "text_unigram_vocab": "ugv",
    "text_unigram_segment": "ugs",
    "streaming_cusum_gate": "scu",
    "dedup_components_delta": "ccd",
    "mm_afp_near_dup": "afp",
    "docs_sample_fixed_per_lang": "spl",
    "er_link_dirty_names": "eld",
    "text_tokenizer_compare": "tkc",
    "docs_split_leakage_audit": "slk",
    "sketch_accuracy_audit": "ska",
    "corpus_funnel_report": "cfr",  # was "fnl" (collided with events_funnel)
    "customers_k_anonymity": "kan",
    "scd2_point_in_time": "pit",
    "text_phrase_search": "phr",
    "corpus_content_hashes": "cch",
    "docs_sample_weighted_k": "swk",
    "events_user_anomalies": "uan",
    "streaming_user_anomalies": "sua",
    "ann_index_health": "ihl",
    "retrieval_hybrid_rrf3": "rr3",
    "docs_chunk_overlap": "chu",
    "dedup_decontaminate": "dcn",
    "emb_pca_power": "pca",
    "emb_anisotropy_audit": "ani",
    "ann_label_audit": "lba",
    "ann_label_audit_clustered": "lbc",
    "text_bpe_fertility": "frt",
    "text_quality_ensemble": "qen",
    "corpus_curriculum_plan": "cpl",
    "events_ewma_daily": "ewm",
    "docs_pack_chunks": "pkc",
    "text_keywords": "kw",
    "events_anomaly_days": "ano",
    "dedup_chunks_exact": "chd",
    "dedup_source_matrix": "smx",
    "customer_rfm_segments": "rf",
    "events_active_users": "dw",
    "q1_pricing_summary": "q1p",
    "q7_volume_shipping": "q7v",
    "q10_returned_items": "q10",
    "q8_market_share": "q8m",
    "q18_large_orders": "q18",
    "sales_per_nation": "nsl",
    "sales_rollup": "rup",
    "events_type_mode": "tmo",
    "text_fingerprint": "tfp",
    "text_pii_redact": "pii",
    "sketch_heavy_hitters": "cmh",
    "sketch_value_quantiles": "qsk",
    "events_type_value_quantiles": "qkg",
    "events_drift_tvd": "tvd",
    "parts_abc_analysis": "ab",
    "brand_basket_affinity": "bsk",
    "text_vocab_growth": "voc",
    "text_ngram_novelty": "nov",
    "text_bpe_merges": "bpe",
    "text_bpe_segment": "bps",
    "text_dsir_importance": "dsr",
    "sales_monthly_yoy": "yym",
    "q14_promo_revenue": "q14",
    # round-5 additions (final line only, 1:1)
    "q2_min_cost_supplier": "q2m",
    "q6_forecast_revenue": "q6f",
    "q11_important_parts": "q11",
    "q13_order_count_distribution": "q13",
    "q15_top_supplier": "q15",
    "q20_promotion_suppliers": "q20",
    "salted_events_join": "sjo",
    "text_collocations": "col",
    "emb_kmeans_step": "km",
    "docs_sample_fixed": "fxk",
    "docs_split_assign": "tvt",
    "docs_split_leakage_safe": "tvs",
    "corpus_mixture_plan": "mxp",
    "events_value_hour_corr": "vhc",
    "events_daily_trend": "dtr",
    "streaming_payment_match_outer": "sto",
    "streaming_payment_match_full": "stf",
    "events_attribution": "atr",
    # round-6 additions (final line only, 1:1)
    "pipeline_compaction": "plc",
    "salted_lineitem_agg": "sag",
    "ann_recall_audit": "rca",
    "ann_recall_clustered": "rcc",
    "ann_truncation_audit": "tru",
    "emb_hard_negatives": "hng",
    "dedup_lsh_quality": "lsq",
    "dedup_signal_agreement": "sga",
    "events_zorder_scan": "zsc",
    "ann_topk_lsh_multi": "alm",
    "text_build_postings": "pst",
    "text_model_quality": "ftq",
    "curation_source_caps": "scp",
    "graph_triangles_cosupply": "tri",
    "emb_bitext_mine": "btx",
    "bucketed_sales_join": "bkj",
    "text_token_stats": "tks",
    "dedup_components": "cmp",
    "dedup_components_star": "cst",
    "text_repetition": "rep",
    "events_variant_props": "vrt",
    "events_gapfill": "gpf",
    "text_length_quantiles": "lnq",
    "dedup_ensemble": "ens",
    "dedup_semantic": "sdd",
    "mm_asset_stats": "mst",
    "mm_fingerprint": "mfp",
    "mm_phash_near_dup": "mph",
    "events_funnel": "fnl",
    "events_daily_stats": "edy",
    "events_range_follow": "erg",
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
