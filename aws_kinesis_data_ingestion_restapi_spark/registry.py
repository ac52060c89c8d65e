"""Driver-contract registry: named queries + their DuckDB oracle SQL.

Every entry pairs a Spark implementation (``(spark, sf_dir) →
DataFrame``) with ANSI SQL that DuckDB runs over the same parquet
tables. The driver compares row-count + schema + order-insensitive
value-hash, with columns sorted by name — so every computed column is
aliased IDENTICALLY on both sides, and all floating-point measures go
through decimal-exact aggregation (functions/exact.py) so the values
match bit-for-bit across engines.

Three query families:

1. ``pipeline_*`` — the reference's ETL operators (S4 decode, T1-T7
   projections/flattens/explode) driven end-to-end: Spark builds the
   nested order-event form from the TPC-H tables (analytics.
   build_order_events), applies the real pipeline transforms, and the
   oracle checks the flat equivalent with plain SQL.

2. ``ref_*`` — the reference's five Athena analytics queries (SURVEY
   §2.4 Q1-Q8) over the pipeline-derived tables, exercising the actual
   functions in queries.py.

3. general analytics (``q1_*``, ``sales_*``, ``events_*``) — the wider
   query surface (multi-measure aggregates, JSON extraction, temporal
   rollups) sized for the bench.

Extensions (dedup / similarity / text) register from
operators/registry_ext.py and are merged in here.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_kinesis_data_ingestion_restapi_spark import analytics
from aws_kinesis_data_ingestion_restapi_spark import queries as refq
from aws_kinesis_data_ingestion_restapi_spark.functions.exact import davg, dsum
from aws_kinesis_data_ingestion_restapi_spark.operators import sketch as _sketch
from aws_kinesis_data_ingestion_restapi_spark.operators.transforms import (
    derive_all_tables,
    to_orders,
    to_product_details,
    to_purchase_details,
    to_shipping_addresses,
)
from aws_kinesis_data_ingestion_restapi_spark.sources.events import decode_envelope

QueryFn = Callable[[SparkSession, str], DataFrame]


def _derived(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    events = analytics.build_order_events(spark, sf_dir)
    return derive_all_tables(events)


# ---------------------------------------------------------------------------
# 1. pipeline_* — ETL operators end-to-end
# ---------------------------------------------------------------------------


def pipeline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1+T2+T3: projection + trailing-Z ISO parse + date cast."""
    return to_orders(analytics.build_order_events(spark, sf_dir))


def pipeline_product_details(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7: array explode + 2-level struct flatten (round-trips the
    collect_list nesting — output must equal flat lineitem⋈part)."""
    return to_product_details(analytics.build_order_events(spark, sf_dir))


def pipeline_shipping_addresses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6: struct flatten."""
    return to_shipping_addresses(analytics.build_order_events(spark, sf_dir))


def pipeline_purchase_details(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5: struct flatten incl. the purchaise-typo field access."""
    return to_purchase_details(analytics.build_order_events(spark, sf_dir))


def pipeline_envelope_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4: JSON → base64 → envelope → unbase64 → from_json round trip.
    The encode leg uses to_json/base64 (JVM built-ins); the decode leg
    is the engine's real ingest head (sources.events.decode_envelope).
    """
    events = analytics.build_order_events(spark, sf_dir)
    envelopes = events.select(
        F.lit("ingestion-dev").alias("StreamName"),
        F.lit("test-partition-01").alias("PartitionKey"),
        F.base64(F.to_json(F.struct(*events.columns))).alias("Data"),
    )
    decoded = decode_envelope(envelopes)
    return decoded.select(
        "customer_id",
        "order_id",
        "status",
        F.col("purchaise_details.amount").alias("amount"),
        F.size("product_details").alias("n_products"),
    )


def _session_scratch(spark: SparkSession, prefix: str) -> str:
    """Fixed per-session scratch dir (applicationId-keyed): per-call
    mkdtemp accumulated unbounded temp litter across repeated
    gate/bench runs (round-5 ADVICE); overwrite-mode writes make
    reuse idempotent. One helper so every scratch consumer shares the
    same contract."""
    import os
    import tempfile

    base = os.path.join(
        tempfile.gettempdir(),
        f"{prefix}_{spark.sparkContext.applicationId}",
    )
    os.makedirs(base, exist_ok=True)
    return base


def pipeline_partition_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2+K5 end-to-end through the CATALOG path: write
    ``purchase_details`` in the reference's Hive layout
    (``year=YYYY/month=MM``, zero-padded strings — T4; Glue table
    main.tf:1379-1403), register it with the real external-table DDL
    (catalog.create_external_tables + RECOVER PARTITIONS, the
    Glue-crawler analog), then answer a single-month question THROUGH
    the table name. The partition predicate must prune at the
    DIRECTORY level — PartitionFilters on year and month, with only
    that partition's files in the scan — which is strictly more than
    the reference's Glue declarations offer (their partition values
    aren't even queryable, SURVEY §1.2). Plan pinned in
    tests/test_plans.py::test_pipeline_partition_scan_prunes.

    Scale shape: at 100 TB this is THE access path that matters for
    the derived tables — a month slice reads year=/month= directories
    only; everything else is never opened. The oracle checks the same
    aggregate straight from ``orders`` (amount = o_totalprice,
    payment_type = o_orderpriority, one row per order).

    The scratch directory is FIXED per session (keyed on the Spark
    applicationId) rather than a fresh mkdtemp per invocation — the
    query runs in both the gate and the bench, and per-call dirs
    accumulated unbounded temp litter across repeated runs (round-5
    ADVICE); overwrite-mode writes make reuse idempotent."""
    from aws_kinesis_data_ingestion_restapi_spark.catalog import (
        create_external_tables,
    )
    from aws_kinesis_data_ingestion_restapi_spark.sinks import write_partitioned

    base = _session_scratch(spark, "pp_scan")
    events = analytics.build_order_events(spark, sf_dir)
    pd_df = to_purchase_details(events, with_partitions=True)
    write_partitioned(
        pd_df, f"{base}/purchase_details", table="purchase_details",
        mode="overwrite",
    )
    create_external_tables(spark, base, database="pp_gate")
    t = spark.table("pp_gate.purchase_details")
    return (
        t.filter((F.col("year") == "1995") & (F.col("month") == "03"))
        .groupBy("payment_type")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("amount").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_amount"),
        )
        .orderBy("payment_type")
    )


def pipeline_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The small-files MAINTENANCE path (scale.compact_table) driven
    end-to-end under the oracle (VERDICT r5 ask #5): simulate
    streaming append litter — three disjoint slices of ``orders``
    appended as separate micro-batches, 8 tasks each, partitioned by
    o_orderpriority, i.e. up to 3×8 files PER partition directory —
    then compact to bounded-size files preserving the Hive layout,
    and answer a per-priority aggregate THROUGH the compacted table.

    The file-count contract is asserted HARD in here (raise if
    compaction failed to reduce the file count) and surfaced to the
    oracle as the ``files_reduced`` column — the data columns prove
    compaction moved bytes without changing a single value (the
    oracle aggregates ``orders`` directly). The exact counts are
    pinned in tests/test_scale.py, not here, because post-compaction
    file count depends on scan packing, not on query semantics.

    Scale shape: at 100 TB this runs per fresh partition as an
    incremental job; compaction is a scan + rewrite with
    maxRecordsPerFile — no shuffle at all (the Hive layout is
    preserved by partitionBy on write).

    Scratch dir: fixed per session (applicationId-keyed), same
    litter-avoidance contract as pipeline_partition_scan."""
    from aws_kinesis_data_ingestion_restapi_spark.operators.scale import (
        compact_table,
    )
    from aws_kinesis_data_ingestion_restapi_spark.sources.tables import (
        load_table,
    )

    base = _session_scratch(spark, "compact")
    path = f"{base}/orders_smallfiles"
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    for i in range(3):  # disjoint slices ⇒ the union is exactly orders
        mode = "overwrite" if i == 0 else "append"
        (
            orders.filter(F.col("o_orderkey") % 3 == i)
            .repartition(8)
            .write.mode(mode)
            .partitionBy("o_orderpriority")
            .parquet(path)
        )
    files_before = len(spark.read.parquet(path).inputFiles())
    files_after = compact_table(
        spark, path, partition_cols=["o_orderpriority"]
    )
    if files_after >= files_before:
        raise RuntimeError(
            f"compaction did not reduce the file count "
            f"({files_before} -> {files_after})"
        )
    t = spark.read.parquet(path)
    return (
        t.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_amount"),
        )
        .withColumn("files_reduced", F.lit(True))
        .orderBy("o_orderpriority")
    )


def events_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X93: the multi-dimensional DATA-LAYOUT path (scale.zorder_key /
    write_zordered) driven end-to-end under the oracle: rewrite the
    events table clustered on the Morton interleave of (ts, value),
    then answer a 2-D box predicate (a 3-day window AND a value band)
    THROUGH the clustered copy. The oracle runs the same predicate on
    the raw table — a layout rewrite may only change the physical
    shape, never a value (the same proof discipline as
    bucketed_sales_join / salted_*).

    Why this layout is first-class at 100 TB: partitioning prunes ONE
    directory dimension and a linear sort prunes ONE leading column;
    an events/telemetry table is queried by time AND user/value/type
    together, and the z-order curve is the standard trick (Delta
    OPTIMIZE ZORDER BY) that lets parquet footer min/max prune files
    for predicates on ANY dimension subset. The pruning itself is
    MEASURED in tests/test_scale.py (footer-intersection counts,
    z-order vs linear sort on the same data) — this query pins the
    value-identity half of the contract in the driver gate every
    round.

    Quantization grid: ts over the generator's [2024-01-01,
    2024-02-01) UTC epoch range, value clamped to [0, 500) — both
    16-bit, interleaved into one 32-bit key. ``ts`` is normalized
    through functions.exact.as_timestamp BEFORE the rewrite (the
    events parquet has shipped as TIMESTAMP(NANOS)-as-long, NTZ, and
    zoned across generator versions — every other events query
    branches the same way), so the clustered copy always carries a
    real timestamp column and the read-back box predicate stays a
    pushable scan filter. Scratch dir fixed per session
    (applicationId-keyed), same litter contract as
    pipeline_partition_scan."""
    from aws_kinesis_data_ingestion_restapi_spark.functions.exact import (
        as_timestamp,
    )
    from aws_kinesis_data_ingestion_restapi_spark.operators import scale
    from aws_kinesis_data_ingestion_restapi_spark.sources.tables import (
        load_table,
    )

    base = _session_scratch(spark, "zorder")
    path = f"{base}/events_z"
    events = load_table(spark, sf_dir, "events")
    events = events.withColumn(
        "ts", as_timestamp(events, "ts").cast("timestamp")
    )
    z = scale.zorder_key(
        [
            scale.quantize(
                F.unix_timestamp("ts"), lo=1704067200, hi=1706745600, bits=16
            ),
            scale.quantize(F.col("value"), lo=0.0, hi=500.0, bits=16),
        ],
        bits=16,
    )
    scale.write_zordered(events, path, z, n_files=32)
    t = spark.read.parquet(path)
    return (
        t.filter(
            (F.col("ts") >= F.lit("2024-01-10").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-13").cast("timestamp"))
            & (F.col("value") >= 100.0)
            & (F.col("value") < 150.0)
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", scale=6, alias="total_value"),
            F.countDistinct("user_id").alias("unique_users"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# 2. ref_* — the five reference analytics queries over derived tables
# ---------------------------------------------------------------------------


def ref_total_sales_per_country(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _derived(spark, sf_dir)
    pd_exact = t["purchase_details"].withColumn(
        "amount", F.col("amount").cast("decimal(18,2)")
    )
    out = refq.q_total_sales_per_country(pd_exact, t["shipping_addresses"])
    return out.withColumn("total_sales", F.col("total_sales").cast("double"))


def ref_average_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _derived(spark, sf_dir)
    # davg (exact decimal sum ÷ count) instead of F.avg so the double
    # matches DuckDB bit-for-bit; semantics identical to the reference's
    # AVG(amount).
    return t["purchase_details"].agg(davg("amount", alias="average_order_value"))


def ref_total_income_per_payment_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _derived(spark, sf_dir)
    pd_exact = t["purchase_details"].withColumn(
        "amount", F.col("amount").cast("decimal(18,2)")
    )
    out = refq.q_total_income_per_payment_method(pd_exact)
    return out.withColumn("total_income", F.col("total_income").cast("double"))


def ref_most_sales_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _derived(spark, sf_dir)
    return refq.q_most_sales_products(t["product_details"])


def ref_order_and_client_details(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _derived(spark, sf_dir)
    return refq.q_order_and_client_details(t["orders"], t["shipping_addresses"])


# ---------------------------------------------------------------------------
# 3. Streaming-semantics operators, batch-checkable form
# ---------------------------------------------------------------------------


def serving_last_write_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4+E3 as a checkable query: the serving view's last-write-wins
    upsert (DynamoDB ``put_item`` replay semantics,
    lambda_kinesis_consumer:48) expressed as window-function compaction.

    Simulates an at-least-once redelivery: every order arrives twice,
    the second time with status='shipped' (batch_seq 2). The upsert
    result keeps exactly the newest version per (customer_id, order_id)
    — the same dedup rule streaming/sinks.serving_upsert applies per
    micro-batch, here in its scalable shuffle-once window form.
    """
    from pyspark.sql.window import Window

    base = analytics.build_order_events(spark, sf_dir).select(
        "customer_id", "order_id", "order_date", "status"
    )
    v1 = base.withColumn("batch_seq", F.lit(1))
    v2 = base.withColumn("status", F.lit("shipped")).withColumn(
        "batch_seq", F.lit(2)
    )
    w = Window.partitionBy("customer_id", "order_id").orderBy(F.desc("batch_seq"))
    return (
        v1.unionByName(v2)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# Registry tables
# ---------------------------------------------------------------------------

QUERY_FNS: dict[str, QueryFn] = {
    "pipeline_orders": pipeline_orders,
    "pipeline_product_details": pipeline_product_details,
    "pipeline_shipping_addresses": pipeline_shipping_addresses,
    "pipeline_purchase_details": pipeline_purchase_details,
    "pipeline_envelope_decode": pipeline_envelope_decode,
    "pipeline_partition_scan": pipeline_partition_scan,
    "pipeline_compaction": pipeline_compaction,
    "events_zorder_scan": events_zorder_scan,
    "ref_total_sales_per_country": ref_total_sales_per_country,
    "ref_average_order_value": ref_average_order_value,
    "ref_total_income_per_payment_method": ref_total_income_per_payment_method,
    "ref_most_sales_products": ref_most_sales_products,
    "ref_order_and_client_details": ref_order_and_client_details,
    "q1_pricing_summary": analytics.q1_pricing_summary,
    "sales_per_nation": analytics.sales_per_nation,
    "sales_rollup": analytics.sales_rollup,
    "q3_shipping_priority": analytics.q3_shipping_priority,
    "text_length_quantiles": analytics.text_length_quantiles,
    "top_parts_by_revenue": analytics.top_parts_by_revenue,
    "events_daily_stats": analytics.events_daily_stats,
    "events_json_props": analytics.events_json_props,
    "events_tumbling_30s": analytics.events_tumbling_30s,
    "events_sliding_1h_15m": analytics.events_sliding_1h_15m,
    "serving_last_write_wins": serving_last_write_wins,
    "top_orders_per_customer": analytics.top_orders_per_customer,
    "customer_running_spend": analytics.customer_running_spend,
    "payment_type_share": analytics.payment_type_share,
    "events_sessionization": analytics.events_sessionization,
    # join-type surface beyond inner equi-joins (semi / anti / set ops)
    "customers_with_urgent_orders": analytics.customers_with_urgent_orders,
    "customers_without_urgent_orders": analytics.customers_without_urgent_orders,
    "customer_retention": analytics.customer_retention,
    # multi-way and having-filtered join shapes (TPC-H Q5 / Q18)
    "q5_local_supplier_volume": analytics.q5_local_supplier_volume,
    "q18_large_orders": analytics.q18_large_orders,
    # the classic TPC-H optimizer shapes (round 4): dual-role dim join,
    # conditional-aggregate ratios, decorrelated per-group threshold,
    # disjunctive pushdown, scalar-subquery + anti join
    "q7_volume_shipping": analytics.q7_volume_shipping,
    "q8_market_share": analytics.q8_market_share,
    "q10_returned_items": analytics.q10_returned_items,
    "q12_ship_delay_classes": analytics.q12_ship_delay_classes,
    "q14_promo_revenue": analytics.q14_promo_revenue,
    "q17_small_quantity_revenue": analytics.q17_small_quantity_revenue,
    "q19_disjunctive_revenue": analytics.q19_disjunctive_revenue,
    "q22_dormant_customers": analytics.q22_dormant_customers,
    "q4_late_order_priority": analytics.q4_late_order_priority,
    "q9_red_parts_profit": analytics.q9_red_parts_profit,
    "q16_supplier_diversity": analytics.q16_supplier_diversity,
    "q21_late_sole_supplier": analytics.q21_late_sole_supplier,
    # round-5: the battery completes — all 22 TPC-H shapes present
    # (Q2 decorrelated min join-back, Q6 pure pushed-filter aggregate,
    # Q11 group-vs-scalar-total HAVING, Q13 LEFT OUTER count
    # distribution, Q15 max-revenue tie join-back, Q20 nested semi
    # chain)
    "q2_min_cost_supplier": analytics.q2_min_cost_supplier,
    "q6_forecast_revenue": analytics.q6_forecast_revenue,
    "q11_important_parts": analytics.q11_important_parts,
    "q13_order_count_distribution": analytics.q13_order_count_distribution,
    "q15_top_supplier": analytics.q15_top_supplier,
    "q20_promotion_suppliers": analytics.q20_promotion_suppliers,
    # round-5: scale operators as oracle-checked queries
    "salted_events_join": analytics.salted_events_join,
    "salted_lineitem_agg": analytics.salted_lineitem_agg,
    "bucketed_sales_join": analytics.bucketed_sales_join,
    # round-5: exact sufficient-statistics analytics (corr / OLS)
    "events_value_hour_corr": analytics.events_value_hour_corr,
    "events_daily_trend": analytics.events_daily_trend,
    # round-5: last-touch attribution (one window, no range join)
    "events_attribution": analytics.events_attribution,
    # X172 position-based multi-touch attribution (exact integer ppm)
    "events_attribution_positional": analytics.events_attribution_positional,
    # FULL OUTER year-over-year reconciliation
    "sales_yoy_full_outer": analytics.sales_yoy_full_outer,
    # cohort retention matrix (first-seen week × activity week)
    "events_cohort_retention": analytics.events_cohort_retention,
    # time-range window frame / equi-depth buckets / robust outliers
    "events_rolling_hour_avg": analytics.events_rolling_hour_avg,
    "events_ntile_quartiles": analytics.events_ntile_quartiles,
    "events_value_outliers_mad": analytics.events_value_outliers_mad,
    # data-profiling surface
    "events_value_histogram": analytics.events_value_histogram,
    "events_type_mode": analytics.events_type_mode,
    "profile_documents": analytics.profile_documents,
    # materialized-aggregate maintenance (fold deltas, never re-read)
    "incremental_sales_rollup": analytics.incremental_sales_rollup,
    # long→wide PIVOT cross-tab
    "sales_pivot_by_priority": analytics.sales_pivot_by_priority,
    # edit-distance join (deletion-neighborhood blocking)
    "fuzzy_customer_names": analytics.fuzzy_customer_names,
    # skew-salted two-phase aggregation, value-identical to plain GROUP BY
    "salted_priority_sales": analytics.salted_priority_sales,
    # correlated scalar subqueries via the raw SQL surface
    "sql_above_average_orders": analytics.sql_above_average_orders,
    # VARIANT-typed semi-structured access (parse once, typed paths)
    "events_variant_props": analytics.events_variant_props,
    # time-series resample: dense grid + zero-fill + forward-fill
    "events_gapfill": analytics.events_gapfill,
    # ordered temporal funnel (view → click → purchase)
    "events_funnel": analytics.events_funnel,
    # CUBE grouping sets (full lattice, one shuffle)
    "sales_cube": analytics.sales_cube,
    # LATERAL correlated top-k through the raw SQL surface
    "sql_lateral_top_orders": analytics.sql_lateral_top_orders,
    # RECURSIVE CTE hierarchy roll-up (identical SQL text both engines)
    "sql_recursive_rollup": analytics.sql_recursive_rollup,
    # interval-overlap sweep line (two-level distributed prefix sum)
    "events_concurrency_curve": analytics.events_concurrency_curve,
    # first-order Markov transition matrix (LAG surface)
    "events_transition_matrix": analytics.events_transition_matrix,
    # RFM quartile segmentation (threshold scores, no global window)
    "customer_rfm_segments": analytics.customer_rfm_segments,
    # distribution drift (log-free TVD, decimal cross-products)
    "events_drift_tvd": analytics.events_drift_tvd,
    # X130 exact EWMA trend: power-of-two half-life weights, int64 sums
    "events_ewma_daily": analytics.events_ewma_daily,
    # X173 seasonal-naive forecast backtest (calendar joins, int errors)
    "events_seasonal_backtest": analytics.events_seasonal_backtest,
    # X174 event-time disorder profile (two-level prefix max)
    "events_lateness_profile": analytics.events_lateness_profile,
    # X176 exact trimmed mean (rank-trim, decimal-exact sums)
    "events_trimmed_mean": analytics.events_trimmed_mean,
    # X133 leak-free EWMA-residual anomaly flags, 3×MAD band
    "events_anomaly_days": analytics.events_anomaly_days,
    "events_cusum_changepoint": analytics.events_cusum_changepoint,
    # X180 per-user CUSUM changepoints (entity-grain closed form)
    "events_user_cusum": analytics.events_user_cusum,
    # Pareto / ABC classification (integer fixed-point boundaries)
    "parts_abc_analysis": analytics.parts_abc_analysis,
    # market-basket lift (order-key-bounded co-occurrence self-join)
    "brand_basket_affinity": analytics.brand_basket_affinity,
    # monthly seasonality, YoY via calendar self-join (gap-immune)
    "sales_monthly_yoy": analytics.sales_monthly_yoy,
    # DAU / trailing-7-day WAU via contribution explode
    "events_active_users": analytics.events_active_users,
}

# Stateful streaming operators, driven through a real streaming query
# (file source → applyInPandasWithState → memory sink). The state
# MECHANISM is not SQL-expressible, but the drained final results are:
# dedup-under-replay drains to one row per distinct key (both
# deliveries identical), and running totals drain to exactly 2× the
# per-customer batch aggregate — so both get full ORACLE_SQL entries.
from aws_kinesis_data_ingestion_restapi_spark.streaming.registry_stream import (  # noqa: E402
    streaming_decontamination_gate,
    streaming_dedup_delta,
    streaming_dedup_replay,
    streaming_er_delta,
    streaming_fk_gate,
    streaming_hll_users,
    streaming_drift_tvd,
    streaming_enriched_nation_totals,
    streaming_late_data_policy,
    streaming_payment_match,
    streaming_payment_match_full,
    streaming_payment_match_outer,
    streaming_asof_rates,
    streaming_bloom_gate,
    streaming_boilerplate_gate,
    streaming_quality_gate,
    streaming_running_totals_final,
    streaming_session_windows,
    streaming_cusum_gate,
    streaming_sliding_1h_15m,
    streaming_topk_users,
    streaming_user_anomalies,
    streaming_value_quantiles,
)

QUERY_FNS["streaming_dedup_replay"] = streaming_dedup_replay
QUERY_FNS["streaming_dedup_delta"] = streaming_dedup_delta
QUERY_FNS["streaming_er_delta"] = streaming_er_delta
QUERY_FNS["streaming_hll_users"] = streaming_hll_users
QUERY_FNS["streaming_fk_gate"] = streaming_fk_gate
QUERY_FNS["streaming_decontamination_gate"] = streaming_decontamination_gate
QUERY_FNS["streaming_quality_gate"] = streaming_quality_gate
QUERY_FNS["streaming_boilerplate_gate"] = streaming_boilerplate_gate
QUERY_FNS["streaming_bloom_gate"] = streaming_bloom_gate
QUERY_FNS["streaming_asof_rates"] = streaming_asof_rates
QUERY_FNS["streaming_running_totals_final"] = streaming_running_totals_final
QUERY_FNS["streaming_enriched_nation_totals"] = streaming_enriched_nation_totals
QUERY_FNS["streaming_payment_match"] = streaming_payment_match
QUERY_FNS["streaming_payment_match_outer"] = streaming_payment_match_outer
QUERY_FNS["streaming_payment_match_full"] = streaming_payment_match_full
QUERY_FNS["streaming_late_data_policy"] = streaming_late_data_policy
QUERY_FNS["streaming_session_windows"] = streaming_session_windows
QUERY_FNS["streaming_sliding_1h_15m"] = streaming_sliding_1h_15m
QUERY_FNS["streaming_drift_tvd"] = streaming_drift_tvd
QUERY_FNS["streaming_topk_users"] = streaming_topk_users
QUERY_FNS["streaming_cusum_gate"] = streaming_cusum_gate
QUERY_FNS["streaming_user_anomalies"] = streaming_user_anomalies
QUERY_FNS["streaming_value_quantiles"] = streaming_value_quantiles

# merge the dedup / similarity / text-analysis extension surface
from aws_kinesis_data_ingestion_restapi_spark.operators.registry_ext import (  # noqa: E402
    EXT_ORACLE_SQL,
    EXT_QUERY_FNS,
    QSKETCH_BIN_SQL,
)

QUERY_FNS.update(EXT_QUERY_FNS)

# DuckDB fragments for the decimal-exact aggregation contract.
_DSUM2 = "CAST(SUM(CAST({c} AS DECIMAL(18,2))) AS DOUBLE)"
_DSUM6 = "CAST(SUM(CAST({c} AS DECIMAL(18,6))) AS DOUBLE)"
_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * "
    "(CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)
_CHARGE = _DISC_PRICE + " * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))"

_SHIPPING_FLAT = """
    SELECT CAST(o_orderkey AS VARCHAR) AS order_id,
           n_name AS country,
           CAST(c_nationkey AS VARCHAR) AS state,
           c_mktsegment AS city,
           c_name AS street,
           CAST(c_custkey AS VARCHAR) AS zip
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
"""


def _cusum_oracle(day_source: str) -> str:
    """X138/X140 shared CUSUM oracle core (ONE template, two day
    universes — the batch query feeds every day, the streaming gate
    only watermark-CLOSED days — so the arithmetic cannot diverge):
    the exact closed form S_t = P_t - min(0, min_j P_j) over prefix
    sums, integer units (events x d_b), allowance sum_b // 10, alarm
    at S > sum_b, changepoint = first alarm day."""
    return f"""
        WITH daily AS (
            {day_source}
        ),
        idx AS (
            SELECT day, n, ROW_NUMBER() OVER (ORDER BY day) AS i
            FROM daily
        ),
        b AS (
            SELECT CAST(SUM(n) AS BIGINT) AS sum_b,
                   CAST(COUNT(*) AS BIGINT) AS d_b
            FROM idx WHERE i <= 14
        ),
        z AS (
            SELECT day, n, b.sum_b,
                   n * b.d_b - b.sum_b - (b.sum_b // 10) AS zpos,
                   b.sum_b - n * b.d_b - (b.sum_b // 10) AS zneg
            FROM idx CROSS JOIN b WHERE i > b.d_b
        ),
        p AS (
            SELECT day, n, sum_b,
                   SUM(zpos) OVER w AS ppos,
                   SUM(zneg) OVER w AS pneg
            FROM z
            WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
        ),
        s AS (
            SELECT day, n, sum_b,
                   CAST(ppos - LEAST(0, MIN(ppos) OVER w) AS BIGINT)
                       AS s_pos,
                   CAST(pneg - LEAST(0, MIN(pneg) OVER w) AS BIGINT)
                       AS s_neg
            FROM p
            WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
        ),
        a AS (
            SELECT day, n AS n_events, s_pos, s_neg,
                   (s_pos > sum_b OR s_neg > sum_b) AS alarm
            FROM s
        )
        SELECT day, n_events, s_pos, s_neg, alarm,
               alarm AND COALESCE(SUM(CASE WHEN alarm THEN 1 ELSE 0 END)
                   OVER (ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) = 0 AS is_changepoint
        FROM a
        ORDER BY day
    """


ORACLE_SQL: dict[str, str] = {
    "pipeline_orders": """
        SELECT CAST(o_custkey AS VARCHAR) AS customer_id,
               CAST(o_orderkey AS VARCHAR) AS order_id,
               CAST(o_orderdate AS DATE) AS order_date,
               o_orderstatus AS status
        FROM orders
    """,
    "pipeline_product_details": """
        SELECT CAST(l_partkey AS VARCHAR) AS product_id,
               CAST(l_orderkey AS VARCHAR) AS order_id,
               p_name AS name,
               CAST(l_quantity AS INTEGER) AS quantity,
               l_returnflag AS color,
               l_linestatus AS size
        FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
    "pipeline_shipping_addresses": _SHIPPING_FLAT,
    "pipeline_purchase_details": """
        SELECT CAST(o_orderkey AS VARCHAR) AS order_id,
               o_orderpriority AS payment_type,
               o_totalprice AS amount,
               'USD' AS currency,
               CAST(o_orderkey % 13 + 1 AS INTEGER) AS instalments
        FROM orders
    """,
    "pipeline_envelope_decode": """
        SELECT CAST(o_custkey AS VARCHAR) AS customer_id,
               CAST(o_orderkey AS VARCHAR) AS order_id,
               o_orderstatus AS status,
               o_totalprice AS amount,
               (SELECT CAST(COUNT(*) AS INTEGER) FROM lineitem l
                 WHERE l.l_orderkey = o.o_orderkey) AS n_products
        FROM orders o
    """,
    # last-touch attribution: two IGNORE-NULLS LAST_VALUEs over the
    # same touch predicate pick the same row the Spark struct carries;
    # exact epoch-ns arithmetic; strict 1-PRECEDING frame. ORDER BY
    # (ns, event_id) — the stable secondary key pins tie order
    # cross-engine (round-5 ADVICE; same total order as the Spark
    # window in analytics.events_attribution)
    # X180 per-user CUSUM: X138's exact expressions with user-
    # partitioned windows (per-user baseline via conditional window
    # sums, closed-form S, first-alarm flag)
    "events_user_cusum": """
        WITH daily AS (
            SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2
        ),
        idx AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                         ORDER BY day) AS i
            FROM daily
        ),
        en AS (
            SELECT user_id, day, n, i,
                   CAST(SUM(CASE WHEN i <= 14 THEN n END)
                        OVER (PARTITION BY user_id) AS BIGINT) AS sum_b,
                   COUNT(CASE WHEN i <= 14 THEN 1 END)
                        OVER (PARTITION BY user_id) AS d_b
            FROM idx
        ),
        z AS (
            SELECT user_id, day, n, sum_b,
                   n * d_b - sum_b - (sum_b // 10) AS zpos,
                   sum_b - n * d_b - (sum_b // 10) AS zneg
            FROM en WHERE i > d_b
        ),
        p AS (
            SELECT user_id, day, n, sum_b,
                   SUM(zpos) OVER w AS ppos,
                   SUM(zneg) OVER w AS pneg
            FROM z
            WINDOW w AS (PARTITION BY user_id ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW)
        ),
        s AS (
            SELECT user_id, day, n, sum_b,
                   CAST(ppos - LEAST(0, MIN(ppos) OVER w) AS BIGINT)
                       AS s_pos,
                   CAST(pneg - LEAST(0, MIN(pneg) OVER w) AS BIGINT)
                       AS s_neg
            FROM p
            WINDOW w AS (PARTITION BY user_id ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW)
        ),
        a AS (
            SELECT user_id, day, CAST(n AS BIGINT) AS n_events,
                   s_pos, s_neg,
                   (s_pos > sum_b OR s_neg > sum_b) AS alarm
            FROM s
        )
        SELECT user_id, day, n_events, s_pos, s_neg, alarm,
               alarm AND COALESCE(SUM(CASE WHEN alarm THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING), 0) = 0
                   AS is_changepoint
        FROM a ORDER BY user_id, day
    """,
    # X176 trimmed mean: identical stable rank, integer trim bound,
    # decimal-exact sums, one division per mean
    "events_trimmed_mean": """
        WITH ranked AS (
            SELECT event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY value, event_id) AS rk,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM events
        ),
        kept AS (
            SELECT event_type, value FROM ranked
            WHERE rk > n * 5 // 100 AND rk <= n - n * 5 // 100
        ),
        raw AS (
            SELECT event_type, COUNT(*) AS n_total,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                       AS s_raw
            FROM events GROUP BY 1
        ),
        tr AS (
            SELECT event_type, COUNT(*) AS n_kept,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                       AS s_trim
            FROM kept GROUP BY 1
        )
        SELECT raw.event_type, CAST(n_total AS BIGINT) AS n_total,
               CAST(n_kept AS BIGINT) AS n_kept,
               s_raw / CAST(n_total AS DOUBLE) AS mean_raw,
               s_trim / CAST(n_kept AS DOUBLE) AS mean_trimmed
        FROM raw JOIN tr USING (event_type)
        ORDER BY event_type
    """,
    # X175 streaming FK gate: the corrupted fixture's orphans by
    # NOT EXISTS — the anti join's exact NULL semantics (a NULL child
    # key IS an orphan, and a NULL parent key never vacuously empties
    # the result the way NOT IN would — r11 ADVICE #2); double
    # delivery cannot add rows (post-drain DISTINCT)
    "streaming_fk_gate": """
        WITH feed AS (
            SELECT o_orderkey AS order_id,
                   CASE WHEN o_custkey % 13 = 0
                        THEN o_custkey + 10000000
                        ELSE o_custkey END AS customer_id
            FROM orders
        )
        SELECT order_id, customer_id FROM feed f
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = f.customer_id)
        ORDER BY order_id
    """,
    # X174 lateness profile: the PLAIN strict-prefix-max window (the
    # oracle may afford the global order the engine decomposes
    # two-level), identical bucket edges and single-division shares
    "events_lateness_profile": """
        WITH e AS (SELECT event_id, epoch_ns(ts) AS ns FROM events),
        d AS (
            SELECT GREATEST(COALESCE(
                       MAX(ns) OVER (ORDER BY event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND 1 PRECEDING) - ns,
                       0), 0) AS dis
            FROM e
        ),
        b AS (
            SELECT CASE
                WHEN dis <= 0 THEN '0_in_order'
                WHEN dis <= 1000000000 THEN '1_le_1s'
                WHEN dis <= 10000000000 THEN '2_le_10s'
                WHEN dis <= 60000000000 THEN '3_le_60s'
                WHEN dis <= 600000000000 THEN '4_le_10m'
                WHEN dis <= 3600000000000 THEN '5_le_1h'
                ELSE '6_gt_1h' END AS bucket
            FROM d
        ),
        c AS (SELECT bucket, COUNT(*) AS n FROM b GROUP BY 1)
        SELECT bucket, CAST(n AS BIGINT) AS n_events,
               CAST(n AS DOUBLE)
                   / CAST(SUM(n) OVER () AS DOUBLE) AS share,
               CAST(SUM(n) OVER (ORDER BY bucket
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS DOUBLE)
                   / CAST(SUM(n) OVER () AS DOUBLE) AS cum_share
        FROM c
        ORDER BY bucket
    """,
    # X173 backtest: identical calendar self-joins (gap-immune), exact
    # integer error sums, single-division MAEs and ratio
    "events_seasonal_backtest": """
        WITH daily AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   COUNT(*) AS n
            FROM events GROUP BY 1
        ),
        ev AS (
            SELECT t.n, m7.n AS n7, m1.n AS n1
            FROM daily t
            JOIN daily m7 ON t.day = m7.day + 7
            JOIN daily m1 ON t.day = m1.day + 1
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(ABS(n - n7)) AS BIGINT) AS abs_err_seasonal,
               CAST(SUM(ABS(n - n1)) AS BIGINT) AS abs_err_naive,
               CAST(SUM(ABS(n - n7)) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS mae_seasonal,
               CAST(SUM(ABS(n - n1)) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS mae_naive,
               CAST(SUM(ABS(n - n7)) AS DOUBLE)
                   / CAST(SUM(ABS(n - n1)) AS DOUBLE)
                   AS seasonal_vs_naive
        FROM ev
    """,
    # X172 positional attribution: identical value-RANGE frame, struct
    # min/max first/last with (ns, event_id) tie-break, exact ppm
    # credits (middle q = 200000 // (n-2), remainder to the LAST touch)
    "events_attribution_positional": """
        WITH e AS (
            SELECT user_id, event_type, event_id, epoch_ns(ts) AS ns
            FROM events
        ),
        fr AS (
            SELECT user_id, event_type, ns,
                   CASE WHEN event_type IN ('view', 'click', 'signup')
                        THEN {'t_ns': ns, 't_id': event_id,
                              't_type': event_type} END AS touch
            FROM e
        ),
        agg AS (
            SELECT event_type,
                   count(touch) OVER w AS n,
                   min(touch) OVER w AS first_t,
                   max(touch) OVER w AS last_t,
                   count(CASE WHEN touch.t_type = 'view' THEN 1 END)
                       OVER w AS cnt_view,
                   count(CASE WHEN touch.t_type = 'click' THEN 1 END)
                       OVER w AS cnt_click,
                   count(CASE WHEN touch.t_type = 'signup' THEN 1 END)
                       OVER w AS cnt_signup
            FROM fr
            WINDOW w AS (PARTITION BY user_id ORDER BY ns
                         RANGE BETWEEN 86400000000000 PRECEDING
                                   AND 1 PRECEDING)
        ),
        p AS (SELECT * FROM agg WHERE event_type = 'purchase'),
        st AS (
            SELECT 'view' AS touch_type, CASE
                 WHEN n = 0 THEN 0
                 WHEN n = 1 THEN 1000000 * (CASE WHEN first_t.t_type = 'view' THEN 1 ELSE 0 END)
                 WHEN n = 2 THEN 500000 * (CASE WHEN first_t.t_type = 'view' THEN 1 ELSE 0 END) + 500000 * (CASE WHEN last_t.t_type = 'view' THEN 1 ELSE 0 END)
                 ELSE 400000 * (CASE WHEN first_t.t_type = 'view' THEN 1 ELSE 0 END)
                    + (400000 + (200000 - (200000 // (n - 2)) * (n - 2)))
                        * (CASE WHEN last_t.t_type = 'view' THEN 1 ELSE 0 END)
                    + (200000 // (n - 2))
                        * (cnt_view - (CASE WHEN first_t.t_type = 'view' THEN 1 ELSE 0 END) - (CASE WHEN last_t.t_type = 'view' THEN 1 ELSE 0 END))
               END AS c FROM p
            UNION ALL
            SELECT 'click' AS touch_type, CASE
                 WHEN n = 0 THEN 0
                 WHEN n = 1 THEN 1000000 * (CASE WHEN first_t.t_type = 'click' THEN 1 ELSE 0 END)
                 WHEN n = 2 THEN 500000 * (CASE WHEN first_t.t_type = 'click' THEN 1 ELSE 0 END) + 500000 * (CASE WHEN last_t.t_type = 'click' THEN 1 ELSE 0 END)
                 ELSE 400000 * (CASE WHEN first_t.t_type = 'click' THEN 1 ELSE 0 END)
                    + (400000 + (200000 - (200000 // (n - 2)) * (n - 2)))
                        * (CASE WHEN last_t.t_type = 'click' THEN 1 ELSE 0 END)
                    + (200000 // (n - 2))
                        * (cnt_click - (CASE WHEN first_t.t_type = 'click' THEN 1 ELSE 0 END) - (CASE WHEN last_t.t_type = 'click' THEN 1 ELSE 0 END))
               END AS c FROM p
            UNION ALL
            SELECT 'signup' AS touch_type, CASE
                 WHEN n = 0 THEN 0
                 WHEN n = 1 THEN 1000000 * (CASE WHEN first_t.t_type = 'signup' THEN 1 ELSE 0 END)
                 WHEN n = 2 THEN 500000 * (CASE WHEN first_t.t_type = 'signup' THEN 1 ELSE 0 END) + 500000 * (CASE WHEN last_t.t_type = 'signup' THEN 1 ELSE 0 END)
                 ELSE 400000 * (CASE WHEN first_t.t_type = 'signup' THEN 1 ELSE 0 END)
                    + (400000 + (200000 - (200000 // (n - 2)) * (n - 2)))
                        * (CASE WHEN last_t.t_type = 'signup' THEN 1 ELSE 0 END)
                    + (200000 // (n - 2))
                        * (cnt_signup - (CASE WHEN first_t.t_type = 'signup' THEN 1 ELSE 0 END) - (CASE WHEN last_t.t_type = 'signup' THEN 1 ELSE 0 END))
               END AS c FROM p
            UNION ALL
            SELECT 'none', CASE WHEN n = 0 THEN 1000000 ELSE 0 END FROM p
        ),
        tot AS (SELECT COUNT(*) AS np FROM p)
        SELECT touch_type, CAST(SUM(c) AS BIGINT) AS credit_ppm,
               CAST(SUM(c) AS DOUBLE) / 1000000.0 / CAST(np AS DOUBLE)
                   AS share
        FROM st, tot GROUP BY 1, np ORDER BY 1
    """,
    "events_attribution": """
        WITH e AS (
            SELECT user_id, event_type, event_id, epoch_ns(ts) AS ns
            FROM events
        ),
        lt AS (
            SELECT user_id, event_type, ns,
                   LAST_VALUE(CASE WHEN event_type IN
                                   ('view','click','signup')
                              THEN ns END IGNORE NULLS)
                     OVER (PARTITION BY user_id ORDER BY ns, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS t_ns,
                   LAST_VALUE(CASE WHEN event_type IN
                                   ('view','click','signup')
                              THEN event_type END IGNORE NULLS)
                     OVER (PARTITION BY user_id ORDER BY ns, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS t_type
            FROM e
        ),
        conv AS (
            SELECT CASE WHEN t_ns IS NOT NULL
                         AND ns - t_ns <= 86400000000000
                        THEN t_type ELSE 'none' END AS touch_type
            FROM lt WHERE event_type = 'purchase'
        ),
        tot AS (SELECT COUNT(*) AS n_total FROM conv)
        SELECT touch_type, COUNT(*) AS n_conversions,
               CAST(COUNT(*) AS DOUBLE) * 100.0
                 / CAST(n_total AS DOUBLE) AS pct
        FROM conv, tot
        GROUP BY 1, n_total
        ORDER BY 1
    """,
    # exact sufficient statistics → one double formula, identical text
    # both engines (Spark's corr() would float-drift cross-engine)
    "events_value_hour_corr": """
        WITH per AS (
            SELECT event_type,
                   COUNT(*) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   SUM(y) AS sy,
                   SUM(yy) AS syy,
                   SUM(xy) AS sxy
            FROM (
                SELECT event_type,
                       CAST(hour(ts) AS BIGINT) AS x,
                       CAST(value AS DECIMAL(12,4)) AS y,
                       CAST(value AS DECIMAL(12,4))
                         * CAST(value AS DECIMAL(12,4)) AS yy,
                       CAST(CAST(hour(ts) AS BIGINT) AS DECIMAL(2,0))
                         * CAST(value AS DECIMAL(12,4)) AS xy
                FROM events
            )
            GROUP BY 1
        )
        SELECT event_type, n,
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                   AS value_hour_corr
        FROM per
        ORDER BY 1
    """,
    "events_daily_trend": """
        WITH daily AS (
            SELECT event_type,
                   CAST(datediff('day', DATE '1970-01-01',
                                 CAST(date_trunc('day', ts) AS DATE))
                        AS BIGINT) AS x,
                   COUNT(*) AS c
            FROM events
            GROUP BY 1, CAST(date_trunc('day', ts) AS DATE)
        ),
        per AS (
            SELECT event_type,
                   COUNT(*) AS n_days,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(c) AS BIGINT) AS sc,
                   CAST(SUM(x * c) AS BIGINT) AS sxc
            FROM daily
            GROUP BY 1
        )
        SELECT event_type, n_days,
               (CAST(n_days AS DOUBLE) * CAST(sxc AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sc AS DOUBLE))
               / (CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
               (CAST(sc AS DOUBLE)
                - (CAST(n_days AS DOUBLE) * CAST(sxc AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sc AS DOUBLE))
                  / (CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * CAST(sx AS DOUBLE))
               / CAST(n_days AS DOUBLE) AS intercept
        FROM per
        ORDER BY 1
    """,
    # one row per order; the Hive partition values derive from the
    # (parsed) order_date, so year=1995/month=03 ≡ the orderdate month.
    "pipeline_partition_scan": f"""
        SELECT o_orderpriority AS payment_type,
               COUNT(*) AS n_orders,
               {_DSUM2.format(c='o_totalprice')} AS total_amount
        FROM orders
        WHERE strftime(o_orderdate, '%Y') = '1995'
          AND strftime(o_orderdate, '%m') = '03'
        GROUP BY 1
        ORDER BY 1
    """,
    "q2_min_cost_supplier": """
        WITH offers AS (
            SELECT l_partkey, s_name, s_acctbal, n_name AS nation,
                   CAST(l_extendedprice AS DECIMAL(12,2)) AS price
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            JOIN part ON l_partkey = p_partkey
            WHERE r_name = 'ASIA' AND p_type = 'LARGE'
        ),
        mins AS (
            SELECT l_partkey AS mp_key, MIN(price) AS min_price
            FROM offers GROUP BY 1
        )
        SELECT DISTINCT s_acctbal, s_name, nation,
               l_partkey AS part_key,
               CAST(min_price AS DOUBLE) AS min_price
        FROM offers JOIN mins ON l_partkey = mp_key AND price = min_price
        ORDER BY s_acctbal DESC, nation, s_name, part_key
        LIMIT 100
    """,
    "q6_forecast_revenue": """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
               AS revenue
        FROM lineitem
        WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
          AND CAST(l_discount AS DECIMAL(4,2))
              BETWEEN CAST('0.05' AS DECIMAL(4,2))
                  AND CAST('0.07' AS DECIMAL(4,2))
          AND l_quantity < 24
    """,
    # the threshold compares identical DOUBLE projections of the exact
    # decimal sums on both engines (decimal-domain multiply would
    # overflow 38 digits on the total side — see the Spark docstring)
    "q11_important_parts": """
        WITH supply AS (
            SELECT l_partkey,
                   CAST(l_extendedprice AS DECIMAL(12,2))
                   * CAST(l_quantity AS DECIMAL(6,2)) AS val
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_5'
        ),
        per_part AS (
            SELECT l_partkey AS part_key, SUM(val) AS value_dec
            FROM supply GROUP BY 1
        ),
        tot AS (SELECT SUM(value_dec) AS total_dec FROM per_part)
        SELECT part_key, CAST(value_dec AS DOUBLE) AS supply_value
        FROM per_part, tot
        WHERE CAST(value_dec AS DOUBLE) * 1000.0
              > CAST(total_dec AS DOUBLE) * 2.0
        ORDER BY supply_value DESC, part_key
    """,
    "q13_order_count_distribution": """
        WITH per_cust AS (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '1-URGENT'
            GROUP BY 1
        )
        SELECT c_count, COUNT(*) AS custdist
        FROM per_cust
        GROUP BY 1
        ORDER BY custdist DESC, c_count DESC
    """,
    "q15_top_supplier": """
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                       * (CAST(1 AS DECIMAL(3,2))
                          - CAST(l_discount AS DECIMAL(4,2)))) AS rev_dec
            FROM lineitem
            WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
            GROUP BY 1
        ),
        m AS (SELECT MAX(rev_dec) AS max_rev FROM revenue)
        SELECT s_suppkey AS supplier_key, s_name,
               CAST(rev_dec AS DOUBLE) AS total_revenue
        FROM revenue
        CROSS JOIN m
        JOIN supplier ON supplier_no = s_suppkey
        WHERE rev_dec = max_rev
        ORDER BY supplier_key
    """,
    "q20_promotion_suppliers": f"""
        WITH qualifying AS (
            SELECT l_suppkey
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE '%blue%'
              AND l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
            GROUP BY l_suppkey, l_partkey
            HAVING {_DSUM2.format(c='l_quantity')} > 60
        )
        SELECT s_suppkey AS supplier_key, s_name, s_acctbal
        FROM supplier
        WHERE s_suppkey IN (SELECT l_suppkey FROM qualifying)
        ORDER BY supplier_key
    """,
    # the compacted table must hold EXACTLY the orders rows (three
    # disjoint o_orderkey%3 slices re-appended, then rewritten) —
    # the oracle aggregates orders directly; files_reduced mirrors
    # the hard in-query file-count assertion
    "pipeline_compaction": f"""
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               {_DSUM2.format(c='o_totalprice')} AS total_amount,
               TRUE AS files_reduced
        FROM orders
        GROUP BY 1
        ORDER BY 1
    """,
    # the z-ordered copy must hold EXACTLY the events rows — the
    # oracle answers the same 2-D box predicate straight off the raw
    # table; the clustered layout may only change the physical shape
    "events_zorder_scan": f"""
        SELECT event_type,
               COUNT(*) AS n_events,
               {_DSUM6.format(c='value')} AS total_value,
               COUNT(DISTINCT user_id) AS unique_users
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-13'
          AND value >= 100.0 AND value < 150.0
        GROUP BY 1
        ORDER BY 1
    """,
    # salted two-phase agg vs the plain GROUP BY: the salt may only
    # change the shuffle shape, never a value; sums stay decimal until
    # the final double cast on both engines
    "salted_lineitem_agg": """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_qty,
               CAST(MAX(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS max_price,
               CAST(MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS min_price
        FROM lineitem
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "salted_events_join": """
        WITH dim AS (
            SELECT DISTINCT event_type, LENGTH(event_type) AS type_weight
            FROM events
        )
        SELECT e.event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,4))
                        * CAST(type_weight AS DECIMAL(3,0))) AS DOUBLE)
                   AS weighted_value
        FROM events e JOIN dim USING (event_type)
        GROUP BY 1
        ORDER BY 1
    """,
    "bucketed_sales_join": f"""
        SELECT c_mktsegment AS segment,
               COUNT(*) AS n_orders,
               {_DSUM2.format(c='o_totalprice')} AS total_sales
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1
        ORDER BY 1
    """,
    "ref_total_sales_per_country": f"""
        SELECT n_name AS country,
               {_DSUM2.format(c='o_totalprice')} AS total_sales
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY total_sales DESC
    """,
    "ref_average_order_value": f"""
        SELECT {_DSUM2.format(c='o_totalprice')} / COUNT(o_totalprice)
               AS average_order_value
        FROM orders
    """,
    "ref_total_income_per_payment_method": f"""
        SELECT o_orderpriority AS payment_type,
               {_DSUM2.format(c='o_totalprice')} AS total_income
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY total_income DESC
    """,
    "ref_most_sales_products": """
        SELECT p_name AS name,
               CAST(SUM(CAST(l_quantity AS INTEGER)) AS BIGINT)
                   AS total_quantity_sold
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_name
        ORDER BY total_quantity_sold DESC
    """,
    "ref_order_and_client_details": """
        SELECT CAST(o_custkey AS VARCHAR) AS customer_id,
               CAST(o_orderkey AS VARCHAR) AS order_id,
               CAST(o_orderdate AS DATE) AS order_date,
               o_orderstatus AS status,
               n_name AS country,
               CAST(c_nationkey AS VARCHAR) AS state,
               c_mktsegment AS city,
               c_name AS street,
               CAST(c_custkey AS VARCHAR) AS zip
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
    """,
    "q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               {_DSUM2.format(c='l_quantity')} AS sum_qty,
               {_DSUM2.format(c='l_extendedprice')} AS sum_base_price,
               CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
               CAST(SUM({_CHARGE}) AS DOUBLE) AS sum_charge,
               {_DSUM2.format(c='l_quantity')} / COUNT(l_quantity) AS avg_qty,
               {_DSUM2.format(c='l_extendedprice')} / COUNT(l_extendedprice)
                   AS avg_price,
               {_DSUM2.format(c='l_discount')} / COUNT(l_discount) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "sales_per_nation": f"""
        SELECT n_name AS nation,
               {_DSUM2.format(c='o_totalprice')} AS total_sales,
               COUNT(*) AS order_count
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY total_sales DESC
    """,
    "sales_rollup": f"""
        SELECT GROUPING(n_name, o_orderpriority) AS gid,
               n_name AS nation,
               o_orderpriority AS priority,
               {_DSUM2.format(c='o_totalprice')} AS total_sales,
               COUNT(*) AS order_count
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY ROLLUP(n_name, o_orderpriority)
        ORDER BY gid, nation, priority
    """,
    "q3_shipping_priority": f"""
        SELECT o_orderkey,
               CAST(o_orderdate AS DATE) AS order_date,
               o_orderpriority,
               CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE o_orderdate < TIMESTAMP '1996-03-15'
          AND l_shipdate > TIMESTAMP '1996-03-15'
          AND c_mktsegment = 'BUILDING'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 20
    """,
    "text_length_quantiles": r"""
        SELECT lang,
               COUNT(*) AS n_docs,
               quantile_cont(len(list_filter(string_split_regex(lower(trim(text)),
                   '\s+'), t -> t != '')), 0.25) AS p25,
               quantile_cont(len(list_filter(string_split_regex(lower(trim(text)),
                   '\s+'), t -> t != '')), 0.5) AS p50,
               quantile_cont(len(list_filter(string_split_regex(lower(trim(text)),
                   '\s+'), t -> t != '')), 0.75) AS p75
        FROM documents
        GROUP BY lang
        ORDER BY lang
    """,
    "top_parts_by_revenue": f"""
        SELECT p_brand,
               CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue,
               {_DSUM2.format(c='l_quantity')} AS total_qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
        ORDER BY revenue DESC
    """,
    "events_daily_stats": f"""
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               event_type,
               COUNT(*) AS n_events,
               {_DSUM6.format(c='value')} AS total_value,
               COUNT(DISTINCT user_id) AS unique_users
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "events_json_props": f"""
        SELECT CAST(props->>'k' AS INTEGER) AS k,
               COUNT(*) AS n,
               {_DSUM6.format(c='value')} AS total_value
        FROM events
        GROUP BY 1
        ORDER BY 1
    """,
    # sliding windows: every event replayed into its 4 overlapping
    # 1h/15min windows (k in [0,4)) — the same epoch-floor arithmetic
    # as the tumbling oracle, shifted k slides back
    "events_sliding_1h_15m": f"""
        SELECT CAST(to_timestamp(s) AS TIMESTAMP) AS window_start,
               CAST(to_timestamp(s + 3600) AS TIMESTAMP) AS window_end,
               COUNT(*) AS n_events,
               {_DSUM6.format(c='value')} AS total_value,
               COUNT(DISTINCT user_id) AS n_users
        FROM (
            SELECT (FLOOR(epoch(ts) / 900) - k) * 900 AS s, value, user_id
            FROM events, UNNEST([0, 1, 2, 3]) AS t(k)
        )
        GROUP BY 1, 2
        ORDER BY 1
    """,
    "events_tumbling_30s": f"""
        SELECT CAST(to_timestamp(FLOOR(epoch(ts) / 30) * 30) AS TIMESTAMP)
                   AS window_start,
               CAST(to_timestamp(FLOOR(epoch(ts) / 30) * 30 + 30) AS TIMESTAMP)
                   AS window_end,
               COUNT(*) AS n_events,
               {_DSUM6.format(c='value')} AS total_value,
               COUNT(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY 1, 2
        ORDER BY 1
    """,
    "top_orders_per_customer": """
        SELECT CAST(o_custkey AS VARCHAR) AS customer_id,
               CAST(o_orderkey AS VARCHAR) AS order_id,
               o_totalprice AS amount,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rank
        FROM orders
        QUALIFY rank <= 3
    """,
    "customer_running_spend": """
        SELECT CAST(o_custkey AS VARCHAR) AS customer_id,
               CAST(o_orderkey AS VARCHAR) AS order_id,
               CAST(o_orderdate AS DATE) AS order_date,
               o_totalprice AS amount,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS running_spend
        FROM orders
    """,
    "payment_type_share": f"""
        WITH per_type AS (
            SELECT o_orderpriority AS payment_type,
                   {_DSUM2.format(c='o_totalprice')} AS total_income
            FROM orders
            GROUP BY o_orderpriority
        ),
        grand AS (
            SELECT {_DSUM2.format(c='total_income')} AS g FROM per_type
        )
        SELECT payment_type, total_income, total_income / g AS income_share
        FROM per_type, grand
        ORDER BY total_income DESC
    """,
    # Spark session_window semantics: events merge while the gap to the
    # previous event is < 8 h; session_end = last event + 8 h.
    "events_sessionization": f"""
        WITH o AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w >= INTERVAL 8 HOUR
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        s AS (
            SELECT user_id, ts, value,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS sid
            FROM o
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 8 HOUR AS session_end,
               COUNT(*) AS n_events,
               {_DSUM6.format(c='value')} AS total_value
        FROM s
        GROUP BY user_id, sid
        ORDER BY user_id, session_start
    """,
    # hourly resample: grid = generate_series over the global span per
    # type; zero-fill on the join miss; carried_value = last non-null
    # hourly total (IGNORE NULLS window), 0.0 before the first actual.
    # Totals are decimal-exact doubles, so ffill copies identical bits.
    "events_gapfill": f"""
        WITH e AS (
            SELECT date_trunc('hour', ts) AS hour, event_type, value
            FROM events
        ),
        actual AS (
            SELECT event_type, hour, COUNT(*) AS n,
                   {_DSUM6.format(c='value')} AS v
            FROM e GROUP BY 1, 2
        ),
        bounds AS (SELECT MIN(hour) AS h0, MAX(hour) AS h1 FROM e),
        grid AS (
            SELECT event_type,
                   unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
            FROM (SELECT DISTINCT event_type FROM events) CROSS JOIN bounds
        )
        SELECT g.event_type, g.hour,
               COALESCE(n, 0) AS n_events,
               COALESCE(v, 0.0) AS total_value,
               COALESCE(last_value(v IGNORE NULLS) OVER (
                   PARTITION BY g.event_type ORDER BY g.hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 0.0) AS carried_value
        FROM grid g
        LEFT JOIN actual a ON a.event_type = g.event_type AND a.hour = g.hour
    """,
    # the full grouping lattice; null markers on subtotal rows match
    # Spark's cube() output
    "sales_cube": f"""
        SELECT n_name AS nation, o_orderpriority AS priority,
               COUNT(*) AS n_orders,
               {_DSUM2.format(c='o_totalprice')} AS total_sales
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY CUBE (n_name, o_orderpriority)
    """,
    # IDENTICAL query text both engines (modulo view names) — LATERAL
    # is SQL standard; customers with no orders drop in both
    "sql_lateral_top_orders": """
        SELECT c.c_custkey AS customer_key,
               t.o_orderkey AS order_key,
               t.o_totalprice AS amount
        FROM customer c,
             LATERAL (
                 SELECT o_orderkey, o_totalprice
                 FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey
                 LIMIT 2
             ) t
    """,
    # the IDENTICAL recursive text (analytics._RECURSIVE_ROLLUP_SQL)
    # with the view name swapped for the DuckDB-registered table
    "sql_recursive_rollup": analytics._RECURSIVE_ROLLUP_SQL.format(
        supplier="supplier"
    ),
    # ordered funnel: each stage's first event must be strictly after
    # the user's previous stage's first event
    "events_funnel": """
        WITH b AS (SELECT user_id, event_type, ts AS t FROM events),
        s1 AS (
            SELECT user_id, MIN(t) AS t1 FROM b
            WHERE event_type = 'view' GROUP BY 1
        ),
        s2 AS (
            SELECT b.user_id, MIN(t) AS t2 FROM b JOIN s1 USING (user_id)
            WHERE event_type = 'click' AND t > t1 GROUP BY 1
        ),
        s3 AS (
            SELECT b.user_id, MIN(t) AS t3 FROM b JOIN s2 USING (user_id)
            WHERE event_type = 'purchase' AND t > t2 GROUP BY 1
        )
        SELECT '1_view' AS stage, COUNT(*) AS n_users FROM s1
        UNION ALL SELECT '2_click', COUNT(*) FROM s2
        UNION ALL SELECT '3_purchase', COUNT(*) FROM s3
    """,
    "customers_with_urgent_orders": """
        SELECT c_custkey AS customer_key,
               c_name AS name,
               c_mktsegment AS segment
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    """,
    "customers_without_urgent_orders": """
        SELECT c_custkey AS customer_key,
               c_name AS name,
               c_mktsegment AS segment
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
    """,
    "customer_retention": """
        WITH y95 AS (SELECT DISTINCT o_custkey AS customer_key FROM orders
                     WHERE o_orderdate >= '1995-01-01'
                       AND o_orderdate < '1996-01-01'),
             y96 AS (SELECT DISTINCT o_custkey AS customer_key FROM orders
                     WHERE o_orderdate >= '1996-01-01'
                       AND o_orderdate < '1997-01-01')
        SELECT customer_key, 'retained' AS status
        FROM (SELECT customer_key FROM y95
              INTERSECT
              SELECT customer_key FROM y96)
        UNION ALL
        SELECT customer_key, 'churned' AS status
        FROM (SELECT customer_key FROM y95
              EXCEPT
              SELECT customer_key FROM y96)
    """,
    "q5_local_supplier_volume": f"""
        SELECT n_name AS nation,
               CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
                     AND c_nationkey = s_nationkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC
    """,
    "q18_large_orders": f"""
        WITH big AS (
            SELECT l_orderkey,
                   {_DSUM2.format(c='l_quantity')} AS total_qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING {_DSUM2.format(c='l_quantity')} > 300
        )
        SELECT c_name AS customer_name,
               o_custkey AS customer_key,
               o_orderkey AS order_key,
               CAST(o_orderdate AS DATE) AS order_date,
               o_totalprice AS total_price,
               total_qty
        FROM orders
        JOIN big ON o_orderkey = big.l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY total_price DESC, order_key
        LIMIT 100
    """,
    "q7_volume_shipping": f"""
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
               CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_9')
            OR (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_3'))
          AND l_shipdate >= '1996-01-01' AND l_shipdate < '1998-01-01'
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
    """,
    "q8_market_share": f"""
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
               CAST(SUM(CASE WHEN sn.n_name = 'NATION_5'
                             THEN {_DISC_PRICE} END) AS DOUBLE)
                 / CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS mkt_share,
               CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS total_volume
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region   ON cn.n_regionkey = r_regionkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE p_type = 'PROMO' AND r_name = 'ASIA'
          AND o_orderdate >= '1996-01-01' AND o_orderdate < '1998-01-01'
        GROUP BY 1
        ORDER BY 1
    """,
    "q10_returned_items": f"""
        SELECT c_custkey AS customer_key,
               c_name AS customer_name,
               c_acctbal AS acct_balance,
               n_name AS nation,
               CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= '1996-01-01' AND o_orderdate < '1996-04-01'
        GROUP BY 1, 2, 3, 4
        ORDER BY revenue DESC, customer_key
        LIMIT 20
    """,
    "q12_ship_delay_classes": """
        SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                                   CAST(l_shipdate AS DATE)) <= 30 THEN 'fast'
                    WHEN date_diff('day', CAST(o_orderdate AS DATE),
                                   CAST(l_shipdate AS DATE)) <= 90 THEN 'medium'
                    ELSE 'slow' END AS delay_class,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
        GROUP BY 1
        ORDER BY 1
    """,
    "q14_promo_revenue": f"""
        SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                                     THEN {_DISC_PRICE} END) AS DOUBLE)
                     / CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS promo_revenue_pct
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= '1996-03-01' AND l_shipdate < '1996-04-01'
    """,
    "q17_small_quantity_revenue": f"""
        WITH brand_lines AS (
            SELECT l_partkey, l_quantity, l_extendedprice
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand = 'Brand#23'
        ), per_part AS (
            SELECT l_partkey AS pp_key,
                   {_DSUM2.format(c='l_quantity')} / COUNT(l_quantity) AS avg_qty
            FROM brand_lines
            GROUP BY 1
        )
        SELECT {_DSUM2.format(c='l_extendedprice')} / 7.0 AS avg_yearly
        FROM brand_lines JOIN per_part ON l_partkey = pp_key
        WHERE l_quantity < 0.2 * avg_qty
    """,
    "q19_disjunctive_revenue": f"""
        SELECT CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "q22_dormant_customers": f"""
        WITH avg_bal AS (
            SELECT {_DSUM2.format(c='c_acctbal')} / COUNT(c_acctbal) AS avg_bal
            FROM customer WHERE c_acctbal > 0
        )
        SELECT n_name AS nation,
               COUNT(*) AS n_custs,
               {_DSUM2.format(c='c_acctbal')} AS total_acctbal
        FROM customer, avg_bal
        JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > avg_bal
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= '2000-01-01')
        GROUP BY 1
        ORDER BY 1
    """,
    "q4_late_order_priority": """
        SELECT o_orderpriority AS priority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-04-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY 1
        ORDER BY 1
    """,
    "q9_red_parts_profit": f"""
        SELECT n_name AS nation,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
               CAST(SUM({_DISC_PRICE}) AS DOUBLE)
                 - 0.5 * CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))
                                  * CAST(l_quantity AS DECIMAL(12,2)))
                              AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2
        ORDER BY 1, 2 DESC
    """,
    "q16_supplier_diversity": """
        SELECT p_brand, p_size,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_type <> 'PROMO'
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY 1, 2
        ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
    "q21_late_sole_supplier": """
        WITH lines AS (
            SELECT l_orderkey, l_suppkey,
                   CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                        THEN 1 ELSE 0 END AS late
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
        ), per_os AS (
            SELECT l_orderkey, l_suppkey, MAX(late) AS is_late
            FROM lines GROUP BY 1, 2
        ), per_o AS (
            SELECT l_orderkey, COUNT(*) AS n_supp, SUM(is_late) AS n_late
            FROM per_os GROUP BY 1
        )
        SELECT s_name, COUNT(*) AS numwait
        FROM per_os
        JOIN per_o USING (l_orderkey)
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE is_late = 1 AND n_supp >= 2 AND n_late = 1
        GROUP BY 1
        ORDER BY numwait DESC, s_name
        LIMIT 10
    """,
    "sales_yoy_full_outer": f"""
        WITH a AS (
            SELECT o_custkey AS a_key,
                   {_DSUM2.format(c='o_totalprice')} AS a_sales
            FROM orders
            WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1996-01-01'
            GROUP BY 1
        ),
        b AS (
            SELECT o_custkey AS b_key,
                   {_DSUM2.format(c='o_totalprice')} AS b_sales
            FROM orders
            WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
            GROUP BY 1
        )
        SELECT COALESCE(a_key, b_key) AS customer_key,
               a_sales AS y1_sales,
               b_sales AS y2_sales,
               CASE WHEN a_key IS NULL THEN 'new'
                    WHEN b_key IS NULL THEN 'churned'
                    ELSE 'retained' END AS status,
               COALESCE(b_sales, 0.0) - COALESCE(a_sales, 0.0) AS delta
        FROM a FULL OUTER JOIN b ON a_key = b_key
        ORDER BY 1
    """,
    "sales_monthly_yoy": f"""
        WITH m AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                   {_DSUM2.format(c='o_totalprice')} AS revenue
            FROM orders
            GROUP BY 1
        )
        SELECT m.month, m.revenue,
               p.revenue AS prev_year_revenue,
               (m.revenue - p.revenue) * 100.0 / p.revenue AS yoy_pct
        FROM m LEFT JOIN m p ON m.month = p.month + INTERVAL 12 MONTH
        ORDER BY m.month
    """,
    "brand_basket_affinity": """
        WITH ob AS (
            SELECT DISTINCT l_orderkey, p_brand
            FROM lineitem JOIN part ON l_partkey = p_partkey
        ),
        pairs AS (
            SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
                   COUNT(*) AS n_ab
            FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey
                              AND a.p_brand < b.p_brand
            GROUP BY 1, 2
            HAVING COUNT(*) >= 50
        ),
        totals AS (SELECT p_brand, COUNT(*) AS n FROM ob GROUP BY 1),
        no AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM ob)
        SELECT brand_a, brand_b, n_ab,
               (CAST(n_ab AS DOUBLE) * CAST(n_orders AS DOUBLE))
                 / (CAST(ta.n AS DOUBLE) * CAST(tb.n AS DOUBLE)) AS lift
        FROM pairs
        JOIN totals ta ON ta.p_brand = brand_a
        JOIN totals tb ON tb.p_brand = brand_b
        CROSS JOIN no
        ORDER BY lift DESC, brand_a, brand_b
        LIMIT 20
    """,
    # X130: one daily decimal-exact aggregate quantized once, then the
    # trailing banded self-join on the day table with 2^(19-k) weights
    "events_ewma_daily": """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(ROUND(100 * CAST(SUM(CAST(value AS DECIMAL(18,6)))
                        AS DOUBLE), 0) AS BIGINT) AS vq
            FROM events GROUP BY 1
        )
        SELECT a.day, COUNT(*) AS n_days,
               CAST(SUM(b.vq * CAST(pow(2, 19 - (a.day - b.day))
                    AS BIGINT)) AS DOUBLE)
                 / (100.0 * CAST(SUM(CAST(pow(2, 19 - (a.day - b.day))
                    AS BIGINT)) AS DOUBLE)) AS ewma
        FROM daily a
        JOIN daily b ON b.day BETWEEN a.day - 19 AND a.day
        GROUP BY 1
        ORDER BY 1
    """,
    # X133: the X130 trailing window shifted one day back (leak-free),
    # exact common-denominator deviations, lower-median MAD, 3× band
    "events_anomaly_days": """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(ROUND(100 * CAST(SUM(CAST(value AS DECIMAL(18,6)))
                        AS DOUBLE), 0) AS BIGINT) AS vq
            FROM events GROUP BY 1
        ),
        ew AS (
            SELECT a.day, MAX(a.vq) AS vq,
                   CAST(SUM(b.vq * CAST(pow(2, 19 - ((a.day - b.day) - 1))
                        AS BIGINT)) AS BIGINT) AS num,
                   CAST(SUM(CAST(pow(2, 19 - ((a.day - b.day) - 1))
                        AS BIGINT)) AS BIGINT) AS den
            FROM daily a
            JOIN daily b ON b.day BETWEEN a.day - 20 AND a.day - 1
            GROUP BY 1
        ),
        dev AS (
            SELECT day,
                   CAST(vq AS DOUBLE) / 100.0 AS daily_total,
                   CAST(num AS DOUBLE) / (100.0 * CAST(den AS DOUBLE))
                       AS ewma_prev,
                   CAST(vq * den - num AS DOUBLE)
                       / (100.0 * CAST(den AS DOUBLE)) AS deviation
            FROM ew
        ),
        nn AS (SELECT COUNT(*) AS n FROM dev),
        med AS (
            SELECT ABS(deviation) AS mad FROM (
                SELECT deviation,
                       ROW_NUMBER() OVER (ORDER BY ABS(deviation), day)
                           AS r
                FROM dev
            ) CROSS JOIN nn
            WHERE r = (n + 1) // 2
        )
        SELECT day, daily_total, ewma_prev, deviation, mad,
               (ABS(deviation) > 3.0 * mad) AS is_anomaly
        FROM dev CROSS JOIN med
        ORDER BY 1
    """,
    "events_drift_tvd": """
        WITH pt AS (
            SELECT event_type,
                   CAST(SUM(CASE WHEN ts < '2024-01-15' THEN 1 ELSE 0 END)
                        AS DECIMAL(19,0)) AS n1,
                   CAST(SUM(CASE WHEN ts < '2024-01-15' THEN 0 ELSE 1 END)
                        AS DECIMAL(19,0)) AS n2
            FROM events
            GROUP BY 1
        ),
        t AS (
            SELECT CAST(SUM(n1) AS DECIMAL(19,0)) AS t1,
                   CAST(SUM(n2) AS DECIMAL(19,0)) AS t2,
                   COUNT(*) AS n_types
            FROM pt
        )
        SELECT n_types,
               CAST(t1 AS BIGINT) AS n_first,
               CAST(t2 AS BIGINT) AS n_second,
               CAST(SUM(ABS(n1 * t2 - n2 * t1)) AS DOUBLE)
                 / (2.0 * CAST(t1 AS DOUBLE) * CAST(t2 AS DOUBLE)) AS tvd
        FROM pt, t
        GROUP BY n_types, t1, t2
    """,
    "parts_abc_analysis": f"""
        WITH pb AS (
            SELECT p_brand,
                   CAST(SUM(CAST({_DISC_PRICE} * 10000 AS DECIMAL(38,0)))
                        AS DECIMAL(38,0)) AS m4
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY 1
        ),
        c AS (
            SELECT p_brand, m4,
                   SUM(m4) OVER (ORDER BY m4 DESC, p_brand
                       ROWS UNBOUNDED PRECEDING) AS cum,
                   SUM(m4) OVER () AS total
            FROM pb
        )
        SELECT p_brand,
               CAST(m4 AS DOUBLE) / 10000 AS revenue,
               CAST(cum AS DOUBLE) / 10000 AS cum_revenue,
               CASE WHEN cum * 100 <= total * 80 THEN 'A'
                    WHEN cum * 100 <= total * 95 THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM c
        ORDER BY revenue DESC, p_brand
    """,
    "customer_rfm_segments": f"""
        WITH pc AS (
            SELECT o_custkey AS customer_key,
                   CAST(MAX(o_orderdate) AS DATE) AS last_order,
                   COUNT(*) AS frequency,
                   {_DSUM2.format(c='o_totalprice')} AS monetary
            FROM orders GROUP BY 1
        ),
        pc2 AS (
            SELECT *,
                   date_diff('day', DATE '1970-01-01', last_order) AS rd,
                   CAST(ROUND(monetary * 100, 0) AS BIGINT) AS mc
            FROM pc
        ),
        b AS (
            SELECT quantile_cont(rd, 0.25) AS rd_25,
                   quantile_cont(rd, 0.50) AS rd_50,
                   quantile_cont(rd, 0.75) AS rd_75,
                   quantile_cont(frequency, 0.25) AS fq_25,
                   quantile_cont(frequency, 0.50) AS fq_50,
                   quantile_cont(frequency, 0.75) AS fq_75,
                   quantile_cont(mc, 0.25) AS mc_25,
                   quantile_cont(mc, 0.50) AS mc_50,
                   quantile_cont(mc, 0.75) AS mc_75
            FROM pc2
        ),
        s AS (
            SELECT customer_key, last_order, frequency, monetary,
                   1 + (CASE WHEN CAST(rd AS DOUBLE) < rd_75 THEN 1 ELSE 0 END)
                     + (CASE WHEN CAST(rd AS DOUBLE) < rd_50 THEN 1 ELSE 0 END)
                     + (CASE WHEN CAST(rd AS DOUBLE) < rd_25 THEN 1 ELSE 0 END)
                       AS r,
                   1 + (CASE WHEN CAST(frequency AS DOUBLE) < fq_75
                             THEN 1 ELSE 0 END)
                     + (CASE WHEN CAST(frequency AS DOUBLE) < fq_50
                             THEN 1 ELSE 0 END)
                     + (CASE WHEN CAST(frequency AS DOUBLE) < fq_25
                             THEN 1 ELSE 0 END) AS f,
                   1 + (CASE WHEN CAST(mc AS DOUBLE) < mc_75 THEN 1 ELSE 0 END)
                     + (CASE WHEN CAST(mc AS DOUBLE) < mc_50 THEN 1 ELSE 0 END)
                     + (CASE WHEN CAST(mc AS DOUBLE) < mc_25 THEN 1 ELSE 0 END)
                       AS m
            FROM pc2, b
        )
        SELECT customer_key, last_order, frequency, monetary,
               CAST(r AS INT) AS r, CAST(f AS INT) AS f, CAST(m AS INT) AS m,
               CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR)
                   AS segment
        FROM s
        ORDER BY 1
    """,
    "events_active_users": """
        WITH ud AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('day', ts) AS DATE) AS day
            FROM events
        ),
        dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY 1),
        contrib AS (
            SELECT user_id, CAST(g.d AS DATE) AS day
            FROM ud, LATERAL unnest(generate_series(
                CAST(day AS TIMESTAMP),
                CAST(day AS TIMESTAMP) + INTERVAL 6 DAY,
                INTERVAL 1 DAY)) AS g(d)
        ),
        wau AS (
            SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
            FROM contrib GROUP BY 1
        )
        SELECT day, dau, wau
        FROM dau JOIN wau USING (day)
        ORDER BY 1
    """,
    "events_transition_matrix": """
        WITH pairs AS (
            SELECT LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS src,
                   event_type AS dst
            FROM events
        ),
        counts AS (
            SELECT src, dst, COUNT(*) AS n
            FROM pairs WHERE src IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT src, dst, n,
               CAST(n AS DOUBLE)
                 / CAST(SUM(n) OVER (PARTITION BY src) AS DOUBLE) AS p
        FROM counts
        ORDER BY 1, 2
    """,
    # sweep-line concurrency: sessions -> ±1 deltas -> ordered running
    # sum; ends sort before starts at the same instant ((t, delta)
    # order), and the daily MAX is tie-permutation-invariant
    "events_concurrency_curve": """
        WITH o AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER win IS NULL
                             OR ts - lag(ts) OVER win >= INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW win AS (PARTITION BY user_id ORDER BY ts)
        ),
        si AS (
            SELECT user_id, ts,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS sid
            FROM o
        ),
        s AS (
            SELECT MIN(ts) AS st, MAX(ts) + INTERVAL 30 MINUTE AS en
            FROM si GROUP BY user_id, sid
        ),
        d AS (
            SELECT st AS t, 1 AS delta FROM s
            UNION ALL
            SELECT en AS t, -1 AS delta FROM s
        ),
        c AS (
            SELECT t, SUM(delta) OVER (ORDER BY t, delta
                          ROWS UNBOUNDED PRECEDING) AS conc
            FROM d
        )
        SELECT CAST(date_trunc('day', t) AS DATE) AS day,
               CAST(MAX(conc) AS BIGINT) AS peak_concurrency,
               COUNT(*) AS n_boundaries
        FROM c
        GROUP BY 1
        ORDER BY 1
    """,
    "events_cohort_retention": """
        WITH w AS (
            SELECT user_id,
                   CAST(date_trunc('week', ts) AS DATE) AS week,
                   MIN(CAST(date_trunc('week', ts) AS DATE))
                       OVER (PARTITION BY user_id) AS cohort_week
            FROM events
        )
        SELECT cohort_week,
               CAST(date_diff('day', cohort_week, week) / 7 AS INT)
                   AS week_offset,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
        FROM w
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "events_rolling_hour_avg": """
        SELECT event_id, user_id,
               COUNT(*) OVER w AS n_1h,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
                 / COUNT(*) OVER w AS avg_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts)
                     RANGE BETWEEN 3600000000000 PRECEDING AND CURRENT ROW)
        ORDER BY event_id
    """,
    "events_ntile_quartiles": f"""
        WITH q AS (
            SELECT event_type, value,
                   CAST(NTILE(4) OVER (PARTITION BY event_type
                                       ORDER BY value, event_id)
                        AS INT) AS quartile
            FROM events
        )
        SELECT event_type, quartile, COUNT(*) AS n,
               MIN(value) AS lo, MAX(value) AS hi,
               {_DSUM6.format(c='value')} AS total_value
        FROM q
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "events_value_outliers_mad": """
        WITH ranked AS (
            SELECT event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY value) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM events
        ), med AS (
            SELECT event_type, SUM(value) / COUNT(*) AS med_value
            FROM ranked
            WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
            GROUP BY 1
        ), dev AS (
            SELECT e.event_type, e.value, m.med_value,
                   ABS(e.value - m.med_value) AS abs_dev
            FROM events e JOIN med m USING (event_type)
        ), ranked2 AS (
            SELECT event_type, abs_dev,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY abs_dev) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM dev
        ), mad AS (
            SELECT event_type, SUM(abs_dev) / COUNT(*) AS mad
            FROM ranked2
            WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
            GROUP BY 1
        )
        SELECT d.event_type,
               COUNT(*) AS n,
               MIN(d.med_value) AS median,
               MIN(m.mad) AS mad,
               CAST(SUM(CASE WHEN d.abs_dev > 3 * m.mad THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outliers
        FROM dev d JOIN mad m USING (event_type)
        GROUP BY 1
        ORDER BY 1
    """,
    "events_value_histogram": f"""
        SELECT event_type,
               CAST(LEAST(FLOOR(value / 50.0), 9) AS INT) AS bucket,
               COUNT(*) AS n,
               {_DSUM6.format(c='value')} AS total_value
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "events_type_mode": """
        WITH counts AS (
            SELECT event_type,
                   CAST(props->>'k' AS INTEGER) AS k,
                   COUNT(*) AS n
            FROM events
            GROUP BY 1, 2
        )
        SELECT event_type, k AS modal_k, n AS n_mode
        FROM counts
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY event_type ORDER BY n DESC, k ASC) = 1
        ORDER BY event_type
    """,
    # typed JSON path access, k bucketed mod 10
    "events_variant_props": f"""
        SELECT CAST(props->>'k' AS INTEGER) % 10 AS k_mod10,
               COUNT(*) AS n,
               {_DSUM6.format(c='value')} AS total_value
        FROM events
        GROUP BY 1
        ORDER BY 1
    """,
    # same correlated-subquery SQL, modulo dialect casts
    "sql_above_average_orders": """
        SELECT o_custkey AS customer_key,
               o_orderkey AS order_key,
               o_totalprice AS total_price
        FROM orders o
        WHERE 2 * CAST(o_totalprice AS DECIMAL(18,2))
                * (SELECT COUNT(*) FROM orders i
                   WHERE i.o_custkey = o.o_custkey)
              > 3 * (SELECT SUM(CAST(i.o_totalprice AS DECIMAL(18,2)))
                     FROM orders i WHERE i.o_custkey = o.o_custkey)
    """,
    # plain GROUP BY == the salted two-phase plan, bit for bit
    "salted_priority_sales": """
        SELECT o_orderpriority AS priority,
               COUNT(o_orderkey) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_amount,
               CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS min_amount
        FROM orders
        GROUP BY 1
    """,
    # the quadratic reference form of the blocked edit-distance join
    "fuzzy_customer_names": """
        SELECT a.c_custkey AS custkey_a,
               b.c_custkey AS custkey_b,
               levenshtein(a.c_name, b.c_name) AS dist
        FROM customer a
        JOIN customer b ON a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
    # watermark finalization boundary: every delivered row aggregates
    # (this build's no-data-loss semantics for sub-watermark arrivals,
    # pinned in the query docstring), and append mode emits exactly
    # the windows whose end ≤ final watermark (max on-time ts − 1 h)
    "streaming_late_data_policy": f"""
        WITH wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events),
        daily AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   COUNT(*) AS n_events,
                   {_DSUM6.format(c='value')} AS total_value
            FROM events
            GROUP BY 1
        )
        SELECT day, n_events, total_value
        FROM daily
        WHERE CAST(day AS TIMESTAMP) + INTERVAL 1 DAY <= (SELECT w FROM wm)
    """,
    # native streaming session windows: gaps-and-islands bounded by the
    # final watermark (end <= wm emission rule — see the query's
    # docstring for the non-contractual caveat shared with late_data)
    "streaming_session_windows": f"""
        WITH wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events),
        o AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER win IS NULL
                             OR ts - lag(ts) OVER win >= INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW win AS (PARTITION BY user_id ORDER BY ts)
        ),
        s AS (
            SELECT user_id, ts, value,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS sid
            FROM o
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 30 MINUTE AS session_end,
               COUNT(*) AS n_events,
               {_DSUM6.format(c='value')} AS total_value
        FROM s
        GROUP BY user_id, sid
        HAVING MAX(ts) + INTERVAL 30 MINUTE <= (SELECT w FROM wm)
    """,
    # streaming sliding windows: the batch k-in-[0,4) window explode
    # bounded by the final watermark (end <= wm emission rule)
    "streaming_sliding_1h_15m": f"""
        WITH wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events),
        sl AS (
            SELECT CAST(to_timestamp(s) AS TIMESTAMP) AS window_start,
                   CAST(to_timestamp(s + 3600) AS TIMESTAMP) AS window_end,
                   COUNT(*) AS n_events,
                   {_DSUM6.format(c='value')} AS total_value
            FROM (
                SELECT (FLOOR(epoch(ts) / 900) - k) * 900 AS s, value
                FROM events, UNNEST([0, 1, 2, 3]) AS t(k)
            )
            GROUP BY 1, 2
        )
        SELECT window_start, window_end, n_events, total_value
        FROM sl
        WHERE window_end <= (SELECT w FROM wm)
        ORDER BY window_start
    """,
    # X127 streaming TVD drift: tumbling 6 h windows, the pinned
    # end ≤ wm emission rule, then X70's decimal cross-product TVD per
    # closed window against the full-corpus baseline (absent types
    # contribute b_t/(2T) via the grid). Scalars ride CROSS JOINs,
    # not per-row scalar subqueries (the PCA-oracle lesson).
    "streaming_drift_tvd": """
        WITH wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events),
        base AS (
            SELECT event_type, CAST(COUNT(*) AS DECIMAL(19,0)) AS b
            FROM events GROUP BY 1
        ),
        bt AS (SELECT CAST(SUM(b) AS BIGINT) AS t FROM base),
        win AS (
            SELECT CAST(to_timestamp(FLOOR(epoch(ts) / 21600) * 21600)
                        AS TIMESTAMP) AS window_start,
                   CAST(to_timestamp(FLOOR(epoch(ts) / 21600) * 21600
                        + 21600) AS TIMESTAMP) AS window_end,
                   event_type, COUNT(*) AS n
            FROM events GROUP BY 1, 2, 3
        ),
        keep AS (
            SELECT * FROM win WHERE window_end <= (SELECT w FROM wm)
        ),
        tot AS (
            SELECT window_start, window_end,
                   CAST(SUM(n) AS BIGINT) AS nw
            FROM keep GROUP BY 1, 2
        ),
        grid AS (
            SELECT t.window_start, t.window_end, t.nw, bt.t,
                   ABS(CAST(COALESCE(k.n, 0) AS DECIMAL(19,0)) * bt.t
                       - b.b * t.nw) AS _diff
            FROM tot t CROSS JOIN base b CROSS JOIN bt
            LEFT JOIN keep k ON k.window_start = t.window_start
                            AND k.event_type = b.event_type
        )
        SELECT window_start, window_end, nw AS n_events,
               CAST(SUM(_diff) AS DOUBLE)
                 / (2.0 * CAST(nw AS DOUBLE) * CAST(t AS DOUBLE)) AS tvd
        FROM grid
        GROUP BY window_start, window_end, nw, t
        ORDER BY 1
    """,
    # X164 streaming HLL: the X163 register arithmetic restricted to
    # watermark-CLOSED days; register MAX is idempotent, so the twice-
    # delivered fixture cannot perturb a single register
    "streaming_hll_users": """
        WITH wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events),
        keyed AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(user_id AS VARCHAR) AS uid
            FROM events
        ),
        closed AS (
            SELECT CAST(day AS VARCHAR) AS scope, uid FROM keyed
            WHERE CAST(day AS TIMESTAMP) + INTERVAL 1 DAY
                      <= (SELECT w FROM wm)
        ),
        h AS (SELECT DISTINCT scope, md5(uid) AS hx FROM closed),
        r AS (
            SELECT scope,
                   CAST(concat('0x', substr(hx, 1, 2)) AS BIGINT) % 64
                       AS reg,
                   CAST(concat('0x', substr(hx, 3, 15)) AS BIGINT) AS w
            FROM h
        ),
        m AS (
            SELECT scope, reg,
                   MAX(CASE WHEN w = 0 THEN 61
                            ELSE 61 - len(bin(w)) END) AS rho
            FROM r GROUP BY 1, 2
        ),
        s AS (
            SELECT scope,
                   SUM(CAST(1 AS HUGEINT) << (61 - rho))
                       + (64 - COUNT(*)) * (CAST(1 AS HUGEINT) << 61)
                       AS s_all,
                   CAST(64 - COUNT(*) AS BIGINT) AS n_zero_regs
            FROM m GROUP BY 1
        ),
        ex AS (
            SELECT scope,
                   CAST(COUNT(DISTINCT uid) AS BIGINT) AS exact_distinct
            FROM closed GROUP BY 1
        )
        SELECT s.scope, s.n_zero_regs,
               {num!r} / CAST(s_all AS DOUBLE) AS est_distinct,
               ex.exact_distinct,
               ({num!r} / CAST(s_all AS DOUBLE)
                    - CAST(exact_distinct AS DOUBLE))
                   / CAST(exact_distinct AS DOUBLE) AS rel_err
        FROM s JOIN ex USING (scope)
        ORDER BY scope
    """.format(num=_sketch.HLL_EST_NUM),
    # X157 streaming ER: static replay of the attr-agreement blocked
    # linkage (the quadratic reference join IS the oracle — the
    # deletion-neighborhood blocking guarantees zero false negatives at
    # edit distance <= 1), reduced to per-record verdicts with the
    # CLOSEST-candidate rule (min dist, ties by min custkey — r11
    # ADVICE #1: an exact match must beat a distance-1 match); the
    # TWICE-delivered delta must not add or change a single verdict
    # (replay-idempotence) or the hash fails
    "streaming_er_delta": """
        WITH dirty AS (
            SELECT c_custkey + 10000000 AS dirty_id,
                   substr(c_name, 1, len(c_name) // 2) || 'z' ||
                   substr(c_name, len(c_name) // 2 + 2) AS dirty_name,
                   c_nationkey, c_mktsegment
            FROM customer WHERE c_custkey % 10 = 0
            UNION ALL
            SELECT c_custkey + 20000000, 'zq-' || c_name,
                   c_nationkey, c_mktsegment
            FROM customer WHERE c_custkey % 10 = 5
        ),
        links AS (
            SELECT d.dirty_id, c.c_custkey AS custkey,
                   levenshtein(d.dirty_name, c.c_name) AS dist
            FROM dirty d
            JOIN customer c
              ON d.c_nationkey = c.c_nationkey
             AND d.c_mktsegment = c.c_mktsegment
             AND levenshtein(d.dirty_name, c.c_name) <= 1
        ),
        best AS (
            SELECT dirty_id, MIN(dist) AS dist,
                   COUNT(*) AS n_candidates
            FROM links GROUP BY 1
        ),
        bd AS (
            SELECT b.dirty_id, MIN(l.custkey) AS entity_custkey,
                   b.dist, b.n_candidates
            FROM best b JOIN links l
              ON l.dirty_id = b.dirty_id AND l.dist = b.dist
            GROUP BY b.dirty_id, b.dist, b.n_candidates
        )
        SELECT d.dirty_id,
               bd.entity_custkey IS NOT NULL AS matched,
               bd.entity_custkey,
               CAST(bd.dist AS BIGINT) AS dist,
               CAST(COALESCE(bd.n_candidates, 0) AS BIGINT) AS n_candidates
        FROM dirty d LEFT JOIN bd USING (dirty_id)
        ORDER BY d.dirty_id
    """,
    # X137 streaming top-k heavy hitters: static replay of the tumbling
    # counts, the wm emission rule (end <= max ts - 1 h), and the
    # (count DESC, user_id) row_number per closed window; the TWICE-
    # delivered fixture must not change a single emitted count (the
    # replay-invariance pin) or the value-hash fails
    "streaming_topk_users": """
        WITH wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events),
        win AS (
            SELECT CAST(to_timestamp(FLOOR(epoch(ts) / 21600) * 21600)
                        AS TIMESTAMP) AS window_start,
                   CAST(to_timestamp(FLOOR(epoch(ts) / 21600) * 21600
                        + 21600) AS TIMESTAMP) AS window_end,
                   user_id, COUNT(*) AS n_events
            FROM events GROUP BY 1, 2, 3
        ),
        keep AS (
            SELECT * FROM win WHERE window_end <= (SELECT w FROM wm)
        ),
        ranked AS (
            SELECT window_start, window_end, user_id, n_events,
                   ROW_NUMBER() OVER (PARTITION BY window_start
                                      ORDER BY n_events DESC, user_id)
                       AS rnk
            FROM keep
        )
        SELECT window_start, window_end, CAST(rnk AS INTEGER) AS rank,
               user_id, n_events
        FROM ranked WHERE rnk <= 5
        ORDER BY window_start, rank
    """,
    # PIVOT == conditional aggregation per cell; fixed priority domain
    "sales_pivot_by_priority": """
        SELECT n_name AS nation,
               CAST(SUM(CAST(CASE WHEN o_orderpriority = '1-URGENT'
                   THEN o_totalprice END AS DECIMAL(18,2))) AS DOUBLE)
                   AS urgent,
               CAST(SUM(CAST(CASE WHEN o_orderpriority = '2-HIGH'
                   THEN o_totalprice END AS DECIMAL(18,2))) AS DOUBLE)
                   AS high,
               CAST(SUM(CAST(CASE WHEN o_orderpriority = '3-MEDIUM'
                   THEN o_totalprice END AS DECIMAL(18,2))) AS DOUBLE)
                   AS medium,
               CAST(SUM(CAST(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
                   THEN o_totalprice END AS DECIMAL(18,2))) AS DOUBLE)
                   AS not_specified,
               CAST(SUM(CAST(CASE WHEN o_orderpriority = '5-LOW'
                   THEN o_totalprice END AS DECIMAL(18,2))) AS DOUBLE)
                   AS low
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    # one-shot aggregate over ALL orders == the Spark side's three-way
    # incremental fold (decimal sums are associative)
    "incremental_sales_rollup": """
        SELECT o_orderpriority AS priority,
               COUNT(o_orderkey) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_amount,
               CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS max_amount
        FROM orders
        GROUP BY 1
    """,
    # stream-stream interval join: payment within 72 h of its order;
    # delay is (o_orderkey % 96) h by construction, so the time-range
    # predicate provably excludes delay > 72
    "streaming_payment_match": """
        SELECT CAST(o_orderkey AS VARCHAR) AS order_id,
               CAST(o_custkey AS VARCHAR) AS customer_id,
               o_totalprice AS amount,
               o_orderkey % 96 AS delay_hours
        FROM orders
        WHERE o_orderkey % 96 <= 72
    """,
    # LEFT OUTER form: matches emit on arrival; unmatched orders emit
    # with NULL payment columns only once the global watermark
    # (max(o_ts) - 1 h) proves no match can arrive (o_ts + 72 h < wm);
    # the unmatched tail inside the final watermark window is withheld
    # — the engine's pinned outer-emission rule (registry_stream.py)
    "streaming_payment_match_outer": """
        WITH base AS (
            SELECT CAST(o_orderkey AS VARCHAR) AS order_id,
                   CAST(o_custkey AS VARCHAR) AS customer_id,
                   o_totalprice AS amount,
                   o_orderdate AS o_ts,
                   o_orderkey % 96 AS delay_hours
            FROM orders
        ),
        wm AS (SELECT MAX(o_ts) - INTERVAL 1 HOUR AS w FROM base)
        SELECT order_id, customer_id, amount,
               CASE WHEN delay_hours <= 72 THEN delay_hours END
                   AS delay_hours
        FROM base, wm
        WHERE delay_hours <= 72
           OR o_ts + INTERVAL 72 HOUR < w
    """,
    # FULL OUTER: matched + both finalized unmatched tails (left rule
    # = the leftOuter rule; right rule = watermark passes p_ts, since
    # candidate orders satisfy o_ts <= p_ts). Boundaries measured then
    # pinned — see streaming_payment_match_full's docstring.
    "streaming_payment_match_full": """
        WITH base AS (
            SELECT CAST(o_orderkey AS VARCHAR) AS order_key,
                   CAST(o_custkey AS VARCHAR) AS customer_id,
                   o_totalprice AS amount,
                   o_orderdate AS o_ts,
                   o_orderdate + INTERVAL (o_orderkey % 96) HOUR AS p_ts,
                   o_orderkey % 96 AS delay_hours
            FROM orders
        ),
        wm AS (SELECT MAX(o_ts) - INTERVAL 1 HOUR AS w FROM base)
        SELECT order_key, customer_id, amount, delay_hours
        FROM base WHERE delay_hours <= 72
        UNION ALL
        SELECT order_key, customer_id, amount,
               CAST(NULL AS BIGINT) AS delay_hours
        FROM base, wm
        WHERE delay_hours > 72 AND o_ts + INTERVAL 72 HOUR < w
        UNION ALL
        SELECT order_key, CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE),
               delay_hours
        FROM base, wm
        WHERE delay_hours > 72 AND p_ts < w
    """,
    "profile_documents": """
        SELECT * FROM (
            SELECT 'lang' AS "column",
                   COUNT(*) FILTER (WHERE lang IS NULL) AS n_nulls,
                   COUNT(DISTINCT lang) AS n_distinct,
                   CAST(MIN(lang) AS VARCHAR) AS min_value,
                   CAST(MAX(lang) AS VARCHAR) AS max_value
            FROM documents
            UNION ALL
            SELECT 'source',
                   COUNT(*) FILTER (WHERE source IS NULL),
                   COUNT(DISTINCT source),
                   CAST(MIN(source) AS VARCHAR),
                   CAST(MAX(source) AS VARCHAR)
            FROM documents
            UNION ALL
            SELECT 'n_chars',
                   COUNT(*) FILTER (WHERE n_chars IS NULL),
                   COUNT(DISTINCT n_chars),
                   CAST(MIN(n_chars) AS VARCHAR),
                   CAST(MAX(n_chars) AS VARCHAR)
            FROM documents
        )
        ORDER BY "column"
    """,
    "serving_last_write_wins": """
        WITH base AS (
            SELECT CAST(o_custkey AS VARCHAR) AS customer_id,
                   CAST(o_orderkey AS VARCHAR) AS order_id,
                   strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') AS order_date,
                   o_orderstatus AS status,
                   1 AS batch_seq
            FROM orders
        ),
        redelivered AS (
            SELECT customer_id, order_id, order_date,
                   'shipped' AS status, 2 AS batch_seq
            FROM base
        ),
        unioned AS (
            SELECT * FROM base UNION ALL SELECT * FROM redelivered
        )
        SELECT customer_id, order_id, order_date, status, batch_seq
        FROM unioned
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY customer_id, order_id ORDER BY batch_seq DESC) = 1
    """,
    # Drained final state of streaming_dedup under a full 2× replay:
    # both deliveries of a key are identical, so emit-first == the
    # distinct flat order events themselves.
    "streaming_dedup_replay": """
        SELECT CAST(o_custkey AS VARCHAR) AS customer_id,
               CAST(o_orderkey AS VARCHAR) AS order_id,
               strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') AS order_date,
               o_orderstatus AS status,
               CAST(o_totalprice AS DOUBLE) AS amount
        FROM orders
    """,
    # Drained final state of streaming_running_totals after two full
    # deliveries: exactly 2× the per-customer batch aggregate. The
    # operator accumulates integer cents (per-row rounding), so the
    # oracle sums DECIMAL(18,2) exactly and doubles it.
    "streaming_running_totals_final": """
        SELECT CAST(o_custkey AS VARCHAR) AS customer_id,
               CAST(2 * COUNT(*) AS BIGINT) AS n_orders,
               CAST(2 * SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_amount
        FROM orders
        GROUP BY 1
    """,
    # Final state of the stream-static enrichment aggregate after two
    # full deliveries: 2× the per-nation batch totals, decimal-exact.
    "streaming_enriched_nation_totals": """
        SELECT n_name AS nation,
               CAST(2 * COUNT(*) AS BIGINT) AS n_orders,
               CAST(2 * SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_amount
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1
    """,
}

ORACLE_SQL["events_cusum_changepoint"] = _cusum_oracle(
    """SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   COUNT(*) AS n
            FROM events GROUP BY 1"""
)
# X140 streaming CUSUM gate: identical arithmetic over only the
# watermark-CLOSED days (the streaming_late_data_policy boundary)
ORACLE_SQL["streaming_cusum_gate"] = _cusum_oracle(
    """SELECT day, n FROM (
                SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                       COUNT(*) AS n
                FROM events GROUP BY 1
            )
            WHERE CAST(day AS TIMESTAMP) + INTERVAL 1 DAY <=
                  (SELECT max(ts) - INTERVAL 1 HOUR FROM events)"""
)

ORACLE_SQL.update(EXT_ORACLE_SQL)

# Drained complete-mode state of the streaming quantile-sketch
# histogram after two full deliveries: every bin count doubled, so
# n = 2N while the rank-rule estimates are bit-identical to the
# single-delivery read (100·2c ≥ q·2n ⟺ 100·c ≥ q·n) —
# replay_invariant is the value-checked claim, not an assumption.
ORACLE_SQL["streaming_value_quantiles"] = f"""
    WITH {QSKETCH_BIN_SQL},
    hist AS (
        SELECT bin_idx, rep, COUNT(*) AS cnt FROM b GROUP BY 1, 2
    ),
    cum2 AS (
        SELECT bin_idx, rep,
               CAST(SUM(2 * cnt) OVER (ORDER BY bin_idx) AS BIGINT) AS cum,
               CAST(SUM(2 * cnt) OVER () AS BIGINT) AS n
        FROM hist
    ),
    cum1 AS (
        SELECT bin_idx, rep,
               CAST(SUM(cnt) OVER (ORDER BY bin_idx) AS BIGINT) AS cum,
               CAST(SUM(cnt) OVER () AS BIGINT) AS n
        FROM hist
    ),
    qs AS (SELECT unnest([50, 90, 99]) AS q_pct),
    est2 AS (
        SELECT q_pct, n, rep AS est FROM (
            SELECT q.q_pct, c.n, c.rep,
                   ROW_NUMBER() OVER (PARTITION BY q.q_pct
                                      ORDER BY c.bin_idx) AS rn
            FROM qs q JOIN cum2 c ON 100 * c.cum >= q.q_pct * c.n
        ) WHERE rn = 1
    ),
    est1 AS (
        SELECT q_pct, rep AS est_single FROM (
            SELECT q.q_pct, c.rep,
                   ROW_NUMBER() OVER (PARTITION BY q.q_pct
                                      ORDER BY c.bin_idx) AS rn
            FROM qs q JOIN cum1 c ON 100 * c.cum >= q.q_pct * c.n
        ) WHERE rn = 1
    )
    SELECT e2.q_pct, e2.n, e2.est, e1.est_single,
           e2.est = e1.est_single AS replay_invariant
    FROM est2 e2 JOIN est1 e1 ON e2.q_pct = e1.q_pct
    ORDER BY e2.q_pct
"""

# ---------------------------------------------------------------------------
# Driver-gate ordering
# ---------------------------------------------------------------------------
# The correctness gate verifies the FIRST 50 registry entries in
# insertion order (round-2 lesson: 56 declared, only 50 checked — the
# mm_* family and emb_near_dup_lsh_multi never got a CORRECTNESS row).
# Keep never-verified and recently-changed queries inside that window;
# park stable, already-driver-verified, untouched baselines at the
# tail, where falling past position 50 loses nothing.
# --- BEGIN GENERATED GATE ORDER (scripts/gen_gate_head.py) ---
# Window = 0 never-driver-checked additions + 20 changed
# entries + the 30 stalest driver greens (last green in
# round(s) [0, 6], from CORRECTNESS_r*.json). Regenerate with
#   python scripts/gen_gate_head.py
# (pytest runs --check; hand-edits here go stale and FAIL).
_GATE_HEAD = [
    "text_repetition",  # last driver green: r6
    "streaming_payment_match",  # last driver green: r12
    "streaming_payment_match_outer",  # last driver green: r12
    "streaming_payment_match_full",  # last driver green: r12
    "streaming_topk_users",  # last driver green: r11
    "streaming_running_totals_final",  # last driver green: r7
    "streaming_dedup_replay",  # last driver green: r7
    "streaming_hll_users",  # last driver green: r11
    "streaming_sliding_1h_15m",  # last driver green: r11
    "streaming_session_windows",  # last driver green: r11
    "streaming_late_data_policy",  # last driver green: r11
    "streaming_value_quantiles",  # last driver green: r6
    "streaming_cusum_gate",  # last driver green: r11
    "streaming_user_anomalies",  # last driver green: r11
    "streaming_drift_tvd",  # last driver green: r11
    "streaming_enriched_nation_totals",  # last driver green: r7
    "ann_recall_audit",  # last driver green: r12
    "ann_recall_clustered",  # last driver green: r12
    "ann_label_audit",  # last driver green: r12
    "ann_label_audit_clustered",  # last driver green: r12
    "events_user_gini",  # last driver green: r0
    "graph_degree_octaves",  # last driver green: r0
    "graph_supplier_similarity",  # last driver green: r0
    "mm_phash_distance_histogram",  # last driver green: r0
    "mm_storage_profile",  # last driver green: r0
    "orders_ship_latency",  # last driver green: r0
    "quality_calibration_matrix",  # last driver green: r0
    "sketch_bloom_fpr",  # last driver green: r0
    "streaming_asof_rates",  # last driver green: r0
    "streaming_bloom_gate",  # last driver green: r0
    "streaming_boilerplate_gate",  # last driver green: r0
    "text_zipf_octaves",  # last driver green: r0
    "warehouse_column_stats",  # last driver green: r0
    "warehouse_partition_advisor",  # last driver green: r0
    "customers_without_urgent_orders",  # last driver green: r6
    "dedup_simhash_fingerprints",  # last driver green: r6
    "dedup_simhash_pairs",  # last driver green: r6
    "emb_near_dup",  # last driver green: r6
    "emb_near_dup_lsh",  # last driver green: r6
    "events_attribution",  # last driver green: r6
    "events_sessionization",  # last driver green: r6
    "events_type_mode",  # last driver green: r6
    "events_type_value_quantiles",  # last driver green: r6
    "events_value_histogram",  # last driver green: r6
    "events_variant_props",  # last driver green: r6
    "fuzzy_customer_names",  # last driver green: r6
    "incremental_sales_rollup",  # last driver green: r6
    "pipeline_compaction",  # last driver green: r6
    "pipeline_partition_scan",  # last driver green: r6
    "profile_documents",  # last driver green: r6
]
_GATE_TAIL = [
    "ann_filtered_recall_audit",  # last driver green: r12
    "ann_topk_brute",  # last driver green: r12
    "ann_topk_ivf",  # last driver green: r12
    "ann_topk_ivfpq",  # last driver green: r12
    "ann_topk_ivfpq_filtered",  # last driver green: r12
    "ann_topk_ivfpq_trained",  # last driver green: r12
    "ann_topk_lsh",  # last driver green: r12
    "ann_topk_lsh_multi",  # last driver green: r12
    "ann_topk_pq",  # last driver green: r12
    "corpus_mixture_temperature",  # last driver green: r12
    "customers_k_generalize",  # last driver green: r12
    "customers_l_diversity",  # last driver green: r12
    "customers_t_closeness",  # last driver green: r12
    "dedup_band_load_octaves",  # last driver green: r12
    "dedup_benchmark_canaries",  # last driver green: r12
    "dedup_boilerplate_lines",  # last driver green: r12
    "dedup_cluster_size_histogram",  # last driver green: r12
    "dedup_decontaminate_semantic",  # last driver green: r12
    "dedup_exact_substring",  # last driver green: r12
    "dedup_remove_substrings",  # last driver green: r12
    "dedup_source_vocab_overlap",  # last driver green: r12
    "dedup_strip_boilerplate",  # last driver green: r12
    "docs_quality_by_length",  # last driver green: r12
    "docs_quality_floor_sweep",  # last driver green: r12
    "docs_split_balance",  # last driver green: r12
    "emb_distance_octaves",  # last driver green: r12
    "emb_pq_distortion",  # last driver green: r12
    "emb_semantic_contamination",  # last driver green: r12
    "events_benford_audit",  # last driver green: r12
    "events_funnel_latency",  # last driver green: r12
    "events_hourly_acf",  # last driver green: r12
    "events_interarrival_quantiles",  # last driver green: r12
    "events_pettitt_changepoint",  # last driver green: r12
    "events_session_profile",  # last driver green: r12
    "graph_kcore_purchases",  # last driver green: r12
    "retrieval_eval_mrr",  # last driver green: r12
    "retrieval_eval_ndcg",  # last driver green: r12
    "retrieval_hybrid_rrf3",  # last driver green: r12
    "retrieval_known_item_eval",  # last driver green: r12
    "retrieval_margin_profile",  # last driver green: r12
    "retrieval_mmr_topk",  # last driver green: r12
    "text_keywords",  # last driver green: r12
    "text_vocab_coverage",  # last driver green: r12
    "ann_centroid_drift",  # last driver green: r11
    "bucketed_sales_join",  # last driver green: r11
    "corpus_content_hashes",  # last driver green: r11
    "corpus_delete_apply",  # last driver green: r11
    "corpus_funnel_by_source",  # last driver green: r11
    "corpus_funnel_report",  # last driver green: r11
    "corpus_mixture_actuals",  # last driver green: r11
    "customer_retention",  # last driver green: r11
    "customers_with_urgent_orders",  # last driver green: r11
    "dedup_components_delta",  # last driver green: r11
    "docs_hll_distinct_audit",  # last driver green: r11
    "docs_language_confusion",  # last driver green: r11
    "docs_pack_manifest",  # last driver green: r11
    "er_link_dirty_names",  # last driver green: r11
    "events_attribution_positional",  # last driver green: r11
    "events_cms_users_daily",  # last driver green: r11
    "events_hll_users_daily",  # last driver green: r11
    "events_lateness_profile",  # last driver green: r11
    "events_seasonal_backtest",  # last driver green: r11
    "events_trimmed_mean",  # last driver green: r11
    "events_user_anomalies",  # last driver green: r11
    "events_user_cusum",  # last driver green: r11
    "events_user_skew",  # last driver green: r11
    "events_weekly_profile",  # last driver green: r11
    "mm_afp_near_dup",  # last driver green: r11
    "mm_canonical_media",  # last driver green: r11
    "mm_video_near_dup",  # last driver green: r11
    "quality_scorer_agreement",  # last driver green: r11
    "sketch_heavy_hitters",  # last driver green: r11
    "streaming_decontamination_gate",  # last driver green: r11
    "streaming_er_delta",  # last driver green: r11
    "streaming_fk_gate",  # last driver green: r11
    "streaming_quality_gate",  # last driver green: r11
    "text_pii_extract",  # last driver green: r11
    "text_tokenizer_compare",  # last driver green: r11
    "warehouse_fk_audit",  # last driver green: r11
    "warehouse_null_profile",  # last driver green: r11
    "ann_index_health",  # last driver green: r10
    "customers_k_anonymity",  # last driver green: r10
    "docs_sample_fixed_per_lang",  # last driver green: r10
    "docs_sample_weighted_k",  # last driver green: r10
    "docs_split_leakage_audit",  # last driver green: r10
    "er_entity_ids",  # last driver green: r10
    "events_cusum_changepoint",  # last driver green: r10
    "q3_shipping_priority",  # last driver green: r10
    "q6_forecast_revenue",  # last driver green: r10
    "q8_market_share",  # last driver green: r10
    "q9_red_parts_profit",  # last driver green: r10
    "ref_average_order_value",  # last driver green: r10
    "ref_most_sales_products",  # last driver green: r10
    "ref_order_and_client_details",  # last driver green: r10
    "ref_total_income_per_payment_method",  # last driver green: r10
    "ref_total_sales_per_country",  # last driver green: r10
    "sales_monthly_yoy",  # last driver green: r10
    "sales_per_nation",  # last driver green: r10
    "sales_rollup",  # last driver green: r10
    "scd2_point_in_time",  # last driver green: r10
    "sketch_accuracy_audit",  # last driver green: r10
    "text_collocations",  # last driver green: r10
    "text_fingerprint",  # last driver green: r10
    "text_language_id",  # last driver green: r10
    "text_phrase_search",  # last driver green: r10
    "text_pii_redact",  # last driver green: r10
    "text_quality_score",  # last driver green: r10
    "text_stratified_sample",  # last driver green: r10
    "text_token_stats",  # last driver green: r10
    "text_unigram_segment",  # last driver green: r10
    "text_unigram_vocab",  # last driver green: r10
    "text_vocab_growth",  # last driver green: r10
    "top_parts_by_revenue",  # last driver green: r10
    "ann_truncation_audit",  # last driver green: r9
    "corpus_curriculum_plan",  # last driver green: r9
    "corpus_mixture_bpe",  # last driver green: r9
    "corpus_mixture_plan",  # last driver green: r9
    "dedup_chunks_exact",  # last driver green: r9
    "dedup_decontaminate",  # last driver green: r9
    "dedup_source_matrix",  # last driver green: r9
    "docs_chunk_overlap",  # last driver green: r9
    "docs_pack_chunks",  # last driver green: r9
    "emb_anisotropy_audit",  # last driver green: r9
    "emb_kmeans_step",  # last driver green: r9
    "emb_pca_power",  # last driver green: r9
    "events_anomaly_days",  # last driver green: r9
    "events_ewma_daily",  # last driver green: r9
    "graph_communities_lpa",  # last driver green: r9
    "mm_canonical_assets",  # last driver green: r9
    "mm_phash_near_dup",  # last driver green: r9
    "pipeline_orders",  # last driver green: r9
    "pipeline_product_details",  # last driver green: r9
    "pipeline_purchase_details",  # last driver green: r9
    "pipeline_shipping_addresses",  # last driver green: r9
    "q11_important_parts",  # last driver green: r9
    "q13_order_count_distribution",  # last driver green: r9
    "q14_promo_revenue",  # last driver green: r9
    "q15_top_supplier",  # last driver green: r9
    "q16_supplier_diversity",  # last driver green: r9
    "q17_small_quantity_revenue",  # last driver green: r9
    "q18_large_orders",  # last driver green: r9
    "q19_disjunctive_revenue",  # last driver green: r9
    "q20_promotion_suppliers",  # last driver green: r9
    "q2_min_cost_supplier",  # last driver green: r9
    "streaming_dedup_delta",  # last driver green: r9
    "text_bpe_fertility",  # last driver green: r9
    "text_bpe_segment",  # last driver green: r9
    "text_lm_score",  # last driver green: r9
    "text_pack_bpe",  # last driver green: r9
    "text_pack_sequences",  # last driver green: r9
    "text_quality_ensemble",  # last driver green: r9
    "text_tfidf_search",  # last driver green: r9
    "brand_basket_affinity",  # last driver green: r8
    "dedup_components",  # last driver green: r8
    "dedup_exact_recrawl",  # last driver green: r8
    "dedup_incremental_delta",  # last driver green: r8
    "dedup_substring_hotspots",  # last driver green: r8
    "docs_expectations",  # last driver green: r8
    "docs_sample_fixed",  # last driver green: r8
    "docs_split_assign",  # last driver green: r8
    "docs_split_leakage_safe",  # last driver green: r8
    "emb_hard_negatives",  # last driver green: r8
    "emb_near_dup_lsh_multi",  # last driver green: r8
    "events_daily_stats",  # last driver green: r8
    "events_daily_trend",  # last driver green: r8
    "events_drift_tvd",  # last driver green: r8
    "events_funnel",  # last driver green: r8
    "events_gapfill",  # last driver green: r8
    "events_json_props",  # last driver green: r8
    "events_ntile_quartiles",  # last driver green: r8
    "events_rolling_hour_avg",  # last driver green: r8
    "events_tumbling_30s",  # last driver green: r8
    "events_value_hour_corr",  # last driver green: r8
    "events_value_outliers_mad",  # last driver green: r8
    "graph_pagerank_suppliers",  # last driver green: r8
    "mm_asset_stats",  # last driver green: r8
    "mm_extract_features",  # last driver green: r8
    "mm_fingerprint",  # last driver green: r8
    "mm_frame_sample",  # last driver green: r8
    "mm_resize_images",  # last driver green: r8
    "parts_abc_analysis",  # last driver green: r8
    "pipeline_envelope_decode",  # last driver green: r8
    "q1_pricing_summary",  # last driver green: r8
    "q21_late_sole_supplier",  # last driver green: r8
    "q22_dormant_customers",  # last driver green: r8
    "q4_late_order_priority",  # last driver green: r8
    "retrieval_hybrid_rrf",  # last driver green: r8
    "sales_cube",  # last driver green: r8
    "sql_lateral_top_orders",  # last driver green: r8
    "text_bpe_merges",  # last driver green: r8
    "text_dsir_importance",  # last driver green: r8
    "text_ngram_novelty",  # last driver green: r8
    "asof_priority_rates",  # last driver green: r7
    "cdc_scd2_history",  # last driver green: r7
    "cdc_snapshot_diff",  # last driver green: r7
    "curation_pipeline",  # last driver green: r7
    "curation_source_caps",  # last driver green: r7
    "customer_rfm_segments",  # last driver green: r7
    "customer_running_spend",  # last driver green: r7
    "dedup_canonical_docs",  # last driver green: r7
    "dedup_components_star",  # last driver green: r7
    "dedup_contamination",  # last driver green: r7
    "dedup_ensemble",  # last driver green: r7
    "dedup_lsh_quality",  # last driver green: r7
    "dedup_minhash_lsh",  # last driver green: r7
    "dedup_ngram_jaccard",  # last driver green: r7
    "dedup_semantic",  # last driver green: r7
    "dedup_signal_agreement",  # last driver green: r7
    "emb_bitext_mine",  # last driver green: r7
    "emb_pq_codes",  # last driver green: r7
    "events_active_users",  # last driver green: r7
    "events_cohort_retention",  # last driver green: r7
    "events_concurrency_curve",  # last driver green: r7
    "events_range_follow",  # last driver green: r7
    "events_sliding_1h_15m",  # last driver green: r7
    "events_transition_matrix",  # last driver green: r7
    "events_zorder_scan",  # last driver green: r7
    "graph_triangles_cosupply",  # last driver green: r7
    "payment_type_share",  # last driver green: r7
    "sales_yoy_full_outer",  # last driver green: r7
    "serving_last_write_wins",  # last driver green: r7
    "sql_recursive_rollup",  # last driver green: r7
    "text_bm25_search",  # last driver green: r7
    "text_build_postings",  # last driver green: r7
    "text_length_quantiles",  # last driver green: r7
    "text_model_quality",  # last driver green: r7
    "text_quality_sample",  # last driver green: r7
    "top_orders_per_customer",  # last driver green: r7
    "q10_returned_items",  # last driver green: r6
    "q12_ship_delay_classes",  # last driver green: r6
    "q5_local_supplier_volume",  # last driver green: r6
    "q7_volume_shipping",  # last driver green: r6
    "sales_pivot_by_priority",  # last driver green: r6
    "salted_events_join",  # last driver green: r6
    "salted_lineitem_agg",  # last driver green: r6
    "salted_priority_sales",  # last driver green: r6
    "sketch_distinct_trigrams",  # last driver green: r6
    "sketch_value_quantiles",  # last driver green: r6
    "sql_above_average_orders",  # last driver green: r6
]
# --- END GENERATED GATE ORDER ---


def _gate_order(d: dict) -> dict:
    head = {k: d[k] for k in _GATE_HEAD if k in d}
    mid = {k: v for k, v in d.items() if k not in _GATE_HEAD and k not in _GATE_TAIL}
    tail = {k: d[k] for k in _GATE_TAIL if k in d}
    return {**head, **mid, **tail}


QUERY_FNS = _gate_order(QUERY_FNS)
ORACLE_SQL = _gate_order(ORACLE_SQL)
