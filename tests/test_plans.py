"""Plan-shape tests: pin the physical-plan properties that matter at
100 TB, so a regression that silently un-pushes a filter or turns a
broadcast join into a shuffle fails HERE, not on the cluster.

Each assertion is a scale invariant:
- pushed filters  → predicate evaluated inside the parquet reader
                    (row-group skipping), not after a full scan;
- read schema     → column pruning actually reaching the scan;
- broadcast joins → small dims never shuffle the big fact side;
- partition filter→ Hive-layout directory pruning on derived tables
                    (the capability the reference's Glue tables lack —
                    SURVEY §1.2).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_kinesis_data_ingestion_restapi_spark.plans import (
    has_broadcast_join,
    has_partition_filters,
    pushed_filters,
    read_schema_columns,
    scan_count,
)
from aws_kinesis_data_ingestion_restapi_spark.registry import QUERY_FNS

SF_DIR = "/root/testdata/sf0.001"


def test_q1_filter_pushed_and_columns_pruned(spark):
    df = QUERY_FNS["q1_pricing_summary"](spark, SF_DIR)
    pushed = " ".join(pushed_filters(df))
    assert "l_shipdate" in pushed, "shipdate predicate must reach the scan"
    (cols,) = read_schema_columns(df)
    assert set(cols) == {
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    }, "q1 must read exactly its 7 columns, not all 16"


def test_sales_per_nation_broadcasts_dims(spark):
    df = QUERY_FNS["sales_per_nation"](spark, SF_DIR)
    assert has_broadcast_join(df), "customer/nation dims must broadcast"
    cols = read_schema_columns(df)
    assert ["o_custkey", "o_totalprice"] in cols, "orders pruned to 2 cols"


def test_top_parts_by_revenue_broadcasts_part(spark):
    df = QUERY_FNS["top_parts_by_revenue"](spark, SF_DIR)
    assert has_broadcast_join(df)
    cols = read_schema_columns(df)
    assert ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"] in cols


def test_text_ops_prune_documents_scan(spark):
    for name in ("text_token_stats", "text_fingerprint"):
        df = QUERY_FNS[name](spark, SF_DIR)
        for cols in read_schema_columns(df):
            assert "text" in cols and len(cols) <= 3, (
                f"{name} must not read metadata columns: {cols}"
            )


def test_ann_brute_broadcasts_queries_not_corpus(spark):
    # pinned on the OPERATOR plan: the registry entry now returns the
    # shared _audit_topk_panels checkpoint (r12 optimization), whose
    # plan is a cached-RDD scan — the search plan this test guards is
    # the one the panel builder runs.
    from aws_kinesis_data_ingestion_restapi_spark.operators import (
        registry_ext,
        similarity,
    )

    df = similarity.topk_brute(
        registry_ext._embs(spark, SF_DIR), n_queries=10, k=5
    )
    assert has_broadcast_join(df), "query side must broadcast"
    pushed = " ".join(pushed_filters(df))
    assert "vec_id" in pushed, "n_queries filter must reach the scan"


def test_partition_pruning_on_derived_table(spark, tmp_path):
    """Write a table with the reference's Hive layout, then filter on
    the partition column: the plan must show a PartitionFilter (whole
    directories skipped) — strictly more than the reference's Glue
    tables, which don't even expose partition values (SURVEY §1.2)."""
    src = spark.createDataFrame(
        [(f"o{i:05d}", ["ES", "US", "FR"][i % 3], 10.0 * i) for i in range(30)],
        ["order_id", "country", "amount"],
    )
    path = str(tmp_path / "shipping")
    src.write.partitionBy("country").parquet(path)
    df = spark.read.parquet(path).filter(F.col("country") == "ES")
    assert has_partition_filters(df, "country")
    # and partition pruning is visible as a filter, not a post-scan scan
    assert df.count() == 10


def test_pipeline_partition_scan_prunes(spark):
    """The catalog-path month query (registry.pipeline_partition_scan)
    must prune at the DIRECTORY level: PartitionFilters on both year
    and month in the scan, and the file index must contain ONLY the
    year=1995/month=03 partition's files — at 100 TB this is the
    difference between reading one month and reading the table."""
    df = QUERY_FNS["pipeline_partition_scan"](spark, SF_DIR)
    assert has_partition_filters(df, "year")
    assert has_partition_filters(df, "month")
    files = df.inputFiles()
    assert files, "expected a non-empty pruned file list"
    assert all("year=1995" in f and "month=03" in f for f in files), files[:3]
    # and the values actually come back (the partition isn't empty)
    assert df.count() > 0


def test_unused_join_branches_pruned(spark):
    """``build_order_events`` assembles events from 5 TPC-H tables,
    but ``to_orders`` only projects top-level order fields — Catalyst
    must prune the (lineitem ⋈ part) product_details branch entirely,
    leaving 3 scans (orders, customer, nation). If this regresses to 5,
    the orders projection pays for a 4-way join it doesn't use."""
    df = QUERY_FNS["pipeline_orders"](spark, SF_DIR)
    assert scan_count(df) == 3


@pytest.mark.parametrize(
    "name",
    ["ref_total_sales_per_country", "ref_total_income_per_payment_method"],
)
def test_reference_queries_aggregate_partial_final(spark, name):
    """The groupBy aggregates must be partial+final (two HashAggregate
    nodes around an exchange) — map-side combine is what keeps the
    shuffle linear in |groups|, not |rows|, at 100 TB."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    df = QUERY_FNS[name](spark, SF_DIR)
    s = explain_str(df)
    assert s.count("HashAggregate") >= 2, "expected partial+final aggregate"


def test_q1_stays_in_whole_stage_codegen(spark):
    """With AQE's lazy re-planning turned off (it hides codegen spans
    in the pre-execution plan), q1's scan→filter→aggregate chain must
    run as fused generated code — interpreted gaps are 10-100× slower
    per row."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import (
        whole_stage_codegen_ids,
    )

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = QUERY_FNS["q1_pricing_summary"](spark, SF_DIR)
        assert len(whole_stage_codegen_ids(df)) >= 2
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_contamination_broadcasts_benchmark_not_corpus(spark):
    """The benchmark gram set is the broadcast side; the corpus only
    hash-shuffles for the final per-doc aggregate — never for the
    probe join."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    df = QUERY_FNS["dedup_contamination"](spark, SF_DIR)
    assert has_broadcast_join(df)
    plan = explain_str(df)
    # exactly one scan feeds both sides (benchmark ⊂ corpus) — the
    # corpus side must not appear under a shuffle before the join
    assert "BroadcastHashJoin" in plan


def test_asof_join_is_bucketed_join_free_window(spark):
    """No range explosion AND no key-cardinality funnel: the fact side
    reaches a window partitioned by (key, time bucket) via union —
    zero joins anywhere in the plan — so parallelism is keys × buckets,
    not the 5 distinct priorities."""
    import re

    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    df = QUERY_FNS["asof_priority_rates"](spark, SF_DIR)
    plan = explain_str(df)
    # the fill window's partition spec must include the bucket column
    assert re.search(r"windowspecdefinition\([^)]*_b#\d+L,", plan), plan
    # the orders fact side reaches the window via union, not via a join
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # and the (key × bucket) group count actually exceeds the key count
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n_keys = orders.select("o_orderpriority").distinct().count()
    n_groups = (
        df.join(orders, ["o_orderkey", "o_orderpriority"])
        .selectExpr(
            "o_orderpriority",
            "CAST(CAST(o_orderdate AS TIMESTAMP) AS BIGINT) DIV 2592000 AS b",
        )
        .distinct()
        .count()
    )
    assert n_groups > 10 * n_keys, (n_groups, n_keys)


def test_range_follow_uses_equi_join_not_cross(spark):
    """The banded range join must candidate via an equi-join on
    (key, bin) — a cartesian/BNLJ here would be the quadratic form."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    df = QUERY_FNS["events_range_follow"](spark, SF_DIR)
    plan = explain_str(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cdc_diff_shuffles_digests_not_rows(spark):
    """The full-outer join input carries only (key, digest): the scan
    may read the compared columns, but the join schema must not."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    df = QUERY_FNS["cdc_snapshot_diff"](spark, SF_DIR)
    plan = explain_str(df)
    assert "FullOuter" in plan or "full_outer" in plan.lower()


def test_pack_sequences_no_global_window(spark):
    """The distributed prefix sum must not sort the corpus in a single
    task: every window over the full table is partitioned by block."""
    from aws_kinesis_data_ingestion_restapi_spark.operators import packing
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = explain_str(packing.pack_sequences(docs))
    # the only unpartitioned window runs over the tiny block-sums
    # frame, which sits behind a single-partition exchange of the
    # aggregated (not raw) rows
    assert plan.count("Window (") == 2  # tree nodes only
    # the full-table window is keyed by the block column; only the
    # block-sums window (post-aggregation, ~n/block rows) is global
    assert "windowspecdefinition(_blk#" in plan
    assert "_blk" in plan


def test_semi_anti_joins_are_semi_anti(spark):
    """The semi/anti queries must compile to LeftSemi/LeftAnti joins —
    never an inner join + distinct (which multiplies then collapses
    rows) — and the orders probe side must be filter-pushed."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    semi = explain_str(QUERY_FNS["customers_with_urgent_orders"](spark, SF_DIR))
    anti = explain_str(QUERY_FNS["customers_without_urgent_orders"](spark, SF_DIR))
    assert "LeftSemi" in semi, semi[:1500]
    assert "LeftAnti" in anti, anti[:1500]
    assert "1-URGENT" in semi  # pushed predicate reaches the scan side


def test_q5_no_cartesian_and_broadcast_dims(spark):
    """The 6-way Q5 join must stay equi-join shaped (no cartesian /
    BNLJ) with the guaranteed-small dims broadcast."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    plan = explain_str(QUERY_FNS["q5_local_supplier_volume"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # nation/region ride broadcasts


def test_profile_documents_single_scan(spark):
    """The profiler computes all column stats in ONE pass — exactly one
    parquet scan of documents in the plan."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    plan = explain_str(QUERY_FNS["profile_documents"](spark, SF_DIR))
    # one file-index per physical scan; the formatted plan repeats the
    # node label in the detail section, so count locations instead
    assert plan.count("Location: InMemoryFileIndex") == 1, plan[:2000]


def test_pivot_is_single_aggregate(spark):
    """The PIVOT must compile to one partial+final aggregate over one
    scan — never a per-column pass or a value-discovery job."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    plan = explain_str(QUERY_FNS["sales_pivot_by_priority"](spark, SF_DIR))
    assert plan.count("Location: InMemoryFileIndex") == 3  # orders+customer+nation
    assert "CartesianProduct" not in plan


def test_bm25_filters_terms_mapside_and_no_cartesian(spark):
    """The query-term IN-filter must exist as a real Filter node (map
    side, applied to the exploded token stream before the (doc, term)
    aggregation), stats/df frames ride broadcasts, and nothing
    degenerates into a cartesian product."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    plan = explain_str(QUERY_FNS["text_bm25_search"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "spark" in plan and "vector" in plan  # the IN-list literals
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_gapfill_broadcasts_bounds_and_keeps_one_fact_agg(spark):
    """The grid side rides broadcasts (1-row bounds × tiny type dim);
    the fact table pays exactly one aggregate shuffle; no cartesian
    blow-up from the crossJoin of metadata frames."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    plan = explain_str(QUERY_FNS["events_gapfill"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_funnel_no_cartesian_no_window(spark):
    """Funnel stages are conditional-min aggregates joined on user_id —
    never a window over the fact table, never a cartesian product."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    plan = explain_str(QUERY_FNS["events_funnel"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_lateral_topk_decorrelates(spark):
    """The LATERAL correlated LIMIT must decorrelate into a window/
    join plan — never per-customer re-execution via cartesian/BNLJ."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    plan = explain_str(QUERY_FNS["sql_lateral_top_orders"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan


def test_cube_is_single_aggregate(spark):
    """CUBE must expand grouping sets inside one aggregate — one scan
    of each table, no per-grouping-set passes."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    plan = explain_str(QUERY_FNS["sales_cube"](spark, SF_DIR))
    assert plan.count("Location: InMemoryFileIndex") == 3
    assert "Expand" in plan  # the grouping-sets expansion operator


def test_q7_dual_nation_broadcast_no_cartesian(spark):
    """Q7 joins nation twice in different roles; both must ride
    broadcasts, the pair-OR predicate must not degrade the plan to a
    cartesian/BNLJ, and the ship-date range must reach the scan."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    df = QUERY_FNS["q7_volume_shipping"](spark, SF_DIR)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert any("l_shipdate" in f for f in pushed_filters(df))


def test_q10_returnflag_pushed_topk_no_global_sort(spark):
    """Q10's returnflag filter must reach the lineitem scan and the
    top-20 must compile to TakeOrderedAndProject, not a full sort."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    df = QUERY_FNS["q10_returned_items"](spark, SF_DIR)
    plan = explain_str(df)
    assert any("l_returnflag" in f for f in pushed_filters(df))
    assert "TakeOrderedAndProject" in plan


def test_q17_decorrelated_single_lineitem_scan_pair(spark):
    """Q17's per-part average must come from a broadcast of the tiny
    per-part aggregate — no cartesian, no per-row subquery; the brand
    filter prunes part before both legs."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    plan = explain_str(QUERY_FNS["q17_small_quantity_revenue"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_q19_disjunction_keeps_equi_join(spark):
    """Q19's OR-of-conjunctions spans both tables: the join must stay
    a broadcast equi-join on partkey with the disjunction evaluated
    post-probe — never a nested-loop over the fact table."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    plan = explain_str(QUERY_FNS["q19_disjunctive_revenue"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_q22_anti_join_and_scalar_broadcast(spark):
    """Q22's no-recent-orders test must be a LeftAnti hash join and the
    global average balance a 1-row broadcast."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    plan = explain_str(QUERY_FNS["q22_dormant_customers"](spark, SF_DIR))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert has_broadcast_join(QUERY_FNS["q22_dormant_customers"](spark, SF_DIR))


def test_rolling_hour_avg_single_window_exchange(spark):
    """The RANGE-frame moving average must be ONE window over one
    user_id exchange — no self-join, no per-row range probe."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    plan = explain_str(QUERY_FNS["events_rolling_hour_avg"](spark, SF_DIR))
    assert "Window" in plan
    assert "Join" not in plan
    assert plan.count("Location: InMemoryFileIndex") == 1


def test_substring_hotspots_no_allpairs(spark):
    """Substring-hotspot dedup must stay gram-keyed aggregates + one
    equi-join — never a doc×doc product."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    plan = explain_str(QUERY_FNS["dedup_substring_hotspots"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_mad_outliers_broadcasts_tiny_aggregates(spark):
    """The median/MAD per-type aggregates are ≤n_types rows; they must
    ride broadcasts back onto events, never shuffle the fact side."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    plan = explain_str(QUERY_FNS["events_value_outliers_mad"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q4_exists_compiles_to_semi_join(spark):
    """Q4's EXISTS must be ONE LeftSemi hash join (dedup before the
    aggregate — no DISTINCT pass, no correlated re-execution)."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    plan = explain_str(QUERY_FNS["q4_late_order_priority"](spark, SF_DIR))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_q16_exclusion_is_anti_join_before_aggregate(spark):
    """Q16's NOT IN supplier set must be a broadcast anti join applied
    below the count-distinct aggregate."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    plan = explain_str(QUERY_FNS["q16_supplier_diversity"](spark, SF_DIR))
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q21_no_lineitem_self_join(spark):
    """Q21 must read lineitem ONCE (aggregate form), not via the
    original's three-way self-join."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    plan = explain_str(QUERY_FNS["q21_late_sole_supplier"](spark, SF_DIR))
    # scans: lineitem + orders + supplier = 3 file indexes; a self-join
    # formulation would show lineitem twice (4+)
    assert plan.count("Location: InMemoryFileIndex") == 3
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_concurrency_sweep_no_global_raw_window(spark):
    """The sweep-line running sum must use the two-level prefix form:
    the only globally-ordered window runs over the aggregated hourly
    bucket rows, never the raw boundary stream."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    plan = explain_str(QUERY_FNS["events_concurrency_curve"](spark, SF_DIR))
    assert plan.count("Window (") == 2
    assert "windowspecdefinition(_blk#" in plan


def test_q6_all_predicates_pushed_no_join(spark):
    """Q6 is the pure pushed-filter aggregate: the date range and
    quantity predicates must reach the parquet scan, the plan must
    contain no join, and the scan must read only the 3 needed cols."""
    df = QUERY_FNS["q6_forecast_revenue"](spark, SF_DIR)
    pushed = " ".join(pushed_filters(df))
    assert "l_shipdate" in pushed and "l_quantity" in pushed
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    assert "Join" not in explain_str(df)
    (cols,) = read_schema_columns(df)
    assert set(cols) == {"l_extendedprice", "l_discount", "l_quantity",
                         "l_shipdate"}


def test_q2_min_join_back_no_cartesian(spark):
    """Q2's decorrelated min must join back as an equi-join on
    (partkey, price) — never a cartesian or per-row subquery."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    plan = explain_str(QUERY_FNS["q2_min_cost_supplier"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_q13_left_outer_preserved(spark):
    """Q13's zero-order customers exist only if the left outer join
    survives planning (an inner rewrite would drop the c_count=0 row)."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    df = QUERY_FNS["q13_order_count_distribution"](spark, SF_DIR)
    plan = explain_str(df)
    assert "LeftOuter" in plan or "left_outer" in plan.lower()


def test_bucketed_sales_join_no_join_exchange(spark):
    """The bucketed tables must sort-merge-join with NO exchange below
    the join — the only shuffle in the whole plan is the final segment
    aggregate. This is the write-once/join-forever contract at 100 TB."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    df = QUERY_FNS["bucketed_sales_join"](spark, SF_DIR)
    plan = explain_str(df)
    assert "SortMergeJoin" in plan
    # both scans read the bucket layout (the exchange-free evidence)...
    assert plan.count("Bucketed: true") == 2, plan[:2500]
    # ...and the only Exchanges are ABOVE the join: the groupBy hash
    # exchange + the orderBy range exchange. A shuffled join would
    # add two more below it. ("Exchange (" counts tree nodes only —
    # the formatted detail section repeats node labels.)
    assert plan.count("Exchange (") == 2, plan[:2500]


def test_salted_events_join_spreads_key(spark):
    """The salted join must join on (event_type, _salt) — the salt
    column visible in the join keys is what spreads each low-
    cardinality key over n_salts reducers."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    plan = explain_str(QUERY_FNS["salted_events_join"](spark, SF_DIR))
    assert "_salt" in plan
    assert "CartesianProduct" not in plan


def test_pq_codes_broadcast_codebook_no_cartesian(spark):
    """PQ assignment must probe a broadcast codebook (never shuffle the
    corpus against it) and ADC search must join codes to broadcast
    distance tables — no cartesian anywhere in either plan."""
    from aws_kinesis_data_ingestion_restapi_spark.operators import (
        registry_ext,
        similarity,
    )
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    # ann_topk_pq pinned on the OPERATOR plan: the registry entry now
    # returns the shared _audit_topk_panels checkpoint (r12
    # optimization), whose plan is a cached-RDD scan.
    plans = {
        "emb_pq_codes": QUERY_FNS["emb_pq_codes"](spark, SF_DIR),
        "topk_pq": similarity.topk_pq(
            registry_ext._embs(spark, SF_DIR), n_queries=10, k=5
        ),
    }
    for name, df in plans.items():
        plan = explain_str(df)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastHashJoin" in plan, name


def test_salted_lineitem_agg_two_phase_plan(spark):
    """The salted aggregate must show BOTH phases in the plan: a
    phase-1 exchange that hash-partitions on (key..., _salt) — the
    deterministic spark_partition_id salt that spreads a hot key over
    n_salts reducers — and a phase-2 exchange on the bare key. With
    the final orderBy's range exchange that is exactly three
    exchanges; a collapsed (single-phase) plan would drop to two."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    plan = explain_str(QUERY_FNS["salted_lineitem_agg"](spark, SF_DIR))
    # Catalyst renames the alias: the salt survives as
    # SPARK_PARTITION_ID() % 8 projected into a _groupingexpression
    assert "SPARK_PARTITION_ID()" in plan
    assert "_groupingexpression" in plan
    # phase 1 groups by 3 keys (key + salt), phase 2 by the bare pair
    assert "Keys [3]: [l_returnflag" in plan
    assert "Keys [2]: [l_returnflag" in plan
    assert plan.count("Exchange (") == 3, plan[:2500]


def test_ann_recall_audit_no_cartesian_truth_reused(spark):
    """The recall audit must close each method against the ground
    truth via equi-joins (never a cartesian), and the truth side must
    come from the localCheckpointed scan (computed once), visible as
    'Scan ExistingRDD' rather than three repeated brute-force
    window pipelines."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    plan = explain_str(QUERY_FNS["ann_recall_audit"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert plan.count("Scan ExistingRDD") >= 3, plan[:2500]


def test_incremental_dedup_probe_shape(spark):
    """The delta-vs-corpus probe must be pure equi-joins on the band
    key (never a cartesian), pick best matches through the rank
    pushdown (WindowGroupLimit — top-1 per delta doc without
    materializing full rank partitions), and drop corpus-dup'd docs
    from the in-batch pass via a left-anti join — the three plan
    features that keep per-batch cost independent of corpus size."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    plan = explain_str(QUERY_FNS["dedup_incremental_delta"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan
    assert "LeftAnti" in plan


def test_events_zorder_scan_pushes_both_dimensions(spark):
    """The z-ordered read-back must push BOTH box predicates (ts and
    value) into the parquet scan — footer min/max pruning only fires
    on pushed filters, and a post-scan filter would make the layout
    pointless."""
    df = QUERY_FNS["events_zorder_scan"](spark, SF_DIR)
    pushed = " ".join(pushed_filters(df))
    assert "ts" in pushed, pushed
    assert "value" in pushed, pushed


def test_runtime_bloom_filter_reduces_fact_scan(spark):
    """The engine's 100 TB fact ⋈ filtered-dim path gets a map-side
    semi-join reduction for FREE: with runtime bloom filters on
    (session default), Catalyst builds a bloom_filter_agg over the
    selective dim's join keys and injects might_contain(...) into the
    fact scan's filter — fact rows that cannot join die before the
    shuffle. The default applicationSideScanSizeThreshold (10 GiB) is
    exactly the at-scale regime; the test lowers it so the at-scale
    plan shape is visible (and pinned) at test scale."""
    thr = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    bcast = "spark.sql.autoBroadcastJoinThreshold"
    old_thr, old_bcast = spark.conf.get(thr), spark.conf.get(bcast)
    try:
        spark.conf.set(thr, "0")
        spark.conf.set(bcast, "-1")  # shuffle join, the bloom-eligible shape
        from aws_kinesis_data_ingestion_restapi_spark.sources.tables import (
            load_table,
        )

        li = load_table(spark, SF_DIR, "lineitem")
        orders = load_table(spark, SF_DIR, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
        assert "bloom_filter_agg" in plan, plan[:2000]
        # and the reduced join still answers correctly
        rows = j.collect()
        assert len(rows) == 1 and rows[0]["o_orderpriority"] == "1-URGENT"
    finally:
        spark.conf.set(thr, old_thr)
        spark.conf.set(bcast, old_bcast)


def test_semantic_dup_pairs_equi_join_no_cartesian(spark):
    """SemDeDup's candidate stage must be an EQUI-join on the cell id
    — the whole point of clustering first is that the quadratic
    comparison never leaves a cell. A cartesian (or a degenerate
    broadcast nested loop) here would be all-pairs wearing a
    disguise. The assignment's n×K BroadcastNestedLoopJoin is a
    separate, deliberate stage — the test checkpoints the assignment
    so the pinned plan is exactly the candidate stage."""
    from aws_kinesis_data_ingestion_restapi_spark.operators import similarity
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assign = similarity._kmeans_assign(
        embs.select("vec_id", similarity.quantized().alias("v")),
        embs.filter(F.col("vec_id") % 10 == 0).select(
            F.col("vec_id").alias("cell"),
            similarity.quantized().alias("cv"),
        ),
        "vec_id",
    ).localCheckpoint(eager=True)
    plan = explain_str(similarity.semantic_dup_pairs(assign))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    # an equi-join keyed on the cell column (formatted explain lists
    # join keys in the detail section)
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    ), plan[:2000]
    assert "Left keys [1]: [cell" in plan, plan[:2000]


def test_clustered_embeddings_pure_projection(spark):
    """The clustered fixture is ONE map-side projection — no shuffle,
    no join: at 100 TB a fixture that reshuffled the corpus would
    dominate the audit it exists to serve."""
    from aws_kinesis_data_ingestion_restapi_spark.operators import similarity
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = explain_str(similarity.clustered_embeddings(embs))
    assert "Exchange" not in plan, plan[:2000]
    assert "Join" not in plan, plan[:2000]


def test_bucketed_band_index_probe_no_corpus_exchange(spark, tmp_path):
    """The X90 100 TB deployment shape, plan-proven: the corpus band
    index persisted BUCKETED by (band, band_key) is probed by a delta
    batch with the corpus side shuffle-free — only the (small) delta
    side exchanges onto the index's layout. This is the 'probe cost
    tracks the delta' claim at the plan level, complementing the
    measured wall-clock numbers in BENCH_NOTES (10× corpus → 0.96×
    probe time)."""
    from aws_kinesis_data_ingestion_restapi_spark.operators import dedup, scale
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sigs = dedup.minhash_signatures(docs, num_perm=32)
    corpus_bands = dedup.minhash_band_keys(
        sigs.filter(F.col("doc_id") % 10 < 7), num_perm=32, bands=4
    )
    delta_bands = dedup.minhash_band_keys(
        sigs.filter(F.col("doc_id") % 10 >= 7), num_perm=32, bands=4
    )
    scale.write_bucketed(
        corpus_bands, "band_index_plan_pin", ["band", "band_key"], n_buckets=8
    )
    bcast = "spark.sql.autoBroadcastJoinThreshold"
    old_bcast = spark.conf.get(bcast)
    try:
        spark.conf.set(bcast, "-1")  # pin the SMJ shape, not a broadcast
        idx = spark.table("band_index_plan_pin")
        probe = delta_bands.alias("d").join(
            idx.alias("c"),
            (F.col("d.band") == F.col("c.band"))
            & (F.col("d.band_key") == F.col("c.band_key")),
        ).select(F.col("d.doc_id").alias("delta_id"),
                 F.col("c.doc_id").alias("match_id"))
        plan = explain_str(probe)
        assert "SortMergeJoin" in plan, plan[:2500]
        assert plan.count("Bucketed: true") == 1, plan[:2500]  # corpus scan
        # structural: the corpus branch (the join's second child, from
        # its Sort down to the bucketed table scan) contains NO
        # Exchange — only the delta side shuffles to align with the
        # index's bucket layout (the delta branch also carries the sig
        # builder's own doc_id repartition, which is why a global
        # exchange count would be brittle)
        tree = plan.split("\n\n(")[0]
        corpus_branch = tree[tree.rfind("+- Sort"):]
        assert "band_index_plan_pin" in corpus_branch, tree
        assert "Exchange" not in corpus_branch, tree
        assert probe.count() > 0  # and the probe actually matches
    finally:
        spark.conf.set(bcast, old_bcast)
        spark.sql("DROP TABLE IF EXISTS band_index_plan_pin")


def test_source_caps_window_group_limit_pushdown(spark):
    """The per-source cap's rank-then-filter must compile to
    WindowGroupLimit — each map task keeps only its local top-cap per
    source BEFORE the shuffle, so a 100×-over-cap hot domain dies
    map-side instead of flooding one reducer. And the whole pre-window
    stage is one scan + projection — no doc_id self-join."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    plan = explain_str(QUERY_FNS["curation_source_caps"](spark, SF_DIR))
    assert "WindowGroupLimit" in plan, plan[:2000]
    # score + source come from ONE scan (quality_score passthrough) —
    # zero joins anywhere: the pre-window stage is a pure projection
    assert "Join" not in plan, plan[:2000]


def test_model_quality_zero_shuffle(spark):
    """The hashed-linear scorer is ONE codegen projection: no
    exchange, no join — the property that lets a quality model score
    100 TB as a pure scan. (The registry entry reads through
    spread_scan, whose single round-robin exchange exists only for
    the one-row-group local fixtures — pinned here over a raw read.)"""
    from aws_kinesis_data_ingestion_restapi_spark.operators import text
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = explain_str(text.hashed_linear_score(docs))
    assert "Exchange" not in plan, plan[:2000]
    assert "Join" not in plan, plan[:2000]


def test_ivfpq_cell_filter_below_adc_join(spark):
    """The IVF-PQ scale claim at the plan level (r7 VERDICT ask #1):
    the coarse-cell restriction must sit BELOW the ADC lookup join —
    codes meet the broadcast probe panel on the cell key first, so
    unprobed cells' codes never reach the distance tables and per-query
    ADC work is (n/K)·nprobe·m, not n·m (the defect this operator
    exists to fix in topk_pq). Physical-plan detail sections number
    children lower than parents, so the pin is an ordering over the
    operator ids: cell-join < pcell-ADC-join < sum(qd2) aggregate."""
    import re

    from aws_kinesis_data_ingestion_restapi_spark.operators import similarity
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = explain_str(similarity.topk_ivfpq(embs, n_queries=10, k=5))
    cell_join = adc_join = adc_sum = None
    for m in re.finditer(
        r"\((\d+)\) (BroadcastHashJoin|HashAggregate)[^\n]*\n(.*?)(?=\n\(|\Z)",
        plan,
        re.S,
    ):
        num, op, body = int(m.group(1)), m.group(2), m.group(3)
        if op == "BroadcastHashJoin":
            keys = re.search(r"Left keys \[\d+\]: \[([^\]]*)\]", body)
            keys = keys.group(1) if keys else ""
            if "pcell#" in keys:
                adc_join = num
            elif keys.startswith("cell#"):
                cell_join = num
        elif op == "HashAggregate" and "sum(qd2" in body:
            adc_sum = num  # keeps the FINAL (highest) sum agg
    assert cell_join is not None, plan[:3000]
    assert adc_join is not None, plan[:3000]
    assert adc_sum is not None, plan[:3000]
    assert cell_join < adc_join < adc_sum, (cell_join, adc_join, adc_sum)


def test_ivfpq_trained_cell_filter_below_adc_join(spark):
    """The trained-quantizer residual IVFADC (r9) must keep the SAME
    at-scale property its stride sibling pins above: the coarse-cell
    restriction sits BELOW the ADC lookup join — codes meet the
    broadcast probe panel on the cell key first, so unprobed cells'
    codes never reach the residual distance tables. Training changes
    the quantizers, never the search plan shape."""
    import re

    from aws_kinesis_data_ingestion_restapi_spark.operators import similarity
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = explain_str(similarity.topk_ivfpq_trained(embs, n_queries=10, k=5))
    cell_join = adc_join = adc_sum = None
    for m in re.finditer(
        r"\((\d+)\) (BroadcastHashJoin|HashAggregate)[^\n]*\n(.*?)(?=\n\(|\Z)",
        plan,
        re.S,
    ):
        num, op, body = int(m.group(1)), m.group(2), m.group(3)
        if op == "BroadcastHashJoin":
            keys = re.search(r"Left keys \[\d+\]: \[([^\]]*)\]", body)
            keys = keys.group(1) if keys else ""
            if "pcell#" in keys:
                adc_join = num
            elif keys.startswith("cell#"):
                cell_join = num
        elif op == "HashAggregate" and "sum(qd2" in body:
            adc_sum = num  # keeps the FINAL (highest) sum agg
    assert cell_join is not None, plan[:3000]
    assert adc_join is not None, plan[:3000]
    assert adc_sum is not None, plan[:3000]
    assert cell_join < adc_join < adc_sum, (cell_join, adc_join, adc_sum)


def test_bpe_round_single_word_exchange(spark):
    """X102's per-round scale claim, plan-pinned: every window of the
    re-segmentation (candidate lead, island rank, parity rank,
    absorbed lag, dense re-position) partitions by `word`, so the
    WHOLE round compiles to exactly ONE data Exchange (the word
    layout) with only re-sorts between the five windows, and the top
    pair reaches the candidates as a 1-row broadcast — never a
    shuffle join. A second data exchange appearing here means a
    window stopped sharing the word layout and every merge round
    would shuffle the token table twice."""
    import re

    from pyspark.sql import functions as F

    from aws_kinesis_data_ingestion_restapi_spark.operators.text import _bpe_round
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    words = (
        docs.select(F.explode(F.split("text", r"\s+")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    toks = words.select(
        "word",
        "freq",
        F.posexplode(
            F.expr(
                "transform(sequence(1, length(word)),"
                " i -> substring(word, i, 1))"
            )
        ).alias("pos", "tok"),
    ).localCheckpoint(eager=True)
    top, _ = _bpe_round(toks)
    top = top.localCheckpoint(eager=True)
    _, new_toks = _bpe_round(toks, top=top)
    plan = explain_str(new_toks)
    tree = plan.split("\n\n(")[0]
    data_exchanges = len(re.findall(r"\+- Exchange ", tree)) + len(
        re.findall(r":- Exchange ", tree)
    )
    assert data_exchanges == 1, tree
    assert tree.count("Window") == 5, tree
    assert "BroadcastExchange" in tree, tree
    assert "SortMergeJoin" not in tree, tree
    # and the one exchange is the word layout
    m = re.search(r"\(\d+\) Exchange[^\n]*\n.*?Arguments: ([^\n]*)", plan, re.S)
    assert "hashpartitioning(word" in m.group(1), m.group(1)


def test_dsir_importance_two_scans_broadcast_model(spark):
    """X105's scale claim, plan-pinned: DSIR scoring is exactly TWO
    corpus scans (one builds the 256-bucket count "model", one streams
    tokens through it) with the model reaching the token stream as a
    BROADCAST hash join — never a shuffle join of corpus against
    corpus — plus the two partial-aggregated exchanges (bucket counts,
    per-doc sums) and the final order sort. A SortMergeJoin or a third
    scan appearing here means the 100-TB-as-two-scans property broke."""
    from aws_kinesis_data_ingestion_restapi_spark.operators.text import (
        dsir_importance,
    )
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = explain_str(dsir_importance(docs))
    tree = plan.split("\n\n(")[0]
    assert tree.count("Scan parquet") == 2, tree
    assert tree.count("BroadcastHashJoin") == 1, tree
    assert "SortMergeJoin" not in tree, tree
    assert "BroadcastNestedLoopJoin" not in tree, tree


def test_phash_near_dup_equi_joins_only(spark):
    """X104's scale claim, plan-pinned: pHash candidates come from the
    pigeonhole (band, band_val) EQUI-join and the popcount verify from
    id equi-joins — three hash joins, zero nested-loop/cartesian
    operators. An asset-level cross product appearing here means the
    banding stopped bounding the pair space."""
    from aws_kinesis_data_ingestion_restapi_spark.operators import multimodal
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = explain_str(
        multimodal.phash_near_dup(multimodal.rerendered_assets(docs))
    )
    tree = plan.split("\n\n(")[0]
    assert "BroadcastNestedLoopJoin" not in tree, tree
    assert "CartesianProduct" not in tree, tree
    n_joins = (
        tree.count("BroadcastHashJoin")
        + tree.count("SortMergeJoin")
        + tree.count("ShuffledHashJoin")
    )
    assert n_joins == 3, tree


def test_duplicated_spans_bounded_plan(spark):
    """X117's scale claim, plan-pinned: exact-substring spans compile
    to equi-joins only (the gram probe is a semi-join on the 60-bit
    int key) with the islands window partitioned BY doc_id — no
    cartesian/nested-loop operator, no global un-partitioned window,
    no suffix-array-style global sort of the corpus."""
    import re

    from aws_kinesis_data_ingestion_restapi_spark.operators import dedup
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = explain_str(dedup.duplicated_spans(dedup.spliced_docs(docs)))
    tree = plan.split("\n\n(")[0]
    assert "BroadcastNestedLoopJoin" not in tree, tree
    assert "CartesianProduct" not in tree, tree
    # the islands window partitions by doc_id (never a global window)
    m = re.search(r"\(\d+\) Window[^\n]*\n(.*?)(?=\n\(|\Z)", plan, re.S)
    assert m is not None, plan[:3000]
    assert "doc_id#" in m.group(1), m.group(1)


def test_chunking_is_pure_map(spark):
    """X121's scale claim, plan-proven: chunking is tokenize + a
    per-doc sequence explode + array slices — NO shuffle, NO join.
    A chunker that exchanged the corpus would turn a 100 TB scan
    into a 100 TB shuffle for no reason."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    plan = explain_str(QUERY_FNS["docs_chunk_overlap"](spark, SF_DIR))
    # permitted exchanges: the _docs() input round-robin repartition
    # and the gate's final sort (rangepartitioning). NO keyed shuffle
    # (hashpartitioning = an aggregate/join exchange) may appear.
    assert "hashpartitioning" not in plan, plan[:2000]
    assert "Join" not in plan, plan[:2000]


def test_tfidf_filters_terms_mapside_and_no_cartesian(spark):
    """X120 inherits the X43 plan contract: the query-term IN-filter
    is a real map-side Filter on the exploded token stream (shuffle
    volume ∝ term hits, not corpus tokens), metadata frames ride
    broadcasts, no cartesian blow-up."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    plan = explain_str(QUERY_FNS["text_tfidf_search"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "spark" in plan and "vector" in plan  # the IN-list literals
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_lm_score_bigrams_are_mapside(spark):
    """X119's scale claim: bigrams come from a map-side transform over
    each doc's token array — the plan must contain NO self-join of the
    token stream on (doc, position); the only joins are the model
    lookup and the 1-row vocab broadcast."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    plan = explain_str(QUERY_FNS["text_lm_score"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # positional self-join would appear as a SortMergeJoin on doc_id
    # BELOW the first aggregate; the bigram builder is a Generate of
    # explode(transform(slice(...))) — pin that exact shape
    assert "explode(transform(slice(" in plan, plan[:2000]


def test_pca_power_output_plan_shapes(spark):
    """X123: the per-round iterate is broadcast-joined to the exploded
    component stream (d-row frame side), never shuffled corpus-v-
    corpus; no cartesian product. Calls the operator directly — the
    registry wrapper serves the _pca_proj session cache, whose plan
    is a checkpoint scan with no joins left to pin."""
    from aws_kinesis_data_ingestion_restapi_spark.operators import similarity
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = explain_str(similarity.pca_power_projection(embs))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_lpa_round_plan_shapes(spark):
    """X135: per-round work is one edge-label equi-join + the (node,
    label) aggregate + the argmax aggregate — keyed exchanges bounded
    by the round count, no cartesian product, and the argmax is an
    aggregate (map-side partial), never a per-node row_number sort."""
    import re

    from aws_kinesis_data_ingestion_restapi_spark.operators import graph
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], ["u", "v"]
    )
    # one UN-materialized round exposes the full round plan (the
    # registry path truncates lineage per round via localCheckpoint)
    from aws_kinesis_data_ingestion_restapi_spark.operators.ckpt import (
        materialize as _mat,
    )

    ed = edges.select("u", "v").unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    labels = ed.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    counts = (
        ed.join(labels, ed.u == labels.node)
        .groupBy(F.col("v").alias("n2"), "lbl")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    nxt = (
        counts.groupBy(F.col("n2").alias("node"))
        .agg(
            F.max(F.struct(F.col("cnt"), (-F.col("lbl")).alias("neg"))).alias(
                "m"
            )
        )
        .select("node", (-F.col("m.neg")).alias("lbl"))
    )
    plan = explain_str(nxt)
    assert "CartesianProduct" not in plan
    assert "Window" not in plan  # argmax is an aggregate, not a sort
    assert "partial_max" in plan or "partial max" in plan.lower(), plan[:2500]


def test_resolve_entities_blocking_is_equi_join_with_attrs(spark):
    """X136's scale claim, plan-pinned: entity-resolution candidates
    come from ONE equi-join whose key includes the deletion variant
    AND every agreement attribute — attribute verification happens in
    the shuffle key, not as a post-join filter — and nothing in the
    plan is a nested-loop/cartesian operator."""
    import re

    from aws_kinesis_data_ingestion_restapi_spark.operators.fuzzy import (
        resolve_entities,
    )
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    # plan of the verified-pairs stage (the closure loop materializes
    # per round, so pin the stage the operator adds)
    from aws_kinesis_data_ingestion_restapi_spark.operators import fuzzy

    base = cust.select(
        F.col("c_custkey").alias("_k"),
        F.col("c_name").alias("_s"),
        F.col("c_nationkey"),
        F.col("c_mktsegment"),
        F.explode(fuzzy._deletion_variants("c_name")).alias("_v"),
    )
    a = base.select(
        F.col("_k").alias("key_a"), F.col("_s").alias("_sa"), "_v",
        "c_nationkey", "c_mktsegment",
    )
    b = base.select(
        F.col("_k").alias("key_b"), F.col("_s").alias("_sb"), "_v",
        "c_nationkey", "c_mktsegment",
    )
    cand = a.join(b, ["_v", "c_nationkey", "c_mktsegment"]).filter(
        F.col("key_a") < F.col("key_b")
    )
    plan = explain_str(cand)
    tree = plan.split("\n\n(")[0]
    assert "CartesianProduct" not in tree, tree
    assert "BroadcastNestedLoopJoin" not in tree, tree
    assert re.search(r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin",
                     tree), tree
    m = re.search(r"Left keys \[\d+\]: \[([^\]]*)\]", plan)
    assert m, plan
    keys = m.group(1)
    assert "_v" in keys and "c_nationkey" in keys and "c_mktsegment" in keys, keys


def test_incremental_components_full_width_is_one_label_join(spark):
    """X141's scale claim, plan-pinned: the touched-component
    discovery is equi-joins of the label table against the delta
    endpoints (hash joins only, no cartesian), and the untouched
    passthrough is a LEFT ANTI join on the component key."""
    from aws_kinesis_data_ingestion_restapi_spark.operators import graph
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    base = spark.createDataFrame(
        [(i, i - (i % 3)) for i in range(60)], ["node", "component"]
    )
    delta = spark.createDataFrame([(1, 4), (7, 10)], ["u", "v"])
    out = graph.incremental_components(base, delta)
    plan = explain_str(out)
    tree = plan.split("\n\n(")[0]
    assert "CartesianProduct" not in tree, tree
    assert "BroadcastNestedLoopJoin" not in tree, tree
    assert "LeftAnti" in tree, tree


def test_filtered_ann_pushes_allowed_join_below_adc(spark):
    """X190 plan pin (r11 ask #6): the allowed-id predicate joins the
    INVENTORY below the cell-keyed ADC aggregate — in the formatted
    plan the `_fid` broadcast join must sit in the subtree UNDER the
    refine-shortlist window (node ids: the _fid join's id is larger
    than the shortlist window's, i.e. deeper), never as a post-filter
    above the final top-k."""
    import re

    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    df = QUERY_FNS["ann_topk_ivfpq_filtered"](spark, SF_DIR)
    plan = explain_str(df, mode="extended")
    # the allowed join exists and its column is gone by the output
    assert "_fid" in plan, "allowed-id join missing from the plan"
    opt = plan.split("== Optimized Logical Plan ==")[1].split(
        "== Physical Plan =="
    )[0]
    lines = opt.split("\n")
    win = [
        i for i, ln in enumerate(lines)
        if "windowspecdefinition" in ln and "_ar" in ln
    ]
    fid = [i for i, ln in enumerate(lines) if "_fid" in ln]
    assert win and fid
    # logical tree prints parents first: every _fid line must be BELOW
    # (after) the shortlist window line, i.e. inside its input subtree
    assert min(fid) > min(win), (min(fid), min(win))
    # and deeper-indented than the window node (strictly a child)
    w_ind = len(lines[min(win)]) - len(lines[min(win)].lstrip(" :+-"))
    f_ind = len(lines[min(fid)]) - len(lines[min(fid)].lstrip(" :+-"))
    assert f_ind > w_ind, (lines[min(win)], lines[min(fid)])


def test_supplier_similarity_broadcasts_degrees_no_cartesian(spark):
    """X210's scale claim: candidates generate per shared PART (an
    equi-join — no cartesian anywhere in the plan) and both degree
    frames attach as broadcasts; the top-k is a TakeOrdered, not a
    global sort."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    plan = explain_str(QUERY_FNS["graph_supplier_similarity"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_bloom_fpr_probe_is_equi_join(spark):
    """X211's scale claim: the probe joins the distinct bit set on the
    position column — an equi-join (hash or broadcast), never a
    nested-loop scan of the bit set per probe."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    plan = explain_str(QUERY_FNS["sketch_bloom_fpr"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # the bit-set probe itself must be a hash equi-join on pos (the
    # only BNLJs allowed are the three 1-row scalar attaches)
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "pos" in plan


def test_distance_octave_sample_is_take_ordered(spark):
    """X212's scale claim: the KMV-rule sample compiles to
    TakeOrderedAndProject (distributed top-k by hash) — NOT a global
    Sort of the embeddings table followed by a limit."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    plan = explain_str(QUERY_FNS["emb_distance_octaves"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_partition_advisor_is_three_aggregates(spark):
    """X224's scale claim: each candidate layout is one map-side-
    combined aggregate over a projection — no joins of the fact table
    against itself, no window over the events scan."""
    from aws_kinesis_data_ingestion_restapi_spark.plans import explain_str

    plan = explain_str(QUERY_FNS["warehouse_partition_advisor"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 6  # partial+final per layout
    assert "Window" not in plan
