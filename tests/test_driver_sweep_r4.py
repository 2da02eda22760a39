"""Driver-sweep rehearsal at the driver's own scale factor (sf0.01).

Two layers:

1. The round-4 oracle-bearing additions, hash-compared with the
   driver-identical comparator (frozen literal list — these earned their
   green driver rows in CORRECTNESS_r04 and must stay green).
2. EVERY rows-only query in the registry (current and future), pushed
   through ``driver_canon_rows`` — the driver's exact canonicalization
   path (toPandas → sort_values over all columns → pandas value hash).
   Round 4 shipped three driver ERRs (`multimodal_decode_stub`,
   `image_resize_pool`, `ml_word2vec_doc_vectors`) because the local
   rehearsal asserted only ``count() > 0`` while the driver also sorts and
   hashes, which crashes on list/DenseVector cells.  Deriving the
   parametrization from the live registry makes the class unrepresentable:
   a new query with a driver-unhashable schema fails here before any
   driver sees it.
"""

import pytest

from distributed_deep_learning_with_apache_spark_spark.registry import load_all
from tests.oracle import compare, driver_canon_rows, duck_connect

DRIVER_SF_DIR = "/root/testdata/sf0.01"

REG = load_all()

R4_ORACLE = [
    "events_retention_cohorts",
    "near_dup_containment_stopfiltered",
    "ann_matryoshka_refine",
    "near_dup_edit_distance",
    "simhash64_near_dup_pairs",
    "bucketed_join_revenue",
    "lake_schema_evolution",
    "salted_join_quantity_tier",
    "k_anonymity_violations",
    "recursive_calendar_daily",
    "udtf_chunk_spans",
]

ROWS_ONLY = sorted(n for n, q in REG.items() if q.oracle is None)

# Oracle-bearing round-5 additions: same frozen-list treatment as R4_ORACLE
# so they stay pinned at the DRIVER's scale factor (the routine parity suite
# runs at sf0.001; the driver compares at sf0.01).
R5_ORACLE = [
    "ansi_safe_doc_ratios",
    "batch_observed_metrics",
    "bloom_semijoin_pruned",
    "cdc_snapshot_diff",
    "collated_token_counts",
    "dedup_clusters_logstar",
    "distinct_multi_two_phase",
    "events_ohlc_hourly",
    "except_all_order_priorities",
    "grouped_apply_in_arrow",
    "grouped_quantile_exact",
    "heavy_hitters_sketch_verified",
    "hinted_shuffle_hash_join",
    "incremental_agg_maintenance",
    "intersect_all_order_priorities",
    "lake_compact_small_files",
    "lake_deletion_vectors",
    "lake_dpp_star_join",
    "lake_dynamic_partition_overwrite",
    "lake_vacuum_expire",
    "lateral_top3_orders",
    "leakage_safe_splits",
    "map_in_arrow_bytes",
    "notin_nullaware_anti",
    "ntile_balance_quartiles",
    "nullsafe_bucket_join",
    "quantile_two_pass_exact",
    "row_ids_distributed",
    "segment_nation_rollcall",
    "sink_custom_writer_roundtrip",
    "skew_agg_two_phase",
    "source_orc_lineitem_agg",
    "source_xml_events_agg",
    "sql_registered_udf",
    "triangle_count_copurchase",
    "udaf_weighted_median",
    "udf_iterator_scoring",
    "union_by_name_schema_drift",
    "percentile_band_segments",
    "temperature_mixture_weights",
    "locf_forward_fill",
]


# Oracle-bearing round-6 additions (same frozen-list treatment).
R6_ORACLE = [
    "pagerank_purchase_graph",
    "near_dup_incremental",
    "skyline_pareto_parts",
    "mad_price_outliers",
    "events_session_window_builtin",
    "benford_first_digit",
    "shortest_paths_bfs",
    "cosine_topk_filtered",
    "lake_wap_publish",
    "sql_pipe_syntax",
    "group_by_all_revenue",
    "lake_restore_version",
    "events_local_hour_histogram",
    "customer_rfm_segments",
    "attribution_last_touch",
    "near_dup_index_append_cycle",
    "dq_quarantine_split",
    "lake_shallow_clone_divergence",
    "embedding_drift_by_label",
    "chisq_priority_status_cells",
]

# Oracle-bearing round-7 additions (+ sample_seeded's rows-only -> oracle
# upgrade): frozen at the driver's sf0.01 like the earlier rounds.
R7_ORACLE = [
    "sample_seeded",
    "sample_takesample_k",
    "quantile_sketch_rollup_monthly",
    "kmv_user_overlap_sketch",
    "stream_exactly_once_merge_restart",
    "seasonal_decompose_daily_revenue",
    "stream_kmv_distinct_running",
    "bigram_perplexity_score",
    "ml_prefixspan_event_paths",
    "item_item_cosine_recs",
    "merge_full_sync",
    "incremental_join_maintenance",
    "asof_join_forward",
    "sessionize_with_terminators",
    "hybrid_hotkey_join",
    "retention_policy_sweep",
    "token_budget_top_p",
    "markov_event_transitions",
    "lake_incremental_read",
    "funnel_stage_durations",
    "ab_test_lift_ztest",
    "kcore_copurchase",
    "seasonal_residual_alerts",
    "doc_code_detection",
]


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(DRIVER_SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", R4_ORACLE)
def test_r4_oracle_at_driver_sf(spark, duck, name):
    q = REG[name]
    ok, msg = compare(q.fn(spark, DRIVER_SF_DIR), duck, q.oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", R5_ORACLE)
def test_r5_oracle_at_driver_sf(spark, duck, name):
    q = REG[name]
    ok, msg = compare(q.fn(spark, DRIVER_SF_DIR), duck, q.oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", R6_ORACLE)
def test_r6_oracle_at_driver_sf(spark, duck, name):
    q = REG[name]
    ok, msg = compare(q.fn(spark, DRIVER_SF_DIR), duck, q.oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", R7_ORACLE)
def test_r7_oracle_at_driver_sf(spark, duck, name):
    q = REG[name]
    ok, msg = compare(q.fn(spark, DRIVER_SF_DIR), duck, q.oracle)
    assert ok, f"{name}: {msg}"


# Oracle-bearing round-8 additions, frozen at the driver's sf0.01.
R8_ORACLE = [
    "ml_ridge_normal_eq",
    "knn_classify_embeddings",
    "countmin_estimate_profile",
    "ewma_dyadic_revenue",
    "out_of_order_lateness_histogram",
    "running_distinct_users_daily",
    "ivm_agg_retractions",
    "stream_countmin_running",
    "pca_power_iteration_quantized",
    "lsh_band_tuning_profile",
    "table_checksum_buckets",
    "range_partition_boundaries",
    "bootstrap_ci_revenue",
    "vocab_oov_rate",
    "json_schema_profile",
    "gini_revenue_concentration",
    "ks_two_sample_drift",
    "twap_monthly_revenue",
    "decile_lift_table",
    "cohort_ltv_curve",
    "log2_value_histogram",
]


@pytest.mark.parametrize("name", R8_ORACLE)
def test_r8_oracle_at_driver_sf(spark, duck, name):
    q = REG[name]
    ok, msg = compare(q.fn(spark, DRIVER_SF_DIR), duck, q.oracle)
    assert ok, f"{name}: {msg}"


R9_ORACLE = [
    "nation_revenue_trend",
    "share_of_parent_revenue",
    "pmi_priority_status",
    "floored_running_balance",
    "hot_streak_islands",
    # r9 second batch
    "autocorr_daily_revenue",
    "rolling_median_revenue_7d",
    "haar_wavelet_daily_revenue",
    "user_event_entropy",
    "bitmap_distinct_users",
    "stream_bitmap_distinct_running",
    "abc_pareto_classification",
    "allocation_largest_remainder",
    "near_dup_prefix_filter_jaccard",
    "ann_binary_hamming",
    "interval_month_overlap_revenue",
    "merkle_tree_levels",
    "business_days_to_ship",
    "time_decay_customer_score",
]


@pytest.mark.parametrize("name", R9_ORACLE)
def test_r9_oracle_at_driver_sf(spark, duck, name):
    q = REG[name]
    ok, msg = compare(q.fn(spark, DRIVER_SF_DIR), duck, q.oracle)
    assert ok, f"{name}: {msg}"


# Oracle-bearing round-11 additions (lake z-order clustered write +
# the incremental OPTIMIZE recluster closing that lifecycle).
R11_ORACLE = [
    "lake_zorder_write",
    "lake_zorder_recluster",
]


@pytest.mark.parametrize("name", R11_ORACLE)
def test_r11_oracle_at_driver_sf(spark, duck, name):
    q = REG[name]
    ok, msg = compare(q.fn(spark, DRIVER_SF_DIR), duck, q.oracle)
    assert ok, f"{name}: {msg}"


# Oracle-bearing round-12 additions (the wholetext S2/S3 closure + the
# from-scratch Avro OCF round-trip).
R12_ORACLE = [
    "source_text_wholetext_labels",
    "source_avro_events_agg",
    "near_dup_retract_reprobe",
    "near_dup_compact_tombstones",
]


@pytest.mark.parametrize("name", R12_ORACLE)
def test_r12_oracle_at_driver_sf(spark, duck, name):
    q = REG[name]
    ok, msg = compare(q.fn(spark, DRIVER_SF_DIR), duck, q.oracle)
    assert ok, f"{name}: {msg}"


def test_driver_canon_gate_catches_r4_err_class(spark):
    """Negative control: the exact r4 failure shape (a top-level array
    column) must be flagged by driver_canon_rows, proving the gate is live."""
    df = spark.createDataFrame([(1, [1.0, 2.0]), (2, [3.0])], "id long, v array<double>")
    with pytest.raises(TypeError, match="unhashable"):
        driver_canon_rows(df)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_survive_driver_canon_at_driver_sf(spark, name):
    """Rows-only queries must survive the driver's canonicalizer, not just
    count() — r4's three ERRs (list / DenseVector output cells) passed a
    bare count()>0 rehearsal and then crashed the driver's pandas sort."""
    df = REG[name].fn(spark, DRIVER_SF_DIR)
    assert df.columns
    assert driver_canon_rows(df) > 0, f"{name} returned 0 rows at driver SF"
