#!/usr/bin/env python
"""Regenerate PLANS.md: the executed physical plan + plan-shape summary for
every headline (bench) query at $SPARK_GRAFT_SF_DIR. This is the artifact
backing the scale claims — broadcast placement, pushed filters, exchange
counts are all visible here and gated by tests/test_plans.py."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_deep_learning_with_apache_spark_spark.plans.checks import explain_summary
from distributed_deep_learning_with_apache_spark_spark.registry import load_all
from distributed_deep_learning_with_apache_spark_spark.session import get_spark


# Non-bench queries whose plan shape is itself a scale claim worth showing.
EXTRA_PLANS = [
    "pii_scrub",
    "dedup_incremental",
    "clip_outliers_winsorize",
    "chunk_overlapping",
    "rolling_7d_customer_revenue",
    "lake_zorder_stats",
    "ann_ivf_persisted",
    "image_phash_neardup",
    # r3 additions
    "bigram_lm_quality",
    "grouping_sets_revenue",
    "join_key_skew_profile",
    "dedup_cluster_survivors",
    "ann_pq_adc",
    "video_keyframe_decode",
    # r3 second batch
    "hybrid_retrieval_rrf",
    "psi_drift_events",
    "events_rate_anomaly_zscore",
    "top_ngrams_boilerplate",
    "reservoir_sample_per_group",
    "text_normalize_nfc",
    "events_props_variant",
    "events_hourly_gapfill",
    "events_value_interpolate",
    "sample_weighted_quality",
    "lake_snapshot_time_travel",
    "ml_fpgrowth_item_pairs",
    "near_dup_containment",
    "hll_daily_distinct_rollup",
    # r4 additions
    "near_dup_containment_stopfiltered",
    "ann_matryoshka_refine",
    "near_dup_edit_distance",
    "bucketed_join_revenue",
    "salted_join_quantity_tier",
    "recursive_calendar_daily",
    # r5 additions
    "incremental_agg_maintenance",
    "skew_agg_two_phase",
    "heavy_hitters_sketch_verified",
    "quantile_two_pass_exact",
    "bloom_semijoin_pruned",
    "notin_nullaware_anti",
    "row_ids_distributed",
    "cdc_snapshot_diff",
    "lake_deletion_vectors",
    "distinct_multi_two_phase",
    "udaf_weighted_median",
    # r5 fourth batch (pagerank's returned DF is a checkpointed-RDD scan —
    # its per-iteration join shape is documented in SCALE.md instead)
    "map_in_arrow_bytes",
    # r5 fifth batch
    "events_ohlc_hourly",
    "udf_iterator_scoring",
    # r5 sixth batch (lake_dpp_star_join's registered DF is a post-collect
    # LocalRelation — its dynamicpruningexpression scan is plan-gated in
    # tests/test_lake.py and documented in SCALE.md)
    "triangle_count_copurchase",
    "ntile_balance_quartiles",
    # r6 additions (near_dup_incremental probes a persisted store built in
    # the same call; skyline/lake_wap/lake_restore return post-collect or
    # checkpoint-backed frames — their plan gates live in
    # tests/test_r6_new_ops.py and the shapes in SCALE.md)
    "mad_price_outliers",
    "events_session_window_builtin",
    "benford_first_digit",
    "cosine_topk_filtered",
    "sql_pipe_syntax",
    "group_by_all_revenue",
    "events_local_hour_histogram",
    "near_dup_incremental",
    "skyline_pareto_parts",
    # r7 additions
    "sample_seeded",
    "sample_takesample_k",
    "quantile_sketch_rollup_monthly",
    "kmv_user_overlap_sketch",
    "seasonal_decompose_daily_revenue",
    "bigram_perplexity_score",
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
    # r8 additions
    "ml_ridge_normal_eq",
    "knn_classify_embeddings",
    "countmin_estimate_profile",
    "ewma_dyadic_revenue",
    "out_of_order_lateness_histogram",
    "running_distinct_users_daily",
    "ivm_agg_retractions",
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
    # r11 additions (the z-clustered write's read-back scan; the streaming
    # and IVF-append lifecycles return bounded local/ledger tables whose
    # plans carry no scale claim — their gates live in the ops + tests)
    "lake_zorder_write",
    # r12 additions (the wholetext source shows the whole-file scan +
    # 2-group aggregate; the retraction/compaction/append lifecycle ops
    # and the avro round-trip return post-collect frames after their
    # in-op gates — the retraction overlay's BroadcastHashJoin LeftAnti
    # is plan-gated in tests/test_plans.py instead)
    "source_text_wholetext_labels",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan_dump")
    reg = load_all()
    out = [
        "# PLANS — executed physical plans for the headline queries",
        "",
        f"Generated by `python tools/dump_plans.py` at `{sf_dir}`. The plan-shape",
        "facts below (broadcast joins, pushed filters, exchanges) are asserted in",
        "`tests/test_plans.py`; regenerate after changing any headline query.",
        "Headline (bench) queries first, then the non-bench plan showcases.",
        "",
    ]
    for name, q in sorted(reg.items()):
        if not (q.bench or name in EXTRA_PLANS):
            continue
        df = q.fn(spark, sf_dir)
        df.count()  # let AQE finalize so the plan shows real strategies
        s = explain_summary(df)
        plan = df._jdf.queryExecution().executedPlan().toString()
        out += [
            f"## {name}",
            "",
            f"- broadcast joins: {s['broadcast_hash_joins']}, sort-merge: {s['sort_merge_joins']},"
            f" exchanges: {s['exchanges']}, parquet scans: {s['parquet_scans']},"
            f" cartesian: {s['cartesian_products']}",
            f"- pushed filters: {s['pushed_filters']}",
            "",
            "```",
            plan.strip()[:4000],
            "```",
            "",
        ]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md written ({sum(1 for n, q in reg.items() if q.bench or n in EXTRA_PLANS)} queries)")


if __name__ == "__main__":
    main()
