"""Central query registry.

Every operator implemented from SURVEY.md §2 registers here as a named
query: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) an equivalent ANSI-SQL string the DuckDB
oracle runs on the same parquet tables. ``__spark_entry__.py`` simply
re-exports this registry.

Column-name parity contract: the Spark DataFrame and the oracle SQL must
produce identical column names (the driver sorts columns by name before
hashing). Helpers here do not enforce it; tests/test_oracle_parity.py does.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: SparkQuery
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: add a query to the registry."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags, bench=bench)
        return fn

    return deco


# The driver's correctness gate iterates ``queries()`` in dict order and
# (empirically, CORRECTNESS_r01-r05.json) checks ~50 queries per round.
# After round 6 all 264 registered names have green driver rows (210
# hash + 54 rows-only), but 27 were last confirmed in round 1 and 49 in
# round 2 — six/five rounds of fixture and session evolution ago (VERDICT
# r6 #3).  Round 7 front-loads: (a) every NEW r7 query, (b) queries whose
# code CHANGED this round (advisor fixes + the crossval layout pin — they
# must re-earn their hash), then (c) the full r1-era cohort, then the
# r2-era cohort; whatever exceeds the ~50-query round budget carries to
# r8's rotation (regenerate this list each round from the CORRECTNESS_r*
# latest-row map — see tools/coverage_report.py for the consumption).
_DRIVER_PRIORITY = [
    # --- new in r7 (inserted as they land) --------------------------------
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
    # --- changed in r7: advisor fixes / layout pin (must re-earn hash) ----
    "sample_seeded",  # rows-only -> portable-hash Bernoulli with oracle
    "embedding_drift_by_label",
    "skyline_pareto_parts",
    "chisq_priority_status_cells",
    "lake_wap_publish",
    "ml_crossval_ridge",
    # --- stalest greens: latest driver row is ROUND 1 (r6 verdict #3) -----
    "corpus_curation_pipeline",
    "customer_order_distribution",
    "decontaminate_ngram_overlap",
    "dedup_clusters",
    "disjunctive_predicate_revenue",
    "filter_contains_project",
    "forecast_revenue",
    "idle_rich_customers",
    "important_part_values",
    "keyby_amounts",
    "large_volume_customers",
    "lonely_late_suppliers",
    "market_share",
    "merge_upsert_customers",
    "mix_domains_to_target",
    "nation_trade_volume",
    "order_priority_check",
    "pack_sequences",
    "part_supplier_counts",
    "product_type_profit",
    "promotion_candidate_suppliers",
    "quality_tiers",
    "returned_item_losses",
    "sample_stratified_hash",
    "scd2_customer_history",
    "small_quantity_revenue",
    "top_supplier_revenue",
    # --- then the round-2 cohort (overflow carries to r8) -----------------
    "ann_ivf_by_label",
    "ann_ivf_kmeans",
    "ann_lsh_bucketed",
    "ann_lsh_multiprobe",
    "anomaly_best_worst",
    "approx_stats_lineitem",
    "binary_metadata",
    "chunk_dedup_c4",
    "clip_outliers_winsorize",
    "cosine_topk_exact",
    "customer_balance_ranks",
    "dedup_incremental",
    "doc_embedding_avg",
    "dq_constraint_checks",
    "embedding_argmax",
    "embedding_dim_means",
    "embedding_l2_normalized",
    "embedding_quantize_int8",
    "events_latest_per_user_type",
    "events_sessionized",
    "events_sliding_1h_30m",
    "events_tumbling_hourly",
    "except_unsold_parts",
    "grouped_best_worst_orders",
    "grouped_topk_salted",
    "hstack_features",
    "intersect_active_building_customers",
    "lake_partition_pruned_revenue",
    "lake_zorder_stats",
    "last_timestep_select",
    "late_shipment_priority",
    "minmax_scaled_features",
    "ml_cnn_features_mlp",
    "ml_distributed_mlp_sum",
    "ml_regression_sum",
    "multimodal_frame_sample",
    "near_dup_cosine_pairs",
    "order_gap_days",
    "pii_scrub",
    "profile_lineitem",
    "quantile_order_prices",
    "repetition_signals",
    "running_revenue_per_customer",
    "simhash_fingerprints",
    "source_csv_orders_agg",
    "source_json_events_agg",
    "unpivot_lineitem_measures",
    "vector_scalar_ops",
    "vocab_filter_truncate",
]


def load_all() -> dict[str, Query]:
    """Import every query-defining module, then return the registry."""
    # Imports are side-effectful (decorators fill REGISTRY).
    from .operators import (  # noqa: F401
        asof,
        curation,
        decision_support,
        dedup,
        graph,
        incremental,
        merge,
        quality,
        relational,
        retrieval,
        setops,
        similarity,
        textpipe,
        topk,
    )
    from .functions import arrays, text, udf_surface  # noqa: F401
    from .sources import arrow_writer_sink, binary, formats, lake, pngv_datasource  # noqa: F401
    from .streaming import events  # noqa: F401
    from .ml import cnn as ml_cnn  # noqa: F401
    from .ml import distributed as ml_distributed  # noqa: F401
    from .ml import queries as ml_queries  # noqa: F401

    ordered = {n: REGISTRY[n] for n in _DRIVER_PRIORITY if n in REGISTRY}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    return ordered
