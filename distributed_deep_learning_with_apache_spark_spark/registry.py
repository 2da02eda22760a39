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
# checks exactly 50 queries per round (CORRECTNESS_r01-r08: 50 rows each).
# Round-9 rotation (r8 verdict #1, the round's top item — "never-checked
# first"): the 20 round-8 operators with NO driver row yet (including
# the four whose code changed again this round: the gini/decile
# prefix-sum rewrite, range_partition_boundaries' dead-line delete, and
# the lateness histogram's integer bucketing), then the 2 otherwise-
# checked queries whose code changed this round (must re-earn their
# hash), then the 12 r2-stale names the r8 rotation's 50 slots couldn't
# reach, then the alphabetically-first 16 of the 47 r3-stale names.
# That fills exactly 50 slots; the remaining 31 r3-stale names are next
# in line and front r10's rotation. New r9 operators intentionally sit
# BELOW the backlog (local oracle parity covers them until their first
# driver row) — with 308+ registered and 50 slots/round, evidence
# freshness is the binding constraint (r8 verdict #1).
# Regenerate this list each round from the CORRECTNESS_r* latest-row map.
_DRIVER_PRIORITY = [
    # --- never driver-checked: the entire r8 addition batch -------------
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
    # --- code changed this round (re-earn the hash) ---------------------
    "ml_ridge_normal_eq",
    "stream_exactly_once_merge_restart",
    "embedding_drift_by_label",  # zero-centroid nullif (3x-fuzz find)
    # --- r2-stale cohort: the 12 names r8's 50 slots couldn't reach -----
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
    # --- r3-stale cohort, alphabetical: first 16 fill the 50 ------------
    "bigram_lm_quality",
    "cheapest_part_per_brand",
    "chunk_overlapping",
    "cube_revenue",
    "customer_order_counts_outer",
    "customers_with_open_orders",
    "customers_without_orders",
    "dedup_cluster_survivors",
    "distinct_order_priorities",
    "events_enriched_by_segment",
    "events_funnel",
    "events_hourly_gapfill",
    "events_props_json",
    "events_props_variant",
    "events_rate_anomaly_zscore",
    # ==== slot 51+ from here: fronts the r10 rotation ====================
    # (events_value_interpolate displaced to slot 51 by the drift op's
    # changed-code re-earn — changed code outranks stale evidence; the
    # r10 window is therefore 51 names for 50 slots, one spills to r11)
    "events_value_interpolate",
    # --- r3-stale remainder (31) ----------------------------------------
    "grouping_sets_revenue",
    "hybrid_retrieval_rrf",
    "image_decode_png",
    "join_key_skew_profile",
    "lake_snapshot_time_travel",
    "length_bucket_packing",
    "local_supplier_volume",
    "ml_cnn_trained_conv",
    "monthly_revenue",
    "near_dup_containment",
    "orders_above_customer_avg",
    "orders_by_status_pivot",
    "pricing_summary",
    "promo_revenue_share",
    "psi_drift_events",
    "reservoir_sample_per_group",
    "revenue_per_customer",
    "revenue_per_region",
    "rolling_7d_customer_revenue",
    "rollup_revenue",
    "sample_weighted_quality",
    "scd2_as_of_lookup",
    "semantic_dedup",
    "shipping_priority",
    "stat_lineitem_correlations",
    "stream_foreachbatch_merge",
    "substring_span_dedup",
    "text_normalize_nfc",
    "top10_orders",
    "top_ngrams_boilerplate",
    "union_account_balances",
    # --- r9 additions: below the backlog, first driver row in r10 --------
    # (19 names; with the 31 r3-stale above they fill r10's 50 slots
    # EXACTLY — the addition budget was capped to keep every new op
    # inside the next rotation, per the r8 verdict's freshness rule)
    "nation_revenue_trend",
    "share_of_parent_revenue",
    "pmi_priority_status",
    "floored_running_balance",
    "hot_streak_islands",
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
