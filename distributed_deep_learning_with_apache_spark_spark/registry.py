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
# checks exactly 50 queries per round (CORRECTNESS_r01-r07: 50 rows each).
# Round-8 rotation (r7 verdict #1, the round's top item): first the 7
# names whose code changed or landed this round (changed queries must
# re-earn their hash; ml_ridge_normal_eq is the verdict-#5 deliverable),
# then the ENTIRE stale-evidence backlog — the 6 queries whose newest
# driver row is round 1 and the 49 whose newest row is round 2. That is
# 62 names for 50 slots: the driver covers the front 50 (all changed +
# all r1 + 37 of r2); the ~12 r2-tail names carry to r9's rotation,
# which the verdict explicitly allowed ("rotate over two rounds,
# r2-cohort-first"). Any OTHER new r8 queries intentionally sit BELOW
# the backlog and earn their first driver row in r9 — local oracle
# parity + the frozen R8_ORACLE sf0.01 pins cover them until then.
# Regenerate this list each round from the CORRECTNESS_r* latest-row map.
_DRIVER_PRIORITY = [
    # --- r8 front: new + code-changed this round (must re-earn hash) ----
    "ml_ridge_normal_eq",
    "seasonal_decompose_daily_revenue",
    "seasonal_residual_alerts",
    "sessionize_with_terminators",
    "bigram_perplexity_score",
    "kcore_copurchase",
    "stream_exactly_once_merge_restart",
    # --- r1-stale cohort: newest driver row is ROUND 1 (r7 verdict #1) ---
    "quality_tiers",
    "returned_item_losses",
    "sample_stratified_hash",
    "scd2_customer_history",
    "small_quantity_revenue",
    "top_supplier_revenue",
    # --- r2-stale cohort (r7 verdict #1; ~12 tail names overflow to r9) --
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
    # --- r8 additions beyond the verdict deliverable land BELOW the ------
    # --- backlog: they earn their first driver row in r9's rotation ------
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
