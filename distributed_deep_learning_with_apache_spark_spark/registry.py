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
# checks exactly 50 queries per round (CORRECTNESS_r01-r09: 50 rows each).
# Round-10 rotation (r9 verdict #1, the round's top item): the 19
# round-9b operators with NO driver row yet come first, then the 4
# queries whose code changed THIS round and must re-earn their hash
# (the customer_rfm_segments / quality_tiers prefix-sum rewrites, the
# vocab_oov_rate TakeOrderedAndProject fix, and the exactly-once merge's
# versioned publish dir — changed code outranks stale evidence, the r9
# rule), then the alphabetically-first 27 of the 32 r3-stale names.
# That fills exactly 50 slots; the remaining 5 r3-stale names spill to
# r11 and front its rotation. NO new operators were added this round —
# the r9 verdict capped additions so the rotation budget clears the
# backlog (19 never + 32 stale ~ one full round of slots).
# Regenerate this list each round from the CORRECTNESS_r* latest-row map.
_DRIVER_PRIORITY = [
    # --- never driver-checked: the entire r9b addition batch ------------
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
    # --- code changed this round (re-earn the hash) ---------------------
    "customer_rfm_segments",
    "quality_tiers",
    "vocab_oov_rate",
    "stream_exactly_once_merge_restart",
    # --- r3-stale cohort, alphabetical: first 27 fill the 50 ------------
    "events_value_interpolate",
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
    # ==== slot 51+ from here: fronts the r11 rotation ====================
    # --- r3-stale remainder (5) ------------------------------------------
    "substring_span_dedup",
    "text_normalize_nfc",
    "top10_orders",
    "top_ngrams_boilerplate",
    "union_account_balances",
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
