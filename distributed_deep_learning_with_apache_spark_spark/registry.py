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
# checks exactly 50 queries per round (CORRECTNESS_r01-r10: 50 rows each).
# Round-11 rotation (r10 verdict #1): (a) the last 5 r3-stale names lead
# — with them green, no query's latest driver row predates r4; (b) every
# query whose EXECUTED CODE changed this round re-earns its hash (the
# ranks.py hardening flows into customer_rfm_segments/quality_tiers; the
# NULL-pass-through guard rewrites touch interval_month_overlap_revenue
# and business_days_to_ship); (c) the round's one new ORACLE-BEARING op
# (lake_zorder_write); (d) the remaining slots hold the oldest
# oracle-bearing names (the full r4 cohort, then r5 alphabetical) — and,
# per r10 verdict finding #1, ONLY oracle-bearing names occupy the 50,
# so every driver slot produces a hash verdict (rows-only ops are
# exercised by test_rows_only_runs instead; the round's two new
# rows-only lifecycle ops front the r12 rotation below for their
# execution rows).
# Regenerate this list each round from the CORRECTNESS_r* latest-row map.
_DRIVER_PRIORITY = [
    # --- r3-stale remainder: retires staleness entirely (5) -------------
    "substring_span_dedup",
    "text_normalize_nfc",
    "top10_orders",
    "top_ngrams_boilerplate",
    "union_account_balances",
    # --- code changed this round (re-earn the hash) (4) ------------------
    "customer_rfm_segments",
    "quality_tiers",
    "interval_month_overlap_revenue",
    "business_days_to_ship",
    # --- new oracle-bearing ops this round (2) ----------------------------
    "lake_zorder_write",
    "lake_zorder_recluster",
    # --- oldest oracle-bearing cohort: all of r4 (12) ---------------------
    "ann_matryoshka_refine",
    "bucketed_join_revenue",
    "events_retention_cohorts",
    "global_agg_stats",
    "k_anonymity_violations",
    "lake_schema_evolution",
    "near_dup_containment_stopfiltered",
    "near_dup_edit_distance",
    "recursive_calendar_daily",
    "salted_join_quantity_tier",
    "simhash64_near_dup_pairs",
    "udtf_chunk_spans",
    # --- r5 oracle-bearing, alphabetical: first 28 fill the 50 ------------
    "ansi_safe_doc_ratios",
    "batch_observed_metrics",
    "bloom_semijoin_pruned",
    "cdc_snapshot_diff",
    "collated_token_counts",
    "distinct_multi_two_phase",
    "events_ohlc_hourly",
    "except_all_order_priorities",
    "grouped_apply_in_arrow",
    "grouped_quantile_exact",
    "heavy_hitters_sketch_verified",
    "incremental_agg_maintenance",
    "intersect_all_order_priorities",
    "lake_compact_small_files",
    "lake_deletion_vectors",
    "lake_dynamic_partition_overwrite",
    "lake_vacuum_expire",
    "lateral_top3_orders",
    "leakage_safe_splits",
    "locf_forward_fill",
    "map_in_arrow_bytes",
    "notin_nullaware_anti",
    "ntile_balance_quartiles",
    "nullsafe_bucket_join",
    "percentile_band_segments",
    "quantile_two_pass_exact",
    "segment_nation_rollcall",
    # ==== slot 51+ from here: fronts the r12 rotation ====================
    # --- new rows-only lifecycle ops (execution rows when slots allow) ---
    "stream_near_dup_incremental",
    "ann_ivf_append_batch",
    # --- r5 oracle-bearing remainder (9) ----------------------------------
    "skew_agg_two_phase",
    "source_orc_lineitem_agg",
    "source_xml_events_agg",
    "sql_registered_udf",
    "temperature_mixture_weights",
    "triangle_count_copurchase",
    "udaf_weighted_median",
    "udf_iterator_scoring",
    "union_by_name_schema_drift",
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
