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
# checks exactly 50 queries per round (CORRECTNESS_r01-r11: 50 rows each).
# Round-12 rotation (r11 verdict #3): (a) the two r11 lifecycle ops that
# have never held a driver row lead — with them executed, every one of
# the 331 registered queries has a driver row (329 were green through
# r11); (b) this round's new ops (the PQ-append lifecycle closure, the
# wholetext text-source twin of S2/S3, the from-scratch Avro round-trip,
# and the retraction/compaction lifecycle — near_dup_retract_reprobe is
# oracle-bearing, ann_ivf_delete_serve + ann_ivf_compact_tombstones
# rows-only); (c) every query whose
# EXECUTED CODE changed this round re-earns its execution row (the
# pq_encode_df encoder refactor flows into the three PQ serving ops; the
# idempotency/NULL-guard fixes are already covered by (a)); (d) the
# remaining slots hold the OLDEST-checked oracle-bearing names: the full
# r5 remainder (9), then r6 alphabetical — the first 15 fill the 50
# (the r12 OPTIMIZATION pass prepends its 14 changed-code names, with
# the 5 of them that previously sat in this r6 section moved up rather
# than duplicated; the displaced r6 re-confirmations front the r13
# rotation).
# Rows-only names appear only under (a)-(c), where a fresh execution row
# is the point; every (d) slot produces a hash verdict.
# Regenerate this list each round from the CORRECTNESS_r* latest-row map.
_DRIVER_PRIORITY = [
    # --- (a0) r12 OPTIMIZATION round: every oracle-bearing query whose
    # EXECUTED code changed in the optimization pass (the standing
    # changed-code re-earn rule). Names also present in the (c)/(d)
    # (c)/(d) sections were MOVED here (the contract forbids duplicate
    # priority entries); the displaced tail of the r6 re-confirmations
    # fronts the r13 rotation instead. (14) ----------------------------
    "near_dup_edit_distance",
    "near_dup_minhash_verified",
    "near_dup_jaccard",
    "near_dup_jaccard_stopfiltered",
    "minhash_lsh_candidates",
    "dedup_clusters",
    "dedup_clusters_logstar",
    "dedup_cluster_survivors",
    "doc_embedding_avg",
    "substring_span_dedup",
    "near_dup_containment",
    "near_dup_containment_stopfiltered",
    "simhash_near_dup_pairs",
    "simhash64_near_dup_pairs",
    # --- (a0b) r12 optimization SESSION 2: rows-only queries whose
    # executed code changed (pyarrow sentinel staging; the pq-append
    # thread overlap's name already sits in (b)) (2) ---------------------
    "stream_stream_left_outer_join",
    "stream_stream_full_outer_join",
    # --- (a) never-driver-checked r11 lifecycle ops (rows-only) (2) ------
    "stream_near_dup_incremental",
    "ann_ivf_append_batch",
    # --- (b) new ops this round (7) --------------------------------------
    "ann_ivf_pq_append_batch",
    "source_text_wholetext_labels",
    "source_avro_events_agg",
    "near_dup_retract_reprobe",
    "ann_ivf_delete_serve",
    "ann_ivf_compact_tombstones",
    "near_dup_compact_tombstones",
    # --- (c) executed code changed this round (pq encoder refactor) (3) --
    "ann_pq_adc",
    "ann_ivf_pq_adc",
    "ann_ivf_pq_refined",
    # --- (d) oldest oracle-bearing: r5 remainder (9) ----------------------
    "skew_agg_two_phase",
    "source_orc_lineitem_agg",
    "source_xml_events_agg",
    "sql_registered_udf",
    "temperature_mixture_weights",
    "triangle_count_copurchase",
    "udaf_weighted_median",
    "udf_iterator_scoring",
    "union_by_name_schema_drift",
    # --- (d) oldest oracle-bearing: r6 alphabetical, first 29 fill the 50 -
    "asof_join_latest_order",
    "attribution_last_touch",
    "benford_first_digit",
    "bm25_topk",
    "corpus_token_stats",
    "cosine_topk_filtered",
    "dedup_exact_groups",
    "dedup_exact_survivors",
    "doc_fingerprints",
    "dq_quarantine_split",
    "events_local_hour_histogram",
    "events_session_window_builtin",
    "group_by_all_revenue",
    "hinted_shuffle_hash_join",
    "inverted_index_postings",
    "lake_dpp_star_join",
    "lake_restore_version",
    "lake_shallow_clone_divergence",
    "lang_id",
    "mad_price_outliers",
    "ml_fpgrowth_item_pairs",
    "near_dup_incremental",
    "near_dup_index_append_cycle",
    "pagerank_purchase_graph",
    # ==== slot 51+ from here: fronts the r13 rotation ====================
    # --- r6 oracle-bearing remainder (11) ---------------------------------
    "range_join_events_after_order",
    "row_ids_distributed",
    "shortest_paths_bfs",
    "sink_custom_writer_roundtrip",
    "sql_pipe_syntax",
    "text_quality",
    "tfidf_top_terms",
    "token_counts",
    "tokenize_truncate",
    "zipf_fit",
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
