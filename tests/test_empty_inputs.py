"""Empty-input robustness: every relational query must degrade to zero
rows — not throw — when the tables are empty.

At 100 TB this is the partition-pruned-to-nothing case (a filter or
partition predicate that eliminates every file), which happens on real
clusters daily. Queries that fit models are excluded (an ML fit on an
empty train set is legitimately an error); global single-row aggregates
are excluded because one all-null row is their correct empty-input
answer.
"""

import pyarrow.parquet as pq
import pytest

from distributed_deep_learning_with_apache_spark_spark.registry import load_all
from distributed_deep_learning_with_apache_spark_spark.sources.catalog import TABLE_SCHEMAS

GROUPED_QUERIES = [
    "pricing_summary",
    "revenue_per_region",
    "grouped_best_worst_orders",
    "asof_join_latest_order",
    "cosine_topk_exact",
    "near_dup_minhash_verified",
    "doc_embedding_avg",
    "events_sessionized",
    "corpus_curation_pipeline",
    "dedup_exact_survivors",
    "tfidf_top_terms",
    "lang_id",
    # r3 additions
    "bigram_lm_quality",
    "grouping_sets_revenue",
    "dedup_cluster_survivors",
    "bpe_tokenize_stats",
    "semantic_dedup",
    "substring_span_dedup",
    "length_bucket_packing",
    # r3 second batch
    "hybrid_retrieval_rrf",
    "psi_drift_events",
    "top_ngrams_boilerplate",
    "reservoir_sample_per_group",
    "text_normalize_nfc",
    "events_rate_anomaly_zscore",
    "events_props_variant",
    "events_hourly_gapfill",
    "events_value_interpolate",
    "sample_weighted_quality",
    "ml_fpgrowth_item_pairs",
    # r4 additions (bucketed_join_revenue excluded: saveAsTable on an
    # empty-fixture slug would litter the shared /tmp cache for one test)
    "near_dup_containment_stopfiltered",
    "near_dup_edit_distance",
    "ann_matryoshka_refine",
    "lake_schema_evolution",
    "salted_join_quantity_tier",
    "recursive_calendar_daily",
    "udtf_chunk_spans",
    "k_anonymity_violations",
    "simhash64_near_dup_pairs",
    "except_all_order_priorities",
    "segment_nation_rollcall",
]


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("empty_sf")
    for t in TABLE_SCHEMAS:
        schema = pq.read_schema(f"/root/testdata/sf0.001/{t}.parquet")
        pq.write_table(schema.empty_table(), str(base / f"{t}.parquet"))
    return str(base)


@pytest.mark.parametrize("name", GROUPED_QUERIES)
def test_query_on_empty_tables_returns_zero_rows(spark, empty_sf_dir, name):
    q = load_all()[name]
    assert q.fn(spark, empty_sf_dir).count() == 0
