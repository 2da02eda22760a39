"""Round-3 driver-sweep rehearsal: the 28 oracle-bearing queries the driver
never reached in rounds 1-2, run at the driver's own scale factor (sf0.01)
with the driver-identical comparator (row count + schema + value hash).

VERDICT r2 flagged these as the top gap: all pass locally at sf0.001, but
portability risks (timestamp folds, NULL ordering, month-bucket edges) only
show at the driver's SF.  This module pins them green at sf0.01 so a
regression is caught before the driver sees it.
"""

import os

import pytest

from distributed_deep_learning_with_apache_spark_spark.registry import load_all
from tests.oracle import compare, duck_connect, hostile_oracle_columns

DRIVER_SF_DIR = "/root/testdata/sf0.01"

# Exactly the 28 oracle-bearing names absent from CORRECTNESS_r01+r02.
NEVER_CHECKED_ORACLE = [
    "global_agg_stats",
    "pricing_summary",
    "top10_orders",
    "revenue_per_customer",
    "revenue_per_region",
    "customers_with_open_orders",
    "customers_without_orders",
    "customer_order_counts_outer",
    "union_account_balances",
    "distinct_order_priorities",
    "orders_by_status_pivot",
    "rollup_revenue",
    "cube_revenue",
    "monthly_revenue",
    "orders_above_customer_avg",
    "shipping_priority",
    "local_supplier_volume",
    "cheapest_part_per_brand",
    "promo_revenue_share",
    "stat_lineitem_correlations",
    "rolling_7d_customer_revenue",
    "chunk_overlapping",
    "scd2_as_of_lookup",
    "events_props_json",
    "events_funnel",
    "events_retention_cohorts",
    "events_enriched_by_segment",
    "stream_foreachbatch_merge",
    # round-3 additions (oracle-bearing, never driver-checked by definition)
    "bigram_lm_quality",
    "grouping_sets_revenue",
    "join_key_skew_profile",
    "dedup_cluster_survivors",
    "semantic_dedup",
    "substring_span_dedup",
    "length_bucket_packing",
    "hybrid_retrieval_rrf",
    "psi_drift_events",
    "events_rate_anomaly_zscore",
    "top_ngrams_boilerplate",
    "reservoir_sample_per_group",
    "text_normalize_nfc",
    "events_props_variant",
    "ml_fpgrowth_item_pairs",
    "events_hourly_gapfill",
    "lake_snapshot_time_travel",
    "events_value_interpolate",
    "sample_weighted_quality",
    "near_dup_containment",
]

REG = load_all()

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DRIVER_SF_DIR), reason="driver sf0.01 fixture absent"
)


@pytest.fixture(scope="module")
def duck_driver_sf():
    con = duck_connect(DRIVER_SF_DIR)
    yield con
    con.close()


def test_all_28_are_registered_with_oracles():
    for name in NEVER_CHECKED_ORACLE:
        assert name in REG, name
        assert REG[name].oracle is not None, name


@pytest.mark.parametrize("name", NEVER_CHECKED_ORACLE)
def test_driver_sf_oracle_match(spark, duck_driver_sf, name):
    q = REG[name]
    bad = hostile_oracle_columns(duck_driver_sf, q.oracle)
    assert not bad, f"{name} oracle emits driver-hostile columns: {bad}"
    df = q.fn(spark, DRIVER_SF_DIR)
    ok, msg = compare(df, duck_driver_sf, q.oracle)
    assert ok, f"{name}: {msg}"
