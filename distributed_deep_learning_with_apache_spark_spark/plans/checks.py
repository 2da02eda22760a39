"""Plan-inspection helpers: make the physical plan a first-class, assertable
artifact (the reference has no optimizer to inspect — SURVEY §4; here the
plan IS the performance contract, so CI gates on it).

Used by tests/test_plans.py and available to callers who want to guard
their own queries ("did my filter push down?", "did my dim join broadcast?").
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The executed (post-AQE-planning) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def explain_summary(df: DataFrame) -> dict[str, object]:
    """Compact plan facts: join strategies, exchanges, scans, pushdown."""
    plan = physical_plan(df)
    return {
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "shuffled_hash_joins": plan.count("ShuffledHashJoin"),
        "cartesian_products": plan.count("CartesianProduct")
        + plan.count("BroadcastNestedLoopJoin"),
        "exchanges": plan.count("Exchange "),
        "parquet_scans": plan.count("FileScan parquet"),
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", plan),
        "read_schemas": re.findall(r"ReadSchema: (struct<[^>]*>)", plan),
    }


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert each fragment appears in some scan's PushedFilters."""
    pushed = "; ".join(explain_summary(df)["pushed_filters"])
    for frag in fragments:
        assert frag in pushed, f"filter not pushed down: {frag!r} not in [{pushed}]"


def assert_broadcast_join(df: DataFrame, n: int = 1) -> None:
    s = explain_summary(df)
    assert s["broadcast_hash_joins"] >= n, f"expected ≥{n} broadcast joins: {s}"


def assert_no_cartesian(df: DataFrame) -> None:
    s = explain_summary(df)
    assert s["cartesian_products"] == 0, f"cartesian/nested-loop join in plan: {s}"
