"""Round-4 driver-sweep rehearsal at the driver's own scale factor
(sf0.01) with the driver-identical comparator.

The r4 front-loaded set (registry._DRIVER_PRIORITY):
- ``events_retention_cohorts`` — the single r3 driver hash-fail; its oracle
  now uses DuckDB floor division (``// 86400`` → BIGINT day_offset), and
  tests/oracle.py gained the int-vs-float hostile-type gate so the class
  is unrepresentable.
- the three r4 oracle-bearing additions (stop-filtered containment,
  matryoshka two-stage ANN, edit-distance near-dup).
- the 35 never-driver-checked rows-only names, each pinned rows>0 here so
  the driver's weaker rows-only record can't surprise.
"""

import pytest

from distributed_deep_learning_with_apache_spark_spark.registry import (
    _DRIVER_PRIORITY,
    load_all,
)
from tests.oracle import compare, duck_connect

DRIVER_SF_DIR = "/root/testdata/sf0.01"

REG = load_all()

R4_ORACLE = [
    "events_retention_cohorts",
    "near_dup_containment_stopfiltered",
    "ann_matryoshka_refine",
    "near_dup_edit_distance",
    "simhash64_near_dup_pairs",
    "bucketed_join_revenue",
    "lake_schema_evolution",
    "salted_join_quantity_tier",
    "k_anonymity_violations",
    "recursive_calendar_daily",
    "udtf_chunk_spans",
]

# The rows-only tail: every priority entry before the first rotated-back
# r3-green name that is not itself in R4_ORACLE.
R4_ROWS_ONLY = [
    n
    for n in _DRIVER_PRIORITY[: _DRIVER_PRIORITY.index("global_agg_stats")]
    if n not in R4_ORACLE
]


def test_r4_frontload_shape():
    """The driver checks ~50 names per round from the top of queries();
    the whole r4 target set must fit."""
    assert len(R4_ORACLE) + len(R4_ROWS_ONLY) == 49
    head = _DRIVER_PRIORITY[:49]
    assert set(head) == set(R4_ORACLE) | set(R4_ROWS_ONLY)
    assert all(REG[n].oracle is None for n in R4_ROWS_ONLY)


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(DRIVER_SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", R4_ORACLE)
def test_r4_oracle_at_driver_sf(spark, duck, name):
    q = REG[name]
    ok, msg = compare(q.fn(spark, DRIVER_SF_DIR), duck, q.oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", R4_ROWS_ONLY)
def test_r4_rows_only_at_driver_sf(spark, name):
    df = REG[name].fn(spark, DRIVER_SF_DIR)
    assert df.columns
    assert df.count() > 0, f"{name} returned 0 rows at driver SF"
