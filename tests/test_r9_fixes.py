"""Round-9 verdict/advice deliverables, pinned.

1. gini_revenue_concentration / decile_lift_table rewritten on the
   distributed prefix-sum (r8 verdict "What's wrong" #1): a plan gate
   asserts no Window node executes over an Exchange SinglePartition in
   either op — the single-partition global-rank pass is structurally
   gone, not just faster on the fixture.
2. Hostile-corpus differential fuzz for the r8 statistical family
   (verdict #4): sub-decile populations, a single customer, all-tied
   values straddling decile boundaries, a one-observation month, a
   cohort gap month, and an empty orders table — every case compared
   against the DuckDB oracle, same comparator the driver uses.
3. The gini overflow guard raises LOUDLY (ADVICE r9) instead of letting
   Spark's non-ANSI BIGINT wrap produce a mysterious hash mismatch.
4. ml_ridge_normal_eq averages by RIDGE_FOLDS (no hardcoded 3.0) and
   stream_exactly_once_merge_restart reuses one per-process publish dir
   instead of leaking a parquet dir per invocation (ADVICE r9).
"""

import datetime as dt
import glob
import os
import re
import tempfile

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from distributed_deep_learning_with_apache_spark_spark.registry import load_all
from tests.oracle import compare

STAT_QUERIES = [
    "gini_revenue_concentration",
    "decile_lift_table",
    "twap_monthly_revenue",
    "cohort_ltv_curve",
    "bootstrap_ci_revenue",
    "ks_two_sample_drift",
    "log2_value_histogram",
    # r10: the frontier-ntile rewrite rides the same hostile shapes —
    # n < k tiles (single_customer, seven_customers), one value block
    # straddling EVERY tile edge (all_tied: the tie-probe hard case)
    "customer_rfm_segments",
]

PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _write_orders(td, rows):
    """rows: list of (orderkey, custkey, totalprice, orderdate, priority)."""
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
                "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
                "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
                "o_orderdate": pa.array([r[3] for r in rows], pa.timestamp("us")),
                "o_orderpriority": pa.array([r[4] for r in rows], pa.string()),
            }
        ),
        os.path.join(td, "orders.parquet"),
    )


def _hostile_corpora():
    d = dt.datetime
    return {
        # decile edge: floor(n/10) = 0 — every decile is one customer,
        # deciles beyond n must be ABSENT (ntile semantics), gini tiny-n.
        "seven_customers": [
            (i, i, 100.0 + i, d(1995, 1, 1 + i), PRIO[i % 5]) for i in range(7)
        ],
        # gini degenerate: one customer, G must be exactly 0.
        "single_customer": [(0, 0, 5000.0, d(1995, 3, 1), "1-URGENT")],
        # all customers tied on cents: one per-value rank block straddles
        # every decile boundary — the overlap arithmetic's hard case; G=0.
        "all_tied": [
            (i, i, 777.77, d(1995, 1 + i % 3, 1 + i), PRIO[i % 5])
            for i in range(25)
        ],
        # TWAP: months with exactly one observed day (weight carries to
        # month end) next to a dense month.
        "sparse_months": [
            (0, 0, 100.0, d(1995, 1, 15), "5-LOW"),
            (1, 1, 200.0, d(1995, 2, 1), "1-URGENT"),
            (2, 2, 300.0, d(1995, 2, 2), "5-LOW"),
            (3, 0, 400.0, d(1995, 2, 27), "1-URGENT"),
            (4, 1, 500.0, d(1995, 4, 30), "3-MEDIUM"),
        ],
        # cohort LTV: a customer active in age-month 0 and 2 but not 1 —
        # the triangle has a hole; the running sum must bridge it.
        "cohort_gap": [
            (0, 0, 100.0, d(1995, 1, 10), "2-HIGH"),
            (1, 0, 150.0, d(1995, 3, 20), "2-HIGH"),
            (2, 1, 900.0, d(1995, 2, 5), "5-LOW"),
        ],
        # KS: only one of the two compared priority groups present
        # (n1*n2 = 0 -> NULL D, not a divide-by-zero).
        "ks_one_group": [
            (i, i, 50.0 * (i + 1), d(1995, 1, 1 + i), "1-URGENT")
            for i in range(4)
        ],
        "empty": [],
    }


@pytest.mark.parametrize("corpus", sorted(_hostile_corpora()))
def test_stat_family_on_hostile_corpora(spark, corpus):
    reg = load_all()
    td = tempfile.mkdtemp(prefix=f"r9hostile_{corpus}_")
    _write_orders(td, _hostile_corpora()[corpus])
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{td}/orders.parquet')"
    )
    fails = []
    try:
        for name in STAT_QUERIES:
            ok, msg = compare(reg[name].fn(spark, td), con, reg[name].oracle)
            if not ok:
                fails.append((name, msg[:200]))
    finally:
        con.close()
    assert not fails, fails


def _window_over_single_partition(df) -> list[str]:
    """Window nodes whose input subtree begins with a SinglePartition
    exchange — the global-order serialization the r9 rewrite removed."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    bad = []
    for i, ln in enumerate(lines):
        if re.search(r"\bWindow\b", ln):
            block = "\n".join(lines[i : i + 6])
            if "SinglePartition" in block:
                bad.append(block)
    return bad


@pytest.mark.parametrize(
    "name", ["gini_revenue_concentration", "decile_lift_table"]
)
def test_no_global_order_window_in_rank_stats(spark, sf_dir, name):
    reg = load_all()
    df = reg[name].fn(spark, sf_dir)
    bad = _window_over_single_partition(df)
    assert not bad, f"{name} still serializes a Window through one partition:\n" + "\n".join(bad)


def test_gini_overflow_guard_raises_loudly(spark):
    """n * total_cents past 2^62 must raise, not wrap (ADVICE r9): Spark
    non-ANSI would wrap the BIGINT numerator silently while DuckDB
    errors, surfacing as an unexplainable hash mismatch."""
    reg = load_all()
    td = tempfile.mkdtemp(prefix="r9overflow_")
    _write_orders(
        td,
        [
            (i, i, 1.0e16, dt.datetime(1995, 1, 1 + i), "1-URGENT")
            for i in range(10)
        ],
    )
    with pytest.raises(OverflowError, match="2\\^62"):
        reg["gini_revenue_concentration"].fn(spark, td)


def test_ridge_average_uses_fold_constant():
    """The fold average must track RIDGE_FOLDS, not a hardcoded 3.0 —
    in the Spark aggregate and in the oracle TEMPLATE (the rendered SQL
    legitimately reads "/ 3.0" while RIDGE_FOLDS == 3; the template must
    interpolate the constant so a fold-count change stays consistent)."""
    import inspect

    from distributed_deep_learning_with_apache_spark_spark.ml import queries as mq

    fn_src = inspect.getsource(mq.ml_ridge_normal_eq)
    assert "float(RIDGE_FOLDS)" in fn_src and "/ 3.0" not in fn_src
    mod_src = inspect.getsource(mq)
    assert "{RIDGE_FOLDS}.0" in mod_src
    assert f"/ {mq.RIDGE_FOLDS}.0" in load_all()["ml_ridge_normal_eq"].oracle


def test_lateness_histogram_buckets_are_integer_arithmetic(spark, sf_dir):
    """Bucketing must be remainder subtraction, not double division —
    and every emitted bucket floor must be an exact multiple of the
    bucket width."""
    import inspect

    from distributed_deep_learning_with_apache_spark_spark.streaming import events as ev

    src = inspect.getsource(ev.out_of_order_lateness_histogram)
    assert "pmod" in src and "/ OOO_BUCKET_S" not in src
    rows = (
        load_all()["out_of_order_lateness_histogram"]
        .fn(spark, sf_dir)
        .collect()
    )
    assert rows and all(r["bucket_floor_s"] % ev.OOO_BUCKET_S == 0 for r in rows)


def test_merge_restart_publish_dirs_are_versioned_and_owned(spark, sf_dir):
    """r10 contract (supersedes the r9 fixed-per-pid path, whose rmtree
    invalidated the PREVIOUS invocation's lazy result): each invocation
    publishes to its OWN pid-prefixed dir (atexit-reclaimed, so nothing
    outlives the process), the lifecycle scratch is still removed, and a
    held DataFrame stays collectable across a re-invocation."""
    reg = load_all()
    fn = reg["stream_exactly_once_merge_restart"].fn
    pattern = os.path.join(
        tempfile.gettempdir(), f"sg_eo_merge_pub_{os.getpid()}_*"
    )
    dirs_before = set(glob.glob(pattern))
    df1 = fn(spark, sf_dir)
    n1 = df1.count()
    n2 = fn(spark, sf_dir).count()
    dirs_after = set(glob.glob(pattern))
    assert n1 == n2 > 0
    new_dirs = dirs_after - dirs_before
    assert len(new_dirs) == 2, new_dirs  # one versioned dir per invocation
    assert df1.count() == n1  # invocation 1's result survives invocation 2
