"""Round-8 fix gates: each test pins one r7 verdict/advisor finding shut.

- kcore peel must carry NO forced broadcast hint (verdict #1: the survivor
  set is O(|V|) early on — a forced broadcast OOMs at 100 TB).
- seasonal dow_idx must agree cross-engine for dates BEFORE the epoch
  (advisor: SQL `%` is sign-of-dividend, F.pmod is non-negative).
- sessionize_with_terminators must agree when two same-second events'
  event_id order disagrees with their microsecond ts order (advisor: the
  oracle ordered one window by raw ts, Spark by whole-second t).
- bigram log quantization must sit far from every floor boundary on the
  shipped fixtures (advisor: ln is not correctly-rounded cross-engine).
- stream_exactly_once_merge_restart must return a LAZY parquet read, not a
  driver-collected LocalRelation (verdict #4).
"""

import datetime
import math
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from distributed_deep_learning_with_apache_spark_spark.operators.curation import (
    PPL_SCALE,
)
from distributed_deep_learning_with_apache_spark_spark.operators.graph import (
    _kcore_peel_round,
)
from distributed_deep_learning_with_apache_spark_spark.registry import load_all
from tests.oracle import compare, driver_canon_rows

REG = load_all()


# ---------------------------------------------------------------------------
# kcore: unhinted peel (r7 verdict #1)
# ---------------------------------------------------------------------------
def test_kcore_peel_has_no_forced_broadcast(spark):
    """The peel's survivor semi-joins must carry no user broadcast hint:
    the logical plan decides nothing — AQE picks broadcast vs shuffle from
    the RUNTIME survivor size. A forced hint on an O(|V|) set is the
    100 TB OOM the r7 verdict flagged."""
    edges = [(1, 2), (2, 3), (3, 1), (3, 4)]  # triangle + pendant
    sym = spark.createDataFrame(
        edges + [(v, u) for u, v in edges], "u long, v long"
    )
    peeled = _kcore_peel_round(sym)
    logical = peeled._jdf.queryExecution().logical().toString()
    analyzed = peeled._jdf.queryExecution().analyzed().toString()
    assert "UnresolvedHint" not in logical and "hint" not in logical.lower()
    assert "ResolvedHint" not in analyzed
    # and it still peels correctly: the pendant node 4 (degree 1) drops,
    # the triangle survives with both directions intact.
    rows = {(r["u"], r["v"]) for r in peeled.collect()}
    assert rows == {(1, 2), (2, 3), (3, 1), (2, 1), (3, 2), (1, 3)}


def test_kcore_full_query_source_has_no_broadcast_hint():
    """Belt-and-braces: the registered query's own source must not
    reintroduce F.broadcast around the peel (the helper is shared)."""
    import inspect

    from distributed_deep_learning_with_apache_spark_spark.operators import graph

    src = inspect.getsource(graph.kcore_copurchase) + inspect.getsource(
        _kcore_peel_round
    )
    assert "F.broadcast(" not in src  # ( — prose mentions in docstrings are fine


# ---------------------------------------------------------------------------
# dow_idx: pre-epoch dates (r7 advisor, medium)
# ---------------------------------------------------------------------------
def _write_orders(td: str, days: list[datetime.datetime]) -> None:
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(len(days)), pa.int64()),
                "o_custkey": pa.array([i % 3 for i in range(len(days))], pa.int64()),
                "o_orderstatus": pa.array(["F"] * len(days)),
                "o_totalprice": pa.array(
                    [100.0 + 7 * i for i in range(len(days))], pa.float64()
                ),
                "o_orderdate": pa.array(days, pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * len(days)),
            }
        ),
        os.path.join(td, "orders.parquet"),
    )


def test_seasonal_dow_idx_agrees_on_pre_epoch_dates(spark, tmp_path):
    """Dates BEFORE the epoch Monday make SQL `%` go negative while
    F.pmod stays non-negative; the oracle's ((x%7)+7)%7 wrap plus the
    1900 epoch must keep both queries hash-equal on an 1899 corpus."""
    days = [
        datetime.datetime(1899, 12, 1) + datetime.timedelta(days=i)
        for i in range(40)  # entirely pre-epoch
    ]
    _write_orders(str(tmp_path), days)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{tmp_path}/orders.parquet')"
    )
    try:
        for name in ("seasonal_decompose_daily_revenue", "seasonal_residual_alerts"):
            q = REG[name]
            ok, msg = compare(q.fn(spark, str(tmp_path)), con, q.oracle)
            assert ok, f"{name} diverged on pre-epoch dates: {msg}"
    finally:
        con.close()


# ---------------------------------------------------------------------------
# sessionize: same-second ts/event_id order disagreement (r7 advisor, low)
# ---------------------------------------------------------------------------
def test_sessionize_same_second_collision_agrees(spark, tmp_path):
    """Two events in the SAME whole second whose event_id order disagrees
    with their microsecond ts order: every window in both engines must
    order by (whole-second t, event_id), so prev_type — and therefore the
    purchase-terminator boundary — lands identically."""
    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        # event_id 10 happens LATER within the second than event_id 11:
        # raw-ts order is (11, 10); (t, event_id) order is (10, 11).
        (10, base + datetime.timedelta(microseconds=900_000), 1, "purchase", 1.0, "{}"),
        (11, base + datetime.timedelta(microseconds=100_000), 1, "view", 1.0, "{}"),
        (12, base + datetime.timedelta(seconds=5), 1, "click", 1.0, "{}"),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows]),
            }
        ),
        os.path.join(str(tmp_path), "events.parquet"),
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    try:
        q = REG["sessionize_with_terminators"]
        df = q.fn(spark, str(tmp_path))
        ok, msg = compare(df, con, q.oracle)
        assert ok, f"same-second collision diverged: {msg}"
        # With (t, event_id) ordering, event 11's predecessor is the
        # purchase (event 10) → 11 starts session 2, and the click joins
        # it within the gap: sessions of sizes 1 and 2.
        sizes = sorted(r["n_events"] for r in df.collect())
        assert sizes == [1, 2]
    finally:
        con.close()


# ---------------------------------------------------------------------------
# bigram quantization guard band (r7 advisor, low)
# ---------------------------------------------------------------------------
def test_bigram_log_quantization_guard_band(spark, sf_dir):
    """For every distinct (c12+1, c1+V) the fixture corpus produces, the
    scaled log ln(num/den)*PPL_SCALE must sit >= 1e-6 from the nearest
    integer. Worst-case cross-engine disagreement (1-ulp relative error
    in a non-correctly-rounded ln) moves the scaled value by
    |ln p| * 1.1e-16 * PPL_SCALE ~ 2.2e-12, so the band is a >10^5x
    margin: the floor CANNOT flip on this corpus, and a future unlucky
    corpus fails THIS test loudly instead of the hash mysteriously."""
    from pyspark.sql import functions as F

    from distributed_deep_learning_with_apache_spark_spark.functions.text import (
        tokens,
    )
    from distributed_deep_learning_with_apache_spark_spark.sources.catalog import (
        load_table,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("t")
    )
    n = F.size("t")
    pairs = (
        d.filter(n >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice("t", F.lit(1), n - 1).alias("w1"),
                    F.slice("t", F.lit(2), n - 1).alias("w2"),
                )
            ).alias("z")
        )
        .select(F.col("z.w1").alias("w1"), F.col("z.w2").alias("w2"))
    )
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ctx = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    v = (
        d.select(F.explode("t").alias("tok"))
        .agg(F.countDistinct("tok"))
        .collect()[0][0]
    )
    # distinct (num, den) pairs are vocab^2-bounded; at test SF this is
    # a few thousand rows — a bounded collect.
    nd = (
        pairs.join(big, ["w1", "w2"])
        .join(ctx, "w1")
        .select((F.col("c12") + 1).alias("num"), (F.col("c1") + v).alias("den"))
        .distinct()
        .collect()
    )
    assert nd, "fixture produced no bigrams"
    worst = min(
        abs(math.log(r["num"] / r["den"]) * PPL_SCALE % 1.0 - 0.5)
        for r in nd
    )
    # distance to nearest integer = 0.5 - |frac - 0.5|
    min_dist = 0.5 - max(
        abs(math.log(r["num"] / r["den"]) * PPL_SCALE % 1.0 - 0.5) for r in nd
    )
    assert worst >= 0  # sanity
    assert min_dist >= 1e-6, f"quantization boundary too close: {min_dist}"


# ---------------------------------------------------------------------------
# merge-restart returns a lazy scan (r7 verdict #4)
# ---------------------------------------------------------------------------
def test_merge_restart_returns_lazy_parquet_read(spark, sf_dir):
    """The registered query's return path must be a parquet scan of the
    published snapshot — NOT a driver-collected LocalRelation (O(distinct
    users) on the driver does not survive 100x)."""
    df = REG["stream_exactly_once_merge_restart"].fn(spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "LocalRelation" not in analyzed
    assert "Relation" in analyzed  # the parquet read
    assert driver_canon_rows(df) > 0


# ---------------------------------------------------------------------------
# ridge twin: fold-averaged RMSE ordering (r7 verdict #5)
# ---------------------------------------------------------------------------
def test_ridge_normal_eq_pins_crossval_ordering(spark, sf_dir):
    """The closed-form twin must reproduce ml_crossval_ridge's model
    selection: RMSE strictly monotone in the penalty, smallest lambda
    wins, and the unregularized fit recovers the noise floor (uniform
    [-0.5, 0.5] mnat noise -> sigma = 1/sqrt(12) ~ 0.000289 in y units =
    ~289 micro-RMSE)."""
    rows = {
        r["reg_param"]: r
        for r in REG["ml_ridge_normal_eq"].fn(spark, sf_dir).collect()
    }
    assert set(rows) == {1.0, 1e5, 1e9}
    assert rows[1.0]["is_best"] and not rows[1e5]["is_best"] and not rows[1e9]["is_best"]
    assert (
        rows[1.0]["avg_rmse_micro"]
        < rows[1e5]["avg_rmse_micro"]
        < rows[1e9]["avg_rmse_micro"]
    )
    assert 280_000 < rows[1.0]["avg_rmse_micro"] < 300_000  # noise floor
