"""Structural contracts for round-7 operators (oracle parity lives in
test_oracle_parity.py + the frozen R7_ORACLE driver-sf list):

- portable sampling: determinism under repartitioning (the property that
  made the upgrade from rand(seed) worthwhile), selectivity, fixed size;
- quantile sketch rollup: MERGEABILITY (merge of month sketches == sketch
  of the union) and rank-error of the estimates vs exact quantiles;
- KMV: sub-sketch exactness when unfilled, estimate accuracy when filled;
- exactly-once merge: the injected crash/replay path really runs.
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from distributed_deep_learning_with_apache_spark_spark.operators import incremental, setops
from distributed_deep_learning_with_apache_spark_spark.registry import load_all
from distributed_deep_learning_with_apache_spark_spark.sources.catalog import load_table

REG = load_all()


# ---------------------------------------------------------------------------
# Portable sampling
# ---------------------------------------------------------------------------
def test_sample_seeded_stable_under_repartition(spark, sf_dir):
    """The property rand(seed) lacks (SURVEY §7.4.2): membership is a pure
    function of the row, so any physical layout yields the same sample."""
    base = {r["o_orderkey"] for r in REG["sample_seeded"].fn(spark, sf_dir).collect()}
    o = load_table(spark, sf_dir, "orders").repartition(13, "o_custkey")
    relaid = o.filter(
        setops._lehmer(F.col("o_orderkey"), setops.SAMPLE_A, setops.SAMPLE_C)
        < setops.SAMPLE_FRACTION_NUM
    )
    assert {r["o_orderkey"] for r in relaid.collect()} == base


def test_sample_seeded_selectivity(spark, sf_dir):
    """Bernoulli(0.1) over a bijective hash: observed fraction within a
    generous binomial band (n >= 1500 at the smallest SF)."""
    n_total = load_table(spark, sf_dir, "orders").count()
    n_sample = REG["sample_seeded"].fn(spark, sf_dir).count()
    frac = n_sample / n_total
    assert 0.06 <= frac <= 0.14, f"selectivity {frac} drifted from 0.1"


def test_takesample_exact_k_and_deterministic(spark, sf_dir):
    df1 = REG["sample_takesample_k"].fn(spark, sf_dir)
    n_total = load_table(spark, sf_dir, "orders").count()
    rows1 = sorted(r["o_orderkey"] for r in df1.collect())
    assert len(rows1) == min(setops.TAKESAMPLE_K, n_total)
    rows2 = sorted(
        r["o_orderkey"] for r in REG["sample_takesample_k"].fn(spark, sf_dir).collect()
    )
    assert rows1 == rows2  # run-to-run identical (takeSample(seed) is not)


def test_takesample_is_not_degenerate_prefix(spark, sf_dir):
    """The r7 build found this live: a too-small multiplier leaves small
    keys unwrapped, making bottom-k-by-hash just 'the k smallest keys'.
    Guard: the sample must not be the sorted key prefix."""
    keys = sorted(
        r["o_orderkey"] for r in REG["sample_takesample_k"].fn(spark, sf_dir).collect()
    )
    all_keys = sorted(
        r["o_orderkey"]
        for r in load_table(spark, sf_dir, "orders").select("o_orderkey").collect()
    )
    assert keys != all_keys[: len(keys)], "sample degenerated to smallest keys"


# ---------------------------------------------------------------------------
# Mergeable quantile sketch
# ---------------------------------------------------------------------------
def _bottom_k(df, k):
    w = Window.orderBy("hkey")
    return df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def test_quantile_sketch_mergeability(spark, sf_dir):
    """merge(sketch(A), sketch(B)) == sketch(A ∪ B): union the two halves'
    bottom-k sets and re-truncate; must equal bottom-k over all rows.
    This is the property that lets each month be summarized once and every
    rollup run over stored sketches."""
    o = load_table(spark, sf_dir, "orders").select(
        F.pmod(
            F.pmod(F.col("o_orderkey"), incremental.QSK_P) * incremental.QSK_A
            + incremental.QSK_C,
            incremental.QSK_P,
        ).alias("hkey")
    )
    k = incremental.QSK_K
    half_a = o.filter(F.col("hkey") % 2 == 0)
    half_b = o.filter(F.col("hkey") % 2 == 1)
    merged = _bottom_k(_bottom_k(half_a, k).unionByName(_bottom_k(half_b, k)), k)
    direct = _bottom_k(o, k)
    assert sorted(r["hkey"] for r in merged.collect()) == sorted(
        r["hkey"] for r in direct.collect()
    )


def test_quantile_sketch_rank_error(spark, sf_dir):
    """The final month's running p50 estimate must sit at a true prefix
    rank within 0.5 ± 3/sqrt(K) (~0.375 at K=64) — the sample-quantile
    concentration bound with a wide safety factor."""
    out = REG["quantile_sketch_rollup_monthly"].fn(spark, sf_dir)
    last = out.orderBy(F.col("month").desc()).first()
    cents = load_table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents")
    )
    n = cents.count()
    below = cents.filter(F.col("cents") <= last["est_p50_cents"]).count()
    rank = below / n
    tol = 3 / (incremental.QSK_K ** 0.5)
    assert abs(rank - 0.5) <= tol, f"p50 est at true rank {rank}"


def test_quantile_sketch_exact_when_unfilled(spark, sf_dir):
    """A month with fewer than K orders keeps every row, so the 'estimate'
    must equal the exact type-1 quantile of that month's prefix."""
    out = REG["quantile_sketch_rollup_monthly"].fn(spark, sf_dir)
    first = out.orderBy("month").first()
    if first["n_sample"] >= incremental.QSK_K:
        pytest.skip("smallest prefix already fills the sketch at this SF")
    o = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    prefix = sorted(
        r["cents"] for r in o.filter(F.col("month") <= first["month"]).collect()
    )
    import math

    exact_p50 = prefix[math.ceil(len(prefix) * 0.5) - 1]
    assert first["est_p50_cents"] == exact_p50


# ---------------------------------------------------------------------------
# KMV sketch
# ---------------------------------------------------------------------------
def test_kmv_exact_when_unfilled(spark, sf_dir):
    """k_eff < K means the sketch holds the whole set: estimates must be
    the exact distinct / intersection counts, not the density formula."""
    out = {r["event_type"]: r for r in REG["kmv_user_overlap_sketch"].fn(spark, sf_dir).collect()}
    if not out:
        pytest.skip("no view/purchase events at this SF")
    e = load_table(spark, sf_dir, "events")
    for etype, row in out.items():
        exact = (
            e.filter(F.col("event_type") == etype).select("user_id").distinct().count()
        )
        if row["k_eff"] < incremental.KMV_K:
            assert row["est_distinct"] == exact
        else:
            assert abs(row["est_distinct"] - exact) / exact <= 0.35


def test_kmv_intersection_accuracy(spark, sf_dir):
    out = REG["kmv_user_overlap_sketch"].fn(spark, sf_dir).first()
    if out is None:
        pytest.skip("no view/purchase events at this SF")
    e = load_table(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select("user_id").distinct()
    b = e.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    exact = v.join(b, "user_id", "left_semi").count()
    est = out["est_intersection"]
    if exact == 0:
        assert est == 0
    else:
        assert abs(est - exact) / exact <= 0.5  # compound ratio*union error


# ---------------------------------------------------------------------------
# Exactly-once merge under restart
# ---------------------------------------------------------------------------
def test_exactly_once_merge_matches_batch_truth(spark, sf_dir):
    """End state == one-shot batch aggregate, computed Spark-side (the
    DuckDB hash parity runs separately). The operator itself raises if the
    restart never redelivered the crashed batch, so a pass here proves the
    crash+replay+skip path executed AND double-application did not occur."""
    got = {
        r["user_id"]: (r["n_events"], r["total_value_cents"])
        for r in REG["stream_exactly_once_merge_restart"].fn(spark, sf_dir).collect()
    }
    truth = {
        r["user_id"]: (r["n"], r["c"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).cast("long").alias("c"),
        )
        .collect()
    }
    assert got == truth
