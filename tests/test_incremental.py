"""Mechanism tests for operators/incremental.py (r5): the oracle sweep
(test_oracle_parity.py) proves the OUTPUTS; these prove the MECHANISMS —
that the salted shuffle actually salts, the MV merge actually decomposes
into state+delta, and the count-min sketch actually prunes while keeping
its one-sided-error guarantee.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_deep_learning_with_apache_spark_spark.operators.incremental import (
    CM_D,
    CM_W,
    HH_DENOM,
    N_SALTS,
    _token_stream,
)
from distributed_deep_learning_with_apache_spark_spark.registry import load_all
from distributed_deep_learning_with_apache_spark_spark.sources.catalog import load_table

REG = load_all()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_two_phase_salted_shuffle_shape(spark, sf_dir):
    """Phase 1 must shuffle on (l_returnflag, salt) — the whole point —
    and phase 2 on l_returnflag alone; both phases partial-aggregate."""
    df = REG["skew_agg_two_phase"].fn(spark, sf_dir)
    plan = _plan(df)
    assert "salt" in plan, "phase-1 exchange lost the salt key"
    # two distinct hash-partitionings: (key, salt) then (key)
    assert plan.count("hashpartitioning") >= 2, plan


def test_two_phase_equals_single_phase(spark, sf_dir):
    """The salted two-phase result must be bit-identical to the direct
    single-phase aggregation (all stats decomposable)."""
    li = load_table(spark, sf_dir, "lineitem")
    direct = (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("sum_qty"),
            (
                F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long"))
                / 100.0
                / F.count(F.lit(1))
            ).alias("avg_price"),
            (
                F.sum(
                    F.floor(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + 0.5
                    ).cast("long")
                )
                / 10000.0
            ).alias("revenue"),
        )
        .collect()
    )
    got = REG["skew_agg_two_phase"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, direct))


def test_incremental_merge_decomposes_state_plus_delta(spark, sf_dir):
    """The MV maintenance must actually split the input: state rows (days
    before the newest) + delta rows (the newest day) must tile the table,
    and the merged n_events must equal the full-table count per key."""
    e = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    last_day = e.agg(F.max("day")).collect()[0][0]
    n_state = e.filter(F.col("day") < F.lit(last_day)).count()
    n_delta = e.filter(F.col("day") == F.lit(last_day)).count()
    assert n_state + n_delta == e.count()
    assert n_delta > 0  # the newest partition is non-empty by construction
    merged = {
        r.event_type: r.n_events
        for r in REG["incremental_agg_maintenance"].fn(spark, sf_dir).collect()
    }
    full = {
        r.event_type: r.cnt
        for r in e.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert merged == full


def test_heavy_hitters_sketch_prunes_and_never_drops(spark, sf_dir):
    """CM contract: (a) the sketch's candidate set contains every true
    heavy hitter (one-sided error), (b) it genuinely prunes the vocabulary
    (candidates < vocab), and (c) the verified output IS the true heavy
    set."""
    occ = _token_stream(spark, sf_dir)
    n_tok = occ.count()
    vocab = occ.select("tok").distinct().count()
    exact = {
        (r.tok, r.cnt)
        for r in occ.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .filter(F.col("cnt") >= F.ceil(F.lit(n_tok) / float(HH_DENOM)))
        .collect()
    }
    got = {
        (r.tok, r.cnt)
        for r in REG["heavy_hitters_sketch_verified"].fn(spark, sf_dir).collect()
    }
    assert got == exact  # verify pass makes the approximate mechanism exact
    assert 0 < len(got) < vocab, (len(got), vocab)
    # geometry sanity: noise bound (n/W per cell) stays under the threshold,
    # otherwise the candidate set degenerates toward the full vocabulary
    assert n_tok / CM_W < n_tok / HH_DENOM
    assert CM_D >= 2 and N_SALTS > 1


def test_heavy_hitters_no_vocab_shuffle_before_candidates(spark, sf_dir):
    """The probe stage must be broadcast joins (sketch side), never a
    shuffled join keyed on the token — the vocabulary-wide shuffle is
    exactly what the sketch exists to avoid."""
    df = REG["heavy_hitters_sketch_verified"].fn(spark, sf_dir)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= CM_D, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
