"""Round-9 operator hardening beyond oracle parity.

- pmi_priority_status: ln-quantization guard band scanned over every
  distinct lift ratio the fixtures produce (the bigram discipline).
- floored_running_balance: the reflection identity proved against a
  literal sequential replay — pure-python property over drawn sequences
  AND the Spark output replayed row-for-row.
- hot_streak_islands: output replayed against a sequential scan.
- share_of_parent_revenue: within-region shares sum to 1 (up to the
  documented quantization), region shares likewise.
- nation_revenue_trend: the quantized slope is consistent with the
  exact integer numerator/denominator it ships alongside.
"""

import math
import random
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from distributed_deep_learning_with_apache_spark_spark.operators.decision_support import (
    PMI_SCALE,
)
from distributed_deep_learning_with_apache_spark_spark.registry import load_all
from distributed_deep_learning_with_apache_spark_spark.sources.catalog import (
    load_table,
)

DRIVER_SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", DRIVER_SF_DIR])
def test_pmi_log_quantization_guard_band(spark, sf):
    """Every distinct (n_xy * n, n_x * n_y) lift ratio must put
    ln(ratio)*PMI_SCALE >= 1e-6 from the nearest integer — a >10^5x
    margin over worst-case cross-engine libm disagreement (~2e-12 at
    milli-nat scale), so the floor cannot flip; an unlucky future corpus
    fails HERE loudly instead of the hash mysteriously."""
    o = load_table(spark, sf, "orders")
    cells = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_xy")
    )
    rows = cells.collect()  # bounded: |priorities| x |statuses| cells
    assert rows
    n = sum(r["n_xy"] for r in rows)
    n_x = defaultdict(int)
    n_y = defaultdict(int)
    for r in rows:
        n_x[r["o_orderpriority"]] += r["n_xy"]
        n_y[r["o_orderstatus"]] += r["n_xy"]
    dists = []
    for r in rows:
        num = r["n_xy"] * n
        den = n_x[r["o_orderpriority"]] * n_y[r["o_orderstatus"]]
        frac = (math.log(num / den) * PMI_SCALE) % 1.0
        dists.append(0.5 - abs(frac - 0.5))
    assert min(dists) >= 1e-6, f"quantization boundary too close: {min(dists)}"


def _replay_floor_balance(deltas):
    b, out = 0, []
    for x in deltas:
        b = max(0, b + x)
        out.append(b)
    return out


def test_reflection_identity_matches_sequential_replay_pure():
    """b_t = p_t - min(0, running-min p) == the literal recurrence, on
    randomly drawn signed sequences (the identity the operator rides)."""
    rng = random.Random(909)
    for _ in range(200):
        xs = [rng.randint(-50, 50) for _ in range(rng.randint(1, 60))]
        p, m, ident = 0, 0, []
        for x in xs:
            p += x
            m = min(m, p)
            ident.append(p - min(0, m))
        assert ident == _replay_floor_balance(xs)


def test_floored_running_balance_matches_replay(spark):
    reg = load_all()
    out = {
        (r["user_id"], r["event_id"]): r["balance_cents"]
        for r in reg["floored_running_balance"].fn(spark, DRIVER_SF_DIR).collect()
    }
    e = (
        load_table(spark, DRIVER_SF_DIR, "events")
        .filter(F.col("event_type").isin("purchase", "error"))
        .select(
            "user_id",
            "event_id",
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 100 + 0.5).cast("long"),
            )
            .otherwise(-F.floor(F.col("value") * 100 + 0.5).cast("long"))
            .alias("delta"),
        )
        .collect()
    )
    per_user = defaultdict(list)
    for r in sorted(e, key=lambda r: (r["user_id"], r["event_id"])):
        per_user[r["user_id"]].append((r["event_id"], r["delta"]))
    n_checked = 0
    for uid, seq in per_user.items():
        balances = _replay_floor_balance([d for _, d in seq])
        for (eid, _), b in zip(seq, balances):
            assert out[(uid, eid)] == b, (uid, eid)
            n_checked += 1
    assert n_checked == len(out) > 0


def test_hot_streak_islands_matches_replay(spark):
    from distributed_deep_learning_with_apache_spark_spark.streaming.events import (
        HOT_CENTS,
    )

    reg = load_all()
    got = sorted(
        (
            r["user_id"],
            r["start_event_id"],
            r["end_event_id"],
            r["run_len"],
            r["run_cents"],
        )
        for r in reg["hot_streak_islands"].fn(spark, DRIVER_SF_DIR).collect()
    )
    e = (
        load_table(spark, DRIVER_SF_DIR, "events")
        .select(
            "user_id",
            "event_id",
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
        .collect()
    )
    per_user = defaultdict(list)
    for r in sorted(e, key=lambda r: (r["user_id"], r["event_id"])):
        per_user[r["user_id"]].append((r["event_id"], r["cents"]))
    want = []
    for uid, seq in per_user.items():
        run = []
        for eid, cents in seq + [(None, -1)]:  # sentinel flushes the tail
            if cents >= HOT_CENTS:
                run.append((eid, cents))
            elif run:
                want.append(
                    (
                        uid,
                        run[0][0],
                        run[-1][0],
                        len(run),
                        sum(c for _, c in run),
                    )
                )
                run = []
    assert got == sorted(want) and got


def test_share_of_parent_sums_to_one(spark):
    reg = load_all()
    rows = reg["share_of_parent_revenue"].fn(spark, DRIVER_SF_DIR).collect()
    assert rows
    per_region = defaultdict(float)
    region_share = {}
    for r in rows:
        per_region[r["r_name"]] += r["share_in_region"]
        region_share[r["r_name"]] = r["region_share_of_total"]
    for name, s in per_region.items():
        assert abs(s - 1.0) <= 1e-4, (name, s)  # quantized to 1e-6 per row
    assert abs(sum(region_share.values()) - 1.0) <= 1e-4


def test_nation_trend_slope_consistent_with_moments(spark):
    reg = load_all()
    rows = reg["nation_revenue_trend"].fn(spark, DRIVER_SF_DIR).collect()
    assert rows
    for r in rows:
        if r["slope_den"] == 0:
            assert r["slope_cents_per_month"] is None
            continue
        expect = math.floor(r["slope_num"] * 100.0 / r["slope_den"] + 0.5) / 100
        assert r["slope_cents_per_month"] == expect, r
