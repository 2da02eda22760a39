"""Semantic tests for the round-8 operators — each pins the PROPERTY the
operator exists for, on inputs engineered so a wrong mechanism cannot pass
(the fixture-only hash checks live in test_oracle_parity / R8_ORACLE)."""

import datetime
import math
import os

import pyarrow as pa
import pyarrow.parquet as pq

from distributed_deep_learning_with_apache_spark_spark.operators.decision_support import (
    EWMA_W,
)
from distributed_deep_learning_with_apache_spark_spark.registry import load_all

REG = load_all()

DIM = 64


def _write_embeddings(td, vecs, labels):
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        os.path.join(td, "embeddings.parquet"),
    )


def _unit(axis: int, eps_axis: int = -1, eps: float = 0.0):
    v = [0.0] * DIM
    v[axis] = 1.0
    if eps_axis >= 0:
        v[eps_axis] = eps
    return v


# ---------------------------------------------------------------------------
# knn_classify_embeddings
# ---------------------------------------------------------------------------
def test_knn_majority_vote_and_tiebreak(spark, tmp_path):
    """Geometry forces the neighbor sets: query 0 sits near three label-7
    vectors and two label-3 vectors (7 must win 3:2); query 1 sees a 2:2
    label split among its 5 neighbors' top labels — construct it so votes
    tie and the SMALLEST label must be chosen."""
    vecs = [
        _unit(0),  # query 0 (vec_id 0): axis 0
        _unit(1),  # query 1 (vec_id 1): axis 1
    ]
    labels = [99, 99]  # query labels are irrelevant (they are the queries)
    # 5 neighbors near axis 0: labels 7,7,7,3,3
    for i, lab in enumerate([7, 7, 7, 3, 3]):
        vecs.append(_unit(0, eps_axis=10 + i, eps=0.01))
        labels.append(lab)
    # 5 neighbors near axis 1 with a 2:2:1 split -> top vote ties 2:2
    # between labels 4 and 8 (plus one label 9); tie-break picks 4.
    for i, lab in enumerate([8, 8, 4, 4, 9]):
        vecs.append(_unit(1, eps_axis=20 + i, eps=0.01))
        labels.append(lab)
    # push everything else far away so the two neighbor clouds don't mix
    _write_embeddings(str(tmp_path), vecs, labels)
    # N_QUERIES is 10, so vec_ids 0..9 are all queries; only check 0 and 1
    # (the others' neighborhoods include cross-cloud vectors — fine).
    out = {
        r["query_id"]: r
        for r in REG["knn_classify_embeddings"].fn(spark, str(tmp_path)).collect()
    }
    assert out[0]["predicted_label"] == 7 and out[0]["n_votes"] == 3
    assert out[1]["predicted_label"] == 4 and out[1]["n_votes"] == 2


# ---------------------------------------------------------------------------
# countmin_estimate_profile
# ---------------------------------------------------------------------------
def test_countmin_never_underestimates(spark, sf_dir):
    """CM's defining property: counters only add, so est >= true for every
    probed key; on the fixture (few hundred distinct users vs 3x512
    cells) collisions are rare, so estimates also stay NEAR truth."""
    rows = REG["countmin_estimate_profile"].fn(spark, sf_dir).collect()
    assert rows, "no heavy users profiled"
    for r in rows:
        assert r["over_n"] >= 0, f"CM underestimated {r}"
        assert r["est_n"] == r["true_n"] + r["over_n"]


def test_countmin_overestimates_on_forced_collision(spark, tmp_path):
    """Force every row's hash to collide by using ONE distinct heavy key
    plus enough distinct keys mapped into the same 512-cell space that
    total collision mass is guaranteed: with 2000 distinct light keys and
    512 cells, each CM row's cell for the heavy key absorbs other keys'
    counts with overwhelming odds — over_n must be > 0 for at least the
    top key, proving the estimate is really read from shared counters
    (a bugged implementation that just re-counts exactly would show
    over_n == 0 everywhere)."""
    uids = [1] * 500 + list(range(100, 2100))  # heavy key 1 + 2000 singletons
    n = len(uids)
    base = datetime.datetime(2024, 1, 1)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(
                    [base + datetime.timedelta(seconds=i) for i in range(n)],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array(uids, pa.int64()),
                "event_type": pa.array(["view"] * n),
                "value": pa.array([1.0] * n, pa.float64()),
                "props": pa.array(["{}"] * n),
            }
        ),
        os.path.join(str(tmp_path), "events.parquet"),
    )
    rows = REG["countmin_estimate_profile"].fn(spark, str(tmp_path)).collect()
    top = {r["user_id"]: r for r in rows}
    assert top[1]["true_n"] == 500
    assert top[1]["over_n"] > 0  # shared counters absorbed singleton mass
    assert all(r["over_n"] >= 0 for r in rows)


# ---------------------------------------------------------------------------
# ewma_dyadic_revenue
# ---------------------------------------------------------------------------
def test_ewma_exact_against_reference(spark, tmp_path):
    """Hand-check the dyadic arithmetic on a step series: 20 days at
    10000 cents then 20 at 30000. Assert (a) the constant prefix smooths
    to itself, (b) each output equals the exact integer reference
    num/(2^W - 1), (c) the smoothed curve converges toward the new level
    after the step with the dyadic half-life (alpha=1/2 -> the gap to the
    new level halves each day)."""
    days = [datetime.datetime(1995, 1, 1) + datetime.timedelta(days=i) for i in range(40)]
    prices = [100.0] * 20 + [300.0] * 20  # cents: 10000 then 30000
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(40), pa.int64()),
                "o_custkey": pa.array([0] * 40, pa.int64()),
                "o_orderstatus": pa.array(["F"] * 40),
                "o_totalprice": pa.array(prices, pa.float64()),
                "o_orderdate": pa.array(days, pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * 40),
            }
        ),
        os.path.join(str(tmp_path), "orders.parquet"),
    )
    out = {
        r["day"]: r for r in REG["ewma_dyadic_revenue"].fn(spark, str(tmp_path)).collect()
    }
    assert len(out) == 40 - (EWMA_W - 1)  # full windows only
    cents = [10000] * 20 + [30000] * 20
    den = (1 << EWMA_W) - 1
    for t in range(EWMA_W - 1, 40):
        num = sum(cents[t - i] * (1 << (EWMA_W - 1 - i)) for i in range(EWMA_W))
        expect = math.floor(num / den * 100 + 0.5) / 100
        got = out[days[t].date()]["ewma_cents"]
        assert got == expect, (t, got, expect)
    # constant prefix: smooths to the level itself (within the 2^-W tail)
    assert abs(out[days[EWMA_W - 1].date()]["ewma_cents"] - 10000) < 0.5
    # the day after the step the gap to 30000 has roughly halved
    d_step = out[days[20].date()]["ewma_cents"]
    assert 19000 < d_step < 21000  # x_t weight is ~1/2: midpoint-ish
    # convergence: 10 days after the step the gap is < 2^-10 of 20000 + eps
    assert out[days[30].date()]["ewma_cents"] > 29970


# ---------------------------------------------------------------------------
# out_of_order_lateness_histogram
# ---------------------------------------------------------------------------
def test_lateness_histogram_on_disordered_stream(spark, tmp_path):
    """A hand-built stream where arrival order (event_id) disagrees with
    event time: one event arrives 2 h late, one 5 min late, the rest in
    order — the histogram must put exactly one event in the 7200 bucket,
    one in the 0 bucket with lateness 300, and everything else at 0."""
    base = datetime.datetime(2024, 6, 1, 8, 0, 0)
    # (event_id = arrival order, event-time offset seconds)
    stream = [
        (0, 0),
        (1, 60),
        (2, 120),
        (3, 120 - 7200),  # 2 h behind the running max (120)
        (4, 180),
        (5, 180 - 300),  # 5 min behind the running max (180)
        (6, 240),
    ]
    n = len(stream)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([e for e, _ in stream], pa.int64()),
                "ts": pa.array(
                    [base + datetime.timedelta(seconds=s) for _, s in stream],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([1] * n, pa.int64()),
                "event_type": pa.array(["view"] * n),
                "value": pa.array([1.0] * n, pa.float64()),
                "props": pa.array(["{}"] * n),
            }
        ),
        os.path.join(str(tmp_path), "events.parquet"),
    )
    out = {
        r["bucket_floor_s"]: r
        for r in REG["out_of_order_lateness_histogram"].fn(spark, str(tmp_path)).collect()
    }
    assert out[7200]["n_events"] == 1 and out[7200]["max_lateness_s"] == 7200
    assert out[0]["n_events"] == 6  # 5 in-order + the 300 s one
    assert out[0]["max_lateness_s"] == 300


# ---------------------------------------------------------------------------
# running_distinct_users_daily
# ---------------------------------------------------------------------------
def _write_events(td, rows):
    """rows: (event_id, ts datetime, user_id)"""
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array(["view"] * len(rows)),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        os.path.join(td, "events.parquet"),
    )


def test_running_distinct_counts_first_appearances_once(spark, tmp_path):
    """Three days: day 1 user A; day 2 users A+B (A returns — must NOT
    recount); day 3 user A only (a returning-only day: new_users = 0 but
    the day must still appear with the running total unchanged)."""
    d = lambda i, h: datetime.datetime(2024, 5, i, h)  # noqa: E731
    rows = [
        (0, d(1, 9), 100),
        (1, d(2, 9), 100),
        (2, d(2, 10), 200),
        (3, d(3, 9), 100),
    ]
    _write_events(str(tmp_path), rows)
    out = {
        r["day"].isoformat(): r
        for r in REG["running_distinct_users_daily"].fn(spark, str(tmp_path)).collect()
    }
    assert out["2024-05-01"]["new_users"] == 1
    assert out["2024-05-01"]["cumulative_users"] == 1
    assert out["2024-05-02"]["new_users"] == 1
    assert out["2024-05-02"]["active_users"] == 2
    assert out["2024-05-02"]["cumulative_users"] == 2
    assert out["2024-05-03"]["new_users"] == 0  # returning-only day kept
    assert out["2024-05-03"]["active_users"] == 1
    assert out["2024-05-03"]["cumulative_users"] == 2  # unchanged


# ---------------------------------------------------------------------------
# ivm_agg_retractions
# ---------------------------------------------------------------------------
def test_ivm_retraction_removes_emptied_groups(spark, tmp_path):
    """Hand-built orders where customer 13's ENTIRE group is deleted
    (custkey % 13 == 0): the maintained view must not contain custkey 13
    at all — neither a (0, 0) row nor a (0, nonzero) row — while a
    partially-retracted customer keeps a correctly reduced aggregate."""
    days = datetime.datetime(1995, 3, 1)
    rows = [
        # custkey 13: two orders, both swept by the custkey%13 delete rule
        (11, 13, 100.0),
        (12, 13, 200.0),
        # custkey 2: three orders; orderkey 21 has %7==0 -> partial delete
        (21, 2, 50.0),
        (22, 2, 60.0),
        (23, 2, 70.0),
        # orderkey 30: %10==0 -> held out of base, re-inserted with +1.0
        (30, 2, 80.0),
    ]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
                "o_orderstatus": pa.array(["F"] * len(rows)),
                "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
                "o_orderdate": pa.array([days] * len(rows), pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * len(rows)),
            }
        ),
        os.path.join(str(tmp_path), "orders.parquet"),
    )
    out = {r["o_custkey"]: r for r in REG["ivm_agg_retractions"].fn(spark, str(tmp_path)).collect()}
    assert 13 not in out  # emptied group GONE, not zeroed
    # custkey 2: base keeps 22, 23 (21 deleted); insert adds 30 at 81.00
    assert out[2]["n_orders"] == 3
    assert out[2]["revenue_cents"] == 6000 + 7000 + 8100


# ---------------------------------------------------------------------------
# stream_countmin_running
# ---------------------------------------------------------------------------
def test_stream_countmin_watchlist_one_sided(spark, sf_dir):
    """The streamed counters must preserve CM's one-sided contract for
    the watchlist: every estimate >= the key's true count (0 for keys the
    stream never saw)."""
    from distributed_deep_learning_with_apache_spark_spark.sources.catalog import (
        load_table,
    )

    est = {
        r["user_id"]: r["est_n"]
        for r in REG["stream_countmin_running"].fn(spark, sf_dir).collect()
    }
    true = {
        r["user_id"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .filter("user_id < 10")
        .groupBy("user_id")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert set(est) == set(range(10))
    for uid in range(10):
        assert est[uid] >= true.get(uid, 0), (uid, est[uid], true.get(uid))


# ---------------------------------------------------------------------------
# pca_power_iteration_quantized
# ---------------------------------------------------------------------------
def test_pca_recovers_planted_direction(spark, tmp_path):
    """Plant a dominant variance direction along axis 5 (values swing
    +/-0.5 there, +/-0.01 noise elsewhere): the converged iterate must put
    its maximal |loading| (= 1000 by normalization) on dim 5, every other
    dim's |loading| must be an order of magnitude smaller, and the
    eigenvalue readout must dwarf what any noise axis could carry."""
    import random

    rng = random.Random(11)
    vecs = []
    for k in range(60):
        v = [round(rng.uniform(-0.01, 0.01), 4) for _ in range(DIM)]
        v[5] = 0.5 if k % 2 == 0 else -0.5
        vecs.append(v)
    _write_embeddings(str(tmp_path), vecs, [0] * 60)
    out = {
        r["dim_idx"]: r
        for r in REG["pca_power_iteration_quantized"].fn(spark, str(tmp_path)).collect()
    }
    assert len(out) == DIM
    assert abs(out[5]["loading_q"]) == 1000  # the max-normalized component
    for i in range(DIM):
        if i != 5:
            assert abs(out[i]["loading_q"]) < 100, (i, out[i]["loading_q"])
    # eigenvalue readout: the planted axis carries variance ~0.25 * n in
    # raw units = 0.25 * Q^2 * n^2 in scatter units (C = n*S - S*S), vs
    # ~1e-4 per noise axis — the readout must reflect that separation.
    assert out[0]["lam_maxabs"] > 1000 * 60 * 50 * 50  # >> any noise axis


def test_pca_overflow_budget_holds_at_fixture(spark, sf_dir):
    """The documented int64 budget: |C| and |C w| must sit far inside
    2^63 on the fixture (the docstring's n ~ 1.5e5 safety analysis)."""
    from pyspark.sql import functions as F

    from distributed_deep_learning_with_apache_spark_spark.operators.similarity import (
        PCA_QSCALE,
    )
    from distributed_deep_learning_with_apache_spark_spark.sources.catalog import (
        load_table,
    )

    e = load_table(spark, sf_dir, "embeddings")
    stats = e.select(
        F.count(F.lit(1)).alias("n"),
        F.max(
            F.array_max(
                F.transform(
                    F.col("embedding").cast("array<double>"),
                    lambda x: F.abs(F.floor(x * PCA_QSCALE + F.lit(0.5))),
                )
            )
        ).alias("qmax"),
    ).collect()[0]
    n, qmax = stats["n"], stats["qmax"]
    c_bound = n * n * qmax * qmax  # |C_ij| <= n*S_ij + S_i*S_j <= 2*n^2*q^2
    cw_bound = 64 * 2 * c_bound * 1000
    assert cw_bound < 2**62, (n, qmax, cw_bound)


# ---------------------------------------------------------------------------
# lsh_band_tuning_profile
# ---------------------------------------------------------------------------
def test_lsh_tuning_monotonic_and_catches_exact_dups(spark, tmp_path):
    """The property the profile exists to show: fewer rows per band =
    more candidate pairs (recall-workload monotonicity); and an exact
    duplicate pair must collide under EVERY config (identical signature
    => identical band keys), so candidate_pairs >= 1 even at the
    precision-max 1x8 split."""
    texts = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "the quick brown fox jumps over the lazy dog near the river bank",  # exact dup
        "a completely different document about spark shuffles and joins here",
        "yet another text concerning window functions and watermark tuning",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["web"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(str(tmp_path), "documents.parquet"),
    )
    out = {
        r["rows_per_band"]: r
        for r in REG["lsh_band_tuning_profile"].fn(spark, str(tmp_path)).collect()
    }
    assert set(out) == {1, 2, 4, 8}
    # workload monotone: recall-max 8x1 generates the most candidates
    assert (
        out[1]["candidate_pairs"]
        >= out[2]["candidate_pairs"]
        >= out[4]["candidate_pairs"]
        >= out[8]["candidate_pairs"]
    )
    # the exact dup collides everywhere, even at 1x8
    assert out[8]["candidate_pairs"] >= 1
    assert all(r["n_collision_buckets"] >= 1 for r in out.values())


# ---------------------------------------------------------------------------
# table_checksum_buckets
# ---------------------------------------------------------------------------
def _write_orders_simple(td, rows):
    """rows: (o_orderkey, o_custkey, o_totalprice)"""
    d = datetime.datetime(1995, 3, 1)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
                "o_orderstatus": pa.array(["F"] * len(rows)),
                "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
                "o_orderdate": pa.array([d] * len(rows), pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * len(rows)),
            }
        ),
        os.path.join(td, "orders.parquet"),
    )


def test_checksum_localizes_a_tampered_row(spark, tmp_path):
    """The anti-entropy property: two copies differing in ONE row must
    agree on every bucket except the tampered row's — that is what lets
    reconciliation skip 63/64 of the table."""
    rows = [(k, k % 5, 100.0 + k) for k in range(256)]
    a_dir, b_dir = tmp_path / "a", tmp_path / "b"
    a_dir.mkdir(), b_dir.mkdir()
    _write_orders_simple(str(a_dir), rows)
    tampered = [(k, c, p + 0.01 if k == 77 else p) for k, c, p in rows]
    _write_orders_simple(str(b_dir), tampered)
    fp = lambda d: {  # noqa: E731
        r["bucket"]: (r["n_rows"], r["checksum"])
        for r in REG["table_checksum_buckets"].fn(spark, str(d)).collect()
    }
    fa, fb = fp(a_dir), fp(b_dir)
    diff = [b for b in fa if fa[b] != fb[b]]
    assert diff == [77 % 64]  # exactly the tampered row's bucket
    assert fa[77 % 64][0] == fb[77 % 64][0]  # same count, different sum


# ---------------------------------------------------------------------------
# range_partition_boundaries
# ---------------------------------------------------------------------------
def test_range_boundaries_balance_and_skew_honesty(spark, tmp_path):
    """Uniform values must split into near-equal ranges; a column where
    one value holds >50% of rows must show the collapse honestly (some
    range receives far more than n/8 — the straggler the op exists to
    expose before the shuffle)."""
    uniform = [(k, 0, float(k + 1)) for k in range(800)]
    u_dir = tmp_path / "u"
    u_dir.mkdir()
    _write_orders_simple(str(u_dir), uniform)
    out = REG["range_partition_boundaries"].fn(spark, str(u_dir)).collect()
    counts = [r["n_rows"] for r in out]
    assert sum(counts) == 800
    assert max(counts) <= 110  # ~100 per range on distinct uniform values

    skewed = [(k, 0, 500.0 if k < 500 else float(k)) for k in range(800)]
    s_dir = tmp_path / "s"
    s_dir.mkdir()
    _write_orders_simple(str(s_dir), skewed)
    out_s = REG["range_partition_boundaries"].fn(spark, str(s_dir)).collect()
    assert max(r["n_rows"] for r in out_s) >= 500  # the hot value's range


# ---------------------------------------------------------------------------
# bootstrap_ci_revenue
# ---------------------------------------------------------------------------
def test_bootstrap_ci_brackets_the_mean(spark, sf_dir):
    r = REG["bootstrap_ci_revenue"].fn(spark, sf_dir).collect()[0]
    assert r["n_reps"] == 100
    assert r["ci_lo_cents"] < r["mean_cents"] < r["ci_hi_cents"]
    # sanity: a 95% CI on thousands of orders is tight (within ~10%)
    width = r["ci_hi_cents"] - r["ci_lo_cents"]
    assert width < 0.2 * r["mean_cents"]


# ---------------------------------------------------------------------------
# vocab_oov_rate
# ---------------------------------------------------------------------------
def test_vocab_oov_separates_in_and_out_of_vocab_docs(spark, tmp_path):
    """One doc written entirely from the corpus' dominant tokens (rate 0)
    and one from singletons (rate 1); the frequency vocabulary is built
    from the corpus itself, so the dominant tokens are in-vocab by
    construction."""
    # the vocabulary is top-20 by frequency: 4 dominant tokens (200x)
    # fill slots 1-4; 25 medium tokens (3x) compete for the remaining 16
    # slots — so singletons (1x) can never reach the vocabulary.
    common = "alpha beta gamma delta " * 10  # 4 tokens, 10x each, 20 docs
    texts = [common] * 20
    medium = " ".join(f"tok{i:02d}" for i in range(25))
    texts += [medium] * 3  # 25 medium tokens, 3x each
    texts.append("zzyx qwvv jjkk mmnn oopp rrss")  # all singletons
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["web"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(str(tmp_path), "documents.parquet"),
    )
    out = {
        r["doc_id"]: r for r in REG["vocab_oov_rate"].fn(spark, str(tmp_path)).collect()
    }
    assert out[0]["oov_rate"] == 0.0 and out[0]["n_oov"] == 0
    assert out[23]["oov_rate"] == 1.0 and out[23]["n_oov"] == out[23]["n_tokens"]


# ---------------------------------------------------------------------------
# json_schema_profile
# ---------------------------------------------------------------------------
def test_json_schema_profile_classifies_types(spark, tmp_path):
    """Mixed-type values under the same key must split into per-type rows
    — the drift signal ('k' was int, now sometimes string) this op
    exists to surface."""
    props = [
        '{"k": 42, "name": "ada"}',
        '{"k": "42"}',  # the drift: stringified int
        '{"k": -3.5, "flag": true}',
        '{"name": null}',
    ]
    n = len(props)
    base = datetime.datetime(2024, 2, 1)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(
                    [base + datetime.timedelta(seconds=i) for i in range(n)],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([1] * n, pa.int64()),
                "event_type": pa.array(["view"] * n),
                "value": pa.array([1.0] * n, pa.float64()),
                "props": pa.array(props),
            }
        ),
        os.path.join(str(tmp_path), "events.parquet"),
    )
    rows = {
        (r["json_key"], r["vtype"]): r["n_values"]
        for r in REG["json_schema_profile"].fn(spark, str(tmp_path)).collect()
    }
    assert rows[("k", "int")] == 1
    assert rows[("k", "string")] == 1  # the drifted value
    assert rows[("k", "float")] == 1
    assert rows[("flag", "bool")] == 1
    assert rows[("name", "string")] == 1
    assert rows[("name", "null")] == 1


# ---------------------------------------------------------------------------
# gini_revenue_concentration
# ---------------------------------------------------------------------------
def test_gini_extremes(spark, tmp_path):
    """Equal revenues -> gini 0; one customer holding everything ->
    gini = (n-1)/n (the finite-sample maximum)."""
    eq_dir, sk_dir = tmp_path / "eq", tmp_path / "sk"
    eq_dir.mkdir(), sk_dir.mkdir()
    _write_orders_simple(str(eq_dir), [(k, k, 100.0) for k in range(50)])
    r = REG["gini_revenue_concentration"].fn(spark, str(eq_dir)).collect()[0]
    assert r["gini"] == 0.0 and r["n_customers"] == 50
    # customer 0 gets 9901 of 10000 cents total: near-max concentration
    rows = [(0, 0, 99.01)] + [(k, k, 0.01) for k in range(1, 100)]
    _write_orders_simple(str(sk_dir), rows)
    r2 = REG["gini_revenue_concentration"].fn(spark, str(sk_dir)).collect()[0]
    assert r2["gini"] > 0.95
    assert r2["top10pct_share"] > 0.98


# ---------------------------------------------------------------------------
# ks_two_sample_drift
# ---------------------------------------------------------------------------
def _write_orders_prio(td, rows):
    """rows: (o_orderkey, o_totalprice, o_orderpriority)"""
    d = datetime.datetime(1995, 3, 1)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_custkey": pa.array([0] * len(rows), pa.int64()),
                "o_orderstatus": pa.array(["F"] * len(rows)),
                "o_totalprice": pa.array([r[1] for r in rows], pa.float64()),
                "o_orderdate": pa.array([d] * len(rows), pa.timestamp("us")),
                "o_orderpriority": pa.array([r[2] for r in rows]),
            }
        ),
        os.path.join(td, "orders.parquet"),
    )


def test_ks_identical_zero_disjoint_one(spark, tmp_path):
    """Identical samples -> D = 0; disjoint value ranges -> D = 1 (the
    CDF gap reaches its maximum between the ranges)."""
    same_dir, disj_dir = tmp_path / "same", tmp_path / "disj"
    same_dir.mkdir(), disj_dir.mkdir()
    rows = [(k, float(k % 20 + 1), "1-URGENT") for k in range(40)]
    rows += [(100 + k, float(k % 20 + 1), "5-LOW") for k in range(40)]
    _write_orders_prio(str(same_dir), rows)
    r = REG["ks_two_sample_drift"].fn(spark, str(same_dir)).collect()[0]
    assert r["d_num"] == 0 and r["d_stat"] == 0.0
    rows2 = [(k, float(k + 1), "1-URGENT") for k in range(30)]
    rows2 += [(100 + k, float(1000 + k), "5-LOW") for k in range(30)]
    _write_orders_prio(str(disj_dir), rows2)
    r2 = REG["ks_two_sample_drift"].fn(spark, str(disj_dir)).collect()[0]
    assert r2["d_stat"] == 1.0


# ---------------------------------------------------------------------------
# twap_monthly_revenue
# ---------------------------------------------------------------------------
def test_twap_weights_by_holding_interval(spark, tmp_path):
    """March: one 100.00 observation on the 1st, one 300.00 on the 29th.
    TWAP = (28 days * 10000 + 3 days * 30000) / 31 — NOT the naive
    two-point average 20000."""
    rows = [
        (0, 0, 100.0, datetime.datetime(1995, 3, 1)),
        (1, 0, 300.0, datetime.datetime(1995, 3, 29)),
    ]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
                "o_orderstatus": pa.array(["F"] * len(rows)),
                "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
                "o_orderdate": pa.array([r[3] for r in rows], pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * len(rows)),
            }
        ),
        os.path.join(str(tmp_path), "orders.parquet"),
    )
    r = REG["twap_monthly_revenue"].fn(spark, str(tmp_path)).collect()[0]
    assert r["month"] == "1995-03"
    assert r["covered_days"] == 31
    expect = math.floor((28 * 10000 + 3 * 30000) * 100.0 / 31 + 0.5) / 100
    assert r["twap_cents"] == expect
    assert abs(r["twap_cents"] - 20000) > 3000  # far from the naive mean


# ---------------------------------------------------------------------------
# decile_lift_table
# ---------------------------------------------------------------------------
def test_decile_lift_shape(spark, sf_dir):
    rows = sorted(
        REG["decile_lift_table"].fn(spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    shares = [r["cum_share"] for r in rows]
    assert all(a < b for a, b in zip(shares, shares[1:]))  # monotone
    assert shares[-1] == 1.0
    assert rows[0]["cum_lift"] > 1.0  # the top decile outspends uniform
    assert rows[-1]["cum_lift"] == 1.0  # whole population = baseline
    # deciles ranked by spend: per-decile totals must be non-increasing
    totals = [r["decile_cents"] for r in rows]
    assert all(a >= b for a, b in zip(totals, totals[1:]))


# ---------------------------------------------------------------------------
# cohort_ltv_curve
# ---------------------------------------------------------------------------
def test_cohort_ltv_triangle(spark, tmp_path):
    """Two cohorts with known spend paths: Jan cohort (cust 1) spends
    100 then 50 two months later; Feb cohort (cust 2) spends 200 once.
    The triangle must age each order against ITS customer's cohort and
    accumulate per cohort."""
    rows = [
        (0, 1, 100.0, datetime.datetime(1995, 1, 15)),
        (1, 1, 50.0, datetime.datetime(1995, 3, 2)),  # age 2 for cohort Jan
        (2, 2, 200.0, datetime.datetime(1995, 2, 20)),
    ]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
                "o_orderstatus": pa.array(["F"] * len(rows)),
                "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
                "o_orderdate": pa.array([r[3] for r in rows], pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * len(rows)),
            }
        ),
        os.path.join(str(tmp_path), "orders.parquet"),
    )
    out = {
        (r["cohort_month"].isoformat(), r["age_months"]): r
        for r in REG["cohort_ltv_curve"].fn(spark, str(tmp_path)).collect()
    }
    assert out[("1995-01-01", 0)]["revenue_cents"] == 10000
    assert out[("1995-01-01", 2)]["revenue_cents"] == 5000
    assert out[("1995-01-01", 2)]["cum_revenue_cents"] == 15000  # running LTV
    assert out[("1995-02-01", 0)]["cum_revenue_cents"] == 20000
    assert len(out) == 3  # no spurious (cohort, age) cells


# ---------------------------------------------------------------------------
# log2_value_histogram
# ---------------------------------------------------------------------------
def test_log2_histogram_bucket_edges(spark, tmp_path):
    """Values planted exactly on power-of-two edges: 2^k goes in bucket
    k, 2^k - 1 in bucket k-1 — the boundary a float log2 would fumble."""
    cents_vals = [1, 2, 3, 4, 127, 128, 1023, 1024]
    rows = [(i, 0, c / 100.0) for i, c in enumerate(cents_vals)]
    _write_orders_simple(str(tmp_path), rows)
    out = {
        r["log2_bucket"]: r
        for r in REG["log2_value_histogram"].fn(spark, str(tmp_path)).collect()
    }
    assert out[0]["n_orders"] == 1  # 1
    assert out[1]["n_orders"] == 2  # 2, 3
    assert out[2]["n_orders"] == 1  # 4
    assert out[6]["max_cents"] == 127
    assert out[7]["min_cents"] == 128
    assert out[9]["min_cents"] == 1023 and out[9]["max_cents"] == 1023
    assert out[10]["min_cents"] == 1024
