"""Round-9b operator hardening beyond oracle parity.

- autocorr_daily_revenue: exact-integer differential — the quantized ACF
  recomputed from the raw daily series with Python big ints (Fraction-free:
  the n-scaling identity keeps everything integral).
- rolling_median_revenue_7d: literal sequential replay of the sliding
  window over the collected daily series.
- haar_wavelet_daily_revenue: the pyramid's defining identities — parent
  approx = left + right child approx, detail = left - right — checked
  across levels from the output alone, plus level 1 vs the raw signal.
- user_event_entropy: ln-quantization guard band scanned over every
  fixture user (the PMI/bigram discipline) + the degenerate bounds.
- bitmap_distinct_users / stream_bitmap_distinct_running: bitmap counts
  equal the naive COUNT(DISTINCT); the stream equals its batch twin.
- abc_pareto_classification: sequential replay of the descending
  cumulative classification; classes partition the catalog.
- allocation_largest_remainder: sums exactly to the budget and satisfies
  quota (every share within one unit of exact proportionality).
"""

import math
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from distributed_deep_learning_with_apache_spark_spark.operators.decision_support import (
    ABC_A_PCT,
    ABC_B_PCT,
    ACF_SCALE,
    ALLOC_BUDGET,
)
from distributed_deep_learning_with_apache_spark_spark.operators.quality import (
    ENTROPY_SCALE,
)
from distributed_deep_learning_with_apache_spark_spark.registry import load_all
from distributed_deep_learning_with_apache_spark_spark.sources.catalog import (
    load_table,
)

DRIVER_SF_DIR = "/root/testdata/sf0.01"
REG = load_all()


def _daily_cents(spark, sf):
    o = load_table(spark, sf, "orders")
    rows = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("cents")
        )
        .collect()
    )  # bounded: the calendar day domain (~2.4k rows)
    return {r["day"]: r["cents"] for r in rows}


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", DRIVER_SF_DIR])
def test_autocorr_matches_exact_bigint_reference(spark, sf):
    """Recompute every lag's ACF from the raw daily series in exact Python
    integers (the same n-scaling identity) and compare the quantized
    output value-for-value."""
    series = _daily_cents(spark, sf)
    n = len(series)
    s = sum(series.values())
    den = sum((n * x - s) ** 2 for x in series.values())
    import datetime

    expect = {}
    for k in range(1, 8):
        num, pairs = 0, 0
        for day, x in series.items():
            nxt = series.get(day + datetime.timedelta(days=k))
            if nxt is not None:
                num += (n * x - s) * (n * nxt - s)
                pairs += 1
        expect[k] = (
            pairs,
            math.floor(float(num) * ACF_SCALE / float(den) + 0.5) / ACF_SCALE,
        )
    out = {
        r["lag"]: (r["n_pairs"], r["acf"])
        for r in REG["autocorr_daily_revenue"].fn(spark, sf).collect()
    }
    assert out == expect
    assert all(-1.0 <= acf <= 1.0 for _, acf in out.values())


def test_rolling_median_matches_sequential_replay(spark):
    series = sorted(_daily_cents(spark, DRIVER_SF_DIR).items())
    expect = {}
    for i, (day, _) in enumerate(series):
        w = sorted(c for _, c in series[max(0, i - 6) : i + 1])
        expect[day] = (len(w), w[(len(w) + 1) // 2 - 1])
    out = {
        r["day"]: (r["n_window"], r["median_cents_7d"])
        for r in REG["rolling_median_revenue_7d"].fn(spark, DRIVER_SF_DIR).collect()
    }
    assert out == expect


def test_haar_pyramid_identities(spark):
    """approx(level L, bucket b) == approx(L-1, 2b) + approx(L-1, 2b+1)
    and detail(L, b) == approx(L-1, 2b) - approx(L-1, 2b+1); level-1
    coefficients reconstruct the raw zero-filled daily signal."""
    out = REG["haar_wavelet_daily_revenue"].fn(spark, DRIVER_SF_DIR).collect()
    approx = {(r["level"], r["bucket"]): r["approx_cents"] for r in out}
    detail = {(r["level"], r["bucket"]): r["detail_cents"] for r in out}
    checked = 0
    for (lvl, b), a in approx.items():
        if lvl == 1:
            continue
        left = approx.get((lvl - 1, 2 * b), 0)
        right = approx.get((lvl - 1, 2 * b + 1), 0)
        assert a == left + right, (lvl, b)
        assert detail[(lvl, b)] == left - right, (lvl, b)
        checked += 1
    assert checked > 100
    # level 1 against the raw signal (zero-filled days)
    series = _daily_cents(spark, DRIVER_SF_DIR)
    import datetime

    epoch = datetime.date(1992, 1, 1)
    day_cents = defaultdict(int)
    for day, c in series.items():
        day_cents[(day - epoch).days] = c
    for (lvl, b), a in approx.items():
        if lvl != 1:
            continue
        left, right = day_cents[2 * b], day_cents[2 * b + 1]
        assert a == left + right
        assert detail[(1, b)] == left - right


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", DRIVER_SF_DIR])
def test_entropy_quantization_guard_band_and_bounds(spark, sf):
    """Every fixture user's H*SCALE must sit >= 1e-6 from an integer (the
    floor cannot flip on a ~1e-12 cross-engine libm disagreement), and the
    entropy obeys its exact bounds: 0 <= H <= ln(n_types)."""
    e = load_table(spark, sf, "events")
    cells = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).collect()  # bounded: |users| x |types|
    per_user = defaultdict(list)
    for r in cells:
        per_user[r["user_id"]].append(r["c"])
    dists = []
    expect = {}
    for u, cs in per_user.items():
        n = sum(cs)
        h = math.log(n) - sum(c * math.log(c) for c in cs) / n
        scaled = h * ENTROPY_SCALE
        # single-type users clamp to EXACT 0 in the operator (both
        # engines): their FP form sits one ulp either side of zero
        expect[u] = (n, len(cs), 0 if len(cs) == 1 else math.floor(scaled))
        # The single-type degenerate sits ON the boundary by construction
        # (H == 0 up to one ulp) — but its sum has exactly ONE term, so
        # Python/Spark/DuckDB evaluate the identical expression with no
        # association freedom and agree bit-for-bit; only multi-term sums
        # (where association can differ ~1e-12) need the guard band.
        if len(cs) > 1:
            frac = scaled % 1.0
            dists.append(0.5 - abs(frac - 0.5))
    if dists:
        assert min(dists) >= 1e-6, f"quantization boundary too close: {min(dists)}"
    out = {
        r["user_id"]: (r["n_events"], r["n_types"], r["entropy_milli"])
        for r in REG["user_event_entropy"].fn(spark, sf).collect()
    }
    assert out == expect
    for n, n_types, h_milli in out.values():
        if n_types == 1:
            assert h_milli == 0  # clamped by the n_types CASE, both engines
        else:
            assert 0 <= h_milli <= math.log(n_types) * ENTROPY_SCALE


def test_bitmap_distinct_equals_naive_count_distinct(spark):
    e = load_table(spark, DRIVER_SF_DIR, "events")
    naive = {
        r["day"]: r["d"]
        for r in e.groupBy(F.to_date("ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    out = {
        r["day"]: r["distinct_users"]
        for r in REG["bitmap_distinct_users"].fn(spark, DRIVER_SF_DIR).collect()
    }
    assert out == naive


def test_stream_bitmap_equals_batch_twin(spark):
    batch = {
        r["day"]: r["distinct_users"]
        for r in REG["bitmap_distinct_users"].fn(spark, DRIVER_SF_DIR).collect()
    }
    stream = {
        r["day"]: r["distinct_users"]
        for r in REG["stream_bitmap_distinct_running"]
        .fn(spark, DRIVER_SF_DIR)
        .collect()
    }
    assert stream == batch


def test_abc_classification_matches_sequential_replay(spark):
    li = load_table(spark, DRIVER_SF_DIR, "lineitem")
    per_part = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("cents")
        )
        .collect()
    )  # bounded at the test SF; the operator itself never collects this
    ranked = sorted(per_part, key=lambda r: (-r["cents"], r["l_partkey"]))
    total = sum(r["cents"] for r in ranked)
    expect = defaultdict(lambda: [0, 0])
    cum = 0
    for r in ranked:
        cum += r["cents"]
        cls = "A" if cum * 100 <= total * ABC_A_PCT else (
            "B" if cum * 100 <= total * ABC_B_PCT else "C"
        )
        expect[cls][0] += 1
        expect[cls][1] += r["cents"]
    out = {
        r["abc_class"]: [r["n_parts"], r["class_cents"]]
        for r in REG["abc_pareto_classification"].fn(spark, DRIVER_SF_DIR).collect()
    }
    assert out == dict(expect)
    assert sum(v[0] for v in out.values()) == len(per_part)


def test_allocation_sums_to_budget_and_satisfies_quota(spark):
    rows = REG["allocation_largest_remainder"].fn(spark, DRIVER_SF_DIR).collect()
    total = sum(r["cents"] for r in rows)
    assert sum(r["alloc_units"] for r in rows) == ALLOC_BUDGET
    for r in rows:
        # Hamilton never violates quota: alloc in {floor(exact), ceil(exact)}
        # — bounds in EXACT integers (cents*B ~ 4e17 > 2^53: float division
        # here would mis-floor, the operator's own `div` rationale)
        num = r["cents"] * ALLOC_BUDGET
        exact_floor = num // total
        exact_ceil = -((-num) // total)
        assert exact_floor <= r["alloc_units"] <= exact_ceil
        assert r["alloc_units"] - r["floor_units"] == r["extra"]
        assert r["extra"] in (0, 1)


def test_prefix_filter_is_lossless_vs_full_posting_join(spark):
    """The PPJoin guarantee, stress-checked independently of the oracle:
    candidates from PREFIX postings must yield exactly the same verified
    pairs as candidates from ALL postings."""
    from distributed_deep_learning_with_apache_spark_spark.operators.dedup import (
        shingles,
    )

    d = load_table(spark, DRIVER_SF_DIR, "documents")
    sh = d.select("doc_id", shingles().alias("sh")).filter(F.size("sh") > 0)
    posting = sh.select("doc_id", F.explode("sh").alias("shingle"))
    a, b = posting.alias("a"), posting.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    union = F.size("sa") + F.size("sb") - inter
    full = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sa")), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sb")), "doc_b")
        .filter(inter * 2 >= union)
        .select("doc_a", "doc_b")
        .collect()
    )
    truth = {(r["doc_a"], r["doc_b"]) for r in full}
    out = {
        (r["doc_a"], r["doc_b"])
        for r in REG["near_dup_prefix_filter_jaccard"].fn(spark, DRIVER_SF_DIR).collect()
    }
    assert out == truth
    assert truth  # non-vacuous: the fixture corpus has >= 1 near-dup pair


def test_prefix_filter_indexes_fewer_postings(spark):
    """The point of the prefix: strictly fewer indexed (doc, token)
    postings than the full posting set, without losing a pair."""
    from distributed_deep_learning_with_apache_spark_spark.operators.dedup import (
        shingles,
    )

    d = load_table(spark, DRIVER_SF_DIR, "documents")
    sh = d.select("doc_id", shingles().alias("sh")).filter(F.size("sh") > 0)
    full_postings = sh.select(F.explode("sh")).count()
    # replicate the operator's prefix stage size bound: sum over docs of
    # |x| - ceil(|x|/2) + 1  ==  sum(floor(|x|/2) + 1)
    expected_prefix = (
        sh.select((F.floor(F.size("sh") / 2) + 1).alias("p"))
        .agg(F.sum("p"))
        .collect()[0][0]
    )
    assert expected_prefix < full_postings


def test_binary_hamming_recall_and_bounds(spark):
    """Hamming in [0, 248]; exactly top-5 per query; recall@5 vs the exact
    cosine top-5 at or above the measured floor (the shortlist width, not
    the code width, is the recall knob — the pin documents the trade)."""
    from distributed_deep_learning_with_apache_spark_spark.operators.similarity import (
        BQ_BITS,
        TOP_K,
    )

    out = REG["ann_binary_hamming"].fn(spark, DRIVER_SF_DIR).collect()
    per_q = defaultdict(set)
    for r in out:
        assert 0 <= r["hamming"] <= BQ_BITS
        per_q[r["query_id"]].add(r["neighbor_id"])
    assert all(len(v) == TOP_K for v in per_q.values())
    exact = defaultdict(set)
    for r in REG["cosine_topk_exact"].fn(spark, DRIVER_SF_DIR).collect():
        exact[r["query_id"]].add(r["neighbor_id"])
    hits = sum(len(per_q[q] & exact[q]) for q in exact)
    recall = hits / sum(len(v) for v in exact.values())
    # measured 0.54 at sf0.01 with the 100-row shortlist (0.40 at 50)
    assert recall >= 0.4, recall


def test_interval_proration_conservation(spark):
    """Per-order invariants replayed from the interval table: month count
    == months(lo..hi); sum of per-month floor pro-rations never exceeds
    the order's cents and falls short by < #months (floor remainders)."""
    o = load_table(spark, DRIVER_SF_DIR, "orders")
    li = load_table(spark, DRIVER_SF_DIR, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    iv = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            "o_orderkey",
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
            F.to_date("o_orderdate").alias("d1"),
        )
        .agg(F.max(F.to_date("l_shipdate")).alias("d2"))
        .select(
            "cents",
            F.least("d1", "d2").alias("lo"),
            F.greatest("d1", "d2").alias("hi"),
        )
        .collect()
    )
    total_by_month = defaultdict(lambda: [0, 0, 0])  # n, covered, prorated
    import datetime

    for r in iv:
        lo, hi, cents = r["lo"], r["hi"], r["cents"]
        total_days = (hi - lo).days + 1
        m = datetime.date(lo.year, lo.month, 1)
        alloc = 0
        while m <= hi:
            nxt = (
                datetime.date(m.year + 1, 1, 1)
                if m.month == 12
                else datetime.date(m.year, m.month + 1, 1)
            )
            last = nxt - datetime.timedelta(days=1)
            ov = (min(hi, last) - max(lo, m)).days + 1
            pr = cents * ov // total_days
            cell = total_by_month[m]
            cell[0] += 1
            cell[1] += ov
            cell[2] += pr
            alloc += pr
            m = nxt
        assert alloc <= cents
    out = {
        r["month"].date() if hasattr(r["month"], "date") else r["month"]: [
            r["n_orders"],
            r["covered_days"],
            r["prorated_cents"],
        ]
        for r in REG["interval_month_overlap_revenue"].fn(spark, DRIVER_SF_DIR).collect()
    }
    assert out == dict(total_by_month)


def test_merkle_levels_consistency_and_tamper_descent(spark):
    """Every internal node equals the sum of its 4 children (counts
    exactly, checksums mod P); the root covers the whole table; and a
    simulated single-leaf divergence is localizable by descending exactly
    one mismatched node per level."""
    from distributed_deep_learning_with_apache_spark_spark.operators.setops import (
        CHK_P,
        MERKLE_FANOUT,
        MERKLE_LEVELS,
    )

    out = REG["merkle_tree_levels"].fn(spark, DRIVER_SF_DIR).collect()
    nodes = {(r["level"], r["node"]): (r["n_rows"], r["checksum"]) for r in out}
    for (lvl, node), (n, chk) in nodes.items():
        if lvl == 0:
            continue
        kids = [
            nodes.get((lvl - 1, MERKLE_FANOUT * node + i), (0, 0))
            for i in range(MERKLE_FANOUT)
        ]
        assert n == sum(k[0] for k in kids)
        assert chk == sum(k[1] for k in kids) % CHK_P
    root = nodes[(MERKLE_LEVELS - 1, 0)]
    assert root[0] == sum(n for (lvl, _), (n, _) in nodes.items() if lvl == 0)
    # tamper one leaf: exactly one node per level must flip, and the
    # descent from the root reaches the tampered leaf
    tampered = {k: list(v) for k, v in nodes.items()}
    leaf = (0, 37)
    tampered[leaf][1] = (tampered[leaf][1] + 1) % CHK_P
    for lvl in range(1, MERKLE_LEVELS):
        parent = (lvl, 37 // MERKLE_FANOUT**lvl)
        tampered[parent][1] = (tampered[parent][1] + 1) % CHK_P
    node = 0
    for lvl in range(MERKLE_LEVELS - 1, 0, -1):
        kids = [
            i
            for i in range(MERKLE_FANOUT)
            if tuple(tampered.get((lvl - 1, MERKLE_FANOUT * node + i), (0, 0)))
            != nodes.get((lvl - 1, MERKLE_FANOUT * node + i), (0, 0))
        ]
        assert len(kids) == 1
        node = MERKLE_FANOUT * node + kids[0]
    assert (0, node) == leaf


def test_business_days_closed_form_matches_day_walk(spark):
    """The closed-form weekday count against a literal per-day walk over
    every distinct (lo, hi) interval in the fixture."""
    import datetime

    o = load_table(spark, DRIVER_SF_DIR, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, DRIVER_SF_DIR, "lineitem").select("l_orderkey", "l_shipdate")
    rows = (
        li.join(o, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.least(F.to_date("o_orderdate"), F.to_date("l_shipdate")).alias("lo"),
            F.greatest(F.to_date("o_orderdate"), F.to_date("l_shipdate")).alias("hi"),
        )
        .collect()
    )
    expect = defaultdict(lambda: [0, None, None])
    for r in rows:
        bd = 0
        d = r["lo"]
        while d < r["hi"]:  # weekdays in [lo, hi)
            if d.weekday() < 5:
                bd += 1
            d += datetime.timedelta(days=1)
        cd = (r["hi"] - r["lo"]).days
        cell = expect[bd]
        cell[0] += 1
        cell[1] = cd if cell[1] is None else min(cell[1], cd)
        cell[2] = cd if cell[2] is None else max(cell[2], cd)
    out = {
        r["business_days"]: [r["n_lines"], r["min_calendar_days"], r["max_calendar_days"]]
        for r in REG["business_days_to_ship"].fn(spark, DRIVER_SF_DIR).collect()
    }
    assert out == {k: list(v) for k, v in expect.items()}


def test_time_decay_halving_semantics(spark):
    """decayed == raw for customers whose orders are all within 364 days
    of the anchor; decayed < raw once an order ages past one half-life;
    and every score replays exactly from the raw rows."""
    o = load_table(spark, DRIVER_SF_DIR, "orders")
    anchor = o.agg(F.max(F.to_date("o_orderdate"))).collect()[0][0]
    rows = o.select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
        F.to_date("o_orderdate").alias("d"),
    ).collect()
    expect = defaultdict(lambda: [0, 0, 0])
    for r in rows:
        age_w = (anchor - r["d"]).days // 364
        cell = expect[r["o_custkey"]]
        cell[0] += 1
        cell[1] += r["cents"]
        cell[2] += r["cents"] >> min(age_w, 62)
    out = {
        r["o_custkey"]: [r["n_orders"], r["raw_cents"], r["decayed_cents"]]
        for r in REG["time_decay_customer_score"].fn(spark, DRIVER_SF_DIR).collect()
    }
    assert out == {k: list(v) for k, v in expect.items()}
    assert any(v[2] < v[1] for v in out.values())  # old revenue decays


def test_stream_bitmap_publish_dirs_are_versioned_and_owned(spark):
    """r10 contract (supersedes the r9 fixed-per-pid path): each
    invocation publishes its word state to its OWN pid-prefixed dir
    (atexit-reclaimed), the lifecycle scratch is still removed, and a
    held result DataFrame stays collectable across a re-invocation
    (pinned end-to-end in tests/test_r10_fixes.py)."""
    import glob
    import os
    import tempfile

    tmp = tempfile.gettempdir()  # the operator builds from here, not /tmp
    # compare against a BEFORE snapshot: a concurrent or pre-fix process
    # may have left dirs this process doesn't own
    scratch_before = set(glob.glob(os.path.join(tmp, "sg_bitmap_stream_*")))
    pub_before = set(glob.glob(os.path.join(tmp, f"sg_bitmap_pub_{os.getpid()}_*")))
    REG["stream_bitmap_distinct_running"].fn(spark, DRIVER_SF_DIR).collect()
    REG["stream_bitmap_distinct_running"].fn(spark, DRIVER_SF_DIR).collect()
    pub_after = set(glob.glob(os.path.join(tmp, f"sg_bitmap_pub_{os.getpid()}_*")))
    assert len(pub_after - pub_before) == 2  # one versioned dir per invocation
    scratch_after = set(glob.glob(os.path.join(tmp, "sg_bitmap_stream_*")))
    assert scratch_after - scratch_before == set()  # no NEW scratch leaked


def test_abc_pareto_has_no_global_order_window(spark):
    """The ABC classifier rides the same distributed prefix-sum as
    gini/decile — gate that no Window executes over a SinglePartition
    exchange (its only windows are the per-value tie-rank blocks and the
    partition-local cumulative sums)."""
    import re

    df = REG["abc_pareto_classification"].fn(spark, DRIVER_SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    bad = []
    for i, ln in enumerate(lines):
        if re.search(r"\bWindow\b", ln):
            block = "\n".join(lines[i : i + 6])
            if "SinglePartition" in block:
                bad.append(block)
    assert not bad, (
        "abc_pareto_classification serializes a Window through one "
        "partition:\n" + "\n".join(bad)
    )
