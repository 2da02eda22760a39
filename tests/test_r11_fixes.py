"""Round-11 hardening (the r10 VERDICT's item 5 + all four ADVICE lows):

1. `ntile_frontiers` NULL contract: a NULL value_col raises loudly
   (folded into the per-value stats aggregate — zero extra jobs) instead
   of silently landing every NULL row in tile 1.
2. The correctness gates inside `ntile_frontiers` are explicit raises,
   not `assert` (python -O must never strip them).
3. The oversized-tie-block fallback is AUTOMATIC: blocks larger than
   `TIE_BLOCK_TASK_ROWS` route through a per-block `global_row_ranks`
   pass, and the module counter proves it was taken — exercised both
   directly and through the registered `quality_tiers` /
   `customer_rfm_segments` paths on forced-skew corpora, hash-checked
   against DuckDB throughout.
4. The r10 assert_true guards are NULL-pass-through where SQL propagates
   NULL (interval pro-ration cents, business-day dates) and NULL-reject
   where NULL is an identity-contract violation (bitmaps — pinned in
   test_r10_fixes.py already).
"""

import datetime as dt
import tempfile

import duckdb
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

import distributed_deep_learning_with_apache_spark_spark.operators.ranks as ranks
from distributed_deep_learning_with_apache_spark_spark.registry import load_all
from tests.oracle import compare

REG = load_all()


# ---------------------------------------------------------------------------
# ntile_frontiers unit surface
# ---------------------------------------------------------------------------
def test_ntile_frontiers_null_value_raises(spark):
    df = spark.createDataFrame([(1, 1), (None, 2), (3, 3)], "v int, tb int")
    with pytest.raises(ValueError, match="NULL"):
        ranks.ntile_frontiers(spark, df, "v", True, "tb", 2)


def _engine_ntile_mismatches(spark, df, asc, k, frontiers):
    scored = df.withColumn("tile", ranks.ntile_score_expr("v", asc, "tb", frontiers))
    order = [F.col("v").asc() if asc else F.col("v").desc(), F.col("tb").asc()]
    truth = df.withColumn("tile_t", F.ntile(k).over(Window.orderBy(*order)))
    return (
        scored.join(truth, ["v", "tb"])
        .filter(F.col("tile") != F.col("tile_t"))
        .count()
    )


def test_ntile_frontiers_fallback_taken_and_exact(spark):
    """A value holding 2/3 of the corpus (the pathological tie block the
    r10 docstring documented) with a threshold forcing the fallback: the
    per-block global_row_ranks path must fire AND produce tile
    assignments identical to the engine's own ntile."""
    rows = [(5, i) for i in range(200)] + [(i % 4, 1000 + i) for i in range(100)]
    df = spark.createDataFrame(rows, "v int, tb int")
    before = ranks._fallback_block_probes
    n, fr = ranks.ntile_frontiers(
        spark, df, "v", True, "tb", 4, tie_block_task_rows=50
    )
    assert ranks._fallback_block_probes > before, "fallback was not taken"
    assert n == 300
    assert _engine_ntile_mismatches(spark, df, True, 4, fr) == 0


@pytest.mark.parametrize(
    "rows,asc,k",
    [
        ([(7, i) for i in range(20)], False, 4),  # ALL values equal
        ([(1, 1), (2, 2)], False, 5),  # n < k
        ([(9, i) for i in range(50)] + [(1, 100)], True, 3),  # giant block + 1
    ],
)
def test_ntile_frontiers_hostile_shapes_match_engine(spark, rows, asc, k):
    df = spark.createDataFrame(rows, "v int, tb int")
    _n, fr = ranks.ntile_frontiers(spark, df, "v", asc, "tb", k)
    assert _engine_ntile_mismatches(spark, df, asc, k, fr) == 0


# ---------------------------------------------------------------------------
# Forced-skew corpora through the REGISTERED query paths (hash-checked)
# ---------------------------------------------------------------------------
def _docs_dir(spark, texts):
    d = tempfile.mkdtemp(prefix="sg_r11tiers_")
    spark.createDataFrame(
        [(i, t, "en", f"src{i % 2}", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    return d


def test_quality_tiers_giant_tie_block_takes_fallback_and_matches_oracle(
    spark, monkeypatch
):
    """40 identical documents (one tie block holding ~90% of the corpus)
    + a handful of distinct lengths, with the task threshold tuned down
    so the skew fallback MUST fire inside the registered query — and the
    result still hash-matches DuckDB's ntile."""
    monkeypatch.setattr(ranks, "TIE_BLOCK_TASK_ROWS", 8)
    texts = ["spark hash join scan"] * 40 + ["a" * (i + 1) for i in range(4)]
    d = _docs_dir(spark, texts)
    before = ranks._fallback_block_probes
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    try:
        q = REG["quality_tiers"]
        ok, msg = compare(q.fn(spark, d), con, q.oracle)
        assert ok, msg
    finally:
        con.close()
    assert ranks._fallback_block_probes > before, "fallback not taken in quality_tiers"


def _orders_dir(spark, orders_rows):
    d = tempfile.mkdtemp(prefix="sg_r11rfm_")
    spark.createDataFrame(
        orders_rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp")).coalesce(
        1
    ).write.mode("overwrite").parquet(d + "/orders.parquet")
    return d


def test_rfm_fully_tied_axes_take_fallback_and_match_oracle(spark, monkeypatch):
    """Every customer has ONE order, the SAME price, the SAME date: all
    three RFM axes are one giant tie block each, so every quartile edge
    falls strictly inside a block — the worst case for the probe. With
    the threshold forced down, all probes route through the fallback and
    the (r,f,m) cells still hash-match the ANSI ntile oracle."""
    monkeypatch.setattr(ranks, "TIE_BLOCK_TASK_ROWS", 5)
    rows = [
        (i, i, "O", 1000.0, dt.date(1995, 3, 15), "1-URGENT") for i in range(30)
    ]
    d = _orders_dir(spark, rows)
    before = ranks._fallback_block_probes
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{d}/orders.parquet/*.parquet')"
    )
    try:
        q = REG["customer_rfm_segments"]
        ok, msg = compare(q.fn(spark, d), con, q.oracle)
        assert ok, msg
    finally:
        con.close()
    assert ranks._fallback_block_probes > before, "fallback not taken in RFM"


def test_rfm_and_tiers_default_threshold_fixture_parity(spark, sf_dir):
    """With the DEFAULT threshold (fallback never needed at fixture
    scale) both rewrites still hash-match — the standing guarantee the
    r10 driver rows pinned, re-asserted on the hardened code."""
    import os

    con = duckdb.connect()
    for t in ("orders", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(sf_dir, t)}.parquet')"
        )
    try:
        for name in ("customer_rfm_segments", "quality_tiers"):
            q = REG[name]
            ok, msg = compare(q.fn(spark, sf_dir), con, q.oracle)
            assert ok, f"{name}: {msg}"
    finally:
        con.close()


# ---------------------------------------------------------------------------
# NULL-pass-through guards (ADVICE #3): NULL propagates like SQL, only a
# definitely-violating value raises.
# ---------------------------------------------------------------------------
def _orders_lineitem_dir(spark, orders_rows, lineitem_rows):
    d = tempfile.mkdtemp(prefix="sg_r11null_")
    spark.createDataFrame(
        orders_rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp")).coalesce(
        1
    ).write.mode("overwrite").parquet(d + "/orders.parquet")
    spark.createDataFrame(
        lineitem_rows, "l_orderkey long, l_shipdate date"
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp")).coalesce(
        1
    ).write.mode("overwrite").parquet(d + "/lineitem.parquet")
    return d


def test_interval_overlap_null_totalprice_propagates_not_raises(spark):
    rows_o = [
        (1, 1, "O", None, dt.date(1995, 1, 10), "1-URGENT"),
        (2, 1, "O", 150.0, dt.date(1995, 2, 10), "1-URGENT"),
    ]
    rows_l = [(1, dt.date(1995, 3, 5)), (2, dt.date(1995, 4, 5))]
    d = _orders_lineitem_dir(spark, rows_o, rows_l)
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet/*.parquet')"
        )
    try:
        q = REG["interval_month_overlap_revenue"]
        out = q.fn(spark, d)
        out.collect()  # must NOT raise on the NULL price
        ok, msg = compare(q.fn(spark, d), con, q.oracle)
        assert ok, msg
    finally:
        con.close()


def test_interval_overlap_negative_totalprice_still_raises(spark):
    rows_o = [(1, 1, "O", -5.0, dt.date(1995, 1, 10), "1-URGENT")]
    rows_l = [(1, dt.date(1995, 3, 5))]
    d = _orders_lineitem_dir(spark, rows_o, rows_l)
    with pytest.raises(Exception, match="negative order revenue"):
        REG["interval_month_overlap_revenue"].fn(spark, d).collect()


def test_business_days_null_shipdate_propagates_not_raises(spark):
    rows_o = [
        (1, 1, "O", 100.0, dt.date(1995, 1, 10), "1-URGENT"),
        (2, 1, "O", 100.0, dt.date(1995, 2, 10), "1-URGENT"),
    ]
    rows_l = [(1, None), (2, dt.date(1995, 2, 20))]
    d = _orders_lineitem_dir(spark, rows_o, rows_l)
    out = REG["business_days_to_ship"].fn(spark, d)
    out.collect()  # must NOT raise on the NULL ship date
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet/*.parquet')"
        )
    try:
        q = REG["business_days_to_ship"]
        ok, msg = compare(q.fn(spark, d), con, q.oracle)
        assert ok, msg
    finally:
        con.close()


def test_business_days_pre_epoch_still_raises(spark):
    rows_o = [(1, 1, "O", 100.0, dt.date(1899, 12, 25), "1-URGENT")]
    rows_l = [(1, dt.date(1995, 1, 3))]
    d = _orders_lineitem_dir(spark, rows_o, rows_l)
    with pytest.raises(Exception, match="precedes BD_EPOCH"):
        REG["business_days_to_ship"].fn(spark, d).collect()
