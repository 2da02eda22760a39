"""Structural contracts for round-6 operators (oracle parity lives in
test_oracle_parity.py + the frozen R6_ORACLE driver-sf list)."""

import os

import pytest
from pyspark.sql import functions as F

from distributed_deep_learning_with_apache_spark_spark.operators import curation, dedup
from distributed_deep_learning_with_apache_spark_spark.registry import load_all
from distributed_deep_learning_with_apache_spark_spark.sources.catalog import load_table

REG = load_all()


# ---------------------------------------------------------------------------
# near_dup_incremental: persisted band index mechanics
# ---------------------------------------------------------------------------
def test_incremental_split_matches_exact_dedup_split():
    """The near-dup incremental split must equal dedup_incremental's split
    (the constant lives in dedup.py because curation imports dedup)."""
    assert dedup.INC_HIST_MOD == curation.HIST_MOD
    assert dedup.INC_HIST_KEEP == 8


def test_band_index_build_is_idempotent(spark, sf_dir):
    """Second build must hit the _INDEX_COMPLETE marker: same root, no
    re-write (store mtimes untouched) — the train-once contract."""
    root = dedup.build_band_index(spark, sf_dir)
    marker = os.path.join(root, "_INDEX_COMPLETE")
    assert os.path.exists(marker)
    mtimes = {
        p: os.stat(os.path.join(root, p)).st_mtime_ns
        for p in ("bands", "shingles", "_INDEX_COMPLETE")
    }
    root2 = dedup.build_band_index(spark, sf_dir)
    assert root2 == root
    for p, m in mtimes.items():
        assert os.stat(os.path.join(root, p)).st_mtime_ns == m


def test_band_index_holds_history_only(spark, sf_dir):
    """The store must contain ONLY history docs (doc_id % MOD < KEEP) —
    a batch doc leaking in would make it dedup against itself."""
    root = dedup.build_band_index(spark, sf_dir)
    for sub in ("bands", "shingles"):
        df = spark.read.parquet(os.path.join(root, sub))
        leaked = df.filter(
            F.col("doc_id") % dedup.INC_HIST_MOD >= dedup.INC_HIST_KEEP
        ).count()
        assert leaked == 0, f"{sub} holds {leaked} batch docs"


def test_incremental_never_emits_verified_history_dups(spark, sf_dir):
    """Cross-check against the full-corpus pipeline: any batch doc that
    near_dup_minhash_verified pairs (jaccard >= 0.5) with a HISTORY doc
    must be absent from near_dup_incremental's fresh set."""
    fresh = {
        r["doc_id"] for r in REG["near_dup_incremental"].fn(spark, sf_dir).collect()
    }
    pairs = REG["near_dup_minhash_verified"].fn(spark, sf_dir).collect()
    mod, keep = dedup.INC_HIST_MOD, dedup.INC_HIST_KEEP

    def is_batch(i):
        return i % mod >= keep

    batch_dups = set()
    for r in pairs:
        a, b = r["doc_a"], r["doc_b"]
        if is_batch(a) != is_batch(b):  # cross split: one side is history
            batch_dups.add(a if is_batch(a) else b)
    assert fresh.isdisjoint(batch_dups), sorted(fresh & batch_dups)[:5]
    # and the split universe is respected
    assert all(is_batch(i) for i in fresh)


def test_incremental_fresh_includes_zero_candidate_docs(spark, sf_dir):
    """Batch docs with no band collisions at all (n_band_candidates = 0)
    are still emitted — absence from the probe join must not drop them."""
    rows = REG["near_dup_incremental"].fn(spark, sf_dir).collect()
    assert any(r["n_band_candidates"] == 0 for r in rows)
    n_batch = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % dedup.INC_HIST_MOD >= dedup.INC_HIST_KEEP)
        .count()
    )
    assert 0 < len(rows) <= n_batch


# ---------------------------------------------------------------------------
# pagerank fixed-point: oracle-side structure
# ---------------------------------------------------------------------------
def test_pagerank_oracle_materializes_every_round():
    """Every per-round CTE must be MATERIALIZED: DuckDB inlines plain CTEs,
    and r{k} references r{k-1} three times, so un-materialized unrolling
    explodes 3^10 (found as 'Too many open files' + exponential runtime)."""
    from distributed_deep_learning_with_apache_spark_spark.operators.graph import (
        PR_ITERS,
        _pagerank_oracle,
    )

    sql = _pagerank_oracle()
    for k in range(1, PR_ITERS + 1):
        for cte in (f"c{k}", f"d{k}", f"r{k}"):
            assert f"{cte} AS MATERIALIZED" in sql, f"{cte} not materialized"
