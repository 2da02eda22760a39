"""Every registered query with an oracle must match DuckDB on the test SF.

Mirrors the driver's t2 correctness gate (row count + schema + value hash)
so regressions are caught locally first.
"""

import pytest

from distributed_deep_learning_with_apache_spark_spark.registry import load_all
from tests.oracle import (
    compare,
    duck_connect,
    hostile_oracle_columns,
    int_float_mismatches,
)

REG = load_all()
ORACLE_QUERIES = sorted(name for name, q in REG.items() if q.oracle is not None)
ROWS_ONLY = sorted(name for name, q in REG.items() if q.oracle is None)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_output_types_driver_safe(duck, name):
    """No oracle may emit HUGEINT/list/struct columns — the driver's
    pandas-based hasher mangles or rejects them (round-1 lost 5 rows to
    this; this gate keeps the class from reappearing). Spark-side types are
    checked inside compare()."""
    bad = hostile_oracle_columns(duck, REG[name].oracle)
    assert not bad, f"{name} oracle emits driver-hostile columns: {bad}"


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, sf_dir, duck, name):
    q = REG[name]
    df = q.fn(spark, sf_dir)
    ok, msg = compare(df, duck, q.oracle)
    assert ok, f"{name}: {msg}"


def test_int_float_gate_catches_r3_retention_red(spark, sf_dir, duck):
    """Round 3's only driver hash-fail: the retention oracle used DuckDB
    `/` (float division → DOUBLE day_offset) against Spark's BIGINT. Rows
    and row-insensitive string hashes coincided, so the local sweep passed
    while the driver's *typed* pandas hasher failed. Pin that the gate now
    flags the unfixed oracle and that the fixed (floor-division) oracle
    registered today is clean."""
    q = REG["events_retention_cohorts"]
    df = q.fn(spark, sf_dir)
    # The fixed oracle must be gate-clean and hash-match.
    assert int_float_mismatches(df, duck, q.oracle) == []
    ok, msg = compare(df, duck, q.oracle)
    assert ok, msg
    # The round-3 (unfixed) oracle must be flagged by the gate.
    unfixed = q.oracle.replace("// 86400", "/ 86400")
    assert unfixed != q.oracle
    bad = int_float_mismatches(df, duck, unfixed)
    assert bad and "day_offset" in bad[0], bad
    ok, msg = compare(df, duck, unfixed)
    assert not ok and "driver-hostile" in msg


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    q = REG[name]
    df = q.fn(spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert df.columns


@pytest.mark.parametrize("name", ["doc_embedding_avg", "anomaly_best_worst", "tfidf_top_terms"])
def test_run_to_run_determinism(spark, sf_dir, name):
    # The driver hashes results repeatedly; FP-fold queries must return
    # bit-identical values across executions in one session.
    q = REG[name]
    a = sorted(map(tuple, q.fn(spark, sf_dir).collect()))
    b = sorted(map(tuple, q.fn(spark, sf_dir).collect()))
    assert a == b
