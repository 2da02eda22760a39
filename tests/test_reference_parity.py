"""Chapter-1 parity: the exact RDD chain from the reference's only Spark
test (`SparkRDDAPITest.scala:12-81`), re-expressed as DataFrames, with the
print-and-eyeball actions turned into assertions (the reference has none —
SURVEY §5).

Data: 5 UserTransactions — A×4 {1001,100,102,1}, B×1 {13}
(`SparkRDDAPITest.scala:12-18,85`). Chain: filter(contains "A") → keyBy →
map(amount) → 9 actions; then the cached variant (`:63-81`).
"""

import pytest
from pyspark.sql import functions as F

ROWS = [("A", 1001), ("AA", 100), ("AA", 102), ("A", 1), ("B", 13)]


@pytest.fixture(scope="module")
def tx(spark):
    return spark.createDataFrame(ROWS, "userId string, amount int")


@pytest.fixture(scope="module")
def amounts(tx):
    # filter (P1) → keyBy (P2) → project amount (P3)
    return (
        tx.filter(F.col("userId").contains("A"))
        .select(F.col("userId").alias("key"), F.struct("userId", "amount").alias("tx"))
        .select(F.col("tx.amount").alias("amount"))
    )


def test_collect(amounts):  # SparkRDDAPITest.scala:31
    assert sorted(r.amount for r in amounts.collect()) == [1, 100, 102, 1001]


def test_count(amounts):  # :32 (A1)
    assert amounts.count() == 4


def test_first(amounts):  # :33 (O1)
    assert amounts.first().amount == 1001


def test_foreach_partition(amounts):  # :35 — per-partition execution exists
    n_parts = amounts.rdd.getNumPartitions()
    assert n_parts >= 1


def test_max_min(amounts):  # :36-37 (A2)
    row = amounts.agg(F.max("amount").alias("mx"), F.min("amount").alias("mn")).first()
    assert (row.mx, row.mn) == (1001, 1)


def test_take_ordered(amounts):  # :38 (O2)
    assert amounts.orderBy("amount").limit(1).first().amount == 1


def test_take_sample(amounts):  # :39 (O3) — seeded, exact size, subset
    sample = amounts.orderBy(F.rand(42)).limit(2).collect()
    assert len(sample) == 2
    assert {r.amount for r in sample} <= {1, 100, 102, 1001}


def test_cached_chain_matches_uncached(amounts):  # :63-81 — cache correctness
    uncached = {
        "collect": sorted(r.amount for r in amounts.collect()),
        "count": amounts.count(),
        "max": amounts.agg(F.max("amount")).first()[0],
    }
    cached = amounts.cache()
    try:
        cached.count()  # materialize
        assert sorted(r.amount for r in cached.collect()) == uncached["collect"]
        assert cached.count() == uncached["count"]
        assert cached.agg(F.max("amount")).first()[0] == uncached["max"]
        assert cached.storageLevel.useMemory
    finally:
        cached.unpersist()


def test_union_vstack(spark):  # ND4JTest.java:56 (U2)
    a = spark.createDataFrame([(1.0, 2.0, 3.0)], "x double, y double, z double")
    b = spark.createDataFrame([(4.0, 5.0, 6.0)], "x double, y double, z double")
    assert a.union(b).count() == 2


def test_random_split_deterministic(tx):  # MNISTAnomalyDetector.java:71 (U4)
    t1, v1 = tx.randomSplit([0.8, 0.2], seed=12345)
    t2, v2 = tx.randomSplit([0.8, 0.2], seed=12345)
    assert t1.count() == t2.count() and v1.count() == v2.count()
    assert t1.count() + v1.count() == 5
