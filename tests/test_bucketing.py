"""Bucketing: the co-located-join pattern for repeated fact-fact joins at
scale (PySpark guide: `bucketBy(n, key).saveAsTable` → later joins on key
need no exchange). Asserted here end-to-end: write both fact tables
bucketed on the join key, join them, and require a plan with NO shuffle
exchange — the physical proof that bucketing removes the join shuffle."""

import pytest
from pyspark.sql import functions as F

from distributed_deep_learning_with_apache_spark_spark.sources.catalog import load_table


@pytest.mark.usefixtures("spark")
def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        )
        o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
        for df, name, key in [(li, "li_bucketed", "l_orderkey"), (o, "o_bucketed", "o_orderkey")]:
            (
                df.write.mode("overwrite")
                .bucketBy(8, key)
                .sortBy(key)
                .format("parquet")
                .option("path", str(tmp_path / name))
                .saveAsTable(name)
            )
        joined = (
            spark.table("li_bucketed")
            .join(spark.table("o_bucketed"), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("rev"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # The join itself must not shuffle either side (bucket co-location);
        # only the final tiny aggregation exchanges.
        join_section = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # and it computes the right thing
        expected = (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("rev"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, expected.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        for name in ["li_bucketed", "o_bucketed"]:
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_entry_smoke(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["c_custkey", "c_name", "revenue", "n_orders"]


def test_registered_bucketed_join_plan_and_layout(spark, sf_dir):
    """The registered bucketed_join_revenue query must execute with NO
    exchange on either join key (bucket co-location doing its job) even
    with broadcast disabled, and the bucketed layout on disk must carry
    exactly N_BUCKETS bucket files per table."""
    import glob
    import os

    from distributed_deep_learning_with_apache_spark_spark.registry import load_all
    from distributed_deep_learning_with_apache_spark_spark.sources.lake import (
        N_BUCKETS,
        ensure_bucketed_tables,
    )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        q = load_all()["bucketed_join_revenue"]
        df = q.fn(spark, sf_dir)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        root = ensure_bucketed_tables(spark, sf_dir)
        for name in ("bk_lineitem", "bk_orders"):
            files = [
                f
                for f in glob.glob(os.path.join(root, name, "*.parquet"))
                if not os.path.basename(f).startswith("_")
            ]
            # bucketBy encodes the bucket id as the `_NNNNN` suffix before
            # `.c000` (part-00000-<uuid>_00007.c000.snappy.parquet): the
            # real layout invariant is that every bucket id 0..N-1 exists.
            import re

            buckets = {
                int(m.group(1))
                for f in files
                for m in [re.search(r"_(\d{5})\.c\d+", os.path.basename(f))]
                if m
            }
            assert files, f"no bucket files under {root}/{name}"
            assert buckets == set(range(N_BUCKETS)), (
                f"{name}: bucket ids {sorted(buckets)} != 0..{N_BUCKETS - 1}"
            )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
