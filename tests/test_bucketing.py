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
