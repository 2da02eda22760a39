"""SQL API parity (register_views + spark.sql ≡ DataFrame API — same
Catalyst plan, SURVEY §3 note) and sink coverage (S13 collect boundary,
partitioned parquet write/read-back — the scale-out analog of S14/S15
result persistence)."""

import pytest
from pyspark.sql import functions as F

from distributed_deep_learning_with_apache_spark_spark.plans import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    explain_summary,
)
from distributed_deep_learning_with_apache_spark_spark.registry import load_all
from distributed_deep_learning_with_apache_spark_spark.sources.catalog import (
    load_table,
    register_views,
)

REG = load_all()


def test_sql_api_matches_dataframe_api(spark, sf_dir):
    register_views(spark, sf_dir)
    sql_rows = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_extendedprice), 2) AS revenue
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        """
    ).collect()
    df_rows = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("revenue"))
        .collect()
    )
    assert sorted(map(tuple, sql_rows)) == sorted(map(tuple, df_rows))


def test_sql_over_registered_views_runs_registry_query(spark, sf_dir):
    register_views(spark, sf_dir)
    out = spark.sql("SELECT count(*) AS n FROM orders WHERE o_orderstatus = 'O'").first()
    assert out.n > 0


def test_partitioned_parquet_sink_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "pricing_by_flag")
    df = REG["pricing_summary"].fn(spark, sf_dir)
    df.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == df.count()
    # partition pruning works on the written layout
    pruned = back.filter(F.col("l_returnflag") == "A")
    assert pruned.count() == df.filter(F.col("l_returnflag") == "A").count()
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(l_returnflag" in plan


def test_plan_helpers_on_registry_queries(spark, sf_dir):
    df = REG["revenue_per_customer"].fn(spark, sf_dir)
    assert_broadcast_join(df)
    assert_no_cartesian(df)
    assert_pushed_filters(
        REG["pricing_summary"].fn(spark, sf_dir), "LessThanOrEqual(l_shipdate"
    )
    s = explain_summary(df)
    assert s["parquet_scans"] >= 2


def test_stream_static_enrich_matches_batch_twin(spark, sf_dir):
    """The streaming enrichment (stream ⋈ broadcast dim per micro-batch)
    must produce exactly the batch join's rollup once the bounded fixture
    stream drains — one pipeline definition, two execution modes."""
    from distributed_deep_learning_with_apache_spark_spark.registry import load_all

    reg = load_all()
    got = sorted(map(tuple, reg["stream_static_enrich"].fn(spark, sf_dir).collect()))
    want = sorted(map(tuple, reg["events_enriched_by_segment"].fn(spark, sf_dir).collect()))
    assert got == want
