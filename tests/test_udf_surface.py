"""§2.11 UDF surface: when semantics outgrow built-in expressions, the
sanctioned path is Arrow-batched pandas UDFs — and they must agree with the
JVM-side expression exactly. This pins the extension point the reference
implements as a custom DataSetIterator (Word2VecTransformingIterator.java:
24-259)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from distributed_deep_learning_with_apache_spark_spark.functions.arrays import (
    as_double,
    cosine,
    dot,
)
from distributed_deep_learning_with_apache_spark_spark.sources.catalog import load_table


def test_pandas_udf_dot_matches_jvm_expression(spark, sf_dir):
    @F.pandas_udf(T.DoubleType())
    def np_dot(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(
            [float(np.dot(np.asarray(x, dtype=float), np.asarray(y, dtype=float))) for x, y in zip(a, b)]
        )

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    )
    both = e.select(
        "vec_id",
        F.round(dot(F.col("v"), F.col("v")), 9).alias("jvm"),
        F.round(np_dot(F.col("v"), F.col("v")), 9).alias("py"),
    )
    assert both.filter(F.col("jvm") != F.col("py")).count() == 0


def test_grouped_apply_in_pandas_matches_window(spark, sf_dir):
    # applyInPandas per-group rank ≡ rank window (the custom-operator escape
    # hatch must agree with the declarative form).
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")

    def per_group_top3(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True]).head(3)
        return out

    via_pandas = {
        (r.o_custkey, r.o_orderkey)
        for r in o.groupBy("o_custkey")
        .applyInPandas(per_group_top3, "o_custkey long, o_orderkey long, o_totalprice double")
        .collect()
    }
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    via_window = {
        (r.o_custkey, r.o_orderkey)
        for r in o.withColumn("rn", F.row_number().over(w)).filter("rn <= 3").collect()
    }
    assert via_pandas == via_window


def test_apply_in_pandas_merge_asof_matches_window_asof(spark, sf_dir):
    # The guide's alternative as-of realization (pd.merge_asof per group via
    # applyInPandas) must agree with the union+last_value window form.
    from distributed_deep_learning_with_apache_spark_spark.registry import load_all

    window_form = {
        (r.event_id, r.o_orderkey)
        for r in load_all()["asof_join_latest_order"].fn(spark, sf_dir).collect()
    }

    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    both = e.selectExpr(
        "user_id AS k", "ts AS t", "event_id", "CAST(NULL AS BIGINT) AS o_orderkey", "0 AS side"
    ).unionByName(
        o.selectExpr("o_custkey AS k", "o_orderdate AS t", "CAST(NULL AS BIGINT) AS event_id",
                     "o_orderkey", "1 AS side")
    )

    def per_key_asof(pdf):
        ev = pdf[pdf.side == 0][["event_id", "t"]].sort_values("t")
        od = (
            pdf[pdf.side == 1][["o_orderkey", "t"]]
            .sort_values(["t", "o_orderkey"])  # ties: max orderkey wins via last position
        )
        if ev.empty or od.empty:
            return ev.iloc[0:0][["event_id"]].assign(o_orderkey=[])
        m = pd.merge_asof(ev, od, on="t", direction="backward")
        out = m.dropna(subset=["o_orderkey"])[["event_id", "o_orderkey"]]
        out["o_orderkey"] = out["o_orderkey"].astype("int64")
        return out

    pandas_form = {
        (r.event_id, r.o_orderkey)
        for r in both.groupBy("k")
        .applyInPandas(per_key_asof, "event_id long, o_orderkey long")
        .collect()
    }
    assert pandas_form == window_form


def test_iterator_udf_amortizes_init_across_batches(spark):
    """r5: the Iterator form must run its init site once per
    partition-stream while consuming many Arrow batches — distinct init
    ids ≤ partitions, and each init sees ≥5 batches at batch size 10."""
    import uuid
    from collections import defaultdict
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def tag(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        init = uuid.uuid4().hex  # once per partition-stream
        for i, s in enumerate(batches):
            yield pd.Series([f"{init}:{i}"] * len(s))

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "10")
    try:
        rows = spark.range(100).repartition(2).select(tag("id").alias("t")).collect()
    finally:
        spark.conf.set(key, old)
    per_init = defaultdict(set)
    for r in rows:
        init, i = r.t.split(":")
        per_init[init].add(int(i))
    assert len(per_init) <= 2, per_init.keys()
    assert max(max(v) for v in per_init.values()) >= 4, per_init


def test_apply_in_arrow_matches_builtin_agg(spark, sf_dir):
    """r5: the applyInArrow grouped-map must agree with the built-in
    aggregate twin on every customer."""
    from distributed_deep_learning_with_apache_spark_spark.registry import load_all

    got = {
        r.o_custkey: (r.n_orders, r.total_cents)
        for r in load_all()["grouped_apply_in_arrow"].fn(spark, sf_dir).collect()
    }
    want = {
        r.o_custkey: (r.n, r.c)
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.floor(F.col("o_totalprice") * 10000 + 0.5).cast("long")).alias("c"),
        )
        .collect()
    }
    assert got == want
