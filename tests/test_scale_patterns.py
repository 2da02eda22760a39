"""Scale-pattern equivalence tests: the rewrites you deploy at 100 TB must
be result-identical to their straightforward forms at test scale.

- Salted join ≡ plain join (hot-key mitigation)
- Multi-probe ANN recall ≥ single-probe recall (and both ⊆ exact's universe)
- foreachBatch streaming sink lands every row exactly once
"""

import pytest
from pyspark.sql import functions as F

from distributed_deep_learning_with_apache_spark_spark.registry import load_all
from distributed_deep_learning_with_apache_spark_spark.sources.catalog import (
    TABLE_SCHEMAS,
    load_table,
)

REG = load_all()
SALT = 8


def test_salted_join_matches_plain_join(spark, sf_dir):
    # Replicate-the-build-side salting: each order row is duplicated SALT
    # times with salt s; each event row gets salt hash(event_id)%SALT —
    # the classic hot-key defuser. Result must equal the plain join.
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")

    plain = (
        e.join(o, e.user_id == o.o_custkey)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )

    o_salted = o.withColumn("salt", F.explode(F.lit(list(range(SALT)))))
    e_salted = e.withColumn("salt", F.pmod(F.col("event_id"), F.lit(SALT)).cast("int"))
    salted = (
        e_salted.join(
            o_salted, (e_salted.user_id == o_salted.o_custkey) & (e_salted.salt == o_salted.salt)
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_multiprobe_recall_dominates_single_probe(spark, sf_dir):
    exact = {(r.query_id, r.neighbor_id) for r in REG["cosine_topk_exact"].fn(spark, sf_dir).collect()}
    single = {(r.query_id, r.neighbor_id) for r in REG["ann_lsh_bucketed"].fn(spark, sf_dir).collect()}
    multi = {(r.query_id, r.neighbor_id) for r in REG["ann_lsh_multiprobe"].fn(spark, sf_dir).collect()}
    assert len(multi & exact) >= len(single & exact)


def test_foreach_batch_sink_exactly_once(spark, sf_dir, tmp_path):
    out = str(tmp_path / "batches")
    counts = []

    def sink(batch_df, epoch_id):
        batch_df.write.mode("append").parquet(out)
        counts.append(batch_df.count())

    stream = (
        spark.readStream.schema(TABLE_SCHEMAS["events"])
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select("event_id", "user_id")
    )
    q = stream.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    written = spark.read.parquet(out)
    expected = load_table(spark, sf_dir, "events").count()
    assert written.count() == expected == sum(counts)
    assert written.select("event_id").distinct().count() == expected


def test_join_falls_back_to_sort_merge_without_broadcast(spark, sf_dir):
    """Cluster resilience: with autoBroadcastJoinThreshold off and no
    broadcast hint, the customer⋈orders join must plan as a sort-merge
    join (the strategy that survives when neither side fits in memory)
    and produce identical results to the broadcast plan."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    joined = c.join(o, c.c_custkey == o.o_custkey).groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        smj = c.join(o, c.c_custkey == o.o_custkey).groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
        )
        smj.count()  # finalize AQE plan
        plan = smj._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan and "BroadcastHashJoin" not in plan
        assert sorted(map(tuple, smj.collect())) == sorted(map(tuple, joined.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_frame_sample_kernel_matches_numpy_reference(spark, sf_dir):
    """The stubbed frame feature (mean byte per 64-byte frame) must match
    a driver-side NumPy computation on the same payloads."""
    import numpy as np

    from distributed_deep_learning_with_apache_spark_spark.sources.binary import (
        FRAME_STRIDE,
        sample_frames_df,
    )

    got = {
        (r.doc_id, r.frame_idx): r.frame_mean
        for r in sample_frames_df(spark, sf_dir).filter(F.col("doc_id") < 20).collect()
    }
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20).collect()
    assert got
    for row in docs:
        arr = np.frombuffer(row.text.encode("utf-8"), dtype=np.uint8)
        for i in range(min(4, (len(arr) + FRAME_STRIDE - 1) // FRAME_STRIDE)):
            seg = arr[i * FRAME_STRIDE : (i + 1) * FRAME_STRIDE]
            assert abs(got[(row.doc_id, i)] - float(seg.mean())) < 1e-5


def test_rate_source_unbounded_stream(spark):
    """True unbounded source: the rate source emits rows forever; the query
    is stopped by the harness, not by source exhaustion — the shape every
    Kafka-style deployment has. Asserts micro-batches actually progressed."""
    import time

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "200")
        .load()
        .withColumn("bucket", F.col("value") % 4)
        .groupBy("bucket")
        .count()
    )
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("rate_sink")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.table("rate_sink").count() > 0:
                break
            time.sleep(0.5)
        assert spark.table("rate_sink").count() > 0
        assert q.isActive
    finally:
        q.stop()


def test_aqe_splits_skewed_join_partitions(spark):
    """At 100 TB a hot join key is routine; the engine's answer is AQE's
    runtime skew-join splitting. Force tiny skew thresholds on a join
    where 80% of the left side shares one key and assert the FINAL
    adaptive plan carries the skew=true sort-merge-join marker — i.e. the
    hot partition was actually split, not just tolerated."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 < 8, 0).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 2_000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
        j = left.join(right, "k")
        n = len(j.collect())  # same Dataset: its QueryExecution holds the final plan
        assert n == 160_400
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "AQE did not split the hot partition"
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_join_injection(spark, sf_dir):
    """The third runtime-filtering tier after predicate pushdown and DPP:
    with a selective dimension-side filter on a shuffle join, Spark can
    inject a Bloom filter built from the small side into the big side's
    scan — at 100 TB this prunes most fact rows BEFORE the exchange.
    Forced on here (thresholds lowered) and asserted in the executed plan."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_totalprice") > 290000
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            "l_orderkey", "l_extendedprice", "o_totalprice"
        )
        assert len(j.collect()) > 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloomfilter" in plan.lower().replace("_", ""), "bloom filter not injected"
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_converts_smj_to_broadcast_at_runtime(spark, sf_dir):
    """Static planning can't see post-filter sizes; AQE can. With static
    broadcast disabled (threshold -1) but the ADAPTIVE threshold set, a
    selectively-filtered join side must be converted to a broadcast join
    at runtime from its actual shuffle statistics."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "10MB",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_totalprice") > 350000
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            "l_orderkey", "o_totalprice"
        )
        assert len(j.collect()) >= 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "BroadcastHashJoin" in plan, "AQE did not convert the join"
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
