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
