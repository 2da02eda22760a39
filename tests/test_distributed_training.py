"""Parameter-averaging distributed trainer: convergence + determinism +
the chapter-6 epoch-sweep experiment, with metric thresholds (the
reference eyeballs 0.111+0.333≈0.444 — chapter_5/...Regression.java:45-53)."""

import pytest
from pyspark.sql import functions as F

from distributed_deep_learning_with_apache_spark_spark.ml.distributed import (
    DistributedMLPRegressor,
)
from distributed_deep_learning_with_apache_spark_spark.ml.distributed import make_chapter5_dataset

SCALE = 3.0  # inputs are [0,3) per chapter-5; scaled to [0,1) for tanh


@pytest.fixture(scope="module")
def sum_data(spark):
    return (
        make_chapter5_dataset(spark)
        .select(
            "id",
            F.array(F.col("a") / SCALE, F.col("b") / SCALE).cast("array<double>").alias("features"),
            ((F.col("a") + F.col("b")) / SCALE).alias("label"),
        )
        .repartition(8)
        .cache()
    )


def _mae(model, data):
    return (
        model.transform(data)
        .agg(F.avg(F.abs(F.col("prediction") - F.col("label"))))
        .first()[0]
    )


def test_converges_on_sum_task(spark, sum_data):
    model = DistributedMLPRegressor(layers=[2, 8, 1], epochs=20, lr=0.1, batch_size=32, seed=42).fit(
        sum_data
    )
    assert model.loss_history[-1] < model.loss_history[0] / 10, model.loss_history
    assert _mae(model, sum_data) * SCALE < 0.25  # unscaled MAE on targets up to ~6
    # the reference's spot check: predict 0.111.. + 0.333.. ≈ 0.444
    probe = spark.createDataFrame(
        [([0.111111 / SCALE, 0.333333 / SCALE],)], "features array<double>"
    )
    pred = model.transform(probe).first().prediction * SCALE
    assert pred == pytest.approx(0.444444, abs=0.3)


def test_training_is_deterministic(spark, sum_data):
    m1 = DistributedMLPRegressor(layers=[2, 4, 1], epochs=3, lr=0.1, seed=7).fit(sum_data)
    m2 = DistributedMLPRegressor(layers=[2, 4, 1], epochs=3, lr=0.1, seed=7).fit(sum_data)
    assert m1.loss_history == m2.loss_history


def test_epoch_sweep_improves(spark, sum_data):
    # chapter-6 SumNumberOfIterations.java:34-48: more epochs → better fit
    maes = []
    for epochs in [2, 20]:
        m = DistributedMLPRegressor(
            layers=[2, 8, 1], epochs=epochs, lr=0.1, batch_size=32, seed=42
        ).fit(sum_data)
        maes.append(_mae(m, sum_data))
    assert maes[1] < maes[0]


def test_autoencoder_learns_reconstruction(spark, sf_dir):
    """ML2 mechanism: training must reduce reconstruction error vs the
    untrained network, and the flagship query must produce a valid
    per-label best/worst-5."""
    import numpy as np
    import pyspark.sql.functions as F

    from distributed_deep_learning_with_apache_spark_spark.ml.distributed import (
        DistributedAutoencoder,
    )
    from distributed_deep_learning_with_apache_spark_spark.registry import load_all
    from distributed_deep_learning_with_apache_spark_spark.sources.catalog import load_table

    e = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("features")
    )
    model = DistributedAutoencoder(layers=[64, 16, 4, 16, 64], epochs=30, lr=0.02).fit(
        e.repartition(8)
    )
    assert model.loss_history[-1] < model.loss_history[0] * 0.9, model.loss_history

    out = load_all()["ml_anomaly_autoencoder"].fn(spark, sf_dir).collect()
    assert {r.label for r in out} == set(range(10))
    assert all(r.score >= 0 for r in out)
    from collections import Counter

    per = Counter(r.label for r in out)
    assert all(c <= 10 for c in per.values())
