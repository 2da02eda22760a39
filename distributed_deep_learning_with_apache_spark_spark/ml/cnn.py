"""CNN-capability pipeline: conv feature extraction → MLlib classifier.

SURVEY §7 lists the reference's LeNet-style CNN (ML3,
`MnistClassification.java:90-137`: conv5×5×20 → maxpool → conv5×5×50 →
maxpool → dense → softmax) as the hard part with no MLlib equivalent. This
module closes the capability gap the Spark way: the convolutional feature
extractor runs as an Arrow-batched `mapInPandas` stage (NumPy, vectorized
over the whole batch — the Pandas-UDF analog of a frozen conv backbone),
and the trainable classifier head is MLlib's MultilayerPerceptronClassifier.

Kernels are fixed and deterministic (edge/line/corner detectors) — the
frozen-feature-extractor + trained-head split mirrors how large-scale
pipelines actually use conv backbones on Spark: featurize distributed with
a non-trainable network, train the head with MLlib. (Trainable conv layers
would go through ml/distributed.py's parameter-averaging loop instead.)

Scale posture: featurization is embarrassingly parallel (mapInPandas, no
shuffle, Arrow batches of whole partitions); only the 36-float feature
vectors — 44% smaller than the input — continue into the MLP fit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.catalog import load_table

SEED = 42
SIDE = 8          # 64-dim embedding reshaped to an 8×8 single-channel "image"
N_KERNELS = 4
POOLED = N_KERNELS * 3 * 3  # 4 maps × (6×6 valid conv → 2×2 max-pool → 3×3)

# Deterministic 3×3 kernels: horizontal edge, vertical edge, Laplacian, identity-blur.
KERNELS = [
    [[1, 1, 1], [0, 0, 0], [-1, -1, -1]],
    [[1, 0, -1], [1, 0, -1], [1, 0, -1]],
    [[0, 1, 0], [1, -4, 1], [0, 1, 0]],
    [[1, 2, 1], [2, 4, 2], [1, 2, 1]],
]


def conv_featurize(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """conv3×3×4 (valid) → ReLU → maxpool2×2 over the reshaped 8×8 grid,
    as one Arrow-batched mapInPandas stage. Returns (vec_id, label,
    features array<double>[36]).

    The kernel loop is over 4 kernels only; the batch dimension is fully
    vectorized via sliding_window_view + einsum, so per-row Python cost is
    amortized to nothing (the pickle-by-value closure keeps executors
    import-free).
    """
    out_schema = "vec_id bigint, label int, features array<double>"
    kernels = KERNELS  # captured by value in the closure below

    def batches(it):
        import numpy as np
        import pandas as pd
        from numpy.lib.stride_tricks import sliding_window_view

        ks = np.asarray(kernels, dtype=np.float64)  # [4, 3, 3]
        for pdf in it:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)  # [n, 64]
            imgs = x.reshape(-1, SIDE, SIDE)  # [n, 8, 8]
            win = sliding_window_view(imgs, (3, 3), axis=(1, 2))  # [n, 6, 6, 3, 3]
            conv = np.einsum("nxyij,kij->nkxy", win, ks)  # [n, 4, 6, 6]
            relu = np.maximum(conv, 0.0)
            # 2×2 max-pool, stride 2: [n, 4, 3, 2, 3, 2] → max over the 2×2 cells
            pooled = relu.reshape(-1, N_KERNELS, 3, 2, 3, 2).max(axis=(3, 5))
            feats = pooled.reshape(-1, POOLED)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "label": pdf["label"].to_numpy(),
                    "features": list(feats),
                }
            )

    return df.select("vec_id", "label", vec_col).mapInPandas(batches, out_schema)


@register(
    "ml_cnn_features_mlp",
    oracle=None,  # iterative MLP fit on conv features; rows-only (structure asserted in tests)
    tags=("ml", "classify", "cnn", "multimodal"),
)
def ml_cnn_features_mlp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML3 capability (CNN classification) Spark-first: frozen conv
    backbone via mapInPandas (conv3×3×4 → ReLU → maxpool2×2) over the
    embeddings-as-8×8-images, then an MLlib MLP [36, 24, 10] head; output
    is the distributed confusion matrix (A7), same contract as
    ml_mlp_confusion."""
    from pyspark.ml.classification import MultilayerPerceptronClassifier
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("embedding")
    )
    feats = conv_featurize(e).select(
        array_to_vector("features").alias("features"), F.col("label").cast("double").alias("label")
    )
    train, test = feats.randomSplit([0.8, 0.2], seed=SEED)
    mlp = MultilayerPerceptronClassifier(layers=[POOLED, 24, 10], maxIter=30, seed=SEED)
    model = mlp.fit(train)
    return (
        model.transform(test)
        .groupBy("label", "prediction")
        .agg(F.count(F.lit(1)).alias("n"))
    )
