"""Array/tensor functions — the ND4J surface (SURVEY §2.9) on array columns.

Reference parity: scalar broadcast add/mul (M3, `ND4JTest.java:20,24`),
dimension-wise mean (A3/M10, `ND4JTest.java:44-48`), element reads (M5),
argMax along axis (O6, `MNISTAnomalyDetector.java:75`), hstack/vstack (U2/U3,
`ND4JTest.java:56-57`), and the per-example reconstruction-error score
(A6/ML7, `MNISTAnomalyDetector.java:194`) feeding the flagship grouped
top-k (W1, `:201-217`).

Dense tensors become `array<float>` columns; every op is a JVM-side
higher-order function (`transform`/`aggregate`/`zip_with`) — no Python in
the loop, wholly codegen-compatible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.catalog import load_table


def as_double(vec: Column | str) -> Column:
    """Cast array<float> → array<double> so fold arithmetic is double-precision
    on both engines (DuckDB oracle casts ::DOUBLE[] identically)."""
    vec = F.col(vec) if isinstance(vec, str) else vec
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Dot product: left-to-right fold over zip_with products."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def squared_error(a: Column, b: Column) -> Column:
    """A6: sum((a_i-b_i)^2) — the reconstruction-error expression."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, v: acc + v
    )


def float_array_sig(vec: Column | str, decimals: int = 6) -> Column:
    """Driver-hashable digest of a float-array column: fixed-precision
    rendering + sha2, all JVM-side.

    The driver canonicalizes every registered query's output with pandas
    (sort_values across all columns, then a value hash); Python ``list``
    and ``DenseVector`` cells are unsortable/unhashable there — round 4
    lost three driver rows to exactly this class.  Registered projections
    therefore never emit raw array/vector columns: they emit this scalar
    digest, while the raw-array internal ``*_df`` builders stay available
    for the pixel/vector unit tests.
    """
    vec = F.col(vec) if isinstance(vec, str) else vec
    return F.sha2(
        F.concat_ws(",", F.transform(vec, lambda x: F.format_string(f"%.{decimals}f", x))),
        256,
    )


# ---------------------------------------------------------------------------
# M3/M5: elementwise scalar ops + point reads on a tensor column
# ---------------------------------------------------------------------------
@register(
    "vector_scalar_ops",
    oracle="""
        SELECT vec_id,
               list_transform(embedding::DOUBLE[], x -> x * 2.0 + 1.0)[1] AS first_scaled,
               list_extract(embedding::DOUBLE[], len(embedding)) AS last_element,
               len(embedding) AS dim
        FROM embeddings
    """,
    tags=("arrays",),
)
def vector_scalar_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 scalar broadcast mul/add + M5 element reads (exact FP: *2+1 on
    float-promoted-to-double is bit-identical across engines)."""
    e = load_table(spark, sf_dir, "embeddings")
    v = as_double("embedding")
    scaled = F.transform(v, lambda x: x * 2.0 + 1.0)
    return e.select(
        "vec_id",
        F.element_at(scaled, 1).alias("first_scaled"),
        F.element_at(v, F.size("embedding")).alias("last_element"),
        F.size("embedding").alias("dim"),
    )


# ---------------------------------------------------------------------------
# A3/M10: dimension-wise mean (mean along dim 0 of the embedding matrix)
# ---------------------------------------------------------------------------
@register(
    "embedding_dim_means",
    oracle="""
        SELECT pos, round(avg(v), 6) + 0.0 AS dim_mean, count(*) AS n
        FROM (SELECT unnest(embedding::DOUBLE[]) AS v,
                     generate_subscripts(embedding, 1) AS pos
              FROM embeddings)
        GROUP BY pos
    """,
    tags=("arrays", "agg"),
)
def embedding_dim_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column means of the n×64 embedding matrix via posexplode + hash agg.

    At scale this is the map-side-combinable form of `Summarizer.mean`:
    64 groups regardless of row count, so the shuffle is O(partitions·64).
    """
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select(F.posexplode(as_double("embedding")).alias("pos0", "v"))
        .select((F.col("pos0") + 1).alias("pos"), "v")
        .groupBy("pos")
        .agg((F.round(F.avg("v"), 6) + 0.0).alias("dim_mean"), F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# O6: argMax along axis (one-hot → class index)
# ---------------------------------------------------------------------------
@register(
    "embedding_argmax",
    oracle="""
        SELECT vec_id,
               list_position(embedding, list_aggregate(embedding, 'max')) - 1 AS argmax_dim,
               round(list_aggregate(embedding::DOUBLE[], 'max'), 6) + 0.0 AS max_val
        FROM embeddings
    """,
    tags=("arrays",),
)
def embedding_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6: index of the max element (0-based, first occurrence), float-exact."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        (F.array_position(F.col("embedding"), F.array_max("embedding")) - 1).alias("argmax_dim"),
        (F.round(F.array_max(as_double("embedding")), 6) + 0.0).alias("max_val"),
    )


# ---------------------------------------------------------------------------
# W2: last-timestep selection via negative indexing
# (PredictCommentsUsingRNNAndWord2Vec.java:70-71 — probabilities at T-1)
# ---------------------------------------------------------------------------
@register(
    "last_timestep_select",
    oracle="""
        SELECT vec_id,
               embedding[-1]::DOUBLE AS last_value,
               embedding[1]::DOUBLE AS first_value,
               -- serialized micro-units (not a LIST column): the driver's
               -- pandas hasher can't hash list cells, and float->string
               -- formatting differs across engines; scaled-int strings are
               -- bit-portable because the underlying doubles are identical
               array_to_string(
                 list_transform(list_slice(embedding, -3, -1)::DOUBLE[],
                                x -> CAST(round(x * 1000000) AS BIGINT)), ',') AS tail3_micro
        FROM embeddings
    """,
    tags=("arrays", "w2"),
)
def last_timestep_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: element_at(col, -1) — select the final timestep of a sequence
    column (the RNN-output read), plus a tail slice (raw float→double casts
    are exact, no rounding needed)."""
    e = load_table(spark, sf_dir, "embeddings")
    tail3 = F.slice(as_double("embedding"), F.size("embedding") - 2, 3)
    return e.select(
        "vec_id",
        F.element_at(as_double("embedding"), -1).alias("last_value"),
        F.element_at(as_double("embedding"), 1).alias("first_value"),
        F.array_join(
            F.transform(tail3, lambda v: F.round(v * 1e6).cast("long").cast("string")), ","
        ).alias("tail3_micro"),
    )


# ---------------------------------------------------------------------------
# U3: hstack (feature assembly) + U2: vstack shape checks
# ---------------------------------------------------------------------------
@register(
    "hstack_features",
    oracle="""
        SELECT vec_id,
               len(list_concat(embedding, [label * 1.0::FLOAT])) AS assembled_dim,
               round(list_aggregate(list_concat(embedding::DOUBLE[], [label * 1.0]), 'sum'), 4) + 0.0 AS assembled_sum
        FROM embeddings
    """,
    tags=("arrays",),
)
def hstack_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 hstack: concat feature vectors column-wise (VectorAssembler shape)."""
    e = load_table(spark, sf_dir, "embeddings")
    assembled = F.concat(as_double("embedding"), F.array(F.col("label").cast("double")))
    return e.select(
        "vec_id",
        F.size(assembled).alias("assembled_dim"),
        (F.round(F.aggregate(assembled, F.lit(0.0), lambda a, v: a + v), 4) + 0.0).alias("assembled_sum"),
    )


# ---------------------------------------------------------------------------
# ML2/ML7/W1 flagship: centroid-reconstruction anomaly score + grouped top-k
# ---------------------------------------------------------------------------
@register(
    "anomaly_best_worst",
    oracle="""
        WITH exploded AS (
          SELECT vec_id, label,
                 generate_subscripts(embedding, 1) AS pos,
                 unnest(embedding::DOUBLE[]) AS v
          FROM embeddings
        ),
        cent AS (
          SELECT label, pos, avg(v) AS c FROM exploded GROUP BY label, pos
        ),
        scored AS (
          SELECT e.vec_id, e.label, round(sum((e.v - c.c) * (e.v - c.c)), 4) AS score
          FROM exploded e JOIN cent c ON e.label = c.label AND e.pos = c.pos
          GROUP BY e.vec_id, e.label
        )
        SELECT vec_id, label, score, rn_best, rn_worst FROM (
          SELECT vec_id, label, score,
                 row_number() OVER (PARTITION BY label ORDER BY score ASC,  vec_id ASC)  AS rn_best,
                 row_number() OVER (PARTITION BY label ORDER BY score DESC, vec_id DESC) AS rn_worst
          FROM scored
        ) WHERE rn_best <= 5 OR rn_worst <= 5
    """,
    tags=("arrays", "window", "flagship"),
    bench=True,
)
def anomaly_best_worst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chapter-3 flagship shape (MNISTAnomalyDetector.java:36-217),
    SQL-deterministic: per-label centroid stands in for the autoencoder
    bottleneck; score = squared reconstruction error against the centroid;
    then best-5/worst-5 per label via rank windows.

    Plan at scale: posexplode → hash agg (centroids: |labels|·dim rows,
    tiny) → broadcast the centroids back onto the exploded fact → one
    shuffle for the per-vector score agg → one window shuffle on label.
    The MLlib-PCA variant of the same shape is ml_anomaly_pca (rows-only).
    """
    e = load_table(spark, sf_dir, "embeddings")
    # Centroids via posexplode → partial-aggregable avg per (label, dim).
    # The map-side combine collapses each scan partition to |labels|·dim
    # partial (sum, count) rows before the exchange, so the shuffle carries
    # O(|labels|·dim·partitions) regardless of corpus size — no task ever
    # holds a whole label's vectors (the previous per-label collect_list
    # fold put every vector of a label in ONE row: an OOM at 100× scale).
    # round(score, 4) downstream absorbs FP-order noise in the avg.
    vecs = e.select("vec_id", "label", as_double("embedding").alias("v"))
    cent_long = (
        vecs.select("label", F.posexplode("v").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.avg("val").alias("c"))
    )
    # Reassemble |labels|·dim rows (tiny, KB-scale) into per-label arrays
    # for the broadcast join; collect_list here gathers dim scalars per
    # label, not vectors.
    cent = (
        cent_long.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select("label", F.col("pc.c").alias("c"))
    )
    scored = (
        vecs.join(F.broadcast(cent), "label")
        .select(
            "vec_id",
            "label",
            F.round(squared_error(F.col("v"), F.col("c")), 4).alias("score"),
        )
    )
    by = Window.partitionBy("label")
    best = by.orderBy(F.col("score").asc(), F.col("vec_id").asc())
    worst = by.orderBy(F.col("score").desc(), F.col("vec_id").desc())
    return (
        scored.select(
            "vec_id",
            "label",
            "score",
            F.row_number().over(best).alias("rn_best"),
            F.row_number().over(worst).alias("rn_worst"),
        )
        .filter((F.col("rn_best") <= 5) | (F.col("rn_worst") <= 5))
    )
