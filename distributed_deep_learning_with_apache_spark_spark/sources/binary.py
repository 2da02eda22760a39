"""Multimodal binary columns: opaque bytes + typed metadata, with decode /
feature-extract as Arrow-batched pandas transforms over mapInPandas.

Reference parity: S4/S5 image scan + decode (`MnistClassification.java:
61-63,142-145` — PNG → 28×28×1 float grid) and S6 label-from-path
(`ParentPathLabelGenerator`, `:60`). In this container there are no real
image files or codec libraries, so — per the project contract — the decode
kernel is STUBBED with a deterministic fake (byte-histogram features),
while everything Spark-side is real and tested: schema, binary column
handling, Arrow batch shape, partitioning of the mapInPandas stage.

`read_binary_dir` is the real-world entry (spark.read.format("binaryFile"))
for directories of images; the fixture path manufactures binary columns
from `documents.text` so the pipeline is exercised end-to-end on shipped
test data.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .catalog import load_table

HIST_BINS = 16
DECODE_SCHEMA = (
    "doc_id long, byte_len int, width int, height int, features array<float>"
)


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*.png") -> DataFrame:
    """S4: real binary scan — (path, modificationTime, length, content) with
    label-from-parent-path (S6) materialized as a column."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .withColumn("label", F.regexp_extract(F.input_file_name(), r"/([^/]+)/[^/]+$", 1))
    )


def documents_as_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture stand-in for a binary scan: utf-8 bytes of documents.text as
    the opaque payload + typed metadata columns."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("content"),
        F.octet_length(F.col("text")).alias("byte_len"),
        F.col("source").alias("media_source"),
    )


@register(
    "multimodal_decode_stub",
    oracle=None,  # decode kernel is a stub; Spark-side plumbing rows-only
    tags=("multimodal", "ext"),
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 pipeline shape: binary column → mapInPandas decode → fixed-width
    feature vectors. Arrow-batched; one Python stage, everything before and
    after stays JVM-side.

    The kernel is a closure (pickled by value) so executors never need this
    package importable — required when the driver process runs from an
    arbitrary cwd.
    """
    n_bins = HIST_BINS

    def decode_stub(batches: Iterator) -> Iterator:
        # STUB decode kernel (real one would be PIL/libvips/ffmpeg —
        # unavailable in this container). Deterministic fake: 'decode' =
        # n-bin byte-value histogram, normalized; fixed 28×28 'image' dims.
        # Real Arrow batch plumbing, fake pixels.
        import numpy as np

        for pdf in batches:
            feats = []
            for buf in pdf["content"]:
                arr = np.frombuffer(buf, dtype=np.uint8)
                hist = np.bincount(arr % n_bins, minlength=n_bins).astype("float32")
                total = hist.sum() or 1.0
                feats.append((hist / total).tolist())
            out = pdf[["doc_id", "byte_len"]].copy()
            out["width"] = 28
            out["height"] = 28
            out["features"] = feats
            yield out

    return documents_as_binary(spark, sf_dir).mapInPandas(decode_stub, DECODE_SCHEMA)


@register(
    "binary_metadata",
    oracle="""
        SELECT doc_id,
               octet_length(encode(text)) AS byte_len,
               md5(text) AS content_md5,
               CASE WHEN octet_length(encode(text)) >= 256 THEN 'large' ELSE 'small' END AS size_class
        FROM documents
    """,
    tags=("multimodal", "ext"),
)
def binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over the opaque payload (the queryable layer of a
    multimodal table): byte length, content hash, size classification."""
    b = documents_as_binary(spark, sf_dir)
    return b.select(
        "doc_id",
        "byte_len",
        F.md5("content").alias("content_md5"),
        F.when(F.col("byte_len") >= 256, "large").otherwise("small").alias("size_class"),
    )


FRAME_STRIDE = 64
MAX_FRAMES = 4
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_off int, n_frames int, frame_mean float"


def sample_frames_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-EXPANDING multimodal transform: one binary payload → up to
    MAX_FRAMES frame rows (the video frame-sampling shape; audio windowing
    is the same plumbing). Complements `multimodal_decode_stub`, which is
    1→1 — here one Arrow batch in yields a differently-sized batch out.

    The frame 'decode' is the stubbed kernel (real one = ffmpeg keyframe
    extraction, unavailable in this container): frame i = bytes
    [i*STRIDE, (i+1)*STRIDE) of the payload, feature = mean byte value.
    Stride/offset arithmetic is real and oracle-checked; at 100 TB this
    stage is embarrassingly parallel (no shuffle: expansion happens inside
    the scan's partitions, and Spark only shuffles if a later op asks).
    """
    stride, max_frames = FRAME_STRIDE, MAX_FRAMES

    def sample_frames(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "frame_idx", "frame_off", "n_frames", "frame_mean")}
            for doc_id, buf in zip(pdf["doc_id"], pdf["content"]):
                arr = np.frombuffer(buf, dtype=np.uint8)
                n = min(max_frames, (len(arr) + stride - 1) // stride)
                for i in range(n):
                    seg = arr[i * stride : (i + 1) * stride]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_off"].append(i * stride)
                    out["n_frames"].append(n)
                    out["frame_mean"].append(float(seg.mean()))
            yield pd.DataFrame(out)

    return documents_as_binary(spark, sf_dir).mapInPandas(sample_frames, FRAME_SCHEMA)


@register(
    "multimodal_frame_sample",
    oracle=f"""
        WITH f AS (
          SELECT doc_id,
                 least({MAX_FRAMES}, (octet_length(encode(text)) + {FRAME_STRIDE - 1}) // {FRAME_STRIDE}) AS n_frames,
                 unnest(generate_series(1, least({MAX_FRAMES}, (octet_length(encode(text)) + {FRAME_STRIDE - 1}) // {FRAME_STRIDE}))) AS gs
          FROM documents)
        SELECT doc_id, (gs - 1)::INT AS frame_idx, ((gs - 1) * {FRAME_STRIDE})::INT AS frame_off,
               n_frames::INT AS n_frames
        FROM f
    """,
    tags=("multimodal", "ext"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked slice of `sample_frames_df`: the expansion topology
    (which frames exist, at which offsets) must match the SQL unnest. The
    stubbed per-frame feature is excluded from the contract (it is not
    SQL-expressible once a real codec replaces it) and is unit-tested
    against a NumPy reference instead (tests/test_curation.py pattern)."""
    return sample_frames_df(spark, sf_dir).select("doc_id", "frame_idx", "frame_off", "n_frames")
