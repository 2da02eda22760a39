"""Data-lake write patterns: partitioned, clustered, and compacted parquet.

The reference's only sinks are driver-side (collect/print, Swing grid,
model file — SURVEY §2.1 S13-S15). At 100 TB the engine's real sink is a
partitioned parquet/lakehouse table, and HOW it is written decides every
downstream scan's cost, so these writers are first-class operators:

- ``write_partitioned``: hive-style ``partitionBy`` layout so downstream
  filters on the partition column become partition PRUNING (directories
  never listed, files never opened). Rows are ``repartition``-ed on the
  partition columns first: without that, every one of the N writer tasks
  emits a file into every partition directory (N×P small files, the
  classic lake pathology); with it, each partition's rows land in one
  task → one file.
- ``write_clustered``: ``repartitionByRange + sortWithinPartitions`` on a
  clustering key so each output file covers a narrow, disjoint key range.
  Parquet stores per-row-group min/max stats; range-disjoint files turn a
  selective range predicate into data SKIPPING (whole files eliminated by
  footer stats alone). This is the poor-man's Z-order, and the right
  single-key clustering for time-series / key-range workloads.
- ``compact``: rewrite a directory of many small files into few large
  ones. Streaming sinks and incremental merges (see
  ``streaming/events.py::stream_foreachbatch_merge``) accrete small
  files; scan cost is per-file footer + seek overhead, so periodic
  compaction is standard lake maintenance.

All three are plain Spark writers — no custom file format — so they keep
predicate pushdown, column pruning, and vectorized parquet reads intact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .catalog import load_table


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Hive-style partitioned parquet write, one file per partition value.

    ``repartition(*partition_cols)`` co-locates each partition's rows on a
    single task so the layout is P directories × 1 file, not P × N.
    """
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_clustered(df: DataFrame, path: str, cluster_col: str, num_files: int) -> None:
    """Range-clustered parquet write: ``num_files`` files with disjoint
    ``cluster_col`` ranges, rows sorted within each file.

    Disjoint per-file min/max stats make selective range predicates skip
    whole files at planning time (parquet footer stats), and the in-file
    sort tightens per-row-group stats for finer skipping.
    """
    (
        df.repartitionByRange(num_files, F.col(cluster_col))
        .sortWithinPartitions(cluster_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def compact(spark: SparkSession, src: str, dst: str, num_files: int) -> None:
    """Rewrite ``src`` (many small files) into ``dst`` as ``num_files``
    files. ``coalesce`` avoids a shuffle: it only glues input splits
    together, which is exactly right for compaction (no key layout to
    preserve)."""
    spark.read.parquet(src).coalesce(num_files).write.mode("overwrite").parquet(dst)


@register(
    "lake_partition_pruned_revenue",
    oracle="""
        SELECT l_linestatus,
               count(*) AS n_items,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        WHERE l_returnflag = 'R'
        GROUP BY l_linestatus
    """,
    tags=("lake", "sink", "agg"),
)
def lake_partition_pruned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write lineitem hive-partitioned by l_returnflag, then answer a
    returnflag-filtered revenue query from the partitioned copy.

    The filter prunes to the ``l_returnflag=R`` directory — the scan never
    opens the other partitions' files (plan shows it as a partition
    filter, not a data filter). End-to-end proof that the partitioned
    writer produces a layout Catalyst can prune, with the one-shot SQL
    aggregate as the oracle.
    """
    import shutil
    import tempfile

    base = tempfile.mkdtemp(prefix="sg_lake_")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"
    )
    write_partitioned(li, base, ["l_returnflag"])

    out = (
        spark.read.parquet(base)
        .filter(F.col("l_returnflag") == "R")
        .groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )
    # Materialize before the temp lake directory is removed.
    out = spark.createDataFrame(out.collect(), out.schema)
    shutil.rmtree(base, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering: multi-column data skipping
# ---------------------------------------------------------------------------
Z_BITS = 10  # 10 bits per dimension -> 20-bit interleaved key, 1024 buckets/dim


def zorder_key(col_a, col_b, max_a, max_b):
    """Morton interleave of two columns, all JVM-side bit arithmetic.

    Each column is scaled to a Z_BITS-bit integer rank, then bits are
    interleaved (a in even positions, b in odd). Sorting by the result
    gives every file a small axis-aligned rectangle of the (a, b) space,
    so per-file min/max footer stats prune on EITHER column — the
    multi-column generalization of single-key range clustering
    (write_clustered), same construction Delta/Iceberg OPTIMIZE ZORDER
    uses."""
    scale = (1 << Z_BITS) - 1
    ra = F.least(F.floor(col_a * scale / max_a), F.lit(scale)).cast("long")
    rb = F.least(F.floor(col_b * scale / max_b), F.lit(scale)).cast("long")
    z = F.lit(0).cast("long")
    for i in range(Z_BITS):
        bit_a = F.shiftrightunsigned(ra, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftrightunsigned(rb, i).bitwiseAND(F.lit(1))
        z = (
            z.bitwiseOR(F.shiftleft(bit_a, 2 * i))
            .bitwiseOR(F.shiftleft(bit_b, 2 * i + 1))
        )
    return z


def write_zordered(df: DataFrame, path: str, z_col, num_files: int) -> None:
    """Z-order-clustered parquet write: range-partition + sort on the
    Morton key so each file covers one compact rectangle of the key
    space."""
    (
        df.withColumn("_z", z_col)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


@register(
    "lake_zorder_stats",
    oracle="""
        WITH z AS (
          SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
                 (SELECT max(l_partkey) FROM lineitem) AS max_p,
                 (SELECT max(l_suppkey) FROM lineitem) AS max_s
          FROM lineitem
        ),
        keyed AS (
          SELECT l_orderkey, l_linenumber, l_quantity,
                 least(CAST(floor(l_partkey * 1023.0 / max_p) AS BIGINT), 1023) AS ra,
                 least(CAST(floor(l_suppkey * 1023.0 / max_s) AS BIGINT), 1023) AS rb
          FROM z
        ),
        -- (l_orderkey, l_linenumber) is the lineitem primary key, so this
        -- GROUP BY keeps exactly one output row per input row even when two
        -- rows share (l_quantity, ra, rb) — collisions grow with SF.
        morton AS (
          SELECT l_orderkey, l_quantity,
                 bit_or((ra >> b & 1) << (2 * b)) | bit_or((rb >> b & 1) << (2 * b + 1)) AS zval
          FROM keyed, (SELECT unnest(generate_series(0, 9)) AS b)
          GROUP BY l_orderkey, l_linenumber, l_quantity, ra, rb
        )
        SELECT CAST(zval // 65536 AS BIGINT) AS z_bucket,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(l_quantity), 2) AS total_qty
        FROM morton GROUP BY 1
    """,
    doc="Morton/Z-order key computation + per-bucket stats (the clustering key the z-order writer sorts by).",
    tags=("lake", "ext", "scale"),
)
def lake_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked half of the z-order path: the Morton key itself
    (pure bit arithmetic, engine-portable) aggregated into coarse buckets.
    The file-layout effect of sorting by this key is asserted in
    tests/test_lake.py (disjoint per-file rectangles -> stats pruning on
    either column)."""
    li = load_table(spark, sf_dir, "lineitem")
    maxes = li.agg(
        F.max("l_partkey").alias("max_p"), F.max("l_suppkey").alias("max_s")
    )
    z = zorder_key(F.col("l_partkey"), F.col("l_suppkey"), F.col("max_p"), F.col("max_s"))
    return (
        li.crossJoin(F.broadcast(maxes))
        .select(F.col("l_quantity"), z.alias("zval"))
        .groupBy((F.col("zval") / 65536).cast("long").alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
    )
