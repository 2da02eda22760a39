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
