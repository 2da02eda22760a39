"""Iterative graph centrality over the TPC-H purchase graph ([EXT]).

The reference's closest artifact is its iterative training loops (repeated
passes over a distributed dataset with a small global state update per
pass); PageRank is the same execution shape applied to a graph — the
canonical "iterative joins + one scalar reduce per round" Spark workload,
and the standard importance measure a data-curation pipeline uses to
weight sources (e.g. page/domain rank as a quality prior for web corpora).

Scale posture: each iteration is one key-partitioned equi-join of the
(static, checkpointed) edge list with the current rank vector plus a
map-side-combinable sum — no cartesian, no broadcast of anything
data-proportional. The dangling-mass term rides the same plan as a
broadcast singleton aggregate (one row), so each round is exactly one
Spark job with no driver sync. Lineage is truncated with an eager
localCheckpoint per round
(the standard iterative-Spark discipline — see
`connected_components_logstar` for the pitfall it avoids); on a cluster
this would be `checkpoint()` against reliable storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.catalog import load_table

PR_ITERS = 10
PR_DAMPING = 0.85
PR_TOP = 20


def pagerank(edges: DataFrame, iters: int = PR_ITERS, damping: float = PR_DAMPING) -> DataFrame:
    """Power-iteration PageRank over a directed edge list ``(src, dst)``.

    Returns ``(node, rank)`` for every node. Dangling nodes (no
    out-edges) redistribute their mass uniformly each round — the
    standard formulation, which keeps ``sum(rank) == 1`` exactly (pinned
    against a numpy reference in tests/test_graph.py). Deterministic up
    to floating-point summation order; consumers round before comparing.
    """
    spark = edges.sparkSession
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return spark.createDataFrame([], "node string, rank double")
    # Degree is static: attach it to the edge list once, outside the loop.
    ed = (
        e.join(out_deg, "src")
        .select("src", "dst", "deg")
        .localCheckpoint(eager=True)
    )
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        contrib = (
            ed.join(ranks, ed.src == ranks.node)
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        # Dangling mass: rank held by nodes with no out-edges, folded into
        # the SAME plan as a broadcast singleton aggregate (1 row) instead
        # of a driver-side scalar reduce — one Spark job per iteration,
        # no per-round driver sync.
        dang = (
            ranks.join(out_deg, ranks.node == out_deg.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left_outer")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.col("dmass") / F.lit(float(n))
                    + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


@register(
    "pagerank_purchase_graph",
    oracle=None,  # fixed-round power iteration; numpy-reference-pinned in tests
    tags=("graph", "iterative", "ext", "scale"),
)
def pagerank_purchase_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer→supplier purchase graph: an edge means
    "customer bought a lineitem this supplier fulfilled" (orders ⋈
    lineitem, deduplicated). Customers endorse suppliers; suppliers are
    dangling (no out-edges), so their mass redistributes uniformly —
    ranking suppliers by how much purchase attention flows to them while
    customers stay near the uniform floor.

    Top-k extraction is sort+limit (TakeOrderedAndProject — executor-side
    partial top-k, no global single-partition window); the row_number
    ranks only the k survivors.
    """
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.concat(F.lit("c"), "o_custkey").alias("src"),
        F.concat(F.lit("s"), "l_suppkey").alias("dst"),
    )
    ranks = pagerank(edges)
    top = ranks.orderBy(F.col("rank").desc(), F.col("node").asc()).limit(PR_TOP)
    w = Window.orderBy(F.col("rank").desc(), F.col("node").asc())
    return top.select(
        "node",
        F.round("rank", 8).alias("pagerank"),
        F.row_number().over(w).alias("rnk"),
    )
