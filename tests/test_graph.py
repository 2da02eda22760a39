"""PageRank: numpy power-iteration reference + structural contracts."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from distributed_deep_learning_with_apache_spark_spark.operators.graph import (
    PR_DAMPING,
    PR_ITERS,
    PR_SCALE,
    PR_TOP,
    pagerank,
    pagerank_fixedpoint,
)
from distributed_deep_learning_with_apache_spark_spark.registry import load_all
from distributed_deep_learning_with_apache_spark_spark.sources.catalog import load_table

REG = load_all()


def _numpy_pagerank(edge_list, iters=PR_ITERS, d=PR_DAMPING):
    """Dense reference with the exact same update rule (dangling mass
    redistributed uniformly each round)."""
    nodes = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    targets = [[] for _ in range(n)]
    for u, v in set(edge_list):
        out[idx[u]] += 1
        targets[idx[u]].append(idx[v])
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for i, ts in enumerate(targets):
            if ts:
                share = r[i] / out[i]
                for j in ts:
                    contrib[j] += share
        dangling = r[out == 0].sum()
        r = (1.0 - d) / n + d * (contrib + dangling / n)
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_matches_numpy_reference(spark, sf_dir):
    """The distributed ranks must agree with the dense reference on the
    full sf0.001 purchase graph — same rounds, same damping, same dangling
    rule — to float tolerance."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.concat(F.lit("c"), "o_custkey").alias("src"),
        F.concat(F.lit("s"), "l_suppkey").alias("dst"),
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges).collect()}
    edge_list = [(r["src"], r["dst"]) for r in edges.distinct().collect()]
    want = _numpy_pagerank(edge_list)
    assert set(got) == set(want)
    worst = max(abs(got[k] - want[k]) for k in want)
    assert worst < 1e-9, f"max rank divergence {worst}"
    # Mass conservation: the dangling rule keeps total rank at exactly 1.
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_chain_and_sink_structure(spark):
    """On a→b→c plus endorser d→c, the shared sink c must outrank b, and b
    (one endorser) must outrank the unendorsed sources."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "c")], "src string, dst string"
    )
    r = {row["node"]: row["rank"] for row in pagerank(edges).collect()}
    assert r["c"] > r["b"] > r["a"]
    assert abs(sum(r.values()) - 1.0) < 1e-12


def test_pagerank_registered_query_contract(spark, sf_dir):
    """Registered projection: PR_TOP rows, dense ranks 1..k, descending
    order. Every endorsed supplier strictly outranks every customer
    (customers all sit at the identical base+dangling floor), so the
    suppliers present must form a PREFIX of the ranking — at small SF
    there are fewer suppliers than PR_TOP and customers fill the tail."""
    out = REG["pagerank_purchase_graph"].fn(spark, sf_dir).collect()
    assert len(out) == PR_TOP
    assert [r["rnk"] for r in out] == list(range(1, PR_TOP + 1))
    ranks = [r["pagerank_e12"] for r in out]
    assert ranks == sorted(ranks, reverse=True)
    kinds = [r["node"][0] for r in out]
    assert kinds[0] == "s"
    assert "s" not in kinds[kinds.index("c"):] if "c" in kinds else True


def test_pagerank_empty_graph(spark):
    empty = spark.createDataFrame([], "src string, dst string")
    assert pagerank(empty).count() == 0
    assert pagerank_fixedpoint(empty).count() == 0


def test_pagerank_fixedpoint_tracks_float(spark, sf_dir):
    """The registered query's fixed-point ranks (rank × 1e12 BIGINT —
    what makes the DuckDB oracle hash-exact) must agree with the float
    power iteration to within the accumulated quantization bound: each
    round floors ≤3 integer divisions per node, so |err| ≤ ~3·iters/scale."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.concat(F.lit("c"), "o_custkey").alias("src"),
        F.concat(F.lit("s"), "l_suppkey").alias("dst"),
    )
    fx = {r["node"]: r["rank"] / PR_SCALE for r in pagerank_fixedpoint(edges).collect()}
    fl = {r["node"]: r["rank"] for r in pagerank(edges).collect()}
    assert set(fx) == set(fl)
    worst = max(abs(fx[k] - fl[k]) for k in fl)
    assert worst < 1e-8, f"fixed-point drifted {worst} from float ranks"
