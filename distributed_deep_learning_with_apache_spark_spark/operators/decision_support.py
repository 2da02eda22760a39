"""Decision-support query shapes (TPC-H-style) over the fixture star schema.

These widen the [EXT] relational surface beyond the chapter-1 chain
(SURVEY §2.3/2.4 note: "implement the standard join family ... so the
oracle harness can exercise it") with the classic decision-support
patterns a 100 TB deployment actually runs: existential semi-joins,
outer-join distributions, decorrelated scalar subqueries, disjunctive
join predicates, and having-filtered fact rollups. Adapted to the
fixture columns (no l_commitdate/p_container in TESTDATA.md — predicates
use the columns that exist).

Scale posture per query is noted in its docstring; the common themes:
- every correlated subquery is decorrelated into a join against a
  grouped aggregate (no per-row re-scans);
- dimension sides are broadcast explicitly;
- all predicates are Catalyst expressions so they push into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.catalog import load_table


def _r2(c):
    return F.round(c, 2)


# ---------------------------------------------------------------------------
# Q4 shape: existential semi-join with a non-equi residual predicate.
# ---------------------------------------------------------------------------
@register(
    "order_priority_check",
    oracle="""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
    """,
    tags=("relational", "join", "semi"),
)
def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in a quarter having a late-shipped line.

    EXISTS becomes a left-semi join whose condition mixes the equi key
    (l_orderkey = o_orderkey) with a non-equi residual (shipdate 60+ days
    after order date). Catalyst keeps the equi part as the join key, so
    at scale this is a shuffled hash/sort-merge semi-join, not a
    nested-loop — the date filter on orders prunes the probe side first.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    cond = (li["l_orderkey"] == o["o_orderkey"]) & (
        li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q6 shape: pure scan-side predicate aggregation (pushdown showcase).
# ---------------------------------------------------------------------------
@register(
    "forecast_revenue",
    oracle="""
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
    tags=("relational", "agg", "pushdown"),
    bench=True,
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: every predicate reaches the parquet scan
    (PushedFilters on l_shipdate/l_discount/l_quantity), then a single
    map-side-combinable global sum. At 100 TB this reads only the three
    referenced columns and skips row groups via min/max stats."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        ).agg(_r2(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q13 shape: outer join preserving empty groups, then a distribution.
# ---------------------------------------------------------------------------
@register(
    "customer_order_distribution",
    oracle="""
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c.c_custkey, count(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o
              ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
            GROUP BY c.c_custkey
        )
        GROUP BY c_count
    """,
    tags=("relational", "join", "outer"),
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customers-per-order-count histogram.

    The priority filter must live in the JOIN condition (not WHERE) so
    order-less customers survive with count 0. Two hash aggs: the first
    shuffles on c_custkey, the second on the tiny c_count domain — the
    second shuffle is negligible at any scale."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy(c["c_custkey"])
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# Q17 shape: decorrelated per-group scalar subquery.
# ---------------------------------------------------------------------------
@register(
    "small_quantity_revenue",
    oracle="""
        SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#23'
          AND l.l_quantity < (
            SELECT 0.5 * avg(l2.l_quantity)
            FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
          )
    """,
    tags=("relational", "subquery"),
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue of below-half-average-quantity lines.

    The correlated scalar subquery is decorrelated by hand: first a
    broadcast semi-reduction of lineitem to the brand's parts (the only
    partkeys the correlation can touch), then one grouped avg over that
    reduced set, then an equi-join back. One shuffle on l_partkey instead
    of a per-row rescan of lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    li_b = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    caps = li_b.groupBy(F.col("l_partkey").alias("cap_partkey")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("qty_cap")
    )
    return (
        li_b.join(F.broadcast(caps), li_b["l_partkey"] == caps["cap_partkey"])
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(_r2(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q18 shape: having-filtered fact rollup joined back to its dimensions.
# ---------------------------------------------------------------------------
@register(
    "large_volume_customers",
    oracle="""
        SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
               round(o.o_totalprice, 2) AS o_totalprice,
               round(t.sum_qty, 2) AS sum_qty
        FROM (
            SELECT l_orderkey, sum(l_quantity) AS sum_qty
            FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
        ) t
        JOIN orders o ON o.o_orderkey = t.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
    """,
    tags=("relational", "join", "having"),
    bench=True,
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold.

    The HAVING rollup runs first (map-side partial sums shrink the fact
    before the shuffle); the handful of surviving orderkeys then joins to
    orders and customer. At scale AQE converts the second join to
    broadcast because the rollup output is tiny."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        big.join(o, o["o_orderkey"] == big["l_orderkey"])
        .join(c, c["c_custkey"] == o["o_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            _r2(F.col("o_totalprice")).alias("o_totalprice"),
            _r2(F.col("sum_qty")).alias("sum_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Q19 shape: disjunction of conjunctive join predicates.
# ---------------------------------------------------------------------------
@register(
    "disjunctive_predicate_revenue",
    oracle="""
        SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
               AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("relational", "join", "disjunction"),
)
def disjunctive_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR of brand/size/quantity conjunctions across the
    join. Catalyst extracts the common single-side implications (brand IN
    (...), quantity ranges) and pushes them below the join, so the
    broadcast hash join probes only pre-filtered rows — verify with
    .explain(): the part scan carries a PushedFilters In(p_brand, ...)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), p["p_partkey"] == li["l_partkey"])
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return j.filter(
        arm("Brand#12", 15, 1, 11) | arm("Brand#23", 25, 10, 20) | arm("Brand#34", 35, 20, 30)
    ).agg(_r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))


# ---------------------------------------------------------------------------
# Q22 shape: global scalar aggregate + anti join.
# ---------------------------------------------------------------------------
@register(
    "idle_rich_customers",
    oracle="""
        SELECT c_mktsegment, count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer
        WHERE c_acctbal > (
            SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0
          )
          AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
          )
        GROUP BY c_mktsegment
    """,
    tags=("relational", "join", "anti", "subquery"),
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no recent
    orders (none since 2000-01-01).

    The scalar subquery is a 1-row aggregate broadcast-cross-joined onto
    customer (a broadcast nested-loop of 1 row — free), NOT collected to
    the driver, so the whole plan stays in one job. NOT EXISTS is a
    left-anti join on o_custkey."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("avg_bal"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("numcust"), _r2(F.sum("c_acctbal")).alias("totacctbal"))
    )
