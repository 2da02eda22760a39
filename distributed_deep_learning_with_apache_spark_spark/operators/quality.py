"""Data-quality constraint suite ([EXT]): the dbt/Deequ-style checks a
production pipeline runs before publishing a table.

Each constraint compiles to the cheapest plan that can prove it:
referential integrity is a LEFT ANTI join against the (broadcastable)
parent keys, uniqueness is a hash-agg HAVING count>1, null-rate and
domain checks are scan-stage conditional counts. The whole suite is one
DataFrame union so a scheduler runs it as a single job; every row is
(check_name, n_violations), and a clean table yields all zeros —
value-hash-checked against DuckDB, violations and all.

Scale posture: no constraint materializes violating ROWS (counts only),
anti-joins broadcast the parent-key side (keys, not rows), and the
conditional counts are map-side combinable — the suite costs ~one scan
per table at any size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.catalog import load_table


@register(
    "dq_constraint_checks",
    oracle="""
        SELECT 'orders_custkey_fk' AS check_name,
               CAST(count(*) FILTER (c.c_custkey IS NULL) AS BIGINT) AS n_violations,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        UNION ALL
        SELECT 'lineitem_orderkey_fk',
               CAST(count(*) FILTER (o.o_orderkey IS NULL) AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        UNION ALL
        SELECT 'customer_custkey_unique',
               CAST(coalesce(sum(cnt - 1), 0) AS BIGINT),
               CAST(count(DISTINCT c_custkey) AS BIGINT)
        FROM (SELECT c_custkey, count(*) AS cnt FROM customer GROUP BY c_custkey)
        UNION ALL
        SELECT 'orders_totalprice_positive',
               CAST(count(*) FILTER (o_totalprice <= 0) AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'lineitem_discount_domain',
               CAST(count(*) FILTER (l_discount < 0 OR l_discount > 1) AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'documents_text_not_null',
               CAST(count(*) FILTER (text IS NULL OR length(text) = 0) AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM documents
    """,
    doc="Data-quality suite: FK integrity, uniqueness, domain and null checks as one union of violation counts.",
    tags=("quality", "ext", "scale"),
)
def dq_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One job, six constraints, counts only (violating rows are never
    materialized). A publishing gate checks `n_violations == 0` per row."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    documents = load_table(spark, sf_dir, "documents")

    def counted(name: str, violations, total) -> DataFrame:
        return violations.select(
            F.lit(name).alias("check_name"),
            F.col("v").cast("long").alias("n_violations"),
            total.cast("long").alias("n_rows"),
        )

    o_fk = (
        orders.join(
            F.broadcast(customer.select("c_custkey")), orders.o_custkey == F.col("c_custkey"), "left"
        )
        .agg(
            F.count(F.when(F.col("c_custkey").isNull(), 1)).alias("v"),
            F.count(F.lit(1)).alias("t"),
        )
    )
    l_fk = (
        lineitem.join(
            orders.select("o_orderkey"), lineitem.l_orderkey == F.col("o_orderkey"), "left"
        )
        .agg(
            F.count(F.when(F.col("o_orderkey").isNull(), 1)).alias("v"),
            F.count(F.lit(1)).alias("t"),
        )
    )
    uniq = (
        customer.groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0)).alias("v"),
            F.count(F.lit(1)).alias("t"),
        )
    )
    price = orders.agg(
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("v"), F.count(F.lit(1)).alias("t")
    )
    disc = lineitem.agg(
        F.count(F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)).alias("v"),
        F.count(F.lit(1)).alias("t"),
    )
    txt = documents.agg(
        F.count(F.when(F.col("text").isNull() | (F.length("text") == 0), 1)).alias("v"),
        F.count(F.lit(1)).alias("t"),
    )
    parts = [
        counted("orders_custkey_fk", o_fk, F.col("t")),
        counted("lineitem_orderkey_fk", l_fk, F.col("t")),
        counted("customer_custkey_unique", uniq, F.col("t")),
        counted("orders_totalprice_positive", price, F.col("t")),
        counted("lineitem_discount_domain", disc, F.col("t")),
        counted("documents_text_not_null", txt, F.col("t")),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
