"""The last §2.11 UDF-surface members: iterator pandas UDFs and grouped
applyInArrow.

The reference's UDF story is plain per-row lambdas inside its engine
(SparkRDDAPITest.scala:31-39 maps/filters); re-expressed Spark-first,
every Python crossing must be Arrow-batched. Two API members were still
unregistered after round 4:

- ``Iterator[pd.Series] -> Iterator[pd.Series]`` pandas UDF — the form
  whose body runs ONCE per partition-stream and then consumes Arrow
  batches from a generator. That is the production shape for per-worker
  init amortization (load a model / dictionary / tokenizer once, stream
  thousands of batches through it); the scalar form would pay init per
  batch. tests/test_udf_surface.py proves the amortization (distinct
  inits ≤ partitions while batches per init ≥ 5).
- ``groupBy().applyInArrow`` — the grouped-map transform handed a
  ``pyarrow.Table`` per group, with no pandas conversion layer at all.
  For pure aggregation the built-in agg is strictly better (one shuffle,
  partial merge, no Python); this member exists for per-group logic that
  aggregates can't express (model-per-group fits, per-group resampling)
  — registered here over a high-cardinality key so the 100 TB task
  layout stays balanced (tasks ∝ |customers|, not ∝ 6 statuses).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..registry import register
from ..sources.catalog import load_table

SCORE_W = 2.0  # weight applied to the discounted-price term


@register(
    "udf_iterator_scoring",
    oracle=f"""
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(floor((l_quantity
                               + {SCORE_W} * (l_extendedprice * (1.0 - l_discount)))
                              * 10000 + 0.5)) AS BIGINT) AS score_cents
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="Iterator-of-Series pandas UDF (init-once-per-partition form) scoring lineitem; cent-exact aggregate hash-matches the same IEEE expression in SQL.",
    tags=("udf", "ext"),
)
def udf_iterator_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every lineitem row with an ``Iterator[Tuple[pd.Series, ...]]``
    pandas UDF: the "model" (here a weight constant standing in for an
    expensive artifact) is bound once per partition-stream, then Arrow
    batches flow through the generator. Identical IEEE expression on both
    engines (``q + w*(ep*(1-d))``, same parenthesization), so the
    cent-floored aggregate is bit-exact.

    Scale: the iterator form is why Python scoring survives 1000
    executors — init cost is O(partitions), not O(batches), and the
    Arrow transfer is the same as the scalar form. The aggregate after
    the UDF is an ordinary partial-merge groupBy.
    """

    @pandas_udf("double")
    def score(batches: Iterator[tuple[pd.Series, pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        w = SCORE_W  # init-once site: a real pipeline loads its model here
        for q, ep, d in batches:
            yield q + w * (ep * (1.0 - d))

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice", "l_discount"
    )
    return (
        li.withColumn("s", score("l_quantity", "l_extendedprice", "l_discount"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(F.floor(F.col("s") * 10000 + 0.5).cast("long")).alias("score_cents"),
        )
    )


APPLY_ARROW_SCHEMA = "o_custkey long, n_orders long, total_cents long"


@register(
    "grouped_apply_in_arrow",
    oracle="""
        SELECT o_custkey,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(floor(o_totalprice * 10000 + 0.5)) AS BIGINT) AS total_cents
        FROM orders
        GROUP BY o_custkey
    """,
    doc="groupBy().applyInArrow grouped-map: per-customer order stats computed in pure pyarrow.compute on the group's Arrow table, no pandas layer.",
    tags=("udf", "arrow", "ext"),
)
def grouped_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order stats via ``applyInArrow``: each group arrives
    as a ``pyarrow.Table`` and is reduced with ``pyarrow.compute`` kernels
    (cent-floor, int64 sum) — no pandas materialization, no per-row
    Python. Grouping by ``o_custkey`` (high cardinality) keeps the
    grouped-map task layout balanced; a 6-value status key would serialize
    the whole table through 6 Python calls at scale.

    This is the API-surface registration: when the per-group logic IS an
    aggregate (as here), the built-in ``groupBy().agg`` wins — one
    shuffle with map-side partials vs grouped-map's shuffle of every row
    into Python. The oracle proves value parity; the built-in twin is
    `revenue_per_customer`.
    """

    def per_customer(table: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(table.column("o_totalprice"), 10000.0), 0.5)),
            pa.int64(),
        )
        return pa.table(
            {
                "o_custkey": pa.array([table.column("o_custkey")[0].as_py()], pa.int64()),
                "n_orders": pa.array([table.num_rows], pa.int64()),
                "total_cents": pa.array([pc.sum(cents).as_py()], pa.int64()),
            }
        )

    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    return orders.groupBy("o_custkey").applyInArrow(per_customer, schema=APPLY_ARROW_SCHEMA)
