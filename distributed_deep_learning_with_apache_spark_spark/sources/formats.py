"""Interchange source formats: CSV, JSON-lines, ORC with explicit schemas.

The reference ingests bespoke formats only (whole-file text, PNG, MNIST
idx — SURVEY §2.1); a standalone engine must also speak the standard
interchange formats a reference user would bring. Schema discipline
follows SURVEY §1.2: every read passes an explicit ``StructType`` —
inference is never load-bearing (on 100 TB an inference pass is a full
extra scan, and a sampled inference can mis-type late rows).

Scale notes per format:
- CSV/JSON are row-oriented and splittable (uncompressed / bzip2), but
  carry no column stats → no pushdown-based file skipping; they are
  ingest-edge formats. The pattern here — read once with explicit schema,
  rewrite to parquet/ORC — is the standard bronze→silver step.
- JSON parsing uses PERMISSIVE mode with a ``_corrupt_record`` column so
  one malformed row quarantines instead of failing a 1000-executor job
  (FAILFAST is the opt-in strict variant, exercised in tests).
- ORC is the other columnar format (stripe-level stats, pushdown);
  covered as a write/read roundtrip to prove sink+source symmetry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .catalog import TABLE_SCHEMAS, load_table


def schema_for(table: str, cols: list[str]):
    """Project an explicit fixture schema down to ``cols`` (keeps reads
    inference-free without restating field types)."""
    full = TABLE_SCHEMAS[table]
    by_name = {f.name: f for f in full.fields}
    return type(full)([by_name[c] for c in cols])


@register(
    "source_csv_orders_agg",
    oracle="""
        SELECT o_orderstatus,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders
        GROUP BY o_orderstatus
    """,
    tags=("source", "csv"),
)
def source_csv_orders_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip orders through CSV (header, explicit schema on read)
    and aggregate from the CSV copy. Proves the CSV source/sink pair is
    lossless for the relational columns; the one-shot SQL aggregate over
    the original parquet is the oracle."""
    import shutil
    import tempfile

    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    base = tempfile.mkdtemp(prefix="sg_csv_")
    load_table(spark, sf_dir, "orders").select(*cols).write.mode("overwrite").option(
        "header", "true"
    ).csv(base)

    out = (
        spark.read.schema(schema_for("orders", cols))
        .option("header", "true")
        .csv(base)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )
    out = spark.createDataFrame(out.collect(), out.schema)
    shutil.rmtree(base, ignore_errors=True)
    return out


@register(
    "source_json_events_agg",
    oracle="""
        SELECT event_type,
               count(*) AS n_events,
               round(sum(value), 2) AS total_value
        FROM events
        GROUP BY event_type
    """,
    tags=("source", "json"),
)
def source_json_events_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip events through JSON-lines and aggregate from the JSON
    copy (PERMISSIVE read with explicit schema)."""
    import shutil
    import tempfile

    cols = ["event_id", "event_type", "value"]
    base = tempfile.mkdtemp(prefix="sg_json_")
    load_table(spark, sf_dir, "events").select(*cols).write.mode("overwrite").json(base)

    out = (
        spark.read.schema(schema_for("events", cols))
        .option("mode", "PERMISSIVE")
        .json(base)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    out = spark.createDataFrame(out.collect(), out.schema)
    shutil.rmtree(base, ignore_errors=True)
    return out


@register(
    "source_xml_events_agg",
    oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               floor(sum(floor(value * 10000 + 0.5)) / 100 + 0.5) / 100
                 AS total_value
        FROM events
        GROUP BY event_type
    """,
    doc="Round-trip events through Spark 4's native XML source (rowTag records, explicit schema) and aggregate from the XML copy; oracle aggregates the raw table.",
    tags=("source", "xml"),
)
def source_xml_events_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip events through the native XML data source (built into
    Spark 4 — ``format("xml")`` with a ``rowTag``) and aggregate from the
    XML copy. Like CSV/JSON, XML is an ingest-edge row format: splittable
    on row tags, no column stats, schema supplied explicitly so inference
    never touches the plan. Doubles survive the text round-trip exactly
    (Spark serializes shortest-repr and parses back the identical bits),
    and the sum is cent-scaled integer-exact on both engines so the
    aggregate is FP-order-independent. The oracle aggregates the original
    parquet: the round-trip must be lossless.
    """
    import shutil
    import tempfile

    cols = ["event_id", "event_type", "value"]
    base = tempfile.mkdtemp(prefix="sg_xml_")
    load_table(spark, sf_dir, "events").select(*cols).write.mode("overwrite").format(
        "xml"
    ).option("rootTag", "events").option("rowTag", "event").save(base)

    out = (
        spark.read.schema(schema_for("events", cols))
        .format("xml")
        .option("rowTag", "event")
        .load(base)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            (
                F.floor(
                    F.sum(F.floor(F.col("value") * 10000 + 0.5).cast("long")) / 100
                    + 0.5
                )
                / 100
            ).alias("total_value"),
        )
    )
    out = spark.createDataFrame(out.collect(), out.schema)
    shutil.rmtree(base, ignore_errors=True)
    return out


@register(
    "source_orc_lineitem_agg",
    oracle="""
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_items,
               round(sum(l_quantity), 2) AS total_qty
        FROM lineitem
        WHERE l_quantity > 30
        GROUP BY l_returnflag
    """,
    tags=("source", "orc"),
)
def source_orc_lineitem_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip lineitem through ORC — the other columnar format — and
    aggregate from the ORC copy with a pushed filter. ORC carries
    stripe/row-group statistics like parquet, so the `l_quantity > 30`
    predicate prunes at the scan (tests/test_formats.py pins PushedFilters
    on the ORC read); the oracle aggregates the original parquet. Proves
    sink+source symmetry for the third columnar interchange format."""
    import shutil
    import tempfile

    cols = ["l_orderkey", "l_returnflag", "l_quantity"]
    base = tempfile.mkdtemp(prefix="sg_orc_")
    load_table(spark, sf_dir, "lineitem").select(*cols).write.mode("overwrite").orc(
        base
    )

    out = (
        spark.read.schema(schema_for("lineitem", cols))
        .orc(base)
        .filter(F.col("l_quantity") > 30)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
    )
    out = spark.createDataFrame(out.collect(), out.schema)
    shutil.rmtree(base, ignore_errors=True)
    return out
