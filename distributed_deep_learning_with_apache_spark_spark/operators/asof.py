"""As-of and range joins — operators Spark lacks natively, composed from
existing DataFrame ops (SURVEY §2.3 notes the reference has neither; these
are [EXT] operators every time-series/feature-store workload needs).

As-of join: union both streams, sort within key by time, carry the last
order attributes forward with last_value(ignore nulls) — one shuffle on the
key, no inequality join, no per-group Python. This is the scale-correct
formulation: an inequality join would be O(n·m) per key; the union-scan is
O((n+m) log(n+m)) partition-local after one hash exchange.

Range join: bucketize the time axis, equi-join on (key, bucket) for the
candidate set, then filter the exact interval — turning an unbounded
theta-join into a bounded equi-join (the standard Spark range-join trick).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.catalog import load_table


@register(
    "asof_join_latest_order",
    oracle="""
        WITH u AS (
          SELECT user_id AS k, ts::TIMESTAMP AS t, event_id,
                 NULL::BIGINT AS o_orderkey, NULL::DOUBLE AS o_totalprice, 0 AS is_order
          FROM events
          UNION ALL
          SELECT o_custkey, o_orderdate, NULL, o_orderkey, o_totalprice, 1
          FROM orders
        ),
        carried AS (
          SELECT k, t, event_id, is_order,
                 last_value(o_orderkey IGNORE NULLS) OVER w AS last_orderkey,
                 last_value(o_totalprice IGNORE NULLS) OVER w AS last_totalprice
          FROM u
          WINDOW w AS (PARTITION BY k ORDER BY t ASC, is_order DESC, o_orderkey ASC
                       ROWS UNBOUNDED PRECEDING)
        )
        SELECT event_id, k AS user_id,
               last_orderkey AS o_orderkey,
               round(last_totalprice, 2) AS o_totalprice
        FROM carried
        WHERE is_order = 0 AND last_orderkey IS NOT NULL
    """,
    tags=("join", "asof", "ext"),
    bench=True,
)
def asof_join_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks the latest order (by o_orderdate ≤ ts)
    of the same user. Tie-breaks are total: at equal time, orders sort
    before events (inclusive ≤) and higher orderkey wins among same-date
    orders.
    """
    e = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        "event_id",
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("double").alias("o_totalprice"),
        F.lit(0).alias("is_order"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(None).cast("long").alias("event_id"),
        "o_orderkey",
        "o_totalprice",
        F.lit(1).alias("is_order"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("t").asc(), F.col("is_order").desc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = e.unionByName(o).select(
        "k",
        "event_id",
        "is_order",
        F.last("o_orderkey", ignorenulls=True).over(w).alias("last_orderkey"),
        F.last("o_totalprice", ignorenulls=True).over(w).alias("last_totalprice"),
    )
    return (
        carried.filter((F.col("is_order") == 0) & F.col("last_orderkey").isNotNull())
        .select(
            "event_id",
            F.col("k").alias("user_id"),
            F.col("last_orderkey").alias("o_orderkey"),
            F.round("last_totalprice", 2).alias("o_totalprice"),
        )
    )


BUCKET_S = 86400  # 1-day range-join buckets


@register(
    "range_join_events_after_order",
    oracle="""
        SELECT o.o_orderkey, count(e.event_id) AS n_events_24h,
               round(coalesce(sum(e.value), 0.0), 2) AS total_value_24h
        FROM orders o
        LEFT JOIN events e
          ON e.user_id = o.o_custkey
         AND e.ts::TIMESTAMP >= o.o_orderdate
         AND e.ts::TIMESTAMP < o.o_orderdate + INTERVAL 1 DAY
        GROUP BY o.o_orderkey
    """,
    tags=("join", "range", "ext"),
)
def range_join_events_after_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: events within 24 h after each order of the same user.

    Implemented as the bucketized equi-join: both sides bucket ts to 1-day
    grid; each order probes buckets {d, d+1}; the exact interval filter
    runs on the bounded candidate set. Catalyst sees a plain equi-join on
    (user, bucket) — shuffle-partitionable, AQE-skew-splittable — instead
    of a BroadcastNestedLoopJoin.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        F.col("ts").alias("e_ts"),
        F.floor(F.unix_timestamp("ts") / BUCKET_S).alias("bucket"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").alias("o_ts"),
        F.floor(F.unix_timestamp("o_orderdate") / BUCKET_S).alias("b0"),
    ).withColumn("bucket", F.explode(F.array(F.col("b0"), F.col("b0") + 1)))
    joined = o.join(
        e,
        (o.o_custkey == e.user_id)
        & (o.bucket == e.bucket)
        & (e.e_ts >= o.o_ts)
        & (e.e_ts < o.o_ts + F.expr("INTERVAL 1 DAY")),
        "left",
    )
    return joined.groupBy("o_orderkey").agg(
        F.count("event_id").alias("n_events_24h"),
        F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 2).alias("total_value_24h"),
    )


@register(
    "asof_join_forward",
    oracle="""
        WITH u AS (
          SELECT o_custkey AS k, o_orderdate AS t, o_orderkey,
                 NULL::BIGINT AS event_id, NULL::TIMESTAMP AS e_ts, 0 AS is_event
          FROM orders
          UNION ALL
          SELECT user_id, ts::TIMESTAMP, NULL, event_id, ts::TIMESTAMP, 1
          FROM events
        ),
        carried AS (
          SELECT k, t, o_orderkey, is_event,
                 first_value(event_id IGNORE NULLS) OVER w AS next_event_id,
                 first_value(e_ts IGNORE NULLS) OVER w AS next_ts
          FROM u
          WINDOW w AS (PARTITION BY k ORDER BY t ASC, is_event ASC, event_id ASC
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT o_orderkey, k AS user_id, next_event_id,
               CAST(floor(epoch(next_ts)) AS BIGINT)
                 - CAST(floor(epoch(t)) AS BIGINT) AS secs_until
        FROM carried
        WHERE is_event = 0 AND next_event_id IS NOT NULL
    """,
    doc="FORWARD as-of join (pandas merge_asof direction='forward'): each order picks the customer's FIRST event at-or-after it — time-to-next-activity; same union-scan formulation as the backward form with the window reversed.",
    tags=("join", "asof", "ext", "scale"),
)
def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The other as-of direction (`merge_asof(direction='forward')`): for
    each order, the customer's FIRST event at-or-after the order date,
    plus seconds until it — the time-to-next-activity latency feature the
    backward carry of `asof_join_latest_order` can't produce. (Roles are
    orders→events here because the fixture's orders all PRECEDE its
    events; the mechanism is direction-symmetric.)

    Same scale-correct formulation: union both streams, ONE hash shuffle
    on the key, a partition-local window — never an inequality join.
    first_value(IGNORE NULLS) over CURRENT ROW..UNBOUNDED FOLLOWING
    carries the next event's attributes backward to the order row.
    Tie-breaks are total: at an equal timestamp the order row sorts
    BEFORE the event (is_event ASC), so the same-instant event is inside
    the order's frame — the inclusive >= contract; lowest event_id wins
    among same-instant events.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        "o_orderkey",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("timestamp").alias("e_ts"),
        F.lit(0).alias("is_event"),
    )
    e = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(None).cast("long").alias("o_orderkey"),
        "event_id",
        F.col("ts").alias("e_ts"),
        F.lit(1).alias("is_event"),
    )
    u = o.unionByName(e)
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("t").asc(), F.col("is_event").asc(), F.col("event_id").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = u.select(
        "k",
        "t",
        "o_orderkey",
        "is_event",
        F.first("event_id", ignorenulls=True).over(w).alias("next_event_id"),
        F.first("e_ts", ignorenulls=True).over(w).alias("next_ts"),
    )
    return carried.filter(
        (F.col("is_event") == 0) & F.col("next_event_id").isNotNull()
    ).select(
        "o_orderkey",
        F.col("k").alias("user_id"),
        "next_event_id",
        (
            F.unix_timestamp("next_ts") - F.unix_timestamp("t")
        ).cast("long").alias("secs_until"),
    )
