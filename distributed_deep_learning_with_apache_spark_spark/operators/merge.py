"""MERGE / CDC emulation ([EXT]): upsert and SCD2 history tracking built
from anti-join + union + window — the lakehouse-format-free realization of
MERGE INTO (no Delta/Iceberg jars in this image; the plan shape is the
same one those formats execute underneath).

Scenario: the `events` stream is the change feed (latest `value` per user
= the incoming balance update); `customer` is the dimension being merged
into (user_id ↔ c_custkey).

Scale posture: both operators are equi-joins on the merge key plus one
rank window over the change feed — shuffle on the key, AQE-skew-safe,
no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.catalog import load_table


def _latest_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC feed: latest event value per user (the rank-window dedup)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("user_id").alias("key"),
            F.round("value", 2).alias("new_balance"),
            F.unix_timestamp("ts").alias("update_ts_s"),
        )
    )


_DUCK_UPDATES = """
          SELECT user_id AS key, round(value, 2) AS new_balance,
                 floor(epoch(ts::TIMESTAMP))::BIGINT AS update_ts_s
          FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
          ) WHERE rn = 1
"""


@register(
    "merge_upsert_customers",
    oracle=f"""
        WITH updates AS ({_DUCK_UPDATES})
        SELECT c.c_custkey,
               round(coalesce(u.new_balance, c.c_acctbal), 2) AS acctbal,
               CASE WHEN u.key IS NOT NULL THEN 1 ELSE 0 END AS was_updated
        FROM customer c LEFT JOIN updates u ON u.key = c.c_custkey
    """,
    tags=("merge", "cdc", "ext"),
)
def merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE ... WHEN MATCHED THEN UPDATE, emulated: left join the change
    feed onto the dimension, coalesce updated values over existing ones."""
    c = load_table(spark, sf_dir, "customer")
    u = _latest_updates(spark, sf_dir)
    return (
        c.join(u, c.c_custkey == u.key, "left")
        .select(
            "c_custkey",
            F.round(F.coalesce("new_balance", "c_acctbal"), 2).alias("acctbal"),
            F.when(F.col("key").isNotNull(), 1).otherwise(0).alias("was_updated"),
        )
    )


@register(
    "scd2_customer_history",
    oracle=f"""
        WITH updates AS ({_DUCK_UPDATES})
        SELECT c.c_custkey, round(c.c_acctbal, 2) AS acctbal,
               0 AS version, u.update_ts_s AS valid_to_s,
               CASE WHEN u.key IS NULL THEN 1 ELSE 0 END AS is_current
        FROM customer c LEFT JOIN updates u ON u.key = c.c_custkey
        UNION ALL
        SELECT c.c_custkey, u.new_balance AS acctbal,
               1 AS version, NULL::BIGINT AS valid_to_s, 1 AS is_current
        FROM customer c JOIN updates u ON u.key = c.c_custkey
    """,
    tags=("merge", "cdc", "scd2", "ext"),
)
def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 MERGE: matched rows close the old version (valid_to = update
    time) and append the new current version; unmatched rows stay current.
    One change-feed window + two equi-joins + union — no MERGE keyword,
    identical history table."""
    c = load_table(spark, sf_dir, "customer")
    u = _latest_updates(spark, sf_dir)
    old = (
        c.join(u, c.c_custkey == u.key, "left")
        .select(
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.lit(0).alias("version"),
            F.col("update_ts_s").alias("valid_to_s"),
            F.when(F.col("key").isNull(), 1).otherwise(0).alias("is_current"),
        )
    )
    new = (
        c.join(u, c.c_custkey == u.key, "inner")
        .select(
            "c_custkey",
            F.col("new_balance").alias("acctbal"),
            F.lit(1).alias("version"),
            F.lit(None).cast("long").alias("valid_to_s"),
            F.lit(1).alias("is_current"),
        )
    )
    return old.unionByName(new)


@register(
    "scd2_as_of_lookup",
    oracle=f"""
        WITH updates AS ({_DUCK_UPDATES}),
        bounds AS (
          SELECT CAST(floor((min(floor(epoch(ts::TIMESTAMP)))
                           + max(floor(epoch(ts::TIMESTAMP)))) / 2.0) AS BIGINT) AS as_of_s
          FROM events
        )
        SELECT c.c_custkey,
               round(CASE WHEN u.key IS NOT NULL AND u.update_ts_s <= b.as_of_s
                          THEN u.new_balance ELSE c.c_acctbal END, 2) AS acctbal_asof,
               CAST(CASE WHEN u.key IS NOT NULL AND u.update_ts_s <= b.as_of_s
                         THEN 1 ELSE 0 END AS BIGINT) AS version_asof
        FROM customer c
        CROSS JOIN bounds b
        LEFT JOIN updates u ON u.key = c.c_custkey
    """,
    doc="Point-in-time (time-travel) read over the SCD2 history: which version was current at the as-of instant.",
    tags=("merge", "cdc", "scd2", "ext"),
)
def scd2_as_of_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The read side of SCD2 — a time-travel lookup: for a deterministic
    AS-OF instant (midpoint of the change feed), resolve each customer's
    then-current version. Plan: the 1-row as-of bound broadcasts, the
    change feed joins on the merge key — same single-shuffle shape as the
    MERGE itself, which is what makes point-in-time reads as cheap as
    current reads on a 100 TB dimension."""
    c = load_table(spark, sf_dir, "customer")
    u = _latest_updates(spark, sf_dir)
    e = load_table(spark, sf_dir, "events")
    ts_s = F.unix_timestamp("ts")
    bounds = e.agg(
        F.floor((F.min(ts_s) + F.max(ts_s)) / 2.0).cast("long").alias("as_of_s")
    )
    updated = F.col("key").isNotNull() & (F.col("update_ts_s") <= F.col("as_of_s"))
    return (
        c.crossJoin(F.broadcast(bounds))
        .join(u, c.c_custkey == u.key, "left")
        .select(
            "c_custkey",
            F.round(F.when(updated, F.col("new_balance")).otherwise(F.col("c_acctbal")), 2).alias(
                "acctbal_asof"
            ),
            F.when(updated, 1).otherwise(0).cast("long").alias("version_asof"),
        )
    )


@register(
    "merge_full_sync",
    oracle=f"""
        WITH updates AS ({_DUCK_UPDATES})
        SELECT u.key, round(u.new_balance, 2) AS balance,
               CASE WHEN c.c_custkey IS NULL THEN 'insert' ELSE 'update' END
                 AS action
        FROM updates u LEFT JOIN customer c ON c.c_custkey = u.key
        UNION ALL
        SELECT c.c_custkey AS key, CAST(NULL AS DOUBLE) AS balance,
               'delete' AS action
        FROM customer c LEFT JOIN updates u ON u.key = c.c_custkey
        WHERE u.key IS NULL
    """,
    doc="Tri-clause MERGE (full sync): WHEN MATCHED UPDATE, WHEN NOT MATCHED INSERT, WHEN NOT MATCHED BY SOURCE DELETE — the replica-mirroring merge, realized as one full-outer join with per-row action routing.",
    tags=("merge", "cdc", "ext", "scale"),
)
def merge_full_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third MERGE clause the upsert lacks: `WHEN NOT MATCHED BY
    SOURCE THEN DELETE` (Delta 2.4+/SQL:2003 F312 extension) — after the
    merge the target's key set IS the source's key set, which is the
    contract replica-mirroring pipelines (reverse ETL, dimension sync)
    run on. Emulated with ONE full-outer equi-join on the merge key and
    per-row action routing:

    - source ∩ target → 'update' (take the source balance),
    - source ∖ target → 'insert',
    - target ∖ source → 'delete' (emitted to the audit output; a
      lakehouse MERGE would drop the row — surfacing it keeps all three
      clause paths hash-checkable in one flat table).

    Scale: one shuffle on the merge key (AQE-skew-safe), no window, no
    driver state; identical plan shape at any replica size. The CDC feed
    dedup reuses `_latest_updates`' rank window.
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    u = _latest_updates(spark, sf_dir)
    j = c.join(u, c.c_custkey == u.key, "full_outer")
    return j.select(
        F.coalesce("key", "c_custkey").alias("key"),
        F.when(F.col("key").isNotNull(), F.round("new_balance", 2)).alias("balance"),
        F.when(F.col("c_custkey").isNull(), F.lit("insert"))
        .when(F.col("key").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("action"),
    )
