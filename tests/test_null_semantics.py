"""Null-semantics differential tests: Spark vs DuckDB on null-laden data.

The fixture tables contain no NULLs, so the oracle sweep never exercises
the classic null minefields. Here a small null-injected table is
registered in BOTH engines and the behaviors that differ across SQL
implementations are pinned to ANSI semantics:

- aggregates skip NULLs (count(col) vs count(*), avg denominator);
- NULL ordering is explicit (NULLS FIRST/LAST spelled out on both sides —
  Spark defaults ASC→nulls-first, DuckDB ASC→nulls-last, so implicit
  ordering would silently diverge);
- WHERE drops NULL comparisons (three-valued logic), including the
  NOT IN + NULL trap;
- null-safe equality (Spark `<=>` / DuckDB `IS NOT DISTINCT FROM`);
- outer-join null padding vs real stored NULLs.
"""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tests.oracle import compare

ROWS = [
    (1, "a", 10.0),
    (2, "a", None),
    (3, None, 30.0),
    (4, "b", None),
    (5, "b", 50.0),
    (6, None, None),
    (7, "c", 70.0),
]
SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("grp", T.StringType(), True),
        T.StructField("val", T.DoubleType(), True),
    ]
)


@pytest.fixture(scope="module")
def ndf(spark):
    return spark.createDataFrame(ROWS, SCHEMA).cache()


@pytest.fixture(scope="module")
def ncon():
    con = duckdb.connect()
    con.register(
        "t", pd.DataFrame(ROWS, columns=["id", "grp", "val"]).astype({"id": "int64"})
    )
    return con


def test_aggregates_skip_nulls(ndf, ncon):
    df = ndf.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("val").alias("n_vals"),
        F.round(F.avg("val"), 4).alias("avg_val"),
        F.sum("val").alias("sum_val"),
    )
    ok, msg = compare(
        df,
        ncon,
        """SELECT grp, count(*) AS n_rows, count(val) AS n_vals,
                  round(avg(val), 4) AS avg_val, sum(val) AS sum_val
           FROM t GROUP BY grp""",
    )
    assert ok, msg


def test_explicit_null_ordering_parity(ndf, ncon):
    # rank by val with explicit NULLS LAST; ties impossible (unique vals).
    from pyspark.sql import Window

    w = Window.orderBy(F.col("val").asc_nulls_last(), F.col("id").asc())
    df = ndf.select("id", "val", F.row_number().over(w).alias("rk"))
    ok, msg = compare(
        df,
        ncon,
        """SELECT id, val,
                  row_number() OVER (ORDER BY val ASC NULLS LAST, id ASC) AS rk
           FROM t""",
    )
    assert ok, msg


def test_three_valued_logic_in_where(ndf, ncon):
    # val > 20 drops NULL vals; NOT(val > 20) ALSO drops them.
    df = ndf.filter(~(F.col("val") > 20)).select("id")
    ok, msg = compare(df, ncon, "SELECT id FROM t WHERE NOT (val > 20)")
    assert ok, msg


def test_not_in_with_null_is_empty(ndf, ncon):
    # The classic trap: NOT IN against a set containing NULL selects
    # nothing in ANSI SQL. (Note: DataFrame left_anti is the
    # null-REJECTING variant — rows with NULL keys survive it — so the
    # two are NOT interchangeable; this pins the SQL form on both engines.)
    ndf.createOrReplaceTempView("null_t")
    out = ndf.sparkSession.sql(
        "SELECT id FROM null_t WHERE val NOT IN (SELECT val FROM null_t)"
    )
    assert out.count() == 0
    assert ncon.sql("SELECT id FROM t WHERE val NOT IN (SELECT val FROM t)").fetchall() == []


def test_null_safe_equality(ndf, ncon):
    # Self-join on grp with null-safe equality: NULL grp matches NULL grp.
    a, b = ndf.alias("a"), ndf.alias("b")
    df = (
        a.join(b, F.col("a.grp").eqNullSafe(F.col("b.grp")))
        .groupBy(F.col("a.id").alias("id"))
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )
    ok, msg = compare(
        df,
        ncon,
        """SELECT a.id AS id, count(*) AS n_matches
           FROM t a JOIN t b ON a.grp IS NOT DISTINCT FROM b.grp
           GROUP BY a.id""",
    )
    assert ok, msg


def test_outer_join_null_padding(ndf, ncon):
    # Left join against the non-null-val subset: padded NULLs + stored NULLs
    # must coalesce identically in both engines.
    right = ndf.filter(F.col("val") > 20).select(
        F.col("id").alias("rid"), F.col("val").alias("rval")
    )
    df = ndf.join(right, ndf.id == right.rid, "left").select(
        "id", F.coalesce("rval", F.lit(-1.0)).alias("rval_or_default")
    )
    ok, msg = compare(
        df,
        ncon,
        """SELECT a.id AS id, coalesce(b.rval, -1.0) AS rval_or_default
           FROM t a LEFT JOIN (SELECT id AS rid, val AS rval FROM t WHERE val > 20) b
           ON a.id = b.rid""",
    )
    assert ok, msg
