"""Differential fuzzing: randomized relational queries, Spark vs DuckDB.

The reference's tests are print-and-eyeball (SURVEY §5); our upgrade on
that discipline is property-based differential testing — hypothesis draws
a random filter + group-by + aggregate query as a small AST, we render it
BOTH as a DataFrame plan and as ANSI SQL, and the DuckDB result must
hash-match the Spark result exactly (same compare as the driver's t2
gate). This covers the combinational space of predicates the hand-written
oracle queries can't enumerate: AND/OR nesting, empty results, constants
at column boundaries, grouped vs global aggregation.

Determinism: ``derandomize=True`` makes the example set a pure function
of the test code, so CI never flakes on a novel draw.
"""

import os

# Extended-fuzz knob: SG_FUZZ_MULT=N multiplies every max_examples
# (derandomized generation explores a longer deterministic prefix).
FUZZ_MULT = int(os.environ.get("SG_FUZZ_MULT", "1"))

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from distributed_deep_learning_with_apache_spark_spark.sources.catalog import load_table
from tests.oracle import compare, duck_connect

# Numeric columns with their plausible constant ranges (sf0.001 fixture).
NUM_COLS = {
    "l_quantity": (1.0, 50.0),
    "l_extendedprice": (900.0, 105000.0),
    "l_discount": (0.0, 0.1),
    "l_tax": (0.0, 0.08),
}
CAT_COLS = {"l_returnflag": ["A", "N", "R"], "l_linestatus": ["F", "O"]}
OPS = ["<", "<=", ">", ">="]


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duck_connect(sf_dir)


def num_predicate():
    return st.tuples(
        st.sampled_from(sorted(NUM_COLS)), st.sampled_from(OPS), st.floats(0.0, 1.0)
    ).map(
        lambda t: (t[0], t[1], round(NUM_COLS[t[0]][0] + t[2] * (NUM_COLS[t[0]][1] - NUM_COLS[t[0]][0]), 3))
    )


def cat_predicate():
    return st.sampled_from(
        [(c, "=", v) for c, vs in sorted(CAT_COLS.items()) for v in vs]
    )


predicates = st.lists(
    st.one_of(num_predicate(), cat_predicate()), min_size=1, max_size=3
)
connectors = st.lists(st.sampled_from(["AND", "OR"]), min_size=2, max_size=2)
group_cols = st.sampled_from([[], ["l_returnflag"], ["l_linestatus"], ["l_returnflag", "l_linestatus"]])
agg_specs = st.lists(
    st.sampled_from(
        [
            ("count", None),
            ("sum", "l_extendedprice"),
            ("sum", "l_quantity"),
            ("avg", "l_extendedprice"),
            ("min", "l_quantity"),
            ("max", "l_extendedprice"),
            ("min", "l_discount"),
        ]
    ),
    min_size=1,
    max_size=3,
    unique=True,
)


def _render(preds, conns):
    """One predicate expression, rendered for both engines identically.

    The SQL string is parenthesized around every fold step to mirror the
    Spark side's LEFT-fold exactly: without it, ``A OR B AND C`` parses
    as ``A OR (B AND C)`` (AND binds tighter) while the Column fold
    builds ``(A OR B) AND C`` — the two engines then evaluate different
    expressions (caught by the SG_FUZZ_MULT=3 extended run: count 0 vs
    3010 on a 3-predicate OR/AND draw; a harness bug, not an engine
    divergence)."""
    sql_expr, spark_expr = None, None
    for i, (col, op, val) in enumerate(preds):
        lit = f"'{val}'" if op == "=" else repr(val)
        sql_atom = f"({col} {op} {lit})"
        e = {
            "<": F.col(col) < val,
            "<=": F.col(col) <= val,
            ">": F.col(col) > val,
            ">=": F.col(col) >= val,
            "=": F.col(col) == val,
        }[op]
        if spark_expr is None:
            sql_expr = sql_atom
            spark_expr = e
        else:
            conn = conns[(i - 1) % len(conns)]
            sql_expr = f"({sql_expr} {conn} {sql_atom})"
            spark_expr = (spark_expr & e) if conn == "AND" else (spark_expr | e)
    return sql_expr, spark_expr


def _aggs(specs):
    """(spark agg exprs, sql select snippets) with matching aliases."""
    spark_aggs, sql_aggs = [], []
    for i, (fn, col) in enumerate(specs):
        alias = f"a{i}"
        if fn == "count":
            spark_aggs.append(F.count(F.lit(1)).alias(alias))
            sql_aggs.append(f"count(*) AS {alias}")
        elif fn in ("sum", "avg"):
            nd = 2 if fn == "sum" else 4
            spark_aggs.append(F.round(getattr(F, fn)(col), nd).alias(alias))
            sql_aggs.append(f"round({fn}({col}), {nd}) AS {alias}")
        else:  # min / max — exact
            spark_aggs.append(getattr(F, fn)(col).alias(alias))
            sql_aggs.append(f"{fn}({col}) AS {alias}")
    return spark_aggs, sql_aggs


@given(preds=predicates, conns=connectors, groups=group_cols, specs=agg_specs)
@settings(
    max_examples=20 * FUZZ_MULT,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_filter_group_agg_parity(spark, sf_dir, duck, preds, conns, groups, specs):
    where_sql, where_expr = _render(preds, conns)
    spark_aggs, sql_aggs = _aggs(specs)

    df = load_table(spark, sf_dir, "lineitem").filter(where_expr)
    if groups:
        df = df.groupBy(*groups).agg(*spark_aggs)
        sql = (
            f"SELECT {', '.join(groups + sql_aggs)} FROM lineitem "
            f"WHERE {where_sql} GROUP BY {', '.join(groups)}"
        )
    else:
        df = df.agg(*spark_aggs)
        sql = f"SELECT {', '.join(sql_aggs)} FROM lineitem WHERE {where_sql}"

    ok, msg = compare(df, duck, sql)
    assert ok, f"{sql}\n{msg}"


# ---------------------------------------------------------------------------
# Window top-k fuzz: random partition/order/k, rendered for both engines.
# Order key includes the unique (l_orderkey, l_linenumber) tail so ranks are
# total and the comparison is deterministic.
# ---------------------------------------------------------------------------
window_groups = st.sampled_from(["l_returnflag", "l_linestatus"])
order_keys = st.sampled_from(["l_extendedprice", "l_quantity", "l_discount"])
directions = st.sampled_from(["ASC", "DESC"])
ks = st.integers(min_value=1, max_value=7)


@given(part=window_groups, key=order_keys, direction=directions, k=ks)
@settings(
    max_examples=12 * FUZZ_MULT,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_window_topk_parity(spark, sf_dir, duck, part, key, direction, k):
    from pyspark.sql import Window

    order_sql = f"{key} {direction}, l_orderkey ASC, l_linenumber ASC"
    sql = (
        f"SELECT {part}, l_orderkey, l_linenumber, {key} AS val FROM ("
        f"  SELECT *, row_number() OVER (PARTITION BY {part} ORDER BY {order_sql}) AS rn"
        f"  FROM lineitem) WHERE rn <= {k}"
    )
    key_col = F.col(key).asc() if direction == "ASC" else F.col(key).desc()
    w = Window.partitionBy(part).orderBy(
        key_col, F.col("l_orderkey").asc(), F.col("l_linenumber").asc()
    )
    df = (
        load_table(spark, sf_dir, "lineitem")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(part, "l_orderkey", "l_linenumber", F.col(key).alias("val"))
    )
    ok, msg = compare(df, duck, sql)
    assert ok, f"{sql}\n{msg}"


# ---------------------------------------------------------------------------
# Join fuzz: random join type + post-join aggregate, customer ⋈ orders.
# ---------------------------------------------------------------------------
join_types = st.sampled_from(["inner", "left", "left_semi", "left_anti"])
segments = st.sampled_from(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"])
price_cuts = st.floats(min_value=0.0, max_value=1.0)


@given(jt=join_types, seg=segments, cut=price_cuts)
@settings(
    max_examples=12 * FUZZ_MULT,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_join_agg_parity(spark, sf_dir, duck, jt, seg, cut):
    price = round(1000.0 + cut * 200000.0, 2)
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == seg)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > price)

    if jt in ("left_semi", "left_anti"):
        sql_join = "SEMI" if jt == "left_semi" else "ANTI"
        sql = (
            f"SELECT c_nationkey, count(*) AS n, round(sum(c_acctbal), 2) AS bal FROM ("
            f"  SELECT c.* FROM customer c {sql_join} JOIN "
            f"  (SELECT * FROM orders WHERE o_totalprice > {price}) o ON o.o_custkey = c.c_custkey"
            f"  WHERE c.c_mktsegment = '{seg}') GROUP BY c_nationkey"
        )
        joined = c.join(o, c.c_custkey == o.o_custkey, jt)
        df = joined.groupBy("c_nationkey").agg(
            F.count(F.lit(1)).alias("n"), F.round(F.sum("c_acctbal"), 2).alias("bal")
        )
    else:
        outer = "LEFT " if jt == "left" else ""
        sql = (
            f"SELECT c_nationkey, count(*) AS n, count(o_orderkey) AS n_orders FROM ("
            f"  SELECT c.c_nationkey, o.o_orderkey FROM "
            f"  (SELECT * FROM customer WHERE c_mktsegment = '{seg}') c "
            f"  {outer}JOIN (SELECT * FROM orders WHERE o_totalprice > {price}) o"
            f"  ON o.o_custkey = c.c_custkey) GROUP BY c_nationkey"
        )
        joined = c.join(o, c.c_custkey == o.o_custkey, jt).select("c_nationkey", "o_orderkey")
        df = joined.groupBy("c_nationkey").agg(
            F.count(F.lit(1)).alias("n"), F.count("o_orderkey").alias("n_orders")
        )
    ok, msg = compare(df, duck, sql)
    assert ok, f"{sql}\n{msg}"


# ---------------------------------------------------------------------------
# HAVING fuzz: random post-aggregation predicate.
# ---------------------------------------------------------------------------
having_groups = st.sampled_from([["l_returnflag"], ["l_linestatus"], ["l_returnflag", "l_linestatus"]])
having_cuts = st.integers(min_value=0, max_value=3000)


@given(groups=having_groups, cut=having_cuts)
@settings(
    max_examples=10 * FUZZ_MULT,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_having_parity(spark, sf_dir, duck, groups, cut):
    sql = (
        f"SELECT {', '.join(groups)}, count(*) AS n, round(sum(l_quantity), 2) AS qty "
        f"FROM lineitem GROUP BY {', '.join(groups)} HAVING count(*) > {cut}"
    )
    df = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(*groups)
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        .filter(F.col("n") > cut)
    )
    ok, msg = compare(df, duck, sql)
    assert ok, f"{sql}\n{msg}"


# ---------------------------------------------------------------------------
# Scalar-subquery fuzz: filter against a scaled global aggregate.
# ---------------------------------------------------------------------------
factors = st.floats(min_value=0.5, max_value=1.5)
agg_cols = st.sampled_from(["l_extendedprice", "l_quantity"])


# ---------------------------------------------------------------------------
# Set-operation fuzz: two filtered projections combined with a random set op
# in both DISTINCT and ALL forms. Exercises Spark's union/subtract/intersect
# family against the ANSI semantics DuckDB implements.
# ---------------------------------------------------------------------------
SET_OPS = {
    "UNION": lambda a, b: a.union(b).distinct(),
    "UNION ALL": lambda a, b: a.union(b),
    "EXCEPT": lambda a, b: a.subtract(b),
    "EXCEPT ALL": lambda a, b: a.exceptAll(b),
    "INTERSECT": lambda a, b: a.intersect(b),
    "INTERSECT ALL": lambda a, b: a.intersectAll(b),
}
set_ops = st.sampled_from(sorted(SET_OPS))
cut_pairs = st.tuples(st.floats(0.0, 1.0), st.floats(0.0, 1.0))


@given(op=set_ops, cuts=cut_pairs)
@settings(
    max_examples=12 * FUZZ_MULT,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_set_op_parity(spark, sf_dir, duck, op, cuts):
    lo = round(1000.0 + cuts[0] * 150000.0, 2)
    hi = round(1000.0 + cuts[1] * 150000.0, 2)
    proj = "o_orderpriority, o_orderstatus"
    sql = (
        f"SELECT {proj} FROM orders WHERE o_totalprice > {lo} "
        f"{op} "
        f"SELECT {proj} FROM orders WHERE o_totalprice > {hi}"
    )
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > lo).select("o_orderpriority", "o_orderstatus")
    b = o.filter(F.col("o_totalprice") > hi).select("o_orderpriority", "o_orderstatus")
    df = SET_OPS[op](a, b)
    ok, msg = compare(df, duck, sql)
    assert ok, f"{sql}\n{msg}"


# ---------------------------------------------------------------------------
# Global sort-limit fuzz: ORDER BY random key/direction with a unique
# tiebreak, LIMIT k — the TakeOrderedAndProject path. The tiebreak makes the
# selected row set deterministic across engines.
# ---------------------------------------------------------------------------
sort_keys = st.sampled_from(["o_totalprice", "o_orderdate"])
sort_dirs = st.sampled_from(["ASC", "DESC"])
limit_ks = st.integers(min_value=1, max_value=25)
status_filters = st.sampled_from(["F", "O", "P"])


@given(key=sort_keys, direction=sort_dirs, k=limit_ks, status=status_filters)
@settings(
    max_examples=12 * FUZZ_MULT,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_sort_limit_parity(spark, sf_dir, duck, key, direction, k, status):
    sql = (
        f"SELECT o_orderkey, o_custkey, {key} AS val FROM orders "
        f"WHERE o_orderstatus = '{status}' "
        f"ORDER BY {key} {direction}, o_orderkey ASC LIMIT {k}"
    )
    key_col = F.col(key).asc() if direction == "ASC" else F.col(key).desc()
    df = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == status)
        .orderBy(key_col, F.col("o_orderkey").asc())
        .limit(k)
        .select("o_orderkey", "o_custkey", F.col(key).alias("val"))
    )
    ok, msg = compare(df, duck, sql)
    assert ok, f"{sql}\n{msg}"


# ---------------------------------------------------------------------------
# Running-sum + binning fuzz: the pack_sequences plan shape — partitioned
# cumulative sum over a unique order, integer-divided into bins. Integer
# measures keep the fold exact, so parity is deterministic regardless of
# partial-aggregation order.
# ---------------------------------------------------------------------------
cum_parts = st.sampled_from(["o_orderstatus", "o_orderpriority"])
cum_mods = st.integers(min_value=7, max_value=997)
cum_widths = st.integers(min_value=100, max_value=5000)


@given(part=cum_parts, m=cum_mods, width=cum_widths)
@settings(
    max_examples=10 * FUZZ_MULT,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_running_sum_bins_parity(spark, sf_dir, duck, part, m, width):
    from pyspark.sql import Window

    sql = (
        f"SELECT o_orderkey, {part} AS part, cumsum, cumsum // {width} AS bin FROM ("
        f"  SELECT o_orderkey, {part},"
        f"         CAST(sum(o_custkey % {m}) OVER ("
        f"           PARTITION BY {part} ORDER BY o_orderkey ASC"
        f"           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumsum"
        f"  FROM orders)"
    )
    w = (
        Window.partitionBy("part")
        .orderBy(F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", F.col(part).alias("part"), (F.col("o_custkey") % m).alias("v"))
        .withColumn("cumsum", F.sum("v").over(w).cast("long"))
        .select(
            "o_orderkey",
            "part",
            "cumsum",
            F.floor(F.col("cumsum") / width).cast("long").alias("bin"),
        )
    )
    ok, msg = compare(df, duck, sql)
    assert ok, f"{sql}\n{msg}"


@given(factor=factors, col=agg_cols)
@settings(
    max_examples=10 * FUZZ_MULT,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_scalar_subquery_parity(spark, sf_dir, duck, factor, col):
    f = round(factor, 4)
    sql = (
        f"SELECT l_returnflag, count(*) AS n FROM lineitem "
        f"WHERE {col} > (SELECT avg({col}) FROM lineitem) * {f} "
        f"GROUP BY l_returnflag"
    )
    li = load_table(spark, sf_dir, "lineitem")
    threshold = li.agg((F.avg(col) * f).alias("thr"))
    df = (
        li.join(F.broadcast(threshold))
        .filter(F.col(col) > F.col("thr"))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ok, msg = compare(df, duck, sql)
    assert ok, f"{sql}\n{msg}"
