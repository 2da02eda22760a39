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
    """One predicate expression, rendered for both engines identically."""
    sql_parts, spark_expr = [], None
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
            sql_parts.append(sql_atom)
            spark_expr = e
        else:
            conn = conns[(i - 1) % len(conns)]
            sql_parts.append(f"{conn} {sql_atom}")
            spark_expr = (spark_expr & e) if conn == "AND" else (spark_expr | e)
    return " ".join(sql_parts), spark_expr


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
    max_examples=20,
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
