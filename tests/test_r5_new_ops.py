"""Round-5 operator tests: exact quantile narrowing, null-aware NOT IN,
Bloom semi-join pruning, dynamic partition overwrite, ORC source.

Oracle hash-parity for all five registered queries runs in
tests/test_oracle_parity.py (auto-parametrized); these tests pin the
mechanisms — convergence, three-valued-logic, one-sided error, and
partition-file survival — that the hash check alone can't see.
"""

import glob
import math
import os

import pytest
from pyspark.sql import functions as F

from distributed_deep_learning_with_apache_spark_spark.operators.setops import (
    exact_order_statistics,
)
from distributed_deep_learning_with_apache_spark_spark.registry import load_all
from distributed_deep_learning_with_apache_spark_spark.sources.catalog import load_table

REG = load_all()


# ---------------------------------------------------------------------------
# quantile_two_pass_exact: the narrowing engine on hostile distributions
# ---------------------------------------------------------------------------
def _check_stats(spark, values, need):
    df = spark.createDataFrame([(float(v),) for v in values], "v double")
    got, passes = exact_order_statistics(df, len(values), set(need))
    ref = sorted(values)
    for k in need:
        assert got[k] == ref[k], (k, got[k], ref[k])
    return passes


def test_quantile_narrowing_uniform(spark):
    vals = [((i * 2654435761) % 100003) / 7.0 for i in range(20000)]
    passes = _check_stats(spark, vals, [0, 9999, 10000, 19999])
    assert passes <= 3, f"uniform narrowing took {passes} passes"


def test_quantile_narrowing_all_equal(spark):
    """A single duplicated value: the bucket's actual min==max resolves
    instantly instead of looping on a range that cannot shrink."""
    passes = _check_stats(spark, [42.5] * 10000, [0, 5000, 9999])
    assert passes <= 1, f"constant column took {passes} passes"


def test_quantile_narrowing_one_heavy_value(spark):
    """90% of mass on one value, the rest spread: the heavy bucket must
    resolve by min==max, the spread ranks by collect-and-index."""
    vals = [7.0] * 18000 + [float(i) * 1.5 + 100.0 for i in range(2000)]
    passes = _check_stats(spark, vals, [0, 9000, 17999, 18000, 19999])
    assert passes <= 3


def test_quantile_matches_spark_percentile(spark, sf_dir):
    """The registered query's interpolated quantiles equal Spark's own
    exact percentile() on the same column (independent implementation)."""
    li = load_table(spark, sf_dir, "lineitem")
    expect = li.agg(
        *[
            F.percentile("l_extendedprice", F.lit(q)).alias(f"q{i}")
            for i, q in enumerate((0.5, 0.9, 0.99))
        ]
    ).first()
    rows = {
        r.quantile: r.value
        for r in REG["quantile_two_pass_exact"].fn(spark, sf_dir).collect()
    }
    for i, q in enumerate((0.5, 0.9, 0.99)):
        want = math.floor(expect[f"q{i}"] * 10000 + 0.5) / 10000
        assert rows[q] == pytest.approx(want, abs=1e-9), (q, rows[q], want)


# ---------------------------------------------------------------------------
# notin_nullaware_anti: the three-valued-logic contract
# ---------------------------------------------------------------------------
def test_notin_with_real_null_is_empty(spark, sf_dir, duck=None):
    """Flip the nullif sentinel so the subquery REALLY yields a NULL: SQL
    NOT IN must then return zero rows on both engines — the trap a plain
    anti join (which would return rows) gets wrong."""
    import duckdb

    load_table(spark, sf_dir, "part").createOrReplaceTempView("part_nnx")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_nnx")
    # sentinel = a quantity value guaranteed present under the filter
    some_q = (
        load_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") <= 25))
        .select(F.col("l_quantity").cast("int").alias("q"))
        .first()
    )
    assert some_q is not None, "fixture has no R/<=25 lineitems"
    sql = f"""
        SELECT p_size FROM {{part}}
        WHERE p_size NOT IN (
          SELECT nullif(CAST(l_quantity AS INT), {some_q.q})
          FROM {{lineitem}} WHERE l_returnflag = 'R' AND l_quantity <= 25
        )
    """
    spark_rows = spark.sql(
        sql.format(part="part_nnx", lineitem="lineitem_nnx")
    ).count()
    con = duckdb.connect()
    for t in ("part", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    duck_rows = len(
        con.execute(sql.format(part="part", lineitem="lineitem")).fetchall()
    )
    con.close()
    assert spark_rows == 0 and duck_rows == 0, (spark_rows, duck_rows)


def test_notin_plans_nullaware_broadcast_anti(spark, sf_dir):
    """The registered query must plan the null-aware LeftAnti broadcast
    join (trailing isNullAware flag), not a nested-loop or plain anti."""
    df = REG["notin_nullaware_anti"].fn(spark, sf_dir)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    anti = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
    assert anti and "BroadcastHashJoin" in anti[0], plan
    assert anti[0].rstrip().endswith("true"), f"not null-aware: {anti[0]}"


# ---------------------------------------------------------------------------
# bloom_semijoin_pruned: one-sided error + real pruning
# ---------------------------------------------------------------------------
def test_bloom_never_drops_true_members_and_prunes(spark, sf_dir):
    from distributed_deep_learning_with_apache_spark_spark.operators.relational import (
        BLOOM_M,
        BLOOM_SEEDS,
    )

    orders = load_table(spark, sf_dir, "orders")
    build = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 150000)
    ).select("o_orderkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")

    def with_positions(df, key):
        return df.select(
            F.col(key).alias("k"),
            *[
                F.pmod(F.xxhash64(F.col(key), F.lit(s)), F.lit(BLOOM_M)).alias(
                    f"p{i}"
                )
                for i, s in enumerate(BLOOM_SEEDS)
            ],
        ).collect()

    build_rows = with_positions(build, "o_orderkey")
    true_keys = {r.k for r in build_rows}
    assert true_keys, "fixture has no urgent expensive orders"
    bits = set()
    for r in build_rows:
        bits.update(r[f"p{i}"] for i in range(len(BLOOM_SEEDS)))

    probe = with_positions(li.distinct(), "l_orderkey")
    n_fact_keys = len(probe)
    candidates = 0
    for r in probe:
        is_cand = all(r[f"p{i}"] in bits for i in range(len(BLOOM_SEEDS)))
        if r.k in true_keys:
            assert is_cand, f"false negative on {r.k}"
        candidates += is_cand
    # one-sided error: candidates >= truth, and pruning must be real
    n_true = sum(1 for r in probe if r.k in true_keys)
    assert candidates >= n_true
    assert candidates <= max(n_true * 2, n_true + 0.05 * n_fact_keys), (
        candidates,
        n_true,
        n_fact_keys,
    )


def test_bloom_plan_no_cartesian_beyond_singleton(spark, sf_dir):
    """The only nested-loop join allowed is the 1-row broadcast bitmap;
    no CartesianProduct anywhere."""
    df = REG["bloom_semijoin_pruned"].fn(spark, sf_dir)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan  # the 16 KiB bitmap singleton


# ---------------------------------------------------------------------------
# lake_dynamic_partition_overwrite: touched-partition-only semantics
# ---------------------------------------------------------------------------
def test_dynamic_overwrite_preserves_untouched_partitions(spark, sf_dir, tmp_path):
    base = str(tmp_path / "dpo")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
    )
    o.write.mode("overwrite").partitionBy("order_month").parquet(base)
    months = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(base, "order_month=*"))
    )
    assert "order_month=1995-03-01" in months and len(months) > 1
    untouched = [m for m in months if m != "order_month=1995-03-01"]
    files_before = {
        m: sorted(glob.glob(os.path.join(base, m, "*.parquet"))) for m in untouched
    }
    touched_before = sorted(
        glob.glob(os.path.join(base, "order_month=1995-03-01", "*.parquet"))
    )

    restated = o.filter(F.col("order_month") == F.lit("1995-03-01").cast("date"))
    restated.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("order_month").parquet(base)

    for m in untouched:
        after = sorted(glob.glob(os.path.join(base, m, "*.parquet")))
        assert after == files_before[m], f"untouched partition {m} was rewritten"
    touched_after = sorted(
        glob.glob(os.path.join(base, "order_month=1995-03-01", "*.parquet"))
    )
    assert touched_after != touched_before, "touched partition not replaced"

    # STATIC mode (the default) on the same one-month batch truncates the
    # whole table — the foot-gun dynamic mode exists to avoid.
    base2 = str(tmp_path / "dpo_static")
    o.write.mode("overwrite").partitionBy("order_month").parquet(base2)
    restated.write.mode("overwrite").option(
        "partitionOverwriteMode", "static"
    ).partitionBy("order_month").parquet(base2)
    left = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(base2, "order_month=*"))
    )
    assert left == ["order_month=1995-03-01"], left


# ---------------------------------------------------------------------------
# source_orc_lineitem_agg: pushdown reaches the ORC scan
# ---------------------------------------------------------------------------
def test_orc_registered_query_pushes_filter(spark, sf_dir, tmp_path):
    from distributed_deep_learning_with_apache_spark_spark.sources.formats import (
        schema_for,
    )

    path = str(tmp_path / "orc_q")
    load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    ).write.orc(path)
    scan = (
        spark.read.schema(
            schema_for("lineitem", ["l_orderkey", "l_returnflag", "l_quantity"])
        )
        .orc(path)
        .filter(F.col("l_quantity") > 30)
    )
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "l_quantity" in plan.split("PushedFilters")[1][:120], plan
