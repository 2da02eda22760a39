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


# ---------------------------------------------------------------------------
# dedup_clusters_logstar: O(log n) rounds, label-propagation equivalence
# ---------------------------------------------------------------------------
def _labels_of(spark, pairs):
    from distributed_deep_learning_with_apache_spark_spark.operators.dedup import (
        connected_components_logstar,
    )

    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "doc_a long, doc_b long"
    )
    labels, rounds = connected_components_logstar(df)
    return {r.doc_id: r.cluster_id for r in labels.collect()}, rounds


def test_logstar_path_graph_converges_logarithmically(spark):
    """A 200-node path (diameter 200) — label propagation needs ~200 join
    rounds; large/small-star must finish in <= 14 (≈ 2·log2 n). This is
    the property that justifies the second CC engine."""
    n = 200
    labels, rounds = _labels_of(spark, [(i, i + 1) for i in range(n)])
    assert rounds <= 14, f"path graph took {rounds} star rounds"
    assert set(labels) == set(range(n + 1))
    assert all(v == 0 for v in labels.values())


def test_logstar_multi_component_and_star(spark):
    """Disjoint shapes keep disjoint labels: a path, a star rooted high,
    a triangle, and an isolated edge."""
    pairs = (
        [(10, 11), (11, 12)]                       # path → min 10
        + [(100, i) for i in (101, 102, 103)]      # star → min 100
        + [(7, 8), (8, 9), (9, 7)]                 # triangle → min 7
        + [(500, 501)]                             # edge → min 500
    )
    labels, _ = _labels_of(spark, pairs)
    want = {10: 10, 11: 10, 12: 10, 100: 100, 101: 100, 102: 100, 103: 100,
            7: 7, 8: 7, 9: 7, 500: 500, 501: 500}
    assert labels == want


def test_logstar_empty_edges(spark):
    labels, rounds = _labels_of(spark, [])
    assert labels == {} and rounds == 0


def test_logstar_equals_label_propagation(spark, sf_dir):
    """Both CC engines must emit the identical labeling on the real
    near-dup pair graph (they also share the recursive-CTE oracle)."""
    a = {
        (r.doc_id, r.cluster_id)
        for r in REG["dedup_clusters"].fn(spark, sf_dir).collect()
    }
    b = {
        (r.doc_id, r.cluster_id)
        for r in REG["dedup_clusters_logstar"].fn(spark, sf_dir).collect()
    }
    assert a == b


# ---------------------------------------------------------------------------
# row_ids_distributed: no SinglePartition exchange, ids dense and ordered
# ---------------------------------------------------------------------------
def test_row_ids_no_single_partition_exchange(spark, sf_dir):
    df = REG["row_ids_distributed"].fn(spark, sf_dir)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    # and the naive oracle form DOES funnel through one reducer — the
    # contrast that motivates the operator
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ords_rid")
    naive = spark.sql(
        "SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) FROM ords_rid"
    )
    naive.count()
    assert "SinglePartition" in naive._jdf.queryExecution().executedPlan().toString()


def test_row_ids_dense_and_key_ordered(spark, sf_dir):
    rows = REG["row_ids_distributed"].fn(spark, sf_dir).collect()
    rows.sort(key=lambda r: r.row_id)
    assert [r.row_id for r in rows] == list(range(1, len(rows) + 1))
    keys = [r.o_orderkey for r in rows]
    assert keys == sorted(keys)


# ---------------------------------------------------------------------------
# cdc_snapshot_diff: all four change types, counts cross-checked
# ---------------------------------------------------------------------------
def test_cdc_diff_types_match_first_principles(spark, sf_dir):
    from distributed_deep_learning_with_apache_spark_spark.sources.lake import (
        SNAP_DELETE_BELOW,
    )

    got = {
        r.change_type: r.n_rows
        for r in REG["cdc_snapshot_diff"].fn(spark, sf_dir).collect()
    }
    o = load_table(spark, sf_dir, "orders")
    even = F.col("o_orderkey") % 2 == 0
    kept = F.col("o_totalprice") >= SNAP_DELETE_BELOW
    urgent = F.col("o_orderpriority") == "1-URGENT"
    want = {
        "delete": o.filter(even & ~kept).count(),
        "insert": o.filter(~even & kept).count(),
        "update": o.filter(even & kept & urgent).count(),
        "unchanged": o.filter(even & kept & ~urgent).count(),
    }
    want = {k: v for k, v in want.items() if v}
    assert got == want


# ---------------------------------------------------------------------------
# lake_deletion_vectors: base immutable, DV exact, broadcast anti plan
# ---------------------------------------------------------------------------
def test_dv_base_files_survive_delete_commit(spark, sf_dir):
    """The 'delete' never rewrites base data: the sidecar exists, its row
    count equals the matching rows, and base files carry no tombstones."""
    from distributed_deep_learning_with_apache_spark_spark.sources.lake import (
        DV_DELETE_BELOW,
        DV_DELETE_STATUS,
        ensure_dv_table,
    )

    root = ensure_dv_table(spark, sf_dir)
    base = spark.read.parquet(os.path.join(root, "base"))
    dv = spark.read.parquet(os.path.join(root, "dv"))
    o = load_table(spark, sf_dir, "orders")
    assert base.count() == o.count()  # every row still physically present
    want_deleted = o.filter(
        (F.col("o_orderstatus") == DV_DELETE_STATUS)
        & (F.col("o_totalprice") < DV_DELETE_BELOW)
    ).count()
    assert dv.count() == want_deleted
    # positions are unique within a file — an overlay key, not a multiset
    assert dv.distinct().count() == dv.count()


def test_dv_read_plans_broadcast_anti(spark, sf_dir):
    df = REG["lake_deletion_vectors"].fn(spark, sf_dir)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    anti = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
    assert anti and "BroadcastHashJoin" in anti[0], plan


# ---------------------------------------------------------------------------
# udaf_weighted_median: GROUPED_AGG surface + first-principles value check
# ---------------------------------------------------------------------------
def test_udaf_weighted_median_first_principles(spark, sf_dir):
    got = {
        r.l_returnflag: r.weighted_median
        for r in REG["udaf_weighted_median"].fn(spark, sf_dir).collect()
    }
    rows = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .collect()
    )
    by_flag = {}
    for r in rows:
        by_flag.setdefault(r.l_returnflag, []).append(
            (r.l_extendedprice, r.l_quantity)
        )
    for flag, vw in by_flag.items():
        vw.sort()
        total = sum(w for _, w in vw)
        acc = 0.0
        for v, w in vw:
            acc += w
            if acc >= total / 2:
                assert got[flag] == v, (flag, got[flag], v)
                break


def test_udaf_weighted_median_ties_and_skew(spark):
    """Tie-heavy and weight-skewed groups: one dominant value must win,
    and all-equal values return that value."""
    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 2.0, 100.0), ("a", 3.0, 1.0),
         ("b", 5.0, 2.0), ("b", 5.0, 2.0), ("b", 9.0, 1.0)],
        "g string, v double, w double",
    )
    from distributed_deep_learning_with_apache_spark_spark.operators import relational  # noqa: F401
    import pandas as pd
    from pyspark.sql import functions as FF

    @FF.pandas_udf("double")
    def wmedian(v: pd.Series, w: pd.Series) -> float:
        d = pd.DataFrame({"v": v, "w": w}).sort_values("v", kind="mergesort")
        cw = d["w"].cumsum()
        return float(d["v"][cw >= d["w"].sum() / 2].iloc[0])

    got = {
        r.g: r.m
        for r in df.groupBy("g").agg(wmedian("v", "w").alias("m")).collect()
    }
    assert got == {"a": 2.0, "b": 5.0}


# ---------------------------------------------------------------------------
# sink_custom_writer_roundtrip: commit protocol mechanics
# ---------------------------------------------------------------------------
def test_arrowsink_commit_protocol(spark, sf_dir):
    """One committed file per non-empty task, a manifest naming exactly
    those files, clean staging, and a row count equal to the input."""
    import json
    import tempfile
    import shutil

    from distributed_deep_learning_with_apache_spark_spark.sources.arrow_writer_sink import (
        read_arrowsink_table,
        register_arrowsink,
    )

    register_arrowsink(spark)
    base = tempfile.mkdtemp(prefix="sg_arrowsink_test_")
    try:
        src = (
            load_table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_totalprice")
            .repartition(4)
        )
        n_in = src.count()
        src.write.format("arrowsink").mode("overwrite").option("path", base).save()
        with open(os.path.join(base, "_SUCCESS")) as f:
            manifest = json.load(f)
        files = sorted(
            os.path.basename(p) for p in glob.glob(os.path.join(base, "part-*.parquet"))
        )
        assert manifest["files"] == files and len(files) == 4
        assert manifest["n_rows"] == n_in
        assert glob.glob(os.path.join(base, "_staging", "*.parquet")) == []
        assert read_arrowsink_table(spark, base).count() == n_in
        # overwrite replaces the file set atomically (manifest last)
        src.limit(10).repartition(1).write.format("arrowsink").mode(
            "overwrite"
        ).option("path", base).save()
        assert read_arrowsink_table(spark, base).count() == 10
        with open(os.path.join(base, "_SUCCESS")) as f:
            manifest2 = json.load(f)
        assert len(manifest2["files"]) == 1
        # no stale part files outside the manifest
        on_disk = sorted(
            os.path.basename(p) for p in glob.glob(os.path.join(base, "part-*.parquet"))
        )
        assert on_disk == manifest2["files"]
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_arrowsink_append_merges_manifest(spark, sf_dir):
    """Append mode must UNION the manifest with prior commits — a second
    write can neither rename over the first commit's files (per-commit
    uuid in names) nor replace the manifest wholesale (r5 advisor
    finding: both happened)."""
    import json
    import tempfile
    import shutil

    from distributed_deep_learning_with_apache_spark_spark.sources.arrow_writer_sink import (
        read_arrowsink_table,
        register_arrowsink,
    )

    register_arrowsink(spark)
    base = tempfile.mkdtemp(prefix="sg_arrowsink_append_")
    try:
        src = load_table(spark, sf_dir, "orders").select("o_orderkey").repartition(2)
        n = src.count()
        src.write.format("arrowsink").mode("overwrite").option("path", base).save()
        first_files = set(
            os.path.basename(p) for p in glob.glob(os.path.join(base, "part-*.parquet"))
        )
        # Append a second, smaller commit.
        src.limit(7).repartition(1).write.format("arrowsink").mode("append").option(
            "path", base
        ).save()
        with open(os.path.join(base, "_SUCCESS")) as f:
            manifest = json.load(f)
        # Prior files survive on disk and in the manifest; totals sum.
        assert first_files <= set(manifest["files"])
        assert len(manifest["files"]) == len(first_files) + 1
        assert manifest["n_rows"] == n + 7
        assert read_arrowsink_table(spark, base).count() == n + 7
        # Every file name embeds its commit id — two commits never collide.
        assert len(set(manifest["files"])) == len(manifest["files"])
    finally:
        shutil.rmtree(base, ignore_errors=True)


# ---------------------------------------------------------------------------
# stream_stream_left_outer_join: outer rows emitted via watermark passage
# ---------------------------------------------------------------------------
def test_stream_left_outer_matches_batch_twin(spark, sf_dir):
    out = REG["stream_stream_left_outer_join"].fn(spark, sf_dir)
    matched = out.filter(F.col("e_id").isNotNull())
    unmatched = out.filter(F.col("e_id").isNull())
    # batch twin over the same semantics
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "ts")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id"), F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts")
    )
    binner = p.join(
        e,
        (F.col("p_user") == F.col("e_user"))
        & (F.col("e_ts") >= F.col("p_ts"))
        & (F.col("e_ts") <= F.col("p_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    n_pairs = binner.count()
    n_matched_p = binner.select("p_id").distinct().count()
    n_purchases = p.count()
    assert matched.count() == n_pairs
    # every purchase with no in-window error emitted exactly one null row
    assert unmatched.count() == n_purchases - n_matched_p
    assert unmatched.count() > 0, "fixture should contain unmatched purchases"


# ---------------------------------------------------------------------------
# grouped_quantile_exact: per-group narrowing on hostile distributions
# ---------------------------------------------------------------------------
def test_grouped_narrowing_mixed_distributions(spark):
    """Groups with wildly different shapes narrow jointly and correctly:
    constant, heavy-one-value, and spread — each checked against a
    first-principles sort."""
    from distributed_deep_learning_with_apache_spark_spark.operators.setops import (
        exact_grouped_order_statistics,
    )

    data = {
        "const": [42.5] * 5000,
        "heavy": [7.0] * 9000 + [float(i) * 1.3 for i in range(1000)],
        "spread": [((i * 2654435761) % 99991) / 3.0 for i in range(8000)],
    }
    rows = [(g, float(v)) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    needs = {g: {0, len(vs) // 2, len(vs) - 1} for g, vs in data.items()}
    got, passes = exact_grouped_order_statistics(df, needs)
    for g, vs in data.items():
        ref = sorted(vs)
        for k in needs[g]:
            assert got[(g, k)] == ref[k], (g, k)
    assert passes <= 4, passes


def test_grouped_quantile_matches_spark_percentile(spark, sf_dir):
    import math

    expect = {
        (r.l_returnflag, q): r[f"q{i}"]
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            *[
                F.percentile("l_extendedprice", F.lit(q)).alias(f"q{i}")
                for i, q in enumerate((0.5, 0.9, 0.99))
            ]
        )
        .collect()
        for i, q in enumerate((0.5, 0.9, 0.99))
    }
    got = {
        (r.l_returnflag, r.quantile): r.value
        for r in REG["grouped_quantile_exact"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for key, v in got.items():
        want = math.floor(expect[key] * 10000 + 0.5) / 10000
        assert v == pytest.approx(want, abs=1e-9), (key, v, want)


# ---------------------------------------------------------------------------
# distinct_multi_two_phase: Expand absent here, present in the naive form
# ---------------------------------------------------------------------------
def test_multi_distinct_no_expand(spark, sf_dir):
    df = REG["distinct_multi_two_phase"].fn(spark, sf_dir)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan, plan
    naive = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("a"),
            F.countDistinct("l_suppkey").alias("b"),
        )
    )
    naive.count()
    assert "Expand" in naive._jdf.queryExecution().executedPlan().toString()
    # values agree with the naive plan too
    got = {(r.l_returnflag, r.n_parts, r.n_supps) for r in df.collect()}
    want = {(r.l_returnflag, r.a, r.b) for r in naive.collect()}
    assert got == want


# ---------------------------------------------------------------------------
# events_ohlc_hourly: deterministic ties + aggregate (not sort-rank) plan
# ---------------------------------------------------------------------------
def test_ohlc_tie_determinism_first_principles(spark, tmp_path):
    """Two events share the exact min ts and two the exact max ts inside
    one (hour, type) bucket; event_id must break both ties, matching the
    oracle's (ts, event_id) rank order."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = dt.datetime(2024, 3, 1, 10, 0, 0)
    rows = [
        # (event_id, ts, value) — all one hour, one type
        (7, t0, 111.0),          # min-ts tie, larger id
        (3, t0, 222.0),          # min-ts tie, smaller id -> open
        (5, t0 + dt.timedelta(minutes=30), -9.0),   # low
        (9, t0 + dt.timedelta(minutes=59), 444.0),  # max-ts tie, larger id -> close
        (8, t0 + dt.timedelta(minutes=59), 555.0),  # max-ts tie, smaller id; also high
    ]
    td = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([0] * 5, pa.int64()),
                "event_type": pa.array(["click"] * 5),
                "value": pa.array([r[2] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * 5),
            }
        ),
        os.path.join(td, "events.parquet"),
    )
    out = REG["events_ohlc_hourly"].fn(spark, td).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_events, r.open_v, r.high_v, r.low_v, r.close_v) == (5, 222.0, 555.0, -9.0, 444.0)


def test_ohlc_plan_partial_agg_one_exchange_no_window(spark, sf_dir):
    """The scale property: OHLC is a real aggregate with map-side partial
    merge and exactly one shuffle — NOT the oracle's double-direction
    window-rank formulation (which shuffles every row and sorts each
    partition twice). The struct min_by key forces SortAggregate (struct
    is not a mutable hash-agg buffer type), but the sort is on the group
    key only and partials collapse rows before the exchange."""
    df = REG["events_ohlc_hourly"].fn(spark, sf_dir)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "partial_min_by" in plan and "partial_max_by" in plan, plan
    assert plan.count("Exchange") == 1, plan


# ---------------------------------------------------------------------------
# source_xml_events_agg: markup-hostile strings survive the XML round-trip
# ---------------------------------------------------------------------------
def test_xml_roundtrip_escapes_markup(spark, tmp_path):
    """event_type values containing XML metacharacters must round-trip
    bit-exactly (writer escapes, reader unescapes)."""
    from distributed_deep_learning_with_apache_spark_spark.sources.formats import schema_for

    hostile = ['a<b&c>"d\'', "&amp;", "<event>", "]]>", "plain"]
    df = spark.createDataFrame(
        [(i, s, float(i) + 0.25) for i, s in enumerate(hostile)],
        schema_for("events", ["event_id", "event_type", "value"]),
    )
    path = str(tmp_path / "xml")
    df.write.format("xml").option("rootTag", "events").option("rowTag", "event").save(path)
    back = (
        spark.read.schema(schema_for("events", ["event_id", "event_type", "value"]))
        .format("xml")
        .option("rowTag", "event")
        .load(path)
    )
    assert sorted(back.collect()) == sorted(df.collect())


# ---------------------------------------------------------------------------
# collated_token_counts / ansi_safe_doc_ratios: first-principles semantics
# ---------------------------------------------------------------------------
def _write_docs(td, texts):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(texts))),
                "text": pa.array(texts, pa.string()),
                "lang": ["en"] * len(texts),
                "domain": ["web"] * len(texts),
                "quality": [0.5] * len(texts),
            }
        ),
        os.path.join(td, "documents.parquet"),
    )


def test_collation_merges_case_variants(spark, tmp_path):
    """UTF8_LCASE grouping must merge byte-distinct spellings and report
    how many it merged."""
    td = str(tmp_path)
    _write_docs(td, ["Spark rules", "SPARK again", "spark x", "other doc", "Other"])
    out = {r.token: (r.n_docs, r.n_case_variants)
           for r in REG["collated_token_counts"].fn(spark, td).collect()}
    assert out == {"spark": (3, 3), "other": (2, 2)}, out


def test_ansi_safe_ratio_nulls_on_empty_not_raises(spark, tmp_path):
    """Under ansi.enabled=true, empty documents must yield NULL density
    (counted in n_unmeasurable) — not a divide-by-zero error."""
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    td = str(tmp_path)
    _write_docs(td, ["four words right here", "", "ab cd"])
    [r] = REG["ansi_safe_doc_ratios"].fn(spark, td).collect()
    assert r.n_docs == 3 and r.n_unmeasurable == 1
    # densities: 4 tokens / 21 bytes and 2 tokens / 5 bytes, floor(x*1e4+0.5)
    import math
    want = math.floor(4 / 21 * 10000 + 0.5) + math.floor(2 / 5 * 10000 + 0.5)
    assert r.density_e4 == want, (r.density_e4, want)


# ---------------------------------------------------------------------------
# triangle_count_copurchase: first-principles enumeration on a known graph
# ---------------------------------------------------------------------------
def test_triangle_count_known_graph(spark, tmp_path):
    """Orders staged so the support-2 co-purchase graph is exactly
    {1-2, 1-3, 2-3, 2-4, 3-4}: two triangles (1,2,3) and (2,3,4) sharing
    edge 2-3, four participating nodes — each triangle counted once."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # each inner list is one order's distinct parts; listed pairs co-occur
    orders_parts = [
        [1, 2, 3], [1, 2, 3],          # support 2 for 1-2, 1-3, 2-3
        [2, 3, 4], [2, 3, 4],          # support 2 more for 2-3; 2-4, 3-4
        [1, 4],                        # support 1 only -> NOT an edge
        [5, 6],                        # isolated support-1 pair
    ]
    rows = [
        (oid, p)
        for oid, parts in enumerate(orders_parts)
        for p in parts
    ]
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            }
        ),
        os.path.join(str(tmp_path), "lineitem.parquet"),
    )
    [r] = REG["triangle_count_copurchase"].fn(spark, str(tmp_path)).collect()
    assert (r.n_edges, r.n_triangles, r.n_tri_nodes) == (5, 2, 4), r


def test_triangle_plan_no_cartesian(spark, sf_dir):
    """All three triangle joins must be equi-joins; the only cross joins
    are the three singleton aggregate combiners."""
    df = REG["triangle_count_copurchase"].fn(spark, sf_dir)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan


# ---------------------------------------------------------------------------
# lateral_top3_orders: decorrelation plan + tie-handling semantics
# ---------------------------------------------------------------------------
def test_lateral_decorrelates_to_one_join(spark, sf_dir):
    """The correlated LATERAL subquery must be rewritten into a single
    equi-join (no per-outer-row execution): exactly one join node, no
    CartesianProduct, and a per-key limit (window group limit / rank
    filter) enforcing the 3-row cap."""
    df = REG["lateral_top3_orders"].fn(spark, sf_dir)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    import re
    joins = re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", plan)
    assert len(joins) >= 1, plan


def test_lateral_matches_window_form(spark, sf_dir):
    """LATERAL ... ORDER BY ... LIMIT 3 must equal the window-function
    top-3 formulation row for row (same tiebreak)."""
    from pyspark.sql import Window, functions as F
    from distributed_deep_learning_with_apache_spark_spark.sources.catalog import load_table

    got = sorted(
        (r.c_custkey, r.o_orderkey)
        for r in REG["lateral_top3_orders"].fn(spark, sf_dir).collect()
    )
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    want = sorted(
        (r.o_custkey, r.o_orderkey)
        for r in o.select("o_custkey", "o_orderkey", F.row_number().over(w).alias("rn"))
        .filter("rn <= 3")
        .collect()
    )
    assert got == want


# ---------------------------------------------------------------------------
# intersect_all: bag multiplicity on a constructed frame
# ---------------------------------------------------------------------------
def test_intersect_all_multiplicity(spark):
    a = spark.createDataFrame([("x",)] * 3 + [("y",)] * 1 + [("z",)] * 2, "v string")
    b = spark.createDataFrame([("x",)] * 1 + [("y",)] * 4, "v string")
    got = sorted(r.v for r in a.intersectAll(b).collect())
    assert got == ["x", "y"]  # min(3,1) x's, min(1,4) y's, no z


# ---------------------------------------------------------------------------
# nullsafe_bucket_join: the NULL buckets must pair into ONE row
# ---------------------------------------------------------------------------
def test_nullsafe_join_pairs_null_buckets(spark, sf_dir):
    rows = REG["nullsafe_bucket_join"].fn(spark, sf_dir).collect()
    null_rows = [r for r in rows if r.k_decile_joined is None]
    # however many NULL-bucket events exist, the join must emit at most ONE
    # reconciled NULL row — never one dangling outer row per side
    assert len(null_rows) <= 1, null_rows
    if null_rows:
        [r] = null_rows
        assert r.is_null_bucket
        # at sf fixtures both clicks and purchases land in the NULL bucket,
        # so both sides must be present on the single reconciled row
        assert r.n_clicks is not None and r.n_buys is not None, r


# ---------------------------------------------------------------------------
# hinted_shuffle_hash_join: strategy override must stick
# ---------------------------------------------------------------------------
def test_shuffle_hash_hint_overrides_smj(spark, sf_dir):
    """The hint must produce ShuffledHashJoin and suppress SortMergeJoin;
    dropping the hint on the same shape is allowed to pick any strategy,
    but the hinted plan may not silently fall back."""
    df = REG["hinted_shuffle_hash_join"].fn(spark, sf_dir)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


# ---------------------------------------------------------------------------
# union_by_name_schema_drift: name alignment vs positional corruption
# ---------------------------------------------------------------------------
def test_union_by_name_aligns_and_nullfills(spark, sf_dir):
    rows = REG["union_by_name_schema_drift"].fn(spark, sf_dir).collect()
    v1 = [r for r in rows if r.src == "v1"]
    v2 = [r for r in rows if r.src == "v2"]
    assert v1 and v2
    # v1 predates the revenue column -> null-filled; v2 always has it
    assert all(r.revenue_cents is None for r in v1)
    assert all(r.revenue_cents is not None for r in v2)
    # name alignment: every n is a count (small positive), never a user_id
    # smuggled into the wrong slot by position
    assert all(r.n >= 1 for r in rows)


def test_union_by_name_rejects_positional(spark):
    """Negative control: plain positional union of the drifted schemas
    either errors or mis-types — unionByName is the only safe spelling."""
    import pytest as _pytest

    a = spark.createDataFrame([(1, "x")], "id long, tag string")
    b = spark.createDataFrame([("y", 2)], "tag string, id long")
    got = sorted((r.id, r.tag) for r in a.unionByName(b).collect())
    assert got == [(1, "x"), (2, "y")]
    with _pytest.raises(Exception):
        # positional union pairs long with string -> analysis error
        a.union(b).collect()


# ---------------------------------------------------------------------------
# batch_observed_metrics: accumulator path == dedicated aggregate pass
# ---------------------------------------------------------------------------
def test_observed_metrics_equal_direct_agg(spark, sf_dir):
    from distributed_deep_learning_with_apache_spark_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    [got] = REG["batch_observed_metrics"].fn(spark, sf_dir).collect()
    [want] = (
        load_table(spark, sf_dir, "lineitem")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("price_cents"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
        )
        .collect()
    )
    assert tuple(got) == tuple(want)


# ---------------------------------------------------------------------------
# stream_dedup_within_watermark: redelivered keys collapse to one row
# ---------------------------------------------------------------------------
def test_dedup_within_watermark_collapses_redeliveries(spark, tmp_path):
    """At-least-once redelivery shape: the same event_id appears 3x with
    slightly different timestamps (fresh send times) — within the
    watermark delay they must collapse to ONE output row per key."""
    import datetime as dt
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = dt.datetime(2024, 1, 1)
    rows = []
    for eid in range(20):
        for resend in range(3):  # redeliveries seconds apart
            rows.append((eid, base + dt.timedelta(minutes=eid, seconds=resend),
                         eid % 4, "click", 1.0, '{"k": 1}'))
    pq.write_table(
        pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows]),
        }),
        os.path.join(str(tmp_path), "events.parquet"),
    )
    out = REG["stream_dedup_within_watermark"].fn(spark, str(tmp_path))
    got = sorted(r.event_id for r in out.collect())
    assert got == list(range(20)), got  # one row per key, all 60 inputs collapsed


# ---------------------------------------------------------------------------
# leakage_safe_splits: no cluster may straddle splits; doc-keyed would
# ---------------------------------------------------------------------------
def test_leakage_safe_split_has_zero_cross_split_clusters(spark, sf_dir):
    """End-to-end leakage audit at doc level: every near-dup cluster maps
    to exactly one split. Negative control: keying the SAME bucket hash on
    doc_id instead of cluster_id must leak (>0 clusters straddle splits)
    on a corpus that has multi-doc clusters."""
    from pyspark.sql import functions as F
    from distributed_deep_learning_with_apache_spark_spark.operators.dedup import dedup_clusters
    from distributed_deep_learning_with_apache_spark_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    labels = dedup_clusters(spark, sf_dir)
    labeled = d.join(labels, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
    )

    def bucket_of(col):
        h = F.md5(col.cast("string"))
        return (F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1))) % 10

    multi = labeled.groupBy("cluster_id").count().filter("count > 1").count()
    assert multi > 0, "fixture must contain multi-doc clusters for this audit"

    cluster_keyed = labeled.withColumn("split", bucket_of(F.col("cluster_id")))
    leaks = (
        cluster_keyed.groupBy("cluster_id")
        .agg(F.count_distinct("split").alias("n_splits"))
        .filter("n_splits > 1")
        .count()
    )
    assert leaks == 0, leaks

    doc_keyed = labeled.withColumn("split", bucket_of(F.col("doc_id")))
    doc_leaks = (
        doc_keyed.groupBy("cluster_id")
        .agg(F.count_distinct("split").alias("n_splits"))
        .filter("n_splits > 1")
        .count()
    )
    assert doc_leaks > 0, "doc-keyed split should leak on this corpus"


# ---------------------------------------------------------------------------
# stream_stream_full_outer_join: BOTH sides' outer rows via watermark
# ---------------------------------------------------------------------------
def test_stream_full_outer_matches_batch_twin(spark, sf_dir):
    out = REG["stream_stream_full_outer_join"].fn(spark, sf_dir)
    matched = out.filter(F.col("p_id").isNotNull() & F.col("e_id").isNotNull())
    left_only = out.filter(F.col("e_id").isNull())
    right_only = out.filter(F.col("p_id").isNull())
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "ts")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id"), F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts")
    )
    binner = p.join(
        e,
        (F.col("p_user") == F.col("e_user"))
        & (F.col("e_ts") >= F.col("p_ts"))
        & (F.col("e_ts") <= F.col("p_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    n_pairs = binner.count()
    n_matched_p = binner.select("p_id").distinct().count()
    n_matched_e = binner.select("e_id").distinct().count()
    assert matched.count() == n_pairs
    assert left_only.count() == p.count() - n_matched_p
    assert right_only.count() == e.count() - n_matched_e
    assert left_only.count() > 0 and right_only.count() > 0, (
        "fixture should exercise both outer sides"
    )


def test_observe_does_not_poison_later_rdd_jobs(spark, sf_dir):
    """Regression: a used Observation stays registered in the session's
    ObservationManager, which is not java-serializable — on a SHARED
    session it breaks closure cleaning for every later RDD-based job
    (Task not serializable: ObservationManager). batch_observed_metrics
    must therefore observe on an isolated newSession(); this pins that an
    RDD closure job on the shared session still serializes afterwards."""
    [r] = REG["batch_observed_metrics"].fn(spark, sf_dir).collect()
    assert r.n_rows > 0
    # an RDD mapPartitions job on the SAME session — the poisoned path
    got = spark.range(100).rdd.mapPartitions(lambda it: [sum(x.id for x in it)]).sum()
    assert got == 4950
